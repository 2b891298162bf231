"""Worker for the 2-process multi-host trainer test (not a pytest module).

Launched by tests/test_multihost.py as
``python multihost_worker.py <coordinator_port> <process_id> <out_dir>``:
initializes jax.distributed over 2 CPU processes x 2 local devices, builds a
process-sharded PairLoader (the reference DistributedSampler equivalent,
`/root/reference/geotransformer/engine/base_trainer.py:66-72`), runs one
epoch of the Trainer over the 4-device global mesh, and prints the final
loss for the parent to cross-check between hosts.
"""

import os
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

port, pid, out_dir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
cache_dir = sys.argv[4] if len(sys.argv) > 4 else None

# Must run before any backend initialization (the image's sitecustomize pins
# the TPU platform; see tests/conftest.py).
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)
if cache_dir:
    # Per-test cache dir shared by BOTH workers, never the global
    # /root/.jax_cache: that one accumulates AOT entries compiled on other
    # host ISAs, and the resulting mismatch warnings + forced recompiles
    # once pushed a worker past Gloo's 30s key-value deadline.
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
jax.distributed.initialize(
    coordinator_address=f"localhost:{port}", num_processes=2, process_id=pid
)
assert jax.process_count() == 2
assert jax.device_count() == 4
assert jax.local_device_count() == 2

# Establish the cross-process Gloo contexts NOW, while both processes are in
# lockstep straight out of distributed init: a trivial psum over the global
# mesh compiles in seconds and creates the communicator clique. Without
# this, the first collective is the full train step — if one worker's
# compile runs long the other times out in Gloo context init
# (GetKeyValue() 30s deadline; reproduced in round 2's verdict).
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_mesh = Mesh(np.asarray(jax.devices()), ("data",))
_x = jax.make_array_from_process_local_data(
    NamedSharding(_mesh, P("data")),
    np.full((jax.local_device_count(),), 1.0, np.float32),
)
_total = jax.jit(
    lambda v: v.sum(), out_shardings=NamedSharding(_mesh, P())
)(_x)
assert float(np.asarray(_total.addressable_shards[0].data)) == jax.device_count()
print(f"GLOO_WARM pid={pid}", flush=True)

import dataclasses

from test_parallel import tiny_config
from test_engine import SyntheticPairDataset, pipeline_cfg

from geotransformer_tpu.models import create_model
from geotransformer_tpu.engine import Trainer
from geotransformer_tpu.preprocess.loader import PairLoader

cfg = tiny_config()
cfg = dataclasses.replace(cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
model = create_model(cfg)
# 8 items, 2 host shards of 4, local batch 2 -> 2 global steps of 4 pairs.
loader = PairLoader(
    SyntheticPairDataset(8), pipeline_cfg(cfg), batch_size=2, shuffle=True,
    num_shards=jax.process_count(), shard_index=jax.process_index(),
)
trainer = Trainer(
    cfg, model, loader, val_loader=None,
    # shared dir (like real multihost NFS): orbax coordinates the write
    output_dir=os.path.join(out_dir, "shared"),
    use_mesh=True, log_steps=1, tensorboard=False,
)
assert trainer.mesh is not None and trainer.mesh.size == 4

example = dict(next(iter(loader))[0])
example.pop("meta")
trainer.initialize(example)
state = trainer.run()
assert int(state.step) == 2
loss = float(trainer.last_metrics["loss"])
print(f"MULTIHOST_OK pid={pid} step={int(state.step)} loss={loss:.6f}",
      flush=True)
