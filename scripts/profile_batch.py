#!/usr/bin/env python
"""Measure multi-pair batched inference throughput (vmap over pairs).

The reference is architecturally stuck at batch size 1 per GPU (stack mode,
`/root/reference/geotransformer/utils/data.py:139-189`, README:176); our
fixed-capacity padded batches vmap cleanly, so one chip can serve several
pairs per step. The deep-stage convs, transformer (N=512), Sinkhorn, and
LGR are all launch/latency-bound at batch 1 — batching fills the chip.

Prints pairs/s at batch sizes 1, 2, 4, 8 on the demo pair.
"""
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import (
    build_pyramid, pad_registration_batch, caps_for_pyramid,
    fit_split_for_table,
)
from geotransformer_tpu.models import create_model
from geotransformer_tpu.utils.timing import trace_ms

cfg = make_3dmatch_config()
ref = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
src = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
points = np.concatenate([ref, src], 0)
lengths = np.asarray([len(ref), len(src)])
pyr = build_pyramid(points, lengths, cfg.backbone.num_stages,
                    cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
                    list(cfg.caps.neighbor_limits))
caps = tuple(caps_for_pyramid(pyr, multiple=256, per_cloud=True))
cfg = cfg.with_caps(stage_caps=caps)
feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
base = pad_registration_batch(pyr, feats, np.eye(4, dtype=np.float32), caps)
nb = [fit_split_for_table(np.asarray(t), np.asarray(t).shape[0])
      for t in base["neighbors"]]
sub = [fit_split_for_table(
    np.asarray(t), np.asarray(base["neighbors"][i]).shape[0])
    for i, t in enumerate(base["subsampling"])]
batch = jax.tree.map(jnp.asarray, pad_registration_batch(
    pyr, feats, np.eye(4, dtype=np.float32), caps,
    neighbor_splits=nb, subsampling_splits=sub))
model = create_model(cfg)
variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
    jax.random.PRNGKey(0), batch)

for bs in (1, 2, 4, 8):
    bb = jax.tree.map(lambda x: jnp.broadcast_to(x[None], (bs,) + x.shape), batch)
    fwd = jax.vmap(
        lambda b: model.apply(variables, b, training=False, with_gt=False)[
            "estimated_transform"])
    try:
        ms = trace_ms(lambda v, b: fwd(b), (variables, bb),
                      lambda out: out[0, 0, 0], iters=4)
        print(f"batch {bs}: {ms:8.2f} ms  -> {bs * 1000.0 / ms:7.2f} pairs/s",
              flush=True)
    except Exception as exc:
        print(f"batch {bs}: FAILED {type(exc).__name__}: {exc}"[:300], flush=True)
