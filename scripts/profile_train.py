#!/usr/bin/env python
"""Trace one train step on the TPU and print the top device ops by time."""
import glob, gzip, json, os.path as osp, shutil, sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import (
    build_pyramid, pad_registration_batch, caps_for_pyramid,
    fit_split_for_table,
)
from geotransformer_tpu.models import create_model, precompute_gt_targets
from geotransformer_tpu.parallel.train import init_train_state, make_optimizer, make_train_step

ref = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
src = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
points = np.concatenate([ref, src], 0)
lengths = np.asarray([len(ref), len(src)])
cfg = make_3dmatch_config()
pyr = build_pyramid(points, lengths, 4, cfg.backbone.init_voxel_size,
                    cfg.backbone.init_radius, list(cfg.caps.neighbor_limits))
caps = tuple(caps_for_pyramid(pyr, multiple=256, per_cloud=True))
cfg = cfg.with_caps(stage_caps=caps)
feats = np.ones((points.shape[0], 1), np.float32)
# PRODUCTION train batch: inverse tables (scatter-free backward), fitted
# splits, and loader-precomputed no_grad targets — same as bench.py's
# train_step_ms configuration.
base = pad_registration_batch(pyr, feats, np.eye(4, dtype=np.float32), caps)
nb_splits = [fit_split_for_table(np.asarray(t), np.asarray(t).shape[0])
             for t in base["neighbors"]]
sub_splits = [fit_split_for_table(
    np.asarray(t), np.asarray(base["neighbors"][i]).shape[0])
    for i, t in enumerate(base["subsampling"])]
tmp = pad_registration_batch(
    pyr, feats, np.eye(4, dtype=np.float32), caps,
    inverse_limits=cfg.caps.inverse_limits,
    neighbor_splits=nb_splits, subsampling_splits=sub_splits)
inv_splits = [fit_split_for_table(np.asarray(t), np.asarray(t).shape[0],
                                  align=8)
              for t in tmp["neighbors_inv"]]
sub_inv_splits = [fit_split_for_table(
    np.asarray(t), np.asarray(tmp["neighbors"][i + 1]).shape[0], align=8)
    for i, t in enumerate(tmp["subsampling_inv"])]
batch = jax.tree.map(jnp.asarray, pad_registration_batch(
    pyr, feats, np.eye(4, dtype=np.float32), caps,
    inverse_limits=cfg.caps.inverse_limits,
    neighbor_splits=nb_splits, subsampling_splits=sub_splits,
    inverse_splits=inv_splits, sub_inverse_splits=sub_inv_splits))
targets = jax.jit(lambda b: precompute_gt_targets(cfg, b, use_pallas=True))(batch)
batch = dict(batch, **targets)
model = create_model(cfg)
tx = make_optimizer(cfg, steps_per_epoch=10, world_size=1)
state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
step = make_train_step(model, cfg, tx, mesh=None)
b1 = jax.tree.map(lambda x: x[None], batch)
rng = jax.random.PRNGKey(1)
s, aux = step(state, b1, rng); float(aux["loss"])  # compile+sync

trace_dir = "/tmp/train_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
with jax.profiler.trace(trace_dir):
    out = state, None
    s2 = state
    for _ in range(3):
        s2, aux = step(s2, b1, rng)
    float(aux["loss"])

# parse (events appear once per step; divide totals by the 3 steps)
files = glob.glob(trace_dir + "/**/*.trace.json.gz", recursive=True)
from collections import defaultdict
agg = defaultdict(lambda: [0.0, 0, ""])
for f in files:
    with gzip.open(f, "rt") as fh:
        data = json.load(fh)
    pids = {}
    for e in data["traceEvents"]:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pids[e["pid"]] = e.get("args", {}).get("name", "")
    tpu_pids = {p for p, n in pids.items() if "TPU" in str(n)}
    for e in data["traceEvents"]:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids and "dur" in e:
            a = agg[e.get("name", "?")]
            a[0] += e["dur"]
            a[1] += 1
            ln = e.get("args", {}).get("long_name", "")
            if ln:
                a[2] = ln
print("per-step op times (3-step trace):")
for nm, (d, c, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:30]:
    print(f"{d / 3 / 1000.0:9.3f} ms x{c:3d}  {nm[:36]:36s} {ln[:140]}")
