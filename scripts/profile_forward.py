#!/usr/bin/env python
"""Trace the inference forward on the TPU and print the top device ops.

Same parsing as profile_train.py but for the bench.py primary metric
configuration (per-cloud fitted caps, training=False, with_gt=False).
Optionally --kitti for the KITTI-scale synthetic pair.
"""
import argparse, glob, gzip, json, os.path as osp, shutil, sys
sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config, make_kitti_config
from geotransformer_tpu.preprocess import (
    build_pyramid, pad_registration_batch, caps_for_pyramid,
    fit_split_for_table,
)
from geotransformer_tpu.models import create_model

parser = argparse.ArgumentParser()
parser.add_argument("--kitti", action="store_true")
parser.add_argument("--top", type=int, default=40)
parser.add_argument("--multiple", type=int, default=128,
                    help="pair-fit cap rounding multiple (128 = the value "
                         "bench.py's primary metric uses)")
parser.add_argument("--calibrated", action="store_true",
                    help="use the config's dataset-calibrated caps instead "
                         "of pair-fit caps (bench.py calibrated_caps line)")
args = parser.parse_args()

if args.kitti:
    sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))
    from bench import _kitti_like_pair

    cfg = make_kitti_config()
    ref, src = _kitti_like_pair()
else:
    cfg = make_3dmatch_config()
    ref = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src = np.load("/root/reference/data/demo/src.npy").astype(np.float32)

points = np.concatenate([ref, src], 0)
lengths = np.asarray([len(ref), len(src)])
pyr = build_pyramid(points, lengths, cfg.backbone.num_stages,
                    cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
                    list(cfg.caps.neighbor_limits))
if args.calibrated:
    caps = tuple(cfg.caps.stage_caps)
else:
    caps = tuple(caps_for_pyramid(pyr, multiple=args.multiple, per_cloud=True))
    cfg = cfg.with_caps(stage_caps=caps)
feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
# same fitted splits as bench.py's primary metric
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

fwd = jax.jit(lambda v, b: model.apply(v, b, training=False, with_gt=False)[
    "estimated_transform"][0, 0])
float(fwd(variables, batch))  # compile+sync

ITERS = 4
trace_dir = "/tmp/fwd_trace"
shutil.rmtree(trace_dir, ignore_errors=True)
with jax.profiler.trace(trace_dir):
    out = None
    for _ in range(ITERS):
        out = fwd(variables, batch)
    float(out)

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
total = sum(v[0] for k, v in agg.items() if k.startswith("jit_"))
print(f"caps: {caps}")
print(f"per-call op times ({ITERS}-iter trace; jit total "
      f"{total / ITERS / 1000.0:.2f} ms):")
for nm, (d, c, ln) in sorted(agg.items(), key=lambda kv: -kv[1][0])[:args.top]:
    if nm.startswith("jit_"):
        continue
    print(f"{d / ITERS / 1000.0:9.3f} ms x{c // ITERS:4d}  {nm[:40]:40s} {ln[:150]}")
