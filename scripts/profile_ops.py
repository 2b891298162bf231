#!/usr/bin/env python
"""Op-level device-time attribution for the full model forward (demo pair).

Captures a jax.profiler trace of the jitted forward and aggregates TPU
op events by fusion name, printing the top-N. This is the ground truth for
deciding which kernel to attack next (CLAUDE.md: traces work on this relay;
fetch-based timing carries ~30ms RPC jitter).
"""

import argparse
import collections
import glob
import gzip
import json
import os.path as osp
import re
import shutil
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def collect_op_times(trace_dir, iters):
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(files[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    tids = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "thread_name" and "args" in e:
            tids[(e["pid"], e["tid"])] = e["args"].get("name", "")
    dur = collections.Counter()
    top = collections.Counter()
    for e in events:
        if e.get("ph") != "X" or "TPU" not in pids.get(e.get("pid"), ""):
            continue
        tname = tids.get((e.get("pid"), e.get("tid")), "")
        name = e.get("name", "")
        if name.startswith("jit_"):
            top[name] += e.get("dur", 0)
            continue
        # op-level lines (XLA Ops / XLA Modules threads)
        if "Ops" in tname or "op" in tname.lower():
            dur[name] += e.get("dur", 0)
    return top, dur


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--part", choices=["model", "backbone", "train"], default="model")
    args = ap.parse_args()

    from geotransformer_tpu.configs import make_3dmatch_config
    from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
    from geotransformer_tpu.models import create_model

    ref_points = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src_points = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref_points, src_points], 0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    cfg = make_3dmatch_config()
    pyramid = build_pyramid(points, lengths, 4, cfg.backbone.init_voxel_size,
                            cfg.backbone.init_radius, list(cfg.caps.neighbor_limits))
    caps = tuple(caps_for_pyramid(pyramid, multiple=256))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    batch = jax.tree.map(
        jnp.asarray, pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps)
    )
    model = create_model(cfg)

    if args.part == "backbone":
        from geotransformer_tpu.models.backbone import KPConvFPN

        bb = KPConvFPN(cfg.backbone.input_dim, cfg.backbone.output_dim,
                       cfg.backbone.init_dim, cfg.backbone.kernel_size,
                       cfg.backbone.init_radius, cfg.backbone.init_sigma,
                       cfg.backbone.group_norm, num_stages=4, first_fine_stage=1,
                       use_pallas=True)
        variables = jax.jit(lambda r, f, b: bb.init(r, f, b))(
            jax.random.PRNGKey(0), batch["features"], batch)
        jfn = jax.jit(
            lambda v, f, b: jnp.sum(bb.apply(v, f, b)[0]) + jnp.sum(bb.apply(v, f, b)[-1])
        )
        call = lambda: jfn(variables, batch["features"], batch)
    else:
        variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
            jax.random.PRNGKey(cfg.seed), batch)
        jfn = jax.jit(
            lambda v, b: model.apply(v, b, training=False, with_gt=False)["estimated_transform"][0, 0]
        )
        call = lambda: jfn(variables, batch)

    float(call())  # compile + sync
    trace_dir = "/tmp/gt_op_trace"
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(args.iters):
            out = call()
        float(out)

    top, dur = collect_op_times(trace_dir, args.iters)
    print("== executables ==")
    for name, us in top.most_common(5):
        print(f"  {name:60s} {us / args.iters / 1000.0:8.3f} ms/iter")
    total = sum(dur.values())
    print(f"== top ops (total op time {total / args.iters / 1000.0:.3f} ms/iter) ==")
    for name, us in dur.most_common(args.top):
        print(f"  {us / args.iters / 1000.0:8.3f} ms  {100.0 * us / max(total, 1):5.1f}%  {name[:110]}")


if __name__ == "__main__":
    main()
