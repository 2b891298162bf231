#!/usr/bin/env python
"""Per-phase attribution of the on-device pyramid build (bench.py's
e2e_device_ms line, preprocess/device.py:432-556).

Times each phase of build_pyramid_device as its own jitted program on the
real demo pair (trace-based timing, utils/timing.py): the 3 voxel
subsamples, the 4 per-stage self searches, the 3 subsampling searches, the
3 upsampling searches, and the input edge stream — plus a sub-phase split
of the stage-0 grid search (CSR build vs candidate gather + select) so the
next optimization target is measured, not guessed (round-4 verdict ask).

Usage: python scripts/profile_device.py [--cand_cap 512]
"""
import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, caps_for_pyramid
from geotransformer_tpu.preprocess.device import (
    build_pyramid_device, pad_stage0, _subsample_cloud, _pair_search,
    _radius_search_cloud_grid,
)
from geotransformer_tpu.utils.timing import trace_ms


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--cand_cap", type=int, default=512)
    parser.add_argument("--iters", type=int, default=6)
    args = parser.parse_args()

    ref = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref, src], 0)
    lengths = np.asarray([len(ref), len(src)])
    cfg = make_3dmatch_config()
    S = cfg.backbone.num_stages
    pyr = build_pyramid(points, lengths, S, cfg.backbone.init_voxel_size,
                        cfg.backbone.init_radius,
                        list(cfg.caps.neighbor_limits))
    caps = tuple(caps_for_pyramid(pyr, multiple=128, per_cloud=True))
    sym_caps = tuple(int(max(c)) if isinstance(c, (tuple, list)) else int(c)
                     for c in caps)
    print(f"sym caps: {sym_caps}  neighbor_limits: {cfg.caps.neighbor_limits}")

    pts0, lens0, feats0 = pad_stage0(points, lengths, sym_caps[0], 1)
    spec = dict(num_stages=S, voxel_size=cfg.backbone.init_voxel_size,
                radius=cfg.backbone.init_radius,
                neighbor_limits=tuple(cfg.caps.neighbor_limits),
                stage_caps=sym_caps, knn_cand_cap=args.cand_cap)
    e2e_args = (jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0))

    # whole build (no model) for the reference total
    def build_only(p, l, f):
        return build_pyramid_device(p, l, f, jnp.eye(4, jnp.float32), **spec)[0]

    built = jax.jit(build_only)(*e2e_args)
    total = trace_ms(build_only, e2e_args,
                     lambda o: o["neighbors"][-1][0, 0], iters=args.iters)
    print(f"\nfull build_pyramid_device: {total:.2f} ms\n")

    # per-stage inputs (device arrays, stop_gradient of the real build)
    stage_pts = [jax.tree.map(
        lambda x: x, built["points"][i]).reshape(2, sym_caps[i], 3)
        for i in range(S)]
    stage_lens = [built["lengths"][i] for i in range(S)]

    rows = []

    def add(name, fn, fargs, fetch):
        ms = trace_ms(fn, fargs, fetch, iters=args.iters)
        rows.append((name, ms))
        print(f"  {name:<42s} {ms:8.2f} ms")

    # --- voxel subsamples ---
    v = cfg.backbone.init_voxel_size * 2.0
    for i in range(1, S):
        cap_out = sym_caps[i]
        vv = v

        def sub_fn(p, n, _vv=vv, _cap=cap_out):
            return jax.vmap(lambda a, b: _subsample_cloud(a, b, _vv, _cap))(p, n)

        add(f"subsample s{i-1}->s{i} ({sym_caps[i-1]}->{cap_out})",
            sub_fn, (stage_pts[i - 1], stage_lens[i - 1]),
            lambda o: o[0][0, 0, 0])
        v *= 2.0

    # --- searches ---
    r = cfg.backbone.init_radius
    for i in range(S):
        cap = sym_caps[i]
        k = int(cfg.caps.neighbor_limits[i])

        def self_fn(p, n, _cap=cap, _r=r, _k=k):
            return _pair_search(p, n, p, n, _cap, _cap, _r, _k,
                                cand_cap=args.cand_cap)

        add(f"self search s{i} (q={cap}, s={cap}, k={k})",
            self_fn, (stage_pts[i], stage_lens[i]), lambda o: o[0][0, 0])
        if i < S - 1:
            cap_sub = sym_caps[i + 1]

            def sub_fn(ps, ns, p, n, _cs=cap_sub, _c=cap, _r=r, _k=k):
                return _pair_search(ps, ns, p, n, _cs, _c, _r, _k,
                                    cand_cap=args.cand_cap)

            add(f"sub search s{i+1}<-s{i} (q={cap_sub}, s={cap})",
                sub_fn, (stage_pts[i + 1], stage_lens[i + 1],
                         stage_pts[i], stage_lens[i]),
                lambda o: o[0][0, 0])

            k_up = int(cfg.caps.neighbor_limits[i + 1])

            def up_fn(p, n, ps, ns, _c=cap, _cs=cap_sub, _r=r, _k=k_up):
                return _pair_search(p, n, ps, ns, _c, _cs, _r * 2.0, _k,
                                    cand_cap=args.cand_cap)

            add(f"up search s{i}->s{i+1} (q={cap}, s={cap_sub}, r*2)",
                up_fn, (stage_pts[i], stage_lens[i],
                        stage_pts[i + 1], stage_lens[i + 1]),
                lambda o: o[0][0, 0])
        r *= 2.0

    # --- input edge stream ---
    def stream_fn(table, pts, feats):
        t0 = pts.shape[0]
        tvalid = table < t0
        idx = jnp.where(tvalid, table, 0)
        s = pts[idx]
        off = jnp.where(tvalid[..., None], s - pts[:, None, :], 0.0)
        fsum = jnp.sum(feats, axis=1)
        flag = (tvalid & (fsum[idx] > 0.0)).astype(jnp.float32)
        featv = jnp.where(tvalid, feats[idx, 0], 0.0)
        return jnp.stack([off[:, :, 0], off[:, :, 1], off[:, :, 2],
                          flag, featv], axis=0)

    add("input edge stream (stage-0 gather)",
        stream_fn, (built["neighbors"][0], built["points"][0],
                    built["features"]), lambda o: o[0, 0, 0])

    covered = sum(ms for _, ms in rows)
    print(f"\nphase sum: {covered:.2f} ms  (full build {total:.2f} ms; "
          f"residual = fusion/overlap + stage-0 masking)")

    # --- stage-0 grid-search sub-phases (the top item, split further) ---
    print("\nstage-0 grid search sub-phases (per cloud 0):")
    q = stage_pts[0][0]
    nq = stage_lens[0][0]
    r0 = cfg.backbone.init_radius
    k0 = int(cfg.caps.neighbor_limits[0])

    full = trace_ms(
        lambda a, b: _radius_search_cloud_grid(a, b, a, b, r0, k0,
                                               cand_cap=args.cand_cap),
        (q, nq), lambda o: o[0][0, 0], iters=args.iters)
    print(f"  {'full grid search':<42s} {full:8.2f} ms")

    # CSR build alone: grid sort + segment counts + cumsum
    def csr_fn(s_points, n_s):
        cap_s = s_points.shape[0]
        edge = jnp.float32(r0)
        s_valid = jnp.arange(cap_s) < n_s
        vmin = jnp.min(jnp.where(s_valid[:, None], s_points, jnp.inf), axis=0)
        origin = jnp.floor(vmin / edge) * edge
        cell = jnp.floor(
            (jnp.where(s_valid[:, None], s_points, origin) - origin) / edge
        ).astype(jnp.int32)
        nx = jnp.max(cell[:, 0]) + 1
        ny = jnp.max(cell[:, 1]) + 1
        flat = cell[:, 0] + nx * (cell[:, 1] + ny * cell[:, 2])
        flat = jnp.where(s_valid, flat, 1 << 20)
        flat_sorted, perm = jax.lax.sort(
            (flat, jnp.arange(cap_s, dtype=jnp.int32)), num_keys=1)
        counts = jax.ops.segment_sum(
            jnp.ones((cap_s,), jnp.int32), flat, num_segments=(1 << 20) + 1)
        starts = jnp.concatenate(
            [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts[: 1 << 20])])
        return flat_sorted, perm, starts

    csr = trace_ms(csr_fn, (q, nq), lambda o: o[2][0], iters=args.iters)
    print(f"  {'CSR build (cell sort + counts + cumsum)':<42s} {csr:8.2f} ms")
    print(f"  {'candidate gather + d2 + (d2,idx) sort':<42s} "
          f"{full - csr:8.2f} ms  (residual)")


if __name__ == "__main__":
    main()
