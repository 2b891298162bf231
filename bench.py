#!/usr/bin/env python
r"""Benchmark: full registration model throughput on the bundled demo pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Primary metric: steady-state jitted model forwards per second on one TPU
chip for the real 3DMatch demo pair (19k/16k points, full pipeline: KPConv
FPN -> geometric transformer -> superpoint matching -> 100-iter Sinkhorn ->
LGR with on-device SVD).

Baseline: the reference publishes no wall-clock numbers
(`/root/reference/README.md` has only quality metrics). The GeoTransformer
paper (arXiv:2202.06688, Table 6) reports ~66 ms model time + ~6 ms pose
time per pair on an RTX 3090 for 3DMatch => 13.9 pairs/s. The driver's
gate is "vs A100"; no published A100 GeoTransformer number exists, so the
constant scales the 3090 measurement by a deliberately generous 1.5x
(A100 vs 3090 on this gather/small-matmul/CPU-SVD-bound torch workload is
plausibly 1.2-1.5x; 1.5x is the conservative-for-us end):
BASELINE = 13.9 * 1.5 ~= 21 pairs/s. vs_baseline = ours / 21.

Extra keys on the same line:
  train_step_ms / train_pairs_per_sec — full production train step
      (forward + backward + Adam) with loader-precomputed GT targets.
  train_step_in_graph_targets_ms — same step with the no_grad geometry
      recomputed in-step (the pre-hoist configuration, for comparison).
  e2e_device_ms / e2e_device_pairs_per_sec — device-preprocess inference:
      on-chip pyramid build (voxel subsample + exact radius KNN) + forward
      in ONE jitted program from raw padded points.
  calibrated_caps_pairs_per_sec — forward at the dataset-calibrated config
      capacities instead of caps fitted to this pair (production padding).
  kitti_pairs_per_sec — KITTI-scale forward (synthetic LiDAR-like pair,
      5-stage backbone, hidden 128, patch 128, ~30k points).
"""

import json
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

BASELINE_PAIRS_PER_SEC = 21.0


def _forward_ms(model, variables, batch, iters=6):
    from geotransformer_tpu.utils.timing import trace_ms

    return trace_ms(
        lambda v, b: model.apply(v, b, training=False, with_gt=False),
        (variables, batch),
        lambda out: out["estimated_transform"][0, 0],
        iters=iters,
    )


def _train_ms(model, cfg, batch, tx):
    """Honest chained-state train-step time: the state MUST thread through
    chained steps — fetching only the loss of one step lets XLA dead-code-
    eliminate the backward + optimizer (measured 28 ms for a real 110 ms
    step)."""
    from geotransformer_tpu.parallel.train import init_train_state, make_train_step

    state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
    step = make_train_step(model, cfg, tx, mesh=None)
    batch1 = jax.tree.map(lambda x: x[None], batch)
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def chain(n, s, b, r):
        def body(i, carry):
            s_i, _ = carry
            s_n, aux = step(s_i, b, jax.random.fold_in(r, i))
            return (s_n, aux["loss"])
        return jax.lax.fori_loop(0, n, body, (s, jnp.float32(0)))[1]

    float(chain(jnp.int32(1), state, batch1, rng))  # compile + sync

    def fetch(n):
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            float(chain(jnp.int32(n), state, batch1, rng))
            best = min(best, time.time() - t0)
        return best

    return (fetch(5) - fetch(1)) / 4.0 * 1e3


def _kitti_like_pair(seed=0, n_rays=180000):
    """Synthetic LiDAR-like scan pair at KITTI scale (~30k pts after the
    dataset's 0.3 m voxel downsample). Every return lies on a SURFACE —
    the ground plane or one of a fixed set of vertical facade planes ray-
    cast from two sensor poses — so the voxel pyramid shrinks ~4x per
    stage like real scans (the earlier volumetric generator barely merged
    at deeper stages: 30k -> 24.7k -> 15.4k, inflating the deep-stage
    cost ~8x over the production KITTI caps 30720/8192/2048/768/256)."""
    from geotransformer_tpu.preprocess.voxel import grid_subsample_single

    rng = np.random.default_rng(seed)
    # shared world geometry: vertical facade planes around the street
    n_planes = 40
    c = rng.uniform(-50, 50, (n_planes, 2))
    theta = rng.uniform(0, np.pi, n_planes)
    nvec = np.stack([np.cos(theta), np.sin(theta)], 1)
    tvec = np.stack([-np.sin(theta), np.cos(theta)], 1)
    halfw = rng.uniform(3.0, 15.0, n_planes)
    height = rng.uniform(2.5, 10.0, n_planes)

    def scan(pos, yaw):
        az = rng.uniform(0, 2 * np.pi, n_rays)
        elev = np.deg2rad(rng.uniform(-24.0, 2.0, n_rays))
        ce, se = np.cos(elev), np.sin(elev)
        ca, sa = np.cos(az + yaw), np.sin(az + yaw)
        dirs = np.stack([ce * ca, ce * sa, se], 1)  # world-frame rays
        p = np.array([pos[0], pos[1], 1.7])
        d = np.where(dirs[:, 2] < -1e-4,
                     -p[2] / np.minimum(dirs[:, 2], -1e-4), np.inf)
        for i in range(n_planes):
            denom = dirs[:, 0] * nvec[i, 0] + dirs[:, 1] * nvec[i, 1]
            denom = np.where(np.abs(denom) < 1e-6, 1e-6, denom)
            t = ((c[i, 0] - p[0]) * nvec[i, 0]
                 + (c[i, 1] - p[1]) * nvec[i, 1]) / denom
            hz = p[2] + t * dirs[:, 2]
            u = ((p[0] + t * dirs[:, 0] - c[i, 0]) * tvec[i, 0]
                 + (p[1] + t * dirs[:, 1] - c[i, 1]) * tvec[i, 1])
            ok = ((t > 1.0) & (t < d) & (np.abs(u) < halfw[i])
                  & (hz > 0.0) & (hz < height[i]))
            d = np.where(ok, t, d)
        keep = d < 75.0
        d = d[keep]
        # sensor-frame coordinates (rotation about z: local az drops yaw)
        ca_l, sa_l = np.cos(az[keep]), np.sin(az[keep])
        pts = np.stack(
            [d * ce[keep] * ca_l, d * ce[keep] * sa_l, d * se[keep]], 1
        ).astype(np.float32)
        pts += rng.normal(0, 0.02, pts.shape).astype(np.float32)
        return grid_subsample_single(pts, 0.3)

    ref = scan((0.0, 0.0), 0.0)
    src = scan((6.0, 2.0), 0.12)  # ~KITTI pair displacement
    limit = 30000
    if len(ref) > limit:
        ref = ref[rng.permutation(len(ref))[:limit]]
    if len(src) > limit:
        src = src[rng.permutation(len(src))[:limit]]
    return ref.astype(np.float32), src.astype(np.float32)


def _modelnet_like_root(seed=0, num_models=6):
    """Procedural stand-in for the ModelNet pkl root (real data is
    environment-blocked): surface-sampled scaled boxes, so the voxel
    pyramid shrinks like piecewise-planar CAD models rather than volume
    noise. The bench then exercises the dataset's OWN pair synthesis
    (normalize / random SE(3) / plane crop keep-0.7 / twice-sample to 717,
    reference `datasets/registration/modelnet/dataset.py:162-195`)."""
    import pickle
    import tempfile

    rng = np.random.default_rng(seed)
    data = []
    for _ in range(num_models):
        n = 4096
        face = rng.integers(0, 6, n)
        uv = rng.uniform(-1, 1, (n, 2)).astype(np.float32)
        axis = face % 3
        sign = np.where(face < 3, 1.0, -1.0).astype(np.float32)
        pts = np.empty((n, 3), np.float32)
        normals = np.zeros((n, 3), np.float32)
        for k in range(3):
            m = axis == k
            o = [x for x in range(3) if x != k]
            pts[m, k] = sign[m]
            pts[m, o[0]] = uv[m, 0]
            pts[m, o[1]] = uv[m, 1]
            normals[m, k] = sign[m]
        pts *= rng.uniform(0.4, 1.0, (1, 3)).astype(np.float32)
        data.append(dict(points=pts, normals=normals,
                         label=int(rng.choice([0, 2, 4, 8]))))
    root = tempfile.mkdtemp(prefix="modelnet_bench_")
    for subset in ("train", "test"):
        with open(osp.join(root, f"{subset}.pkl"), "wb") as f:
            pickle.dump(data, f)
    return root


def main():
    import argparse

    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--quick", action="store_true",
        help="measure only the headline + calibrated-caps forwards (for the "
             "2-3-run reproducibility band; the newest committed capture "
             "must still be a full run — see tests/test_readme_sync.py)")
    args = parser.parse_args()

    from geotransformer_tpu.configs import (
        make_3dmatch_config, make_kitti_config, make_modelnet_config,
    )
    from geotransformer_tpu.preprocess import (
        build_pyramid, pad_registration_batch, caps_for_pyramid,
        fit_split_for_table, pad_stage0,
    )
    from geotransformer_tpu.preprocess.device import build_pyramid_device
    from geotransformer_tpu.models import create_model, precompute_gt_targets
    from geotransformer_tpu.parallel.train import make_optimizer
    from geotransformer_tpu.utils.timing import trace_ms

    ref_points = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src_points = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref_points, src_points], 0)
    lengths = np.asarray([len(ref_points), len(src_points)])

    def fit_splits(padded):
        """Pair-fit (h1, m2_cap) splits from a padded batch's tables (the
        production path calibrates them dataset-wide instead)."""
        nb = [fit_split_for_table(np.asarray(t), np.asarray(t).shape[0])
              for t in padded["neighbors"]]
        sub = [fit_split_for_table(
            np.asarray(t), np.asarray(padded["neighbors"][i]).shape[0])
            for i, t in enumerate(padded["subsampling"])]
        return nb, sub

    cfg = make_3dmatch_config()
    pyramid = build_pyramid(
        points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    # multiple=128 swept best among {256, 128, 64} on this pair (15.32 ms vs
    # 16.34 / 15.9; 64 loses to tiling misalignment) — reproduced 3x, ±0%.
    caps = tuple(caps_for_pyramid(pyramid, multiple=128, per_cloud=True))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    batch = pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps)
    nb_splits, sub_splits = fit_splits(batch)
    batch = pad_registration_batch(
        pyramid, feats, np.eye(4, dtype=np.float32), caps,
        neighbor_splits=nb_splits, subsampling_splits=sub_splits)
    batch = jax.tree.map(jnp.asarray, batch)

    model = create_model(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
        jax.random.PRNGKey(cfg.seed), batch
    )

    # Timing methodology: this TPU is reached through an async relay where
    # block_until_ready does not synchronize with device execution and every
    # host fetch carries ~30ms of jittery RPC. Steady-state numbers are
    # therefore read from jax.profiler device traces (trace_ms) or the
    # fetch-difference method; see geotransformer_tpu/utils/timing.py.
    ms = _forward_ms(model, variables, batch)
    pairs_per_sec = 1000.0 / ms

    extras = {}

    def measure_calibrated():
        """Forward at dataset-calibrated (config default) capacities."""
        cfg_cal = make_3dmatch_config()
        cal_caps = tuple(cfg_cal.caps.stage_caps)
        model_cal = create_model(cfg_cal)
        cal_pad = pad_registration_batch(
            pyramid, feats, np.eye(4, dtype=np.float32), cal_caps)
        cal_nb, cal_sub = fit_splits(cal_pad)
        batch_cal = jax.tree.map(jnp.asarray, pad_registration_batch(
            pyramid, feats, np.eye(4, dtype=np.float32), cal_caps,
            neighbor_splits=cal_nb, subsampling_splits=cal_sub))
        variables_cal = jax.jit(
            lambda r, b: model_cal.init(r, b, training=False, with_gt=False)
        )(jax.random.PRNGKey(cfg.seed), batch_cal)
        return _forward_ms(model_cal, variables_cal, batch_cal)

    if args.quick:
        try:
            extras["calibrated_caps_pairs_per_sec"] = round(
                1000.0 / measure_calibrated(), 2)
        except Exception as exc:
            extras["calibrated_caps_error"] = f"{type(exc).__name__}: {exc}"[:200]
        print(json.dumps({
            "metric": "3dmatch_demo_pair_model_throughput",
            "value": round(pairs_per_sec, 2),
            "unit": "pairs/s",
            "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
            **extras,
        }))
        return

    # -- production train step: inverse tables + host-precomputed targets --
    tx = make_optimizer(cfg, steps_per_epoch=10, world_size=1)
    train_np = pad_registration_batch(
        pyramid, feats, np.eye(4, dtype=np.float32), caps,
        inverse_limits=cfg.caps.inverse_limits,
        neighbor_splits=nb_splits, subsampling_splits=sub_splits)
    # backward inverse tables carry even larger shadow fractions (in-degree
    # capacity ~3x the mean in-degree) — split them too
    inv_splits = [fit_split_for_table(
        np.asarray(t), np.asarray(t).shape[0], align=8)
        for t in train_np["neighbors_inv"]]
    # sub-inverse sentinel is the NEXT stage's (query-side) row count
    sub_inv_splits = [fit_split_for_table(
        np.asarray(t), np.asarray(train_np["neighbors"][i + 1]).shape[0],
        align=8)
        for i, t in enumerate(train_np["subsampling_inv"])]
    train_batch = jax.tree.map(jnp.asarray, pad_registration_batch(
        pyramid, feats, np.eye(4, dtype=np.float32), caps,
        inverse_limits=cfg.caps.inverse_limits,
        neighbor_splits=nb_splits, subsampling_splits=sub_splits,
        inverse_splits=inv_splits, sub_inverse_splits=sub_inv_splits))
    targets = jax.jit(lambda b: precompute_gt_targets(cfg, b, use_pallas=True))(
        train_batch)
    train_batch_pre = dict(train_batch, **jax.tree.map(lambda x: x, targets))
    train_ms = _train_ms(model, cfg, train_batch_pre, tx)
    extras["train_step_ms"] = round(train_ms, 2)
    extras["train_pairs_per_sec"] = round(1000.0 / train_ms, 2)
    try:
        extras["train_step_in_graph_targets_ms"] = round(
            _train_ms(model, cfg, train_batch, tx), 2)
    except Exception:
        pass

    # -- end-to-end device-preprocess inference (build + forward, one jit) --
    try:
        cap0 = int(caps[0][0]) if isinstance(caps[0], (tuple, list)) else int(caps[0])
        # device builder uses symmetric caps
        sym_caps = tuple(
            int(max(c)) if isinstance(c, (tuple, list)) else int(c) for c in caps
        )
        cfg_sym = cfg.with_caps(stage_caps=sym_caps)
        model_sym = create_model(cfg_sym)
        pts0, lens0, feats0 = pad_stage0(points, lengths, sym_caps[0],
                                         cfg.backbone.input_dim)

        spec = dict(
            num_stages=cfg.backbone.num_stages,
            voxel_size=cfg.backbone.init_voxel_size,
            radius=cfg.backbone.init_radius,
            neighbor_limits=tuple(cfg.caps.neighbor_limits),
            stage_caps=sym_caps,
        )

        def e2e(v, p, l, f):
            built, overflow = build_pyramid_device(
                p, l, f, jnp.eye(4, dtype=jnp.float32), **spec)
            out = model_sym.apply(v, built, training=False, with_gt=False)
            return out, overflow

        e2e_args = (jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0))
        sym_batch = jax.jit(lambda p, l, f: build_pyramid_device(
            p, l, f, jnp.eye(4, dtype=jnp.float32), **spec)[0])(*e2e_args)
        variables_sym = jax.jit(
            lambda r, b: model_sym.init(r, b, training=False, with_gt=False)
        )(jax.random.PRNGKey(cfg.seed), sym_batch)
        ov = np.asarray(jax.jit(e2e)(variables_sym, *e2e_args)[1])
        assert not ov.any(), f"device pyramid overflow in bench: {ov}"
        e2e_ms = trace_ms(
            lambda v, p, l, f: e2e(v, p, l, f)[0],
            (variables_sym,) + e2e_args,
            lambda out: out["estimated_transform"][0, 0],
            iters=6,
        )
        extras["e2e_device_ms"] = round(e2e_ms, 2)
        extras["e2e_device_pairs_per_sec"] = round(1000.0 / e2e_ms, 2)
    except Exception as exc:  # never break the primary metric
        extras["e2e_device_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # -- forward at dataset-calibrated (config default) capacities --
    try:
        extras["calibrated_caps_pairs_per_sec"] = round(
            1000.0 / measure_calibrated(), 2)
    except Exception as exc:
        extras["calibrated_caps_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # -- KITTI-scale (5-stage, hidden 128, patch 128, ~30k pts) --
    # No wall-clock anchor exists: the paper/reference publish only KITTI
    # quality metrics (reference README.md:199-201), so these lines are
    # explicitly unanchored. Two configurations are reported: caps+splits
    # fitted to the measured pair (kitti_ms, upper bound) and caps+splits
    # calibrated over a 6-pair synthetic LiDAR distribution — the honest
    # production padding (kitti_calibrated_*, plus the train step).
    try:
        from geotransformer_tpu.preprocess import (
            calibrate_split_specs, calibrate_stage_caps,
        )

        kcfg = make_kitti_config()
        kref, ksrc = _kitti_like_pair()
        kpoints = np.concatenate([kref, ksrc], 0)
        klengths = np.asarray([len(kref), len(ksrc)])
        kpyr = build_pyramid(
            kpoints, klengths, kcfg.backbone.num_stages,
            kcfg.backbone.init_voxel_size, kcfg.backbone.init_radius,
            list(kcfg.caps.neighbor_limits),
        )
        kcaps = tuple(caps_for_pyramid(kpyr, multiple=256, per_cloud=True))
        kcfg_fit = kcfg.with_caps(stage_caps=kcaps)
        kfeats = np.ones((kpoints.shape[0], kcfg.backbone.input_dim), np.float32)
        kbatch_np = pad_registration_batch(
            kpyr, kfeats, np.eye(4, dtype=np.float32), kcaps)
        knb, ksub = fit_splits(kbatch_np)
        kbatch = jax.tree.map(jnp.asarray, pad_registration_batch(
            kpyr, kfeats, np.eye(4, dtype=np.float32), kcaps,
            neighbor_splits=knb, subsampling_splits=ksub))
        kmodel = create_model(kcfg_fit)
        kvars = jax.jit(lambda r, b: kmodel.init(r, b, training=False, with_gt=False))(
            jax.random.PRNGKey(kcfg_fit.seed), kbatch)
        kms = _forward_ms(kmodel, kvars, kbatch)
        extras["kitti_ms"] = round(kms, 2)
        extras["kitti_pairs_per_sec"] = round(1000.0 / kms, 2)

        # calibrated configuration: distribution-swept caps + splits
        ksamples = [dict(zip(("ref_points", "src_points"), _kitti_like_pair(seed=s)))
                    for s in range(6)]
        kargs = (kcfg.backbone.num_stages, kcfg.backbone.init_voxel_size,
                 kcfg.backbone.init_radius, list(kcfg.caps.neighbor_limits))
        cal_kcaps = tuple(calibrate_stage_caps(iter(ksamples), *kargs,
                                               num_samples=len(ksamples)))
        cal_knb, cal_ksub = calibrate_split_specs(iter(ksamples), *kargs,
                                                  num_samples=len(ksamples))
        kcfg_cal = kcfg.with_caps(
            stage_caps=cal_kcaps,
            neighbor_splits=tuple(cal_knb), subsampling_splits=tuple(cal_ksub))
        kbatch_cal = jax.tree.map(jnp.asarray, pad_registration_batch(
            kpyr, kfeats, np.eye(4, dtype=np.float32), cal_kcaps,
            neighbor_splits=list(cal_knb), subsampling_splits=list(cal_ksub)))
        kmodel_cal = create_model(kcfg_cal)
        kvars_cal = jax.jit(
            lambda r, b: kmodel_cal.init(r, b, training=False, with_gt=False)
        )(jax.random.PRNGKey(kcfg_cal.seed), kbatch_cal)
        kms_cal = _forward_ms(kmodel_cal, kvars_cal, kbatch_cal)
        extras["kitti_calibrated_pairs_per_sec"] = round(1000.0 / kms_cal, 2)

        # production train step at the calibrated caps (config-default
        # inverse capacities, no pair-fit splits on the inverse tables)
        ktx = make_optimizer(kcfg_cal, steps_per_epoch=10, world_size=1)
        ktrain_batch = jax.tree.map(jnp.asarray, pad_registration_batch(
            kpyr, kfeats, np.eye(4, dtype=np.float32), cal_kcaps,
            inverse_limits=kcfg_cal.caps.inverse_limits,
            neighbor_splits=list(cal_knb), subsampling_splits=list(cal_ksub)))
        ktargets = jax.jit(
            lambda b: precompute_gt_targets(kcfg_cal, b, use_pallas=True)
        )(ktrain_batch)
        ktrain_ms = _train_ms(kmodel_cal, kcfg_cal, dict(ktrain_batch, **ktargets),
                              ktx)
        extras["kitti_train_step_ms"] = round(ktrain_ms, 2)
    except Exception as exc:
        extras["kitti_error"] = f"{type(exc).__name__}: {exc}"[:200]

    # -- ModelNet forward (3-stage, 717-pt pairs, config-default caps) --
    try:
        from geotransformer_tpu.datasets import ModelNetPairDataset
        from geotransformer_tpu.preprocess import calibrate_stage_caps

        mcfg = make_modelnet_config()
        mds = ModelNetPairDataset(
            _modelnet_like_root(), "test", num_points=717, keep_ratio=0.7,
            twice_sample=True, deterministic=True)
        msample = mds[0]
        mpoints = np.concatenate(
            [msample["ref_points"], msample["src_points"]], 0).astype(np.float32)
        mlengths = np.asarray(
            [len(msample["ref_points"]), len(msample["src_points"])])
        mpyr = build_pyramid(
            mpoints, mlengths, mcfg.backbone.num_stages,
            mcfg.backbone.init_voxel_size, mcfg.backbone.init_radius,
            list(mcfg.caps.neighbor_limits),
        )
        # caps calibrated over the synthetic distribution (the config
        # defaults target real CAD meshes, which subsample differently)
        mcaps = tuple(calibrate_stage_caps(
            (mds[i] for i in range(len(mds))),
            mcfg.backbone.num_stages, mcfg.backbone.init_voxel_size,
            mcfg.backbone.init_radius, list(mcfg.caps.neighbor_limits),
            num_samples=len(mds), multiple=64))
        mcfg = mcfg.with_caps(stage_caps=mcaps)
        mfeats = np.ones((mpoints.shape[0], mcfg.backbone.input_dim), np.float32)
        mbatch = jax.tree.map(jnp.asarray, pad_registration_batch(
            mpyr, mfeats, np.eye(4, dtype=np.float32), mcaps))
        mmodel = create_model(mcfg)
        mvars = jax.jit(lambda r, b: mmodel.init(r, b, training=False, with_gt=False))(
            jax.random.PRNGKey(mcfg.seed), mbatch)
        mms = _forward_ms(mmodel, mvars, mbatch)
        extras["modelnet_ms"] = round(mms, 2)
        extras["modelnet_pairs_per_sec"] = round(1000.0 / mms, 2)
    except Exception as exc:
        extras["modelnet_error"] = f"{type(exc).__name__}: {exc}"[:200]

    print(json.dumps({
        "metric": "3dmatch_demo_pair_model_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        **extras,
    }))


if __name__ == "__main__":
    main()
