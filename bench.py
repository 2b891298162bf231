#!/usr/bin/env python
r"""Benchmark: full registration model throughput on the bundled demo pair.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Metric: steady-state jitted model forwards per second on one TPU chip for
the real 3DMatch demo pair (19k/16k points, full pipeline: KPConv FPN ->
geometric transformer -> superpoint matching -> 100-iter Sinkhorn -> LGR
with on-device SVD).

Baseline: the reference publishes no wall-clock numbers
(`/root/reference/README.md` has only quality metrics). The GeoTransformer
paper (arXiv:2202.06688) reports ~66ms model time + ~6ms pose time per pair
on an RTX 3090 for 3DMatch; we take ~14 pairs/s as the CUDA-GPU-class
baseline (A100-class hardware, same order). vs_baseline = ours / 14.
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

BASELINE_PAIRS_PER_SEC = 14.0


def main():
    from geotransformer_tpu.configs import make_3dmatch_config
    from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
    from geotransformer_tpu.models import create_model

    ref_points = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src_points = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref_points, src_points], 0)
    lengths = np.asarray([len(ref_points), len(src_points)])

    cfg = make_3dmatch_config()
    pyramid = build_pyramid(
        points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    caps = tuple(caps_for_pyramid(pyramid, multiple=256, per_cloud=True))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    batch = pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps)
    batch = jax.tree.map(jnp.asarray, batch)

    model = create_model(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
        jax.random.PRNGKey(cfg.seed), batch
    )

    # Timing methodology: this TPU is reached through an async relay where
    # block_until_ready does not synchronize with device execution and every
    # host fetch carries ~30ms of jittery RPC. The steady-state number is
    # therefore read from a jax.profiler device trace (device-side executable
    # duration averaged over iterations), which is immune to host jitter; see
    # geotransformer_tpu/utils/timing.py.
    from geotransformer_tpu.utils.timing import trace_ms

    ms = trace_ms(
        lambda v, b: model.apply(v, b, training=False, with_gt=False),
        (variables, batch),
        lambda out: out["estimated_transform"][0, 0],
        iters=6,
    )
    pairs_per_sec = 1000.0 / ms

    # Secondary metric (extra keys on the same line): full training step
    # (forward + backward + Adam) on the same pair.
    from geotransformer_tpu.parallel.train import (
        init_train_state, make_optimizer, make_train_step,
    )

    tx = make_optimizer(cfg, steps_per_epoch=10, world_size=1)
    # training batches carry inverse neighbor tables (scatter-free backward)
    train_batch = jax.tree.map(jnp.asarray, pad_registration_batch(
        pyramid, feats, np.eye(4, dtype=np.float32), caps,
        inverse_limits=cfg.caps.inverse_limits))
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), train_batch, tx)
    step = make_train_step(model, cfg, tx, mesh=None)
    batch1 = jax.tree.map(lambda x: x[None], train_batch)
    rng = jax.random.PRNGKey(1)

    # The state MUST thread through chained steps: timing a single step by
    # fetching only the loss lets XLA dead-code-eliminate the backward and
    # optimizer update (measured 28 ms vs the honest 110 ms).
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

    train_ms = (fetch(5) - fetch(1)) / 4.0 * 1e3

    print(json.dumps({
        "metric": "3dmatch_demo_pair_model_throughput",
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/s",
        "vs_baseline": round(pairs_per_sec / BASELINE_PAIRS_PER_SEC, 2),
        "train_step_ms": round(train_ms, 2),
        "train_pairs_per_sec": round(1000.0 / train_ms, 2),
    }))


if __name__ == "__main__":
    main()
