#!/usr/bin/env python
r"""On-device training smoke: overfit 4 synthetic pairs, assert loss drops.

Drives the full training stack on the TPU — preprocessing, the Pallas
forward kernels with their custom_vjp backwards (GSE, KPConv), circle +
Sinkhorn-NLL losses, and the Adam update — and checks end-to-end that the
gradients actually optimize. ~40 steps, a couple of minutes including
compilation.
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
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch
from geotransformer_tpu.models import create_model
from geotransformer_tpu.parallel.train import (
    init_train_state, make_optimizer, make_train_step,
)


def make_pair(cfg, seed, with_inverse=True):
    r = np.random.default_rng(seed)
    xy = r.uniform(0, 1, (3500, 2)).astype(np.float32)
    z = 0.2 * np.sin(5 * xy[:, 0]) * np.cos(4 * xy[:, 1]) + 0.01 * r.normal(size=3500)
    ref = np.column_stack([xy, z]).astype(np.float32)
    src = ref[ref[:, 0] < 0.8]
    ang = r.uniform(0, 0.5)
    rot = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0], [0, 0, 1]],
        np.float32,
    )
    t = r.uniform(-0.2, 0.2, 3).astype(np.float32)
    src_t = ((src - t) @ rot).astype(np.float32)  # rot @ src_t + t aligns to ref
    transform = np.eye(4, dtype=np.float32)
    transform[:3, :3] = rot
    transform[:3, 3] = t
    pts = np.concatenate([ref, src_t], 0)
    lengths = np.asarray([len(ref), len(src_t)])
    pyramid = build_pyramid(
        pts, lengths, 4, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
        list(cfg.caps.neighbor_limits),
    )
    feats = np.ones((pts.shape[0], 1), np.float32)
    return jax.tree.map(
        jnp.asarray,
        pad_registration_batch(
            pyramid, feats, transform, cfg.caps.stage_caps,
            inverse_limits=cfg.caps.inverse_limits if with_inverse else None,
        ),
    )


def main(num_steps=40):
    cfg = make_3dmatch_config().with_caps(
        stage_caps=(4096, 1280, 384, 128), correspondence_capacity=2048,
        gt_candidates=64,
    )
    pairs = [make_pair(cfg, s) for s in range(4)]
    model = create_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=10, world_size=1)
    state = init_train_state(model, cfg, jax.random.PRNGKey(0), pairs[0], tx)
    step = make_train_step(model, cfg, tx, mesh=None)
    rng = jax.random.PRNGKey(7)
    losses = []
    for it in range(num_steps):
        batch = jax.tree.map(lambda x: x[None], pairs[it % len(pairs)])
        rng, sk = jax.random.split(rng)
        state, aux = step(state, batch, sk)
        losses.append(float(aux["loss"]))
        if (it + 1) % 10 == 0:
            print(f"step {it + 1:3d}: loss {losses[-1]:.4f}", flush=True)
    first, last = np.mean(losses[:8]), np.mean(losses[-8:])
    assert np.isfinite(losses).all(), "non-finite loss"
    assert last < first - 0.2, f"loss did not decrease: {first:.3f} -> {last:.3f}"
    print(f"OK: loss {first:.3f} -> {last:.3f} over {num_steps} steps")


if __name__ == "__main__":
    main()
