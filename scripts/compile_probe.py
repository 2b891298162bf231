#!/usr/bin/env python
"""Bisect compile-time stalls: time compilation of pipeline pieces serially."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.models import create_model


def stamp(label, t0):
    print(f"{label:45s}: {time.time() - t0:7.1f}s", flush=True)


def main():
    ref_points = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src_points = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref_points, src_points], 0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    cfg = make_3dmatch_config()
    pyramid = build_pyramid(points, lengths, 4, cfg.backbone.init_voxel_size,
                            cfg.backbone.init_radius, list(cfg.caps.neighbor_limits))
    caps = tuple(caps_for_pyramid(pyramid, multiple=256))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((points.shape[0], 1), np.float32)
    batch = jax.tree.map(jnp.asarray, pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps))

    # 1. tiny pallas sinkhorn alone
    t0 = time.time()
    from geotransformer_tpu.kernels.sinkhorn import sinkhorn_log_iterations

    out = sinkhorn_log_iterations(
        jnp.zeros((8, 17, 17)), jnp.zeros((8, 17)), jnp.zeros((8, 17)), 10
    )
    float(jnp.sum(out))
    stamp("pallas sinkhorn tiny", t0)

    # 2. full-size pallas sinkhorn
    t0 = time.time()
    out = sinkhorn_log_iterations(
        jnp.zeros((256, 65, 65)), jnp.zeros((256, 65)), jnp.zeros((256, 65)), 100
    )
    float(jnp.sum(out))
    stamp("pallas sinkhorn full-size", t0)

    # 3. full model forward (training=True -> scan sinkhorn)
    model = create_model(cfg)
    t0 = time.time()
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
        jax.random.PRNGKey(0), batch
    )
    jax.block_until_ready(variables)
    stamp("model.init (jit)", t0)

    t0 = time.time()
    fwd_scan = jax.jit(
        lambda v, b: model.apply(v, b, training=False, with_gt=False,
                                 method=None)
    )
    # force scan backend by pretending training (target rng unused in scan path)
    out = jax.jit(lambda v, b: model.apply(v, b, training=False, with_gt=False))(variables, batch)
    float(out["estimated_transform"][0, 0])
    stamp("full forward (pallas sinkhorn)", t0)


if __name__ == "__main__":
    main()
