#!/usr/bin/env python
r"""On-device smoke test: every shipped config end-to-end on the TPU.

Runs the full registration forward (preprocess -> padded batch -> model,
with the Pallas inference kernels active) for the 3DMatch, KITTI (5-stage),
and ModelNet (3-stage, fine level 0) configurations on synthetic clouds,
checking the estimated transforms are finite and reporting wall-clock.

Usage: python scripts/smoke_tpu.py [--configs 3dmatch kitti modelnet]
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

from geotransformer_tpu.configs import make_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.models import create_model
from geotransformer_tpu.utils.timing import fetch_diff_ms

SCALES = {"3dmatch": (16000, 3.0), "kitti": (12000, 50.0), "modelnet": (717, 1.0)}


def smoke(name, rng):
    n_points, spread = SCALES[name]
    cfg = make_config(name)
    ref = (rng.uniform(0, 1, (n_points, 3)) * spread).astype(np.float32)
    n_src = int(n_points * 0.8)
    src = (ref[:n_src] + 0.02 * spread * rng.normal(size=(n_src, 3))).astype(np.float32)
    pts = np.concatenate([ref, src], 0)
    lengths = np.asarray([len(ref), len(src)])
    pyr = build_pyramid(
        pts, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    caps = tuple(caps_for_pyramid(pyr, multiple=128))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((pts.shape[0], cfg.backbone.input_dim), np.float32)
    batch = jax.tree.map(
        jnp.asarray, pad_registration_batch(pyr, feats, np.eye(4, dtype=np.float32), caps)
    )
    model = create_model(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
        jax.random.PRNGKey(0), batch
    )
    ms = fetch_diff_ms(
        lambda v, b: model.apply(v, b, training=False, with_gt=False),
        (variables, batch), lambda o: o["estimated_transform"][0, 0],
    )
    out = jax.jit(lambda v, b: model.apply(v, b, training=False, with_gt=False))(
        variables, batch
    )
    transform = np.asarray(out["estimated_transform"])
    assert np.isfinite(transform).all(), f"{name}: non-finite transform"
    print(f"{name:9s}: caps={caps} forward={ms:7.1f} ms  OK", flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--configs", nargs="+", default=["3dmatch", "kitti", "modelnet"])
    args = parser.parse_args()
    rng = np.random.default_rng(0)
    for name in args.configs:
        smoke(name, rng)


if __name__ == "__main__":
    main()
