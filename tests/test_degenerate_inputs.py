"""Degenerate-input robustness: tiny/duplicate clouds through the full model."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch
from geotransformer_tpu.models import create_model


def _run(ref, src):
    cfg = make_3dmatch_config().with_caps(
        stage_caps=(256, 256, 128, 128), correspondence_capacity=128,
        gt_candidates=8,
    )
    points = np.concatenate([ref, src], 0).astype(np.float32)
    lengths = np.asarray([len(ref), len(src)])
    pyramid = build_pyramid(
        points, lengths, 4, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    feats = np.ones((points.shape[0], 1), np.float32)
    batch = jax.tree.map(
        jnp.asarray,
        pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32),
                               cfg.caps.stage_caps),
    )
    model = create_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=False)
    out = model.apply(variables, batch, training=False, with_gt=False)
    t = np.asarray(out["estimated_transform"])
    assert np.isfinite(t).all(), "non-finite transform"
    return t


class TestDegenerateClouds:
    def test_single_point_clouds(self, rng):
        _run(np.zeros((1, 3), np.float32), np.ones((1, 3), np.float32) * 0.1)

    def test_all_identical_points(self, rng):
        p = np.tile(np.asarray([[0.3, 0.2, 0.1]], np.float32), (50, 1))
        _run(p, p + 0.01)

    def test_tiny_vs_normal(self, rng):
        ref = rng.uniform(0, 0.5, (120, 3)).astype(np.float32)
        _run(ref, ref[:3] + 0.005)
