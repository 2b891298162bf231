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


class TestEmptyPatchSinkhorn:
    """Fully-masked correspondence slots must yield FINITE Sinkhorn plans.

    A padded (all-invalid) patch used to hit log(0) in the marginals
    (norm = -log(0) = inf), poisoning the fine loss with NaN (0 * NaN
    survives the loss masking) and making the trainer's finite-grad guard
    silently skip every step on sparse-overlap batches."""

    def test_empty_patch_is_finite_and_differentiable(self):
        import jax
        import jax.numpy as jnp
        import numpy as np
        from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.normal(size=(3, 8, 8)), jnp.float32)
        row_masks = jnp.asarray(
            [[True] * 8, [True] * 5 + [False] * 3, [False] * 8])
        col_masks = jnp.asarray(
            [[True] * 8, [True] * 6 + [False] * 2, [False] * 8])
        mod = LearnableLogOptimalTransport(10, backend="scan")

        def loss(s):
            variables = mod.init(jax.random.PRNGKey(0), s, row_masks, col_masks)
            out = mod.apply(variables, s, row_masks, col_masks)
            # mimic the fine loss: a zero-label patch must contribute 0, not NaN
            m = jnp.zeros_like(out).at[0, 0, 0].set(1.0)
            return jnp.sum(out * m) / jnp.maximum(jnp.sum(m), 1.0), out

        (value, out), grads = jax.value_and_grad(loss, has_aux=True)(scores)
        assert np.isfinite(float(value))
        assert np.all(np.isfinite(np.asarray(out)))  # ALL patches finite
        assert np.all(np.isfinite(np.asarray(grads)))
