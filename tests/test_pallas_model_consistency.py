"""End-to-end: the assembled Pallas-kernel model (interpret mode) vs the
XLA model on the same small pair and weights.

The per-kernel parity tests cover each kernel in isolation; this covers the
model-level wiring of the fused paths (GSE full fusion, fused KPConv,
Pallas Sinkhorn, quaternion Procrustes) without TPU hardware. Tolerances
reflect the kernels' bf16 basis/feature storage amplified through the
network with random weights.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch
from geotransformer_tpu.models import create_model


@pytest.fixture(scope="module")
def pair_batch():
    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 1, (1200, 2)).astype(np.float32)
    z = 0.15 * np.sin(6 * xy[:, 0]) * np.cos(5 * xy[:, 1])
    ref = np.column_stack([xy, z]).astype(np.float32)
    src = ref[ref[:, 0] < 0.75] + 0.003 * rng.normal(size=(np.sum(ref[:, 0] < 0.75), 3)).astype(np.float32)
    points = np.concatenate([ref, src.astype(np.float32)], 0)
    lengths = np.asarray([len(ref), len(src)])
    cfg = make_3dmatch_config().with_caps(
        stage_caps=(2048, 640, 192, 64), correspondence_capacity=1024,
        gt_candidates=32,
    )
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
    return cfg, batch


def test_pallas_model_matches_xla(pair_batch):
    cfg, batch = pair_batch
    xla_model = create_model(cfg.with_model(force_pallas=False))
    pal_model = create_model(cfg.with_model(force_pallas=True))
    variables = xla_model.init(
        jax.random.PRNGKey(0), batch, training=False, with_gt=False
    )
    out_x = xla_model.apply(variables, batch, training=False, with_gt=False)
    out_p = pal_model.apply(variables, batch, training=False, with_gt=False)

    # coarse features: bf16-kernel drift through the backbone + transformer
    fx, fp = np.asarray(out_x["ref_feats_c"]), np.asarray(out_p["ref_feats_c"])
    scale = np.abs(fx).max() + 1e-9
    assert np.abs(fx - fp).max() / scale < 0.08, "coarse feature drift too large"

    # both paths must produce finite, rigid transforms
    for out in (out_x, out_p):
        t = np.asarray(out["estimated_transform"])
        assert np.isfinite(t).all()
        r = t[:3, :3]
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-3)
