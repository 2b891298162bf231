"""Model builds and runs for the KITTI (5-stage) and ModelNet (3-stage,
fine level 0) architecture variants, at tiny capacities on CPU."""

import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.configs import (
    make_kitti_config,
    make_modelnet_config,
    BackboneConfig,
    ModelConfig,
    CoarseMatchingConfig,
    GeoTransformerModuleConfig,
    CapsConfig,
)
from geotransformer_tpu.models import create_model
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch


def make_batch(cfg, seed=0, n=500, scale=1.0, auto_caps=False):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(0, scale, (n, 2)).astype(np.float32)
    z = 0.2 * scale * np.sin(4 * xy[:, 0] / scale) + 0.01 * scale * rng.normal(size=n)
    ref = np.column_stack([xy, z]).astype(np.float32)
    keep = ref[:, 0] < 0.8 * scale
    src = (ref[keep] + 0.005 * scale * rng.normal(size=(int(keep.sum()), 3))).astype(np.float32)
    points = np.concatenate([ref, src], 0)
    lengths = np.asarray([len(ref), len(src)])
    pyramid = build_pyramid(
        points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    caps = cfg.caps.stage_caps
    if auto_caps:
        from geotransformer_tpu.preprocess import caps_for_pyramid

        caps = tuple(caps_for_pyramid(pyramid, multiple=32))
        cfg = cfg.with_caps(stage_caps=caps)
    batch = jax.tree.map(
        jnp.asarray, pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps)
    )
    return (batch, cfg) if auto_caps else batch


def run_forward(cfg, batch):
    model = create_model(cfg)
    variables = jax.jit(
        lambda r, b: model.init(r, b, training=False, with_gt=True)
    )(jax.random.PRNGKey(0), batch)
    out = model.apply(variables, batch, training=False, with_gt=True)
    assert np.isfinite(np.asarray(out["estimated_transform"])).all()
    assert np.asarray(out["corr_masks"]).any()
    return out


class TestKittiVariant:
    @pytest.mark.slow
    def test_five_stage_forward(self):
        cfg = make_kitti_config()
        cfg = dataclasses.replace(
            cfg,
            backbone=BackboneConfig(num_stages=5, init_voxel_size=0.1,
                                    base_radius=4.25, init_dim=8, group_norm=4),
            model=ModelConfig(ground_truth_matching_radius=0.2,
                              num_points_in_patch=16, fine_level=1),
            coarse_matching=CoarseMatchingConfig(num_targets=16, num_correspondences=32),
            geotransformer=GeoTransformerModuleConfig(
                input_dim=256, hidden_dim=32, output_dim=32,
                blocks=("self", "cross"), num_heads=2, sigma_d=4.8,
            ),
            caps=CapsConfig(
                stage_caps=(2048, 512, 128, 64, 32),
                neighbor_limits=(16, 16, 16, 16, 16),
                gt_candidates=16, gt_chunk_size=16, correspondence_capacity=256,
            ),
        )
        batch, cfg = make_batch(cfg, n=1500, scale=8.0, auto_caps=True)
        out = run_forward(cfg, batch)
        # coarse level is stage 4 of 5
        assert out["ref_points_c"].shape[0] == cfg.caps.stage_caps[4]


class TestModelNetVariant:
    def test_three_stage_fine_level_zero(self):
        cfg = make_modelnet_config()
        cfg = dataclasses.replace(
            cfg,
            backbone=BackboneConfig(num_stages=3, init_voxel_size=0.06,
                                    init_dim=8, group_norm=4),
            model=ModelConfig(ground_truth_matching_radius=0.05,
                              num_points_in_patch=16, fine_level=0),
            coarse_matching=CoarseMatchingConfig(num_targets=16, num_correspondences=32),
            geotransformer=GeoTransformerModuleConfig(
                input_dim=64, hidden_dim=32, output_dim=32,
                blocks=("self", "cross"), num_heads=2,
            ),
            caps=CapsConfig(
                stage_caps=(512, 128, 64),
                neighbor_limits=(12, 12, 12),
                gt_candidates=16, gt_chunk_size=16, correspondence_capacity=256,
            ),
        )
        batch = make_batch(cfg, n=450)
        out = run_forward(cfg, batch)
        # fine level is full resolution (stage 0)
        assert out["ref_points_f"].shape[0] == cfg.caps.stage_caps[0]

    def test_backbone_param_names_match_reference_pattern(self):
        """3-stage FPN exposes decoder2 + decoder1 (ModelNet naming)."""
        from geotransformer_tpu.models.backbone import KPConvFPN

        cfg = make_modelnet_config()
        bb = KPConvFPN(1, 32, 8, 15, cfg.backbone.init_radius, cfg.backbone.init_sigma,
                       4, num_stages=3, first_fine_stage=0)
        batch = make_batch(dataclasses.replace(
            cfg,
            backbone=BackboneConfig(num_stages=3, init_voxel_size=0.06, init_dim=8, group_norm=4),
            caps=CapsConfig(stage_caps=(512, 128, 64), neighbor_limits=(12, 12, 12)),
        ), n=450)
        variables = jax.jit(lambda r: bb.init(r, batch["features"], batch))(jax.random.PRNGKey(0))
        names = set(variables["params"].keys())
        assert {"encoder1_1", "encoder1_2", "encoder2_1", "encoder3_3", "decoder2", "decoder1"} <= names
