"""Full-model numerical parity vs the reference KITTI (5-stage) and
ModelNet (fine-level-0) experiment models.

Same harness as test_full_model_parity.py (which covers the 3DMatch
config): build the reference torch model at full architectural size with
random init, convert weights, run both pipelines on the same synthetic
pair, compare features and the estimated transform.

Reference architecture deltas under test:
  * KITTI: extra encoder5_* + decoder4 stage
    (`...kitti.../backbone.py:56-110`), sigma_d 4.8, patch 128, topk 2.
  * ModelNet: 3-stage backbone decoding to stage 0 (full resolution)
    (`...modelnet.../backbone.py:58-69`, `...modelnet.../model.py:77-80`).
"""

import importlib
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.configs import make_kitti_config, make_modelnet_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.utils.convert import torch_state_dict_to_variables

from test_full_model_parity import make_pair, torch_data_dict

pytestmark = pytest.mark.slow  # full-model torch-reference parity, minutes each

KITTI_DIR = "/root/reference/experiments/geotransformer.kitti.stage5.gse.k3.max.oacl.stage2.sinkhorn"
MODELNET_DIR = "/root/reference/experiments/geotransformer.modelnet.rpmnet.stage4.gse.k3.max.oacl.stage2.sinkhorn"

_EXP_MODULES = ("backbone", "model", "config", "loss", "dataset")


def load_experiment_model_module(exp_dir):
    """Import an experiment's model.py without clobbering another
    experiment's already-imported flat modules (they all use the same
    top-level names `backbone` / `model`)."""
    saved = {name: sys.modules.pop(name, None) for name in _EXP_MODULES}
    sys.path.insert(0, exp_dir)
    try:
        importlib.import_module("backbone")
        model_mod = importlib.import_module("model")
    finally:
        sys.path.remove(exp_dir)
        for name in _EXP_MODULES:
            sys.modules.pop(name, None)
            if saved[name] is not None:
                sys.modules[name] = saved[name]
    return model_mod


def torch_cfg_from(cfg):
    """Build the easydict config the reference experiment models consume
    from our frozen dataclass config (field names match by design)."""
    from easydict import EasyDict as edict

    tcfg = edict()
    tcfg.model = edict(
        num_points_in_patch=cfg.model.num_points_in_patch,
        ground_truth_matching_radius=cfg.model.ground_truth_matching_radius,
        num_sinkhorn_iterations=cfg.model.num_sinkhorn_iterations,
    )
    tcfg.backbone = edict(
        input_dim=cfg.backbone.input_dim,
        output_dim=cfg.backbone.output_dim,
        init_dim=cfg.backbone.init_dim,
        kernel_size=cfg.backbone.kernel_size,
        init_radius=cfg.backbone.init_radius,
        init_sigma=cfg.backbone.init_sigma,
        group_norm=cfg.backbone.group_norm,
    )
    tcfg.geotransformer = edict(
        input_dim=cfg.geotransformer.input_dim,
        output_dim=cfg.geotransformer.output_dim,
        hidden_dim=cfg.geotransformer.hidden_dim,
        num_heads=cfg.geotransformer.num_heads,
        blocks=list(cfg.geotransformer.blocks),
        sigma_d=cfg.geotransformer.sigma_d,
        sigma_a=cfg.geotransformer.sigma_a,
        angle_k=cfg.geotransformer.angle_k,
        reduction_a=cfg.geotransformer.reduction_a,
    )
    tcfg.coarse_matching = edict(
        num_targets=cfg.coarse_matching.num_targets,
        overlap_threshold=cfg.coarse_matching.overlap_threshold,
        num_correspondences=cfg.coarse_matching.num_correspondences,
        dual_normalization=cfg.coarse_matching.dual_normalization,
    )
    tcfg.fine_matching = edict(
        topk=cfg.fine_matching.topk,
        acceptance_radius=cfg.fine_matching.acceptance_radius,
        mutual=cfg.fine_matching.mutual,
        confidence_threshold=cfg.fine_matching.confidence_threshold,
        use_dustbin=cfg.fine_matching.use_dustbin,
        use_global_score=cfg.fine_matching.use_global_score,
        correspondence_threshold=cfg.fine_matching.correspondence_threshold,
        correspondence_limit=cfg.fine_matching.correspondence_limit,
        num_refinement_steps=cfg.fine_matching.num_refinement_steps,
    )
    return tcfg


def run_both(refmodules, exp_dir, cfg, ref, src, T, corr_capacity=8192):
    import torch

    points = np.concatenate([ref, src], 0)
    lengths = np.asarray([len(ref), len(src)])
    pyramid = build_pyramid(
        points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    feats = np.ones((points.shape[0], 1), np.float32)

    model_mod = load_experiment_model_module(exp_dir)
    torch.manual_seed(7351)
    tmodel = model_mod.create_model(torch_cfg_from(cfg))
    tmodel.eval()
    with torch.no_grad():
        ref_out = tmodel(torch_data_dict(pyramid, feats, T))

    caps = caps_for_pyramid(pyramid, multiple=32)
    cfg = cfg.with_caps(stage_caps=tuple(caps), correspondence_capacity=corr_capacity)
    batch = jax.tree.map(
        jnp.asarray, pad_registration_batch(pyramid, feats, T, caps)
    )

    from geotransformer_tpu.models import create_model

    model = create_model(cfg)
    variables = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=True)
    variables, unused = torch_state_dict_to_variables(tmodel.state_dict(), variables)
    unused = [k for k in unused if not k.endswith("div_term")]
    assert not unused, f"unused torch keys: {unused[:10]}"
    ours = model.apply(variables, batch, training=False, with_gt=True)
    return pyramid, ref_out, ours


def assert_parity(pyramid, ref_out, ours, fine_stage):
    n_ref_c = int(pyramid["lengths"][-1][0])
    n_src_c = int(pyramid["lengths"][-1][1])
    np.testing.assert_allclose(
        np.asarray(ours["ref_feats_c"])[:n_ref_c],
        ref_out["ref_feats_c"].numpy(), rtol=1e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["src_feats_c"])[:n_src_c],
        ref_out["src_feats_c"].numpy(), rtol=1e-3, atol=2e-4,
    )
    n_ref_f = int(pyramid["lengths"][fine_stage][0])
    n_src_f = int(pyramid["lengths"][fine_stage][1])
    np.testing.assert_allclose(
        np.asarray(ours["ref_feats_f"])[:n_ref_f],
        ref_out["ref_feats_f"].numpy(), rtol=1e-3, atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["src_feats_f"])[:n_src_f],
        ref_out["src_feats_f"].numpy(), rtol=1e-3, atol=3e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ours["estimated_transform"]),
        ref_out["estimated_transform"].numpy(), rtol=1e-3, atol=5e-4,
    )


class TestKittiFullModelParity:
    """Real KITTI architecture (5 stages, init_dim 64, hidden 128) on a
    KITTI-scale synthetic scan pair."""

    def test_parity(self, refmodules):
        rng = np.random.default_rng(11)
        # metre-scale pair: the generator produces a unit patch; scale x30
        ref, src, T = make_pair(rng, n=5000)
        scale = np.float32(30.0)
        ref = ref * scale
        src = src * scale
        T = T.copy()
        T[:3, 3] *= scale
        cfg = make_kitti_config()
        pyramid, ref_out, ours = run_both(refmodules, KITTI_DIR, cfg, ref, src, T)
        assert_parity(pyramid, ref_out, ours, fine_stage=1)


class TestModelNetFullModelParity:
    """Real ModelNet architecture (3 stages decoding to stage 0)."""

    def test_parity(self, refmodules):
        rng = np.random.default_rng(13)
        ref, src, T = make_pair(rng, n=717)
        cfg = make_modelnet_config()
        pyramid, ref_out, ours = run_both(refmodules, MODELNET_DIR, cfg, ref, src, T)
        assert_parity(pyramid, ref_out, ours, fine_stage=0)
