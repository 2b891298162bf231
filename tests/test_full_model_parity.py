"""Full-model numerical parity vs the reference experiment model.

Builds the reference 3DMatch GeoTransformer (torch, random init), converts
its weights to flax, runs both on the same synthetic pair through their own
pipelines (reference: unpadded stacked tensors; ours: fixed-capacity padded
batch), and compares features, matching scores, and the estimated transform.
"""

import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.utils.convert import torch_state_dict_to_variables

EXP_DIR = (
    "/root/reference/experiments/geotransformer.3dmatch.stage4.gse.k3.max.oacl.stage2.sinkhorn"
)


def make_pair(rng, n=4000):
    """Synthetic wavy-surface scan pair with a known rigid transform."""
    from geotransformer_tpu.ops import (
        rodrigues_rotation_matrix,
        get_transform_from_rotation_translation,
        apply_transform,
        inverse_transform,
    )

    xy = rng.uniform(0, 1, (n, 2)).astype(np.float32)
    z = 0.15 * np.sin(6 * xy[:, 0]) * np.cos(5 * xy[:, 1]) + 0.01 * rng.normal(size=n)
    ref = np.column_stack([xy, z]).astype(np.float32)

    # src: overlapping subset (70%) of the surface, re-sampled + noise,
    # expressed in its own frame via the inverse GT transform.
    keep = ref[:, 0] < 0.7
    src_world = ref[keep] + 0.003 * rng.normal(size=(keep.sum(), 3)).astype(np.float32)
    axis = jnp.asarray(rng.normal(size=3), jnp.float32)
    R = rodrigues_rotation_matrix(axis, jnp.float32(0.6))
    T = get_transform_from_rotation_translation(R, jnp.asarray([0.3, -0.2, 0.5], jnp.float32))
    src = np.asarray(apply_transform(jnp.asarray(src_world), inverse_transform(T)))
    return ref, src.astype(np.float32), np.asarray(T, np.float32)


@pytest.fixture(scope="module")
def torch_ref_model(refmodules):
    import torch

    if EXP_DIR not in sys.path:
        sys.path.insert(0, EXP_DIR)
    import importlib

    backbone_mod = importlib.import_module("backbone")
    model_mod = importlib.import_module("model")

    from easydict import EasyDict as edict

    cfg = make_3dmatch_config()
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

    torch.manual_seed(7351)
    model = model_mod.create_model(tcfg)
    model.eval()
    return model


def torch_data_dict(pyramid, feats, transform):
    import torch

    return {
        "features": torch.from_numpy(feats),
        "transform": torch.from_numpy(transform),
        "points": [torch.from_numpy(p) for p in pyramid["points"]],
        "lengths": [torch.from_numpy(np.asarray(l)) for l in pyramid["lengths"]],
        "neighbors": [torch.from_numpy(x) for x in pyramid["neighbors"]],
        "subsampling": [torch.from_numpy(x) for x in pyramid["subsampling"]],
        "upsampling": [torch.from_numpy(x) for x in pyramid["upsampling"]],
    }


class TestFullModelParity:
    @pytest.fixture(scope="class")
    def run_both(self, request, torch_ref_model):
        import torch

        rng = np.random.default_rng(3)
        ref, src, T = make_pair(rng)
        points = np.concatenate([ref, src], 0)
        lengths = np.asarray([len(ref), len(src)])
        cfg = make_3dmatch_config()
        pyramid = build_pyramid(
            points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
        )
        feats = np.ones((points.shape[0], 1), np.float32)

        with torch.no_grad():
            ref_out = torch_ref_model(torch_data_dict(pyramid, feats, T))

        caps = caps_for_pyramid(pyramid, multiple=64)
        cfg = cfg.with_caps(stage_caps=tuple(caps), correspondence_capacity=8192)
        batch = pad_registration_batch(pyramid, feats, T, caps)
        batch = jax.tree.map(jnp.asarray, batch)

        from geotransformer_tpu.models import create_model

        model = create_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), batch, training=False, with_gt=True)
        variables, unused = torch_state_dict_to_variables(
            torch_ref_model.state_dict(), variables
        )
        # div_term is a constant buffer (sinusoidal frequencies) we compute inline.
        unused = [k for k in unused if not k.endswith("div_term")]
        assert not unused, f"unused torch keys: {unused[:10]}"
        ours = model.apply(variables, batch, training=False, with_gt=True)
        return pyramid, ref_out, ours, caps

    def test_coarse_features(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        n_ref_c = int(pyramid["lengths"][-1][0])
        n_src_c = int(pyramid["lengths"][-1][1])
        np.testing.assert_allclose(
            np.asarray(ours["ref_feats_c"])[:n_ref_c],
            ref_out["ref_feats_c"].numpy(),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours["src_feats_c"])[:n_src_c],
            ref_out["src_feats_c"].numpy(),
            rtol=1e-3, atol=1e-4,
        )

    def test_fine_features(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        n_ref_f = int(pyramid["lengths"][1][0])
        n_src_f = int(pyramid["lengths"][1][1])
        np.testing.assert_allclose(
            np.asarray(ours["ref_feats_f"])[:n_ref_f],
            ref_out["ref_feats_f"].numpy(),
            rtol=1e-3, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(ours["src_feats_f"])[:n_src_f],
            ref_out["src_feats_f"].numpy(),
            rtol=1e-3, atol=2e-4,
        )

    def test_node_correspondences(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        want = set(
            zip(
                ref_out["ref_node_corr_indices"].numpy().tolist(),
                ref_out["src_node_corr_indices"].numpy().tolist(),
            )
        )
        masks = np.asarray(ours["node_corr_masks"])
        got = set(
            zip(
                np.asarray(ours["ref_node_corr_indices"])[masks].tolist(),
                np.asarray(ours["src_node_corr_indices"])[masks].tolist(),
            )
        )
        # tolerate a tiny tie-break fringe
        assert len(got & want) >= 0.98 * len(want)

    def test_gt_overlaps(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        want = {
            (int(i), int(j)): float(o)
            for (i, j), o in zip(
                ref_out["gt_node_corr_indices"].numpy(),
                ref_out["gt_node_corr_overlaps"].numpy(),
            )
        }
        cand_idx = np.asarray(ours["gt_cand_indices"])
        cand_ov = np.asarray(ours["gt_cand_overlaps"])
        cand_masks = np.asarray(ours["gt_cand_masks"])
        got = {}
        for i in range(cand_idx.shape[0]):
            for s in range(cand_idx.shape[1]):
                if cand_masks[i, s]:
                    got[(i, int(cand_idx[i, s]))] = float(cand_ov[i, s])
        assert set(got) == set(want)
        diffs = [abs(got[k] - want[k]) for k in want]
        assert max(diffs) < 1e-4

    def test_matching_scores(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        want = ref_out["matching_scores"].numpy()  # (P_ref, K+1, K+1)
        got = np.asarray(ours["matching_scores"])
        masks = np.asarray(ours["node_corr_masks"])
        p = want.shape[0]
        assert masks[:p].all()
        # Compare rows whose (ref, src) node pair matches the reference's
        # (top-k ties at the 256-correspondence boundary can swap a few rows)
        # and whose patch-slot sets agree exactly (distance ties).
        ref_pairs = list(
            zip(
                ref_out["ref_node_corr_indices"].numpy().tolist(),
                ref_out["src_node_corr_indices"].numpy().tolist(),
            )
        )
        our_pairs = list(
            zip(
                np.asarray(ours["ref_node_corr_indices"])[:p].tolist(),
                np.asarray(ours["src_node_corr_indices"])[:p].tolist(),
            )
        )
        same_pair = np.asarray([a == b for a, b in zip(our_pairs, ref_pairs)])
        want_valid = want > -1e9
        got_valid = got[:p] > -1e9
        same_pts = np.all(
            np.asarray(ours["ref_node_corr_knn_points"])[:p]
            == ref_out["ref_node_corr_knn_points"].numpy(),
            axis=(1, 2),
        ) & np.all(
            np.asarray(ours["src_node_corr_knn_points"])[:p]
            == ref_out["src_node_corr_knn_points"].numpy(),
            axis=(1, 2),
        )
        same_masks = np.all(want_valid == got_valid, axis=(1, 2)) & same_pair & same_pts
        assert same_masks.mean() > 0.95, f"only {same_masks.mean():.3f} patches agree"
        # Compare in probability space: downstream (LGR) consumes exp(scores)
        # with a 0.05 confidence threshold; log-space noise on ~e^-8 entries
        # is irrelevant and amplified by the 100 Sinkhorn iterations.
        got_prob = np.exp(got[:p][same_masks][want_valid[same_masks]])
        want_prob = np.exp(want[same_masks][want_valid[same_masks]])
        np.testing.assert_allclose(got_prob, want_prob, rtol=2e-2, atol=1e-4)

    def test_estimated_transform(self, run_both):
        pyramid, ref_out, ours, caps = run_both
        want = ref_out["estimated_transform"].numpy()
        got = np.asarray(ours["estimated_transform"])
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=5e-4)
