r"""GeoTransformer registration model (full assembly).

TPU-native equivalent of the reference experiment model
(`/root/reference/experiments/geotransformer.3dmatch.../model.py:19-212`):
KPConv FPN -> geometric transformer over superpoints -> dual-normalized
superpoint matching -> Sinkhorn fine matching -> local-to-global
registration. One jit-compiled function of a fixed-capacity PairBatch; every
output is statically shaped with validity masks.

Layout reminder: each per-stage array stacks [ref | src], each padded to the
per-cloud capacity C_i (rows [0, C_i) ref, [C_i, 2*C_i) src).
"""

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from geotransformer_tpu.configs import GeoTransformerConfig
from geotransformer_tpu.models.backbone import KPConvFPN
from geotransformer_tpu.models.transformer import GeometricTransformer
from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
from geotransformer_tpu.models.matching import (
    superpoint_matching,
    superpoint_target_sample,
    get_node_correspondences,
)
from geotransformer_tpu.models.lgr import local_to_global_registration
from geotransformer_tpu.ops.partition import point_to_node_partition
from geotransformer_tpu.ops.gather import gather_with_shadow


def split_pair(array, ref_capacity):
    """Split a stacked [ref | src] array at the static ref capacity."""
    return array[:ref_capacity], array[ref_capacity:]


def _ref_capacity(cfg_stage_caps, batch, stage):
    """Static ref/src split row for a stage: from the config when the stage
    cap is an asymmetric (cap_ref, cap_src) pair, else half the (symmetric)
    stage row count."""
    cap = cfg_stage_caps[stage] if stage < len(cfg_stage_caps) else None
    rows = batch["points"][stage].shape[0]
    if isinstance(cap, (tuple, list)):
        if int(cap[0]) + int(cap[1]) != rows:
            raise ValueError(
                f"stage {stage}: cfg caps {cap} do not match batch rows {rows}"
            )
        return int(cap[0])
    return rows // 2


def _partition_pair(cfg, batch):
    """Point-to-node partition for both clouds (params-independent geometry;
    reference `model.py:76-108` computes this under no_grad)."""
    fine = cfg.model.fine_level
    coarse = cfg.backbone.num_stages - 1
    cap_f = _ref_capacity(cfg.caps.stage_caps, batch, fine)
    cap_c = _ref_capacity(cfg.caps.stage_caps, batch, coarse)
    ref_points_c, src_points_c = split_pair(batch["points"][coarse], cap_c)
    ref_masks_c, src_masks_c = split_pair(batch["masks"][coarse], cap_c)
    ref_points_f, src_points_f = split_pair(batch["points"][fine], cap_f)
    ref_masks_f, src_masks_f = split_pair(batch["masks"][fine], cap_f)
    out = {}
    (_, out["ref_node_masks"], out["ref_node_knn_indices"],
     out["ref_node_knn_masks"]) = point_to_node_partition(
        ref_points_f, ref_points_c, cfg.model.num_points_in_patch,
        point_masks=ref_masks_f, node_masks_in=ref_masks_c,
    )
    (_, out["src_node_masks"], out["src_node_knn_indices"],
     out["src_node_knn_masks"]) = point_to_node_partition(
        src_points_f, src_points_c, cfg.model.num_points_in_patch,
        point_masks=src_masks_f, node_masks_in=src_masks_c,
    )
    return out


_PARTITION_KEYS = (
    "ref_node_masks", "ref_node_knn_indices", "ref_node_knn_masks",
    "src_node_masks", "src_node_knn_indices", "src_node_knn_masks",
)
_GT_KEYS = ("gt_cand_indices", "gt_cand_overlaps", "gt_cand_masks")


def precompute_gt_targets(cfg, batch, with_gt=True, use_pallas=False):
    """Stage the params-independent geometry OUT of the differentiated step.

    The reference computes the point-to-node partition and the GT node
    overlaps in forward under ``no_grad`` (`model.py:76-108`,
    `modules/registration/matching.py:231`); under ``jax.grad`` they would
    instead execute inside every differentiated train step (~6 ms/step of
    pure batch geometry). This produces them once per batch — host-side in
    the loader workers next to the pyramid build, or on any device — as
    extra batch keys that :class:`GeoTransformer` consumes directly.

    Returns a dict of new batch entries (partition tables + GT overlap
    candidates); merge into the batch with ``dict(batch, **targets)``.
    """
    fine = cfg.model.fine_level
    cap_f = _ref_capacity(cfg.caps.stage_caps, batch, fine)
    coarse = cfg.backbone.num_stages - 1
    cap_c = _ref_capacity(cfg.caps.stage_caps, batch, coarse)
    out = _partition_pair(cfg, batch)
    if with_gt:
        ref_points_c, src_points_c = split_pair(batch["points"][coarse], cap_c)
        ref_points_f, src_points_f = split_pair(batch["points"][fine], cap_f)
        ref_node_knn_points = gather_with_shadow(
            ref_points_f, out["ref_node_knn_indices"], 0.0)
        src_node_knn_points = gather_with_shadow(
            src_points_f, out["src_node_knn_indices"], 0.0)
        (out["gt_cand_indices"], out["gt_cand_overlaps"],
         out["gt_cand_masks"]) = get_node_correspondences(
            ref_points_c, src_points_c,
            ref_node_knn_points, src_node_knn_points,
            batch["transform"], cfg.model.ground_truth_matching_radius,
            ref_masks=out["ref_node_masks"], src_masks=out["src_node_masks"],
            ref_knn_masks=out["ref_node_knn_masks"],
            src_knn_masks=out["src_node_knn_masks"],
            num_candidates=cfg.caps.gt_candidates,
            chunk_size=cfg.caps.gt_chunk_size,
            use_pallas=use_pallas,
        )
    return out


class GeoTransformer(nn.Module):
    cfg: GeoTransformerConfig

    @nn.compact
    def __call__(self, batch, training=False, with_gt=True):
        """Run registration on one padded pair.

        Args:
            batch: PairBatch dict (see preprocess.pyramid.pad_registration_batch).
            training: use sampled GT node correspondences for the fine head
                (requires `with_gt`) and enable the 'target' rng stream.
            with_gt: compute GT node correspondences / overlap targets
                (needed for losses + PIR; skip for pure inference).

        Returns:
            dict of statically-shaped outputs (see keys below).
        """
        cfg = self.cfg
        fine = cfg.model.fine_level
        coarse = cfg.backbone.num_stages - 1
        cap_f = _ref_capacity(cfg.caps.stage_caps, batch, fine)
        cap_c = _ref_capacity(cfg.caps.stage_caps, batch, coarse)

        out = {}

        ref_points_c, src_points_c = split_pair(batch["points"][coarse], cap_c)
        ref_masks_c, src_masks_c = split_pair(batch["masks"][coarse], cap_c)
        ref_points_f, src_points_f = split_pair(batch["points"][fine], cap_f)
        ref_masks_f, src_masks_f = split_pair(batch["masks"][fine], cap_f)
        transform = batch["transform"]

        out["ref_points_c"] = ref_points_c
        out["src_points_c"] = src_points_c
        out["ref_points_f"] = ref_points_f
        out["src_points_f"] = src_points_f
        out["ref_masks_c"] = ref_masks_c
        out["src_masks_c"] = src_masks_c
        out["ref_masks_f"] = ref_masks_f
        out["src_masks_f"] = src_masks_f

        # 1. point-to-node partition (no gradients flow through geometry).
        # Batches carrying precomputed tables (precompute_gt_targets, staged
        # host-side by the loader or by a separate device program) skip the
        # in-step recompute entirely.
        if "ref_node_knn_indices" in batch:
            part = {k: batch[k] for k in _PARTITION_KEYS}
        else:
            part = _partition_pair(cfg, batch)
        ref_node_masks = part["ref_node_masks"]
        src_node_masks = part["src_node_masks"]
        ref_node_knn_indices = part["ref_node_knn_indices"]
        src_node_knn_indices = part["src_node_knn_indices"]
        ref_node_knn_masks = part["ref_node_knn_masks"]
        src_node_knn_masks = part["src_node_knn_masks"]
        ref_node_knn_points = gather_with_shadow(ref_points_f, ref_node_knn_indices, 0.0)
        src_node_knn_points = gather_with_shadow(src_points_f, src_node_knn_indices, 0.0)

        on_tpu_pre = jax.devices()[0].platform == "tpu"
        if cfg.model.force_pallas is not None:
            on_tpu_pre = cfg.model.force_pallas
        if with_gt:
            if "gt_cand_indices" in batch:
                gt_cand_indices = batch["gt_cand_indices"]
                gt_cand_overlaps = batch["gt_cand_overlaps"]
                gt_cand_masks = batch["gt_cand_masks"]
            else:
                gt_cand_indices, gt_cand_overlaps, gt_cand_masks = get_node_correspondences(
                    ref_points_c, src_points_c,
                    ref_node_knn_points, src_node_knn_points,
                    transform, cfg.model.ground_truth_matching_radius,
                    ref_masks=ref_node_masks, src_masks=src_node_masks,
                    ref_knn_masks=ref_node_knn_masks, src_knn_masks=src_node_knn_masks,
                    num_candidates=cfg.caps.gt_candidates,
                    chunk_size=cfg.caps.gt_chunk_size,
                    use_pallas=on_tpu_pre,
                )
            out["gt_cand_indices"] = gt_cand_indices
            out["gt_cand_overlaps"] = gt_cand_overlaps
            out["gt_cand_masks"] = gt_cand_masks

        # 2. KPConv feature pyramid over the stacked pair.
        on_tpu = jax.devices()[0].platform == "tpu"
        if cfg.model.force_pallas is not None:
            on_tpu = cfg.model.force_pallas
        feats_list = KPConvFPN(
            cfg.backbone.input_dim,
            cfg.backbone.output_dim,
            cfg.backbone.init_dim,
            cfg.backbone.kernel_size,
            cfg.backbone.init_radius,
            cfg.backbone.init_sigma,
            cfg.backbone.group_norm,
            num_stages=cfg.backbone.num_stages,
            first_fine_stage=fine,
            use_pallas=on_tpu,  # differentiable (custom_vjp, XLA backward)
            neighbor_limits=tuple(cfg.caps.neighbor_limits),
            name="backbone",
        )(batch["features"], batch)
        feats_c = feats_list[-1]
        feats_f = feats_list[0]

        # 3. geometric transformer on superpoints.
        ref_feats_c, src_feats_c = split_pair(feats_c, cap_c)
        ref_feats_c, src_feats_c = GeometricTransformer(
            cfg.geotransformer.input_dim,
            cfg.geotransformer.output_dim,
            cfg.geotransformer.hidden_dim,
            cfg.geotransformer.num_heads,
            cfg.geotransformer.blocks,
            cfg.geotransformer.sigma_d,
            cfg.geotransformer.sigma_a,
            cfg.geotransformer.angle_k,
            reduction_a=cfg.geotransformer.reduction_a,
            use_pallas=on_tpu,  # differentiable (custom_vjp recompute bwd)
            name="transformer",
        )(
            ref_points_c[None], src_points_c[None],
            ref_feats_c[None], src_feats_c[None],
            ref_masks=ref_masks_c[None], src_masks=src_masks_c[None],
        )
        ref_feats_c = ref_feats_c[0]
        src_feats_c = src_feats_c[0]
        # rsqrt-form L2 normalize: padded rows are exactly zero and
        # jnp.linalg.norm's backward at 0 is 0/0 (NaN); this form matches
        # F.normalize forward and stays finite in the backward.
        ref_feats_c_norm = ref_feats_c * jax.lax.rsqrt(
            jnp.sum(ref_feats_c**2, axis=1, keepdims=True) + 1e-24
        )
        src_feats_c_norm = src_feats_c * jax.lax.rsqrt(
            jnp.sum(src_feats_c**2, axis=1, keepdims=True) + 1e-24
        )
        out["ref_feats_c"] = ref_feats_c_norm
        out["src_feats_c"] = src_feats_c_norm

        ref_feats_f, src_feats_f = split_pair(feats_f, cap_f)
        out["ref_feats_f"] = ref_feats_f
        out["src_feats_f"] = src_feats_f

        # 6. superpoint correspondences (no gradient).
        ref_node_corr_indices, src_node_corr_indices, node_corr_scores, node_corr_masks = (
            superpoint_matching(
                jax.lax.stop_gradient(ref_feats_c_norm),
                jax.lax.stop_gradient(src_feats_c_norm),
                cfg.coarse_matching.num_correspondences,
                ref_masks=ref_node_masks,
                src_masks=src_node_masks,
                dual_normalization=cfg.coarse_matching.dual_normalization,
            )
        )
        out["ref_node_corr_indices"] = ref_node_corr_indices
        out["src_node_corr_indices"] = src_node_corr_indices
        out["node_corr_masks"] = node_corr_masks

        # 7. during training, the fine head consumes sampled GT node pairs.
        if training:
            if not with_gt:
                raise ValueError("training=True requires with_gt=True")
            flat_overlaps = jnp.where(
                gt_cand_masks, gt_cand_overlaps, 0.0
            ).reshape(-1)
            sel, sel_masks = superpoint_target_sample(
                self.make_rng("target"),
                flat_overlaps,
                cfg.coarse_matching.num_targets,
                cfg.coarse_matching.overlap_threshold,
            )
            s = cfg.caps.gt_candidates
            ref_node_corr_indices = sel // s
            src_node_corr_indices = gt_cand_indices.reshape(-1)[sel]
            node_corr_scores = flat_overlaps[sel]
            node_corr_masks = sel_masks

        # 7.2 gather patches for each node correspondence.
        ref_node_corr_knn_indices = ref_node_knn_indices[ref_node_corr_indices]  # (P, K)
        src_node_corr_knn_indices = src_node_knn_indices[src_node_corr_indices]
        ref_node_corr_knn_masks = jnp.logical_and(
            ref_node_knn_masks[ref_node_corr_indices], node_corr_masks[:, None]
        )
        src_node_corr_knn_masks = jnp.logical_and(
            src_node_knn_masks[src_node_corr_indices], node_corr_masks[:, None]
        )
        ref_node_corr_knn_points = ref_node_knn_points[ref_node_corr_indices]
        src_node_corr_knn_points = src_node_knn_points[src_node_corr_indices]

        ref_node_corr_knn_feats = gather_with_shadow(ref_feats_f, ref_node_corr_knn_indices, 0.0)
        src_node_corr_knn_feats = gather_with_shadow(src_feats_f, src_node_corr_knn_indices, 0.0)

        out["ref_node_corr_knn_points"] = ref_node_corr_knn_points
        out["src_node_corr_knn_points"] = src_node_corr_knn_points
        out["ref_node_corr_knn_masks"] = ref_node_corr_knn_masks
        out["src_node_corr_knn_masks"] = src_node_corr_knn_masks

        # 8. optimal transport over patch-to-patch similarities.
        matching_scores = jnp.einsum(
            "pnd,pmd->pnm", ref_node_corr_knn_feats, src_node_corr_knn_feats
        ) / (feats_f.shape[1] ** 0.5)
        # Pallas VMEM-resident Sinkhorn: forward-only kernel for inference,
        # custom_vjp variant (in-VMEM backward sweep) for training; XLA scan
        # off-TPU.
        if on_tpu:
            ot_backend = "pallas_vjp" if training else "pallas"
        else:
            ot_backend = "scan"
        matching_scores = LearnableLogOptimalTransport(
            cfg.model.num_sinkhorn_iterations, backend=ot_backend,
            name="optimal_transport",
        )(matching_scores, ref_node_corr_knn_masks, src_node_corr_knn_masks)
        out["matching_scores"] = matching_scores

        # 9. local-to-global registration (no gradient).
        lgr_scores = jax.lax.stop_gradient(matching_scores)
        if not cfg.fine_matching.use_dustbin:
            lgr_scores = lgr_scores[:, :-1, :-1]
        corr_capacity = (
            cfg.fine_matching.correspondence_limit
            if cfg.fine_matching.correspondence_limit is not None
            else cfg.caps.correspondence_capacity
        )
        lgr_out = local_to_global_registration(
            jax.lax.stop_gradient(ref_node_corr_knn_points),
            jax.lax.stop_gradient(src_node_corr_knn_points),
            ref_node_corr_knn_masks,
            src_node_corr_knn_masks,
            lgr_scores,
            k=cfg.fine_matching.topk,
            acceptance_radius=cfg.fine_matching.acceptance_radius,
            confidence_threshold=cfg.fine_matching.confidence_threshold,
            mutual=cfg.fine_matching.mutual,
            use_dustbin=cfg.fine_matching.use_dustbin,
            use_global_score=cfg.fine_matching.use_global_score,
            global_scores=node_corr_scores,
            correspondence_threshold=cfg.fine_matching.correspondence_threshold,
            correspondence_limit=corr_capacity,
            # branch-free quaternion Kabsch on TPU (jnp.linalg.svd lowers to
            # a serial while-loop Jacobi sweep, ~1.2ms of latency)
            procrustes_method="quat" if on_tpu else "svd",
            num_refinement_steps=cfg.fine_matching.num_refinement_steps,
            patch_masks=node_corr_masks,
        )
        out.update(lgr_out)
        return out


def create_model(cfg: GeoTransformerConfig) -> GeoTransformer:
    from geotransformer_tpu.configs import apply_precision

    # install the config's kernel precision point (process-wide; the
    # PrecisionConfig docstring explains why these are module globals)
    apply_precision(cfg.precision)
    return GeoTransformer(cfg)
