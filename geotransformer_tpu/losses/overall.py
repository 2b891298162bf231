r"""Training losses and evaluator for the registration model.

Masked JAX equivalents of the reference experiment losses
(`/root/reference/experiments/geotransformer.3dmatch.../loss.py:10-159`):
coarse weighted circle loss on superpoint feature distances, fine Sinkhorn
negative log-likelihood, and the PIR/IR/RRE/RTE/RMSE/RR evaluator. All
functions consume the statically-shaped output dict of
:class:`geotransformer_tpu.models.GeoTransformer`.
"""

import jax.numpy as jnp

from geotransformer_tpu.configs import GeoTransformerConfig
from geotransformer_tpu.losses.circle_loss import weighted_circle_loss
from geotransformer_tpu.losses.metrics import (
    isotropic_transform_error,
    registration_rmse,
    inlier_ratio,
)
from geotransformer_tpu.models.matching import candidates_to_dense_overlaps
from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.se3 import apply_transform


def coarse_matching_loss(cfg: GeoTransformerConfig, output):
    """Weighted circle loss on coarse features (reference loss.py:10-40)."""
    ref_feats = output["ref_feats_c"]
    src_feats = output["src_feats_c"]
    ref_masks = output["ref_masks_c"]
    src_masks = output["src_masks_c"]

    feat_dists = jnp.sqrt(pairwise_distance(ref_feats, src_feats, normalized=True))
    overlaps = candidates_to_dense_overlaps(
        output["gt_cand_indices"], output["gt_cand_overlaps"], output["gt_cand_masks"],
        src_feats.shape[0],
    )
    valid = jnp.logical_and(ref_masks[:, None], src_masks[None, :])
    pos_masks = jnp.logical_and(overlaps > cfg.coarse_loss.positive_overlap, valid)
    neg_masks = jnp.logical_and(overlaps == 0.0, valid)
    pos_scales = jnp.sqrt(overlaps * pos_masks.astype(overlaps.dtype))

    return weighted_circle_loss(
        pos_masks, neg_masks, feat_dists,
        cfg.coarse_loss.positive_margin, cfg.coarse_loss.negative_margin,
        cfg.coarse_loss.positive_optimal, cfg.coarse_loss.negative_optimal,
        cfg.coarse_loss.log_scale, pos_scales=pos_scales,
    )


def fine_matching_loss(cfg: GeoTransformerConfig, output, transform):
    """Sinkhorn NLL over GT point matches (reference loss.py:43-71)."""
    ref_knn_points = output["ref_node_corr_knn_points"]
    src_knn_points = output["src_node_corr_knn_points"]
    ref_knn_masks = output["ref_node_corr_knn_masks"]
    src_knn_masks = output["src_node_corr_knn_masks"]
    matching_scores = output["matching_scores"]  # (P, K+1, K+1)

    src_knn_points = apply_transform(src_knn_points, transform)
    dists = pairwise_distance(ref_knn_points, src_knn_points)  # (P, K, K)
    gt_masks = jnp.logical_and(ref_knn_masks[:, :, None], src_knn_masks[:, None, :])
    gt_corr_map = jnp.logical_and(dists < cfg.fine_loss.positive_radius**2, gt_masks)
    slack_row = jnp.logical_and(~gt_corr_map.any(axis=2), ref_knn_masks)
    slack_col = jnp.logical_and(~gt_corr_map.any(axis=1), src_knn_masks)

    labels = jnp.zeros(matching_scores.shape, dtype=bool)
    labels = labels.at[:, :-1, :-1].set(gt_corr_map)
    labels = labels.at[:, :-1, -1].set(slack_row)
    labels = labels.at[:, -1, :-1].set(slack_col)

    m = labels.astype(matching_scores.dtype)
    return -jnp.sum(matching_scores * m) / jnp.maximum(jnp.sum(m), 1.0)


def overall_loss(cfg: GeoTransformerConfig, output, transform):
    """Weighted sum of coarse + fine losses (reference loss.py:74-92)."""
    c_loss = coarse_matching_loss(cfg, output)
    f_loss = fine_matching_loss(cfg, output, transform)
    loss = cfg.loss.weight_coarse_loss * c_loss + cfg.loss.weight_fine_loss * f_loss
    return loss, {"loss": loss, "c_loss": c_loss, "f_loss": f_loss}


def evaluate(cfg: GeoTransformerConfig, output, transform):
    """PIR / IR / RRE / RTE / RMSE / RR (reference loss.py:95-159)."""
    metrics = {}

    # coarse precision (PIR): predicted node pairs hitting GT overlap.
    gt_dense = candidates_to_dense_overlaps(
        output["gt_cand_indices"], output["gt_cand_overlaps"], output["gt_cand_masks"],
        output["src_feats_c"].shape[0],
    )
    gt_map = gt_dense > cfg.eval.acceptance_overlap
    ref_idx = output["ref_node_corr_indices"]
    src_idx = output["src_node_corr_indices"]
    corr_masks = output["node_corr_masks"].astype(jnp.float32)
    hits = gt_map[ref_idx, src_idx].astype(jnp.float32)
    metrics["PIR"] = jnp.sum(hits * corr_masks) / jnp.maximum(jnp.sum(corr_masks), 1.0)

    # fine inlier ratio (IR)
    metrics["IR"] = inlier_ratio(
        output["ref_corr_points"], output["src_corr_points"], transform,
        cfg.eval.acceptance_radius, masks=output["corr_masks"],
    )

    # registration errors
    est = output["estimated_transform"]
    rre, rte = isotropic_transform_error(transform, est)
    metrics["RRE"] = rre
    metrics["RTE"] = rte
    rmse = registration_rmse(
        output["src_points_f"], transform, est, masks=output["src_masks_f"]
    )
    metrics["RMSE"] = rmse
    metrics["RR"] = (rmse < cfg.eval.rmse_threshold).astype(jnp.float32)
    return metrics
