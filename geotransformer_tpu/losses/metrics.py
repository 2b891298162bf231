r"""Registration metrics (device-side, jittable).

JAX equivalents of the reference torch metrics
(`/root/reference/geotransformer/modules/registration/metrics.py:8-111`).
All functions accept optional masks so fixed-capacity padded point sets can
be evaluated exactly.
"""

import jax.numpy as jnp

from geotransformer_tpu.ops.se3 import (
    apply_transform,
    get_rotation_translation_from_transform,
    inverse_transform,
)
from geotransformer_tpu.ops.pairwise_distance import pairwise_distance


def relative_rotation_error(gt_rotations, rotations):
    """RRE in degrees: acos((trace(R^T Rgt) - 1) / 2)."""
    mat = jnp.einsum("...ij,...ik->...jk", rotations, gt_rotations)
    trace = mat[..., 0, 0] + mat[..., 1, 1] + mat[..., 2, 2]
    x = jnp.clip(0.5 * (trace - 1.0), -1.0, 1.0)
    return 180.0 / jnp.pi * jnp.arccos(x)


def relative_translation_error(gt_translations, translations):
    """RTE: euclidean distance between translations."""
    return jnp.linalg.norm(gt_translations - translations, axis=-1)


def isotropic_transform_error(gt_transforms, transforms):
    """(RRE deg, RTE) for (*, 4, 4) transforms."""
    gt_r, gt_t = get_rotation_translation_from_transform(gt_transforms)
    r, t = get_rotation_translation_from_transform(transforms)
    return relative_rotation_error(gt_r, r), relative_translation_error(gt_t, t)


def registration_rmse(src_points, gt_transform, est_transform, masks=None):
    """Mean realignment residual of src points (reference Evaluator RMSE,
    `experiments/.../loss.py:140-143`)."""
    realignment = inverse_transform(gt_transform) @ est_transform
    realigned = apply_transform(src_points, realignment)
    residuals = jnp.linalg.norm(realigned - src_points, axis=-1)
    if masks is None:
        return residuals.mean()
    m = masks.astype(residuals.dtype)
    return jnp.sum(residuals * m) / jnp.maximum(jnp.sum(m), 1.0)


def inlier_ratio(ref_corr_points, src_corr_points, gt_transform, radius, masks=None):
    """Fraction of correspondences within `radius` under the GT transform."""
    aligned = apply_transform(src_corr_points, gt_transform)
    dists = jnp.linalg.norm(ref_corr_points - aligned, axis=-1)
    inliers = (dists < radius).astype(jnp.float32)
    if masks is None:
        return inliers.mean()
    m = masks.astype(jnp.float32)
    return jnp.sum(inliers * m) / jnp.maximum(jnp.sum(m), 1.0)


def modified_chamfer_distance(
    raw_points, ref_points, src_points, gt_transform, transform,
    raw_masks=None, ref_masks=None, src_masks=None,
):
    """Modified Chamfer distance (reference metrics.py:8-44), masked."""

    def masked_min(d2, col_masks):
        if col_masks is not None:
            d2 = jnp.where(col_masks[None, :], d2, 1e12)
        return jnp.min(d2, axis=-1)

    def masked_mean(x, masks):
        if masks is None:
            return x.mean()
        m = masks.astype(x.dtype)
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)

    aligned_src = apply_transform(src_points, transform)
    d2_pq = pairwise_distance(aligned_src, raw_points)
    chamfer_pq = masked_mean(jnp.sqrt(masked_min(d2_pq, raw_masks)), src_masks)

    composed = transform @ inverse_transform(gt_transform)
    aligned_raw = apply_transform(raw_points, composed)
    d2_qp = pairwise_distance(ref_points, aligned_raw)
    chamfer_qp = masked_mean(jnp.sqrt(masked_min(d2_qp, raw_masks)), ref_masks)

    return chamfer_pq + chamfer_qp
