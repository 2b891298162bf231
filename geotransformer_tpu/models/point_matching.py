r"""Dense point matching head (non-LGR variant, used in ablations).

Static-shape equivalent of the reference `PointMatching`
(`/root/reference/geotransformer/modules/geotransformer/point_matching.py:5-115`):
mutual top-k correspondence extraction from patch score matrices, returning a
fixed-capacity correspondence set with validity masks instead of a
``nonzero`` list. (The reference's dustbin slice ``corr_mat[:, -1:, -1]`` is
an unreachable-code bug — shipped configs never enable the dustbin — and is
implemented here with the evidently intended ``[:, :-1, :-1]``.)
"""

import jax
import jax.numpy as jnp

from geotransformer_tpu.models.lgr import compute_correspondence_matrix


def point_matching(
    ref_knn_points,
    src_knn_points,
    ref_knn_masks,
    src_knn_masks,
    ref_knn_indices,
    src_knn_indices,
    log_score_mat,
    *,
    k,
    mutual=True,
    confidence_threshold=0.05,
    use_dustbin=False,
    use_global_score=False,
    global_scores=None,
    correspondence_limit=2048,
    patch_masks=None,
):
    """Extract dense correspondences from patch-to-patch score matrices.

    Args:
        ref_knn_points / src_knn_points: (P, K, 3) patch points.
        ref_knn_masks / src_knn_masks: (P, K) slot validity.
        ref_knn_indices / src_knn_indices: (P, K) fine-point indices.
        log_score_mat: (P, K, K) or (P, K+1, K+1) log matching scores.
        k: per-row/col top-k.
        correspondence_limit: static output capacity C.
        patch_masks: (P,) patch validity.

    Returns:
        dict with ref_corr_points/src_corr_points (C, 3),
        ref_corr_indices/src_corr_indices (C,), corr_scores (C,),
        corr_masks (C,).
    """
    score_mat = jnp.exp(log_score_mat)
    corr_mat = compute_correspondence_matrix(
        score_mat, k, confidence_threshold, ref_knn_masks, src_knn_masks,
        mutual=mutual, use_dustbin=use_dustbin,
    )
    if use_dustbin:
        score_mat = score_mat[:, :-1, :-1]
    if use_global_score:
        score_mat = score_mat * global_scores[:, None, None]
    if patch_masks is not None:
        corr_mat = jnp.logical_and(corr_mat, patch_masks[:, None, None])
    score_mat = score_mat * corr_mat.astype(score_mat.dtype)

    num_patches, num_k = score_mat.shape[0], score_mat.shape[1]
    flat = jnp.where(corr_mat, score_mat, -1.0).reshape(-1)
    top_scores, top_idx = jax.lax.approx_max_k(
        flat, correspondence_limit, recall_target=1.0
    )
    corr_masks = top_scores > 0.0
    corr_scores = jnp.where(corr_masks, top_scores, 0.0)
    p_idx = top_idx // (num_k * num_k)
    i_idx = (top_idx // num_k) % num_k
    j_idx = top_idx % num_k
    return {
        "ref_corr_points": ref_knn_points[p_idx, i_idx],
        "src_corr_points": src_knn_points[p_idx, j_idx],
        "ref_corr_indices": ref_knn_indices[p_idx, i_idx],
        "src_corr_indices": src_knn_indices[p_idx, j_idx],
        "corr_scores": corr_scores,
        "corr_masks": corr_masks,
    }
