r"""Correspondence extraction / conversion / analysis utilities.

TPU rebuild of the reference's score->correspondence extractors and
node<->dense correspondence converters
(`/root/reference/geotransformer/modules/registration/matching.py:12-430`).
The reference returns variable-length ``nonzero`` outputs; everything here
is fixed-capacity + boolean masks (the repo-wide padding idiom), so the
functions stay jit-compatible. Selection among qualifying entries is
by descending score (the reference keeps all, so any subset ordering is
admissible when the capacity covers the qualifying count — pick capacity
from the score-matrix size for exactness).
"""

import jax
import jax.numpy as jnp

from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.partition import get_point_to_node_indices
from geotransformer_tpu.ops.se3 import apply_transform


def _masked_topc(flat_scores, flat_valid, capacity):
    """Top-`capacity` entries of a masked flat score vector.

    Returns (indices (C,), scores (C,), masks (C,))."""
    neg_inf = jnp.asarray(-jnp.inf, flat_scores.dtype)
    keyed = jnp.where(flat_valid, flat_scores, neg_inf)
    scores, indices = jax.lax.top_k(keyed, capacity)
    masks = scores > neg_inf
    return indices, jnp.where(masks, scores, 0.0), masks


def extract_correspondences_from_scores(
    score_mat, capacity, mutual=False, bilateral=False, has_dustbin=False,
    threshold=0.0,
):
    """Max-selection correspondences (reference matching.py:12-67).

    Args:
        score_mat: (N, M) or (N+1, M+1) log matching probabilities.
        capacity: static max number of correspondences returned.

    Returns:
        (ref_indices (C,), src_indices (C,), scores (C,), masks (C,)).
    """
    probs = jnp.exp(score_mat)
    n, m = probs.shape
    row_best = probs >= jnp.max(probs, axis=1, keepdims=True)
    ref_masks_mat = jnp.logical_and(row_best, probs > threshold)
    if mutual or bilateral:
        col_best = probs >= jnp.max(probs, axis=0, keepdims=True)
        src_masks_mat = jnp.logical_and(col_best, probs > threshold)
        if mutual:
            masks_mat = jnp.logical_and(ref_masks_mat, src_masks_mat)
        else:
            masks_mat = jnp.logical_or(ref_masks_mat, src_masks_mat)
    else:
        masks_mat = ref_masks_mat
    if has_dustbin:
        masks_mat = masks_mat.at[-1, :].set(False).at[:, -1].set(False)
    flat_idx, scores, masks = _masked_topc(
        probs.reshape(-1), masks_mat.reshape(-1), capacity)
    return flat_idx // m, flat_idx % m, scores, masks


def extract_correspondences_from_scores_threshold(
    score_mat, threshold, capacity, has_dustbin=False,
):
    """Threshold-selection correspondences (reference matching.py:70-98)."""
    probs = jnp.exp(score_mat)
    n, m = probs.shape
    valid = probs > threshold
    if has_dustbin:
        valid = valid.at[-1, :].set(False).at[:, -1].set(False)
    flat_idx, scores, masks = _masked_topc(
        probs.reshape(-1), valid.reshape(-1), capacity)
    return flat_idx // m, flat_idx % m, scores, masks


def extract_correspondences_from_scores_topk(
    score_mat, k, has_dustbin=False, largest=True,
):
    """Global top-k correspondences (reference matching.py:101-133).

    Returns (ref_indices (k,), src_indices (k,), scores (k,), masks (k,)) —
    masks clear entries that landed on the dustbin row/column."""
    n, m = score_mat.shape
    flat = score_mat.reshape(-1)
    flat = flat if largest else -flat
    scores, flat_idx = jax.lax.top_k(flat, k)
    scores = scores if largest else -scores
    ref_idx = flat_idx // m
    src_idx = flat_idx % m
    masks = jnp.ones((k,), bool)
    if has_dustbin:
        masks = jnp.logical_and(ref_idx != n - 1, src_idx != m - 1)
    return ref_idx, src_idx, scores, masks


def extract_correspondences_from_feats(
    ref_feats, src_feats, capacity, mutual=False, bilateral=False,
):
    """Nearest-neighbor feature correspondences (reference matching.py:136-170).

    Returns (ref_indices, src_indices, feat_dists, masks)."""
    dists = pairwise_distance(ref_feats, src_feats)
    ref_idx, src_idx, neg_scores, masks = extract_correspondences_from_scores(
        -dists, capacity, mutual=mutual, bilateral=bilateral,
        threshold=-jnp.inf,
    )
    # scores were exp(-d2); report plain squared distances like the reference
    feat_dists = dists[ref_idx, src_idx]
    return ref_idx, src_idx, jnp.where(masks, feat_dists, 0.0), masks


def dense_correspondences_to_node_correspondences(
    ref_points, src_points, ref_nodes, src_nodes, corr_indices, corr_masks,
    capacity,
):
    """Point correspondences -> patch correspondences with proxy overlap
    scores (reference matching.py:177-228).

    Args:
        corr_indices: (C_in, 2) point correspondence indices.
        corr_masks: (C_in,) validity.
        capacity: static max number of node correspondences.

    Returns:
        (node_corr_indices (C, 2), counts (C,), scores (C,), masks (C,)).
    """
    num_src_nodes = src_nodes.shape[0]
    ref_p2n, ref_sizes = get_point_to_node_indices(
        ref_points, ref_nodes, return_counts=True)
    src_p2n, src_sizes = get_point_to_node_indices(
        src_points, src_nodes, return_counts=True)
    ref_node_idx = ref_p2n[corr_indices[:, 0]]
    src_node_idx = src_p2n[corr_indices[:, 1]]
    pair_ids = ref_node_idx * num_src_nodes + src_node_idx
    invalid_id = ref_nodes.shape[0] * num_src_nodes
    pair_ids = jnp.where(corr_masks, pair_ids, invalid_id)
    uniq, counts = jnp.unique(
        pair_ids, return_counts=True, size=capacity, fill_value=invalid_id)
    masks = uniq < invalid_id
    counts = jnp.where(masks, counts, 0)
    ref_node_corr = jnp.where(masks, uniq // num_src_nodes, 0)
    src_node_corr = jnp.where(masks, uniq % num_src_nodes, 0)
    scores = 0.5 * (
        counts / jnp.maximum(ref_sizes[ref_node_corr], 1)
        + counts / jnp.maximum(src_sizes[src_node_corr], 1)
    )
    scores = jnp.where(masks, scores, 0.0)
    node_corr = jnp.stack([ref_node_corr, src_node_corr], axis=1)
    return node_corr, counts, scores, masks


def node_correspondences_to_dense_correspondences(
    ref_knn_points, src_knn_points, ref_knn_indices, src_knn_indices,
    node_corr_indices, transform, matching_radius, capacity,
    ref_knn_masks=None, src_knn_masks=None, node_corr_masks=None,
):
    """Patch correspondences -> point correspondences within radius
    (reference matching.py:319-357).

    Returns (corr_indices (C, 2), distances (C,), masks (C,))."""
    p = node_corr_indices.shape[0]
    k = ref_knn_points.shape[1]
    if ref_knn_masks is None:
        ref_knn_masks = jnp.ones(ref_knn_indices.shape, bool)
    if src_knn_masks is None:
        src_knn_masks = jnp.ones(src_knn_indices.shape, bool)
    if node_corr_masks is None:
        node_corr_masks = jnp.ones((p,), bool)
    src_knn_points = apply_transform(src_knn_points, transform)
    r_idx = node_corr_indices[:, 0]
    s_idx = node_corr_indices[:, 1]
    rp = ref_knn_points[r_idx]  # (P, K, 3)
    sp = src_knn_points[s_idx]
    rm = jnp.logical_and(ref_knn_masks[r_idx], node_corr_masks[:, None])
    sm = jnp.logical_and(src_knn_masks[s_idx], node_corr_masks[:, None])
    dist = jnp.sqrt(pairwise_distance(rp, sp))  # (P, K, K)
    corr = jnp.logical_and(dist < matching_radius,
                           jnp.logical_and(rm[:, :, None], sm[:, None, :]))
    flat_idx, neg_d, masks = _masked_topc(
        -dist.reshape(-1), corr.reshape(-1), capacity)
    pk = flat_idx // (k * k)
    rk = (flat_idx // k) % k
    sk = flat_idx % k
    ref_corr = ref_knn_indices[r_idx[pk], rk]
    src_corr = src_knn_indices[s_idx[pk], sk]
    corr_indices = jnp.stack(
        [jnp.where(masks, ref_corr, 0), jnp.where(masks, src_corr, 0)], axis=1)
    return corr_indices, jnp.where(masks, -neg_d, 0.0), masks


def get_node_overlap_ratios(
    ref_points, src_points, ref_knn_points, src_knn_points, ref_knn_indices,
    src_knn_indices, node_corr_indices, transform, matching_radius,
    ref_knn_masks, src_knn_masks, node_corr_masks=None, capacity=None,
    eps=1e-5,
):
    """Fraction of each patch's points covered by dense GT correspondences
    (reference matching.py:361-397)."""
    if capacity is None:
        capacity = node_corr_indices.shape[0] * ref_knn_points.shape[1] ** 2
    corr_indices, _, masks = node_correspondences_to_dense_correspondences(
        ref_knn_points, src_knn_points, ref_knn_indices, src_knn_indices,
        node_corr_indices, transform, matching_radius, capacity,
        ref_knn_masks=ref_knn_masks, src_knn_masks=src_knn_masks,
        node_corr_masks=node_corr_masks,
    )
    n = ref_points.shape[0]
    m = src_points.shape[0]
    ref_overlap = jnp.zeros((n + 1,), jnp.float32).at[
        jnp.where(masks, corr_indices[:, 0], n)].set(1.0)[:n]
    src_overlap = jnp.zeros((m + 1,), jnp.float32).at[
        jnp.where(masks, corr_indices[:, 1], m)].set(1.0)[:m]
    ref_overlap = jnp.concatenate([ref_overlap, jnp.zeros((1,))])
    src_overlap = jnp.concatenate([src_overlap, jnp.zeros((1,))])
    rk = ref_overlap[jnp.minimum(ref_knn_indices, n)]
    sk = src_overlap[jnp.minimum(src_knn_indices, m)]
    rkm = ref_knn_masks.astype(jnp.float32)
    skm = src_knn_masks.astype(jnp.float32)
    ref_ratios = jnp.sum(rk * rkm, axis=1) / (jnp.sum(rkm, axis=1) + eps)
    src_ratios = jnp.sum(sk * skm, axis=1) / (jnp.sum(skm, axis=1) + eps)
    return ref_ratios, src_ratios


def get_node_occlusion_ratios(*args, **kwargs):
    """1 - overlap ratio per patch (reference matching.py:400-430)."""
    ref_ratios, src_ratios = get_node_overlap_ratios(*args, **kwargs)
    return 1.0 - ref_ratios, 1.0 - src_ratios
