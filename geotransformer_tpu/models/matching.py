r"""Superpoint matching, training-target generation, and GT correspondences.

Static-shape redesigns of:
  * `SuperPointMatching`
    (`/root/reference/geotransformer/modules/geotransformer/superpoint_matching.py:7-50`)
    — the reference compacts away empty nodes with ``nonzero``; here the
    dual normalization and global top-k run masked on the padded grid, which
    is numerically identical for valid entries.
  * `SuperPointTargetGenerator` (`.../superpoint_target.py:6-41`) — random
    subset selection becomes masked top-k over random keys.
  * `get_node_correspondences`
    (`/root/reference/geotransformer/modules/registration/matching.py:231-315`)
    — the reference extracts a variable-length list of overlapping node
    pairs after an enclosing-sphere prefilter (``nonzero``); here each ref
    node gets a fixed number of candidate src nodes (the prefilter becomes
    top-S nearest by node distance), and patch overlaps are computed in
    chunks with ``lax.map``. Output is a dense (M, S) candidate table that
    losses scatter into a dense (M, N) overlap matrix.
"""

import jax
import jax.numpy as jnp

from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.se3 import apply_transform


def superpoint_matching(
    ref_feats,
    src_feats,
    num_correspondences,
    ref_masks=None,
    src_masks=None,
    dual_normalization=True,
):
    """Select top-k superpoint correspondences by dual-normalized similarity.

    Args:
        ref_feats: (M, C) L2-normalized coarse features.
        src_feats: (N, C) L2-normalized coarse features.
        num_correspondences: static k.
        ref_masks / src_masks: (M,) / (N,) node validity.
        dual_normalization: apply row*col normalization of exp(-d2).

    Returns:
        ref_corr_indices (k,), src_corr_indices (k,), corr_scores (k,),
        corr_masks (k,) — validity flags (False if fewer valid pairs exist).
    """
    m, n = ref_feats.shape[0], src_feats.shape[0]
    if ref_masks is None:
        ref_masks = jnp.ones((m,), dtype=bool)
    if src_masks is None:
        src_masks = jnp.ones((n,), dtype=bool)
    pair_masks = jnp.logical_and(ref_masks[:, None], src_masks[None, :])

    matching_scores = jnp.exp(-pairwise_distance(ref_feats, src_feats, normalized=True))
    matching_scores = jnp.where(pair_masks, matching_scores, 0.0)
    if dual_normalization:
        ref_scores = matching_scores / (
            jnp.sum(matching_scores, axis=1, keepdims=True) + 1e-24
        )
        src_scores = matching_scores / (
            jnp.sum(matching_scores, axis=0, keepdims=True) + 1e-24
        )
        matching_scores = ref_scores * src_scores

    masked = jnp.where(pair_masks, matching_scores, -1.0)
    # Two-stage exact global top-k (same trick as LGR's two-stage top-C):
    # a flat top-k over the (M*N,) matrix lowers to ONE full sort on TPU
    # (2.75 ms at KITTI's 1536^2); every global top-k element is inside its
    # row's top-k, so per-row approx_max_k (batched row sorts, recall 1.0 =
    # exact) followed by a small flat top-k over (M, k) is exact and ~2x
    # cheaper. Tie-breaking at the k-th score differs from the single sort
    # only among equal scores (the reference's torch.topk order is
    # unspecified there too).
    kr = min(num_correspondences, n)
    row_scores, row_idx = jax.lax.approx_max_k(masked, kr, recall_target=1.0)
    corr_scores, sel = jax.lax.approx_max_k(
        row_scores.reshape(-1), num_correspondences, recall_target=1.0
    )
    corr_masks = corr_scores > -1.0
    corr_scores = jnp.where(corr_masks, corr_scores, 0.0)
    ref_corr_indices = sel // kr
    src_corr_indices = row_idx.reshape(-1)[sel]
    return ref_corr_indices, src_corr_indices, corr_scores, corr_masks


def superpoint_target_sample(
    rng,
    gt_corr_overlaps,
    num_targets,
    overlap_threshold,
):
    """Randomly pick up to `num_targets` GT correspondences above threshold.

    Args:
        rng: jax PRNG key.
        gt_corr_overlaps: (C,) overlaps (0 for invalid slots).
        num_targets: static T.
        overlap_threshold: minimum overlap.

    Returns:
        sel_indices (T,) indices into the C-axis, sel_masks (T,) validity.
    """
    eligible = gt_corr_overlaps > overlap_threshold
    keys = jax.random.uniform(rng, gt_corr_overlaps.shape)
    keys = jnp.where(eligible, keys, -1.0)
    top_keys, sel_indices = jax.lax.top_k(keys, num_targets)
    sel_masks = top_keys > -1.0
    return sel_indices, sel_masks


def get_node_correspondences(
    ref_nodes,
    src_nodes,
    ref_knn_points,
    src_knn_points,
    transform,
    pos_radius,
    ref_masks=None,
    src_masks=None,
    ref_knn_masks=None,
    src_knn_masks=None,
    num_candidates=64,
    chunk_size=32,
    use_pallas=False,
):
    """Ground-truth patch overlaps with fixed-candidate static shapes.

    Args:
        ref_nodes: (M, 3); src_nodes: (N, 3).
        ref_knn_points / src_knn_points: (M, K, 3) / (N, K, 3) patches.
        transform: (4, 4) GT transform aligning src onto ref.
        pos_radius: matching radius.
        *_masks: node validity; *_knn_masks: patch-slot validity.
        num_candidates: S — src candidates kept per ref node (enclosing-sphere
            prefilter turned into masked top-S nearest).
        chunk_size: ref nodes per lax.map chunk (bounds the (chunk, S, K, K)
            working set).
        use_pallas: VMEM-resident overlap kernel (kernels/overlap.py) —
            forward-only, which is exact here: overlaps are training
            targets the reference computes under no_grad.

    Returns:
        cand_indices: (M, S) src node index per candidate.
        cand_overlaps: (M, S) overlap in [0, 1], 0 where invalid.
        cand_masks: (M, S) validity.
    """
    m = ref_nodes.shape[0]
    n = src_nodes.shape[0]
    k = ref_knn_points.shape[1]
    if ref_masks is None:
        ref_masks = jnp.ones((m,), dtype=bool)
    if src_masks is None:
        src_masks = jnp.ones((n,), dtype=bool)
    if ref_knn_masks is None:
        ref_knn_masks = jnp.ones((m, k), dtype=bool)
    if src_knn_masks is None:
        src_knn_masks = jnp.ones((n, src_knn_points.shape[1]), dtype=bool)

    src_nodes = apply_transform(src_nodes, transform)
    src_knn_points = apply_transform(src_knn_points, transform)

    # Enclosing-sphere radii (masked slots excluded).
    ref_dists = jnp.linalg.norm(ref_knn_points - ref_nodes[:, None, :], axis=-1)
    ref_max_dists = jnp.max(jnp.where(ref_knn_masks, ref_dists, 0.0), axis=1)  # (M,)
    src_dists = jnp.linalg.norm(src_knn_points - src_nodes[:, None, :], axis=-1)
    src_max_dists = jnp.max(jnp.where(src_knn_masks, src_dists, 0.0), axis=1)  # (N,)

    node_dist = jnp.sqrt(pairwise_distance(ref_nodes, src_nodes))  # (M, N)
    intersect = (
        ref_max_dists[:, None] + src_max_dists[None, :] + pos_radius - node_dist
    ) > 0
    pair_masks = jnp.logical_and(ref_masks[:, None], src_masks[None, :])
    intersect = jnp.logical_and(intersect, pair_masks)

    # Fixed-S candidate selection: nearest src nodes among intersecting ones.
    sel_key = jnp.where(intersect, -node_dist, -jnp.inf)
    top_vals, cand_indices = jax.lax.top_k(sel_key, num_candidates)  # (M, S)
    cand_masks = top_vals > -jnp.inf

    if use_pallas:
        from geotransformer_tpu.kernels.overlap import patch_overlaps

        overlaps = patch_overlaps(
            jax.lax.stop_gradient(ref_knn_points), ref_knn_masks,
            jax.lax.stop_gradient(src_knn_points[cand_indices]),
            src_knn_masks[cand_indices], pos_radius,
        )
        overlaps = jnp.where(cand_masks, overlaps, 0.0)
        cand_masks = jnp.logical_and(cand_masks, overlaps > 0.0)
        overlaps = jnp.where(cand_masks, overlaps, 0.0)
        return cand_indices, overlaps, cand_masks

    # Chunked overlap computation over ref nodes.
    num_chunks = -(-m // chunk_size)
    pad_m = num_chunks * chunk_size

    def chunk_overlap(args):
        r_knn, r_knn_mask, c_idx, c_mask = args
        # r_knn: (c, K, 3); c_idx: (c, S)
        s_knn = src_knn_points[c_idx]  # (c, S, K, 3)
        s_knn_mask = src_knn_masks[c_idx]  # (c, S, K)
        d2 = pairwise_distance(r_knn[:, None, :, :], s_knn)  # (c, S, K, K)
        # f32 0/1 matches instead of booleans: TPU packs preds at (8,128)
        # with 4x sublane replication, and the packed any/sum reductions
        # dominated this body's profile; max/sum over f32 vectorize cleanly.
        pm = (
            r_knn_mask[:, None, :, None].astype(jnp.float32)
            * s_knn_mask[:, :, None, :].astype(jnp.float32)
        )  # (c, S, K, K)
        match = (d2 < pos_radius**2).astype(jnp.float32) * pm
        ref_counts = jnp.sum(jnp.max(match, axis=3), axis=2)  # (c, S)
        src_counts = jnp.sum(jnp.max(match, axis=2), axis=2)  # (c, S)
        ref_total = jnp.maximum(jnp.sum(r_knn_mask, axis=1).astype(jnp.float32), 1.0)
        src_total = jnp.maximum(jnp.sum(s_knn_mask, axis=2).astype(jnp.float32), 1.0)
        overlaps = 0.5 * (ref_counts / ref_total[:, None] + src_counts / src_total)
        return jnp.where(c_mask, overlaps, 0.0)

    def pad_chunked(x, fill=0):
        pad_width = [(0, pad_m - m)] + [(0, 0)] * (x.ndim - 1)
        xp = jnp.pad(x, pad_width, constant_values=fill)
        return xp.reshape((num_chunks, chunk_size) + x.shape[1:])

    overlaps = jax.lax.map(
        chunk_overlap,
        (
            pad_chunked(ref_knn_points),
            pad_chunked(ref_knn_masks),
            pad_chunked(cand_indices),
            pad_chunked(cand_masks),
        ),
    )
    overlaps = overlaps.reshape(pad_m, num_candidates)[:m]

    cand_masks = jnp.logical_and(cand_masks, overlaps > 0.0)
    overlaps = jnp.where(cand_masks, overlaps, 0.0)
    return cand_indices, overlaps, cand_masks


def candidates_to_dense_overlaps(cand_indices, cand_overlaps, cand_masks, num_src_nodes):
    """Scatter the (M, S) candidate table into a dense (M, N) overlap matrix."""
    m, s = cand_indices.shape
    safe_idx = jnp.where(cand_masks, cand_indices, num_src_nodes)  # OOB drops
    dense = jnp.zeros((m, num_src_nodes + 1), dtype=cand_overlaps.dtype)
    dense = dense.at[jnp.arange(m)[:, None], safe_idx].set(
        jnp.where(cand_masks, cand_overlaps, 0.0)
    )
    return dense[:, :num_src_nodes]
