r"""Point-to-node partition with static shapes.

TPU-native redesign of the reference partition ops
(`/root/reference/geotransformer/modules/ops/pointcloud_partition.py:61-107`):
each fine point is assigned to its nearest superpoint (node); each node gets
the top-`point_limit` of its owned points. Unlike the reference, both the
points and the nodes may be padded — `point_masks` / `node_masks_in` exclude
padding from the assignment, and all outputs keep fixed shapes with sentinel
index == num_points for empty slots.
"""

import jax
import jax.numpy as jnp

from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.gather import index_select

_BIG = 1e12


def point_to_node_partition(
    points,
    nodes,
    point_limit,
    point_masks=None,
    node_masks_in=None,
):
    """Assign each point to its nearest node; build per-node KNN patches.

    Args:
        points: (N, 3) fine points (possibly padded).
        nodes: (M, 3) superpoints (possibly padded).
        point_limit: static int K, patch capacity.
        point_masks: optional (N,) bool, True for real points.
        node_masks_in: optional (M,) bool, True for real nodes.

    Returns:
        point_to_node: (N,) index of owning node for each point (junk for
            padded points).
        node_masks: (M,) bool, True if the node is real and owns >= 1 point.
        node_knn_indices: (M, K) point indices per node, sentinel N for empty.
        node_knn_masks: (M, K) bool validity of each patch slot.
    """
    num_points = points.shape[0]
    num_nodes = nodes.shape[0]

    sq_dist_mat = pairwise_distance(nodes, points)  # (M, N)
    if node_masks_in is not None:
        sq_dist_mat = jnp.where(node_masks_in[:, None], sq_dist_mat, _BIG)
    if point_masks is not None:
        sq_dist_mat = jnp.where(point_masks[None, :], sq_dist_mat, _BIG)

    point_to_node = jnp.argmin(sq_dist_mat, axis=0)  # (N,)

    # node_masks: nodes owning at least one real point.
    owner_onehot = jax.nn.one_hot(point_to_node, num_nodes, dtype=jnp.int32)
    if point_masks is not None:
        owner_onehot = owner_onehot * point_masks[:, None].astype(jnp.int32)
    node_sizes = jnp.sum(owner_onehot, axis=0)  # (M,)
    node_masks = node_sizes > 0
    if node_masks_in is not None:
        node_masks = jnp.logical_and(node_masks, node_masks_in)

    # Per-node KNN restricted to owned points (reference fixed-bug variant,
    # pointcloud_partition.py:90-93). Ownership partitions the points, so
    # this is a segment operation, not an (M, N) masked top-k (which lowers
    # to a ~2ms sort per cloud at 3DMatch scale): sort points once by
    # (owner, distance-to-owner), rank within each segment, and scatter the
    # first `point_limit` of each segment into the patch table.
    d_own = jnp.min(sq_dist_mat, axis=0)  # (N,) distance to owning node
    owner = point_to_node
    invalid_point = d_own >= _BIG  # masked points / all-masked nodes
    if point_masks is not None:
        invalid_point = jnp.logical_or(invalid_point, ~point_masks)
    owner = jnp.where(invalid_point, num_nodes, owner)  # sort junk last

    point_indices = jnp.arange(num_points, dtype=owner.dtype)
    sorted_owner, _, sorted_idx = jax.lax.sort(
        (owner, d_own, point_indices), num_keys=2, is_stable=True
    )
    seg_start = sorted_owner != jnp.concatenate(
        [jnp.full((1,), -1, sorted_owner.dtype), sorted_owner[:-1]]
    )
    start_run = jax.lax.cummax(jnp.where(seg_start, point_indices, 0))
    rank = point_indices - start_run  # position within the owner segment
    valid = jnp.logical_and(rank < point_limit, sorted_owner < num_nodes)

    table = jnp.full((num_nodes + 1, point_limit), num_points, dtype=owner.dtype)
    table = table.at[
        jnp.where(valid, sorted_owner, num_nodes),
        jnp.where(valid, rank, 0),
    ].set(jnp.where(valid, sorted_idx, num_points), mode="drop")
    node_knn_indices = table[:num_nodes]
    node_knn_masks = node_knn_indices != num_points

    return point_to_node, node_masks, node_knn_indices, node_knn_masks


def knn_partition(points, nodes, k, point_masks=None):
    """Top-k nearest points for each node (masked points excluded).

    Returns (knn_distances (M, k), knn_indices (M, k)).
    """
    sq_dist_mat = pairwise_distance(nodes, points)
    if point_masks is not None:
        sq_dist_mat = jnp.where(point_masks[None, :], sq_dist_mat, _BIG)
    neg_top, knn_indices = jax.lax.approx_max_k(-sq_dist_mat, k, recall_target=1.0)
    return jnp.sqrt(jnp.maximum(-neg_top, 0.0)), knn_indices


def get_point_to_node_indices(points, nodes, point_masks=None, return_counts=False):
    """Nearest-node index per point (reference pointcloud_partition.py:9-31).

    Args:
        points: (N, 3).
        nodes: (M, 3).
        point_masks: optional (N,) bool; masked points are excluded from
            the counts (their returned index is still the nearest node).
        return_counts: also return the number of points owned by each node.

    Returns:
        indices (N,) int32 [, node_sizes (M,) int32].
    """
    sq_dist_mat = pairwise_distance(points, nodes)  # (N, M)
    indices = jnp.argmin(sq_dist_mat, axis=1).astype(jnp.int32)
    if not return_counts:
        return indices
    weights = (
        point_masks.astype(jnp.int32)
        if point_masks is not None
        else jnp.ones(points.shape[0], jnp.int32)
    )
    node_sizes = jax.ops.segment_sum(
        weights, indices, num_segments=nodes.shape[0]
    ).astype(jnp.int32)
    return indices, node_sizes


def ball_query_partition(
    points, nodes, radius, point_limit, point_masks=None, return_count=False
):
    """Fixed-capacity ball query per node (reference pointcloud_partition.py:159-175):
    the `point_limit` nearest points, truncated to those within `radius`;
    empty slots hold the sentinel index == num_points.

    Returns (knn_indices (M, K), knn_masks (M, K) [, node_sizes (M,)]).
    """
    knn_distances, knn_indices = knn_partition(
        points, nodes, point_limit, point_masks=point_masks
    )
    knn_masks = knn_distances < radius
    knn_indices = jnp.where(knn_masks, knn_indices, points.shape[0])
    if return_count:
        return knn_indices, knn_masks, jnp.sum(knn_masks, axis=1)
    return knn_indices, knn_masks
