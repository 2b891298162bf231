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

    # Restrict each node's candidate set to the points it owns
    # (reference fixed-bug variant, pointcloud_partition.py:90-93).
    point_indices = jnp.arange(num_points)
    matching = point_to_node[None, :] == jnp.arange(num_nodes)[:, None]  # (M, N)
    if point_masks is not None:
        matching = jnp.logical_and(matching, point_masks[None, :])
    masked_dists = jnp.where(matching, sq_dist_mat, _BIG)

    neg_top, node_knn_indices = jax.lax.top_k(-masked_dists, point_limit)  # (M, K)
    node_knn_node_indices = index_select(point_to_node, node_knn_indices, axis=0)
    node_indices = jnp.arange(num_nodes)[:, None]
    node_knn_masks = jnp.logical_and(
        node_knn_node_indices == node_indices, -neg_top < _BIG
    )
    node_knn_indices = jnp.where(node_knn_masks, node_knn_indices, num_points)

    return point_to_node, node_masks, node_knn_indices, node_knn_masks


def knn_partition(points, nodes, k, point_masks=None):
    """Top-k nearest points for each node (masked points excluded).

    Returns (knn_distances (M, k), knn_indices (M, k)).
    """
    sq_dist_mat = pairwise_distance(nodes, points)
    if point_masks is not None:
        sq_dist_mat = jnp.where(point_masks[None, :], sq_dist_mat, _BIG)
    neg_top, knn_indices = jax.lax.top_k(-sq_dist_mat, k)
    return jnp.sqrt(jnp.maximum(-neg_top, 0.0)), knn_indices
