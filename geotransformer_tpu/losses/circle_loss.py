r"""Circle loss on feature distance matrices (masked).

JAX equivalent of the reference weighted circle loss
(`/root/reference/geotransformer/modules/loss/circle_loss.py:44-86`), with
explicit anchor masks so padded rows/columns are excluded from the means.
"""

import jax
import jax.numpy as jnp


def _masked_mean(values, masks):
    m = masks.astype(values.dtype)
    return jnp.sum(values * m) / jnp.maximum(jnp.sum(m), 1.0)


def weighted_circle_loss(
    pos_masks,
    neg_masks,
    feat_dists,
    pos_margin,
    neg_margin,
    pos_optimal,
    neg_optimal,
    log_scale,
    pos_scales=None,
    neg_scales=None,
):
    """Weighted circle loss over a (M, N) feature-distance matrix.

    pos_masks/neg_masks double as validity masks: padded entries must be
    False in both.
    """
    row_masks = jnp.logical_and(pos_masks.any(-1), neg_masks.any(-1))
    col_masks = jnp.logical_and(pos_masks.any(-2), neg_masks.any(-2))

    pos_weights = feat_dists - 1e5 * (~pos_masks).astype(feat_dists.dtype)
    pos_weights = jnp.maximum(pos_weights - pos_optimal, 0.0)
    if pos_scales is not None:
        pos_weights = pos_weights * pos_scales
    pos_weights = jax.lax.stop_gradient(pos_weights)

    neg_weights = feat_dists + 1e5 * (~neg_masks).astype(feat_dists.dtype)
    neg_weights = jnp.maximum(neg_optimal - neg_weights, 0.0)
    if neg_scales is not None:
        neg_weights = neg_weights * neg_scales
    neg_weights = jax.lax.stop_gradient(neg_weights)

    loss_pos_row = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-1)
    loss_pos_col = jax.nn.logsumexp(log_scale * (feat_dists - pos_margin) * pos_weights, axis=-2)
    loss_neg_row = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-1)
    loss_neg_col = jax.nn.logsumexp(log_scale * (neg_margin - feat_dists) * neg_weights, axis=-2)

    loss_row = jax.nn.softplus(loss_pos_row + loss_neg_row) / log_scale
    loss_col = jax.nn.softplus(loss_pos_col + loss_neg_col) / log_scale

    return 0.5 * (_masked_mean(loss_row, row_masks) + _masked_mean(loss_col, col_masks))


def circle_loss(
    pos_masks, neg_masks, feat_dists,
    pos_margin, neg_margin, pos_optimal, neg_optimal, log_scale,
):
    """Unweighted circle loss (reference circle_loss.py:7-41)."""
    return weighted_circle_loss(
        pos_masks, neg_masks, feat_dists,
        pos_margin, neg_margin, pos_optimal, neg_optimal, log_scale,
    )
