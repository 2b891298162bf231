r"""Pairwise squared distances.

Mirrors the semantics of the reference implementation
(`/root/reference/geotransformer/modules/ops/pairwise_distance.py:4-31`):
``d2 = |x|^2 - 2 x.y + |y|^2`` (or ``2 - 2 x.y`` for unit vectors), clamped at
zero. The matmul is the dominant cost and maps straight onto the MXU.
"""

import jax
import jax.numpy as jnp


def pairwise_distance(x, y, normalized=False, channel_first=False,
                      precision=jax.lax.Precision.HIGHEST):
    """Pairwise squared distance between two (batched) point sets.

    Args:
        x: (*, N, C) or (*, C, N) array.
        y: (*, M, C) or (*, C, M) array.
        normalized: if True, assumes rows are L2-normalized so
            ``d2 = 2 - 2 x.y``.
        channel_first: if True, inputs are (*, C, N) / (*, C, M).

    Returns:
        (*, N, M) array of squared distances (>= 0).
    """
    if channel_first:
        xy = jnp.einsum("...cn,...cm->...nm", x, y, precision=precision)
        x2 = jnp.sum(x**2, axis=-2)[..., :, None]
        y2 = jnp.sum(y**2, axis=-2)[..., None, :]
    else:
        xy = jnp.einsum("...nc,...mc->...nm", x, y, precision=precision)
        x2 = jnp.sum(x**2, axis=-1)[..., :, None]
        y2 = jnp.sum(y**2, axis=-1)[..., None, :]
    if normalized:
        sq_distances = 2.0 - 2.0 * xy
    else:
        sq_distances = x2 - 2.0 * xy + y2
    return jnp.maximum(sq_distances, 0.0)
