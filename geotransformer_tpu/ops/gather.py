r"""Shadow-row gathers and masked selection primitives.

The whole framework uses one padding idiom, inherited from the reference's
"shadow point" trick (`/root/reference/geotransformer/modules/kpconv/kpconv.py:91-104`)
but made total: an index table of capacity-C rows uses the sentinel index C to
mean "no element"; gathers append a shadow row (zeros, or a caller-supplied
fill) so the sentinel fetches a well-defined value. This keeps every gather
static-shape and branch-free, which is what XLA wants on TPU.
"""

import jax.numpy as jnp


def gather_with_shadow(data, indices, shadow_value=0.0):
    """Gather rows of `data` by `indices`, where index == data.shape[0] hits a
    shadow row filled with `shadow_value`.

    Args:
        data: (N, ...) array.
        indices: integer array of any shape with values in [0, N].
        shadow_value: scalar fill for the shadow row.

    Returns:
        Array of shape indices.shape + data.shape[1:].
    """
    shadow = jnp.full((1,) + data.shape[1:], shadow_value, dtype=data.dtype)
    padded = jnp.concatenate([data, shadow], axis=0)
    return jnp.take(padded, indices, axis=0, indices_are_sorted=False, mode="clip")


def index_select(data, indices, axis=0):
    """Multi-dimensional index select along `axis` (no shadow row).

    Equivalent to the reference `index_select`
    (`/root/reference/geotransformer/modules/ops/index_select.py:4-31`).
    """
    return jnp.take(data, indices, axis=axis, mode="clip")


def masked_topk(scores, k, mask=None, largest=True):
    """Top-k over the last axis with invalid entries excluded.

    Args:
        scores: (*, N) float array.
        k: static int, number of entries to select.
        mask: optional (*, N) bool array; False entries are never selected
            (unless fewer than k valid entries exist, in which case the
            returned `valid` flags mark the junk slots).
        largest: select largest (True) or smallest (False) values.

    Returns:
        values: (*, k) selected scores (original sign).
        indices: (*, k) positions into the last axis.
        valid: (*, k) bool, True where the slot holds a real (masked-in) entry.
    """
    import jax

    neg_inf = jnp.asarray(-jnp.inf, dtype=scores.dtype)
    work = scores if largest else -scores
    if mask is not None:
        work = jnp.where(mask, work, neg_inf)
    if scores.shape[-1] >= 16384:
        # For large N, lax.top_k lowers to a full sort on TPU; approx_max_k
        # with recall_target=1.0 is exact and uses the fast PartialReduce op.
        top_vals, top_idx = jax.lax.approx_max_k(work, k, recall_target=1.0)
    else:
        top_vals, top_idx = jax.lax.top_k(work, k)
    valid = top_vals > neg_inf
    values = jnp.take_along_axis(scores, top_idx, axis=-1)
    return values, top_idx, valid
