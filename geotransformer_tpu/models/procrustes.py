r"""Weighted Procrustes (Kabsch) rigid alignment, fully on device.

Equivalent to the reference `weighted_procrustes`
(`/root/reference/geotransformer/modules/registration/procrustes.py:6-73`) —
but where the reference ships the 3x3 cross-covariance to the *CPU* for
``torch.svd`` (procrustes.py:53), this solves the batched 3x3 SVD on the TPU
with ``jnp.linalg.svd``, which XLA lowers to a batched Jacobi iteration; no
host round-trip, differentiable if ever needed.
"""

import jax
import jax.numpy as jnp

from geotransformer_tpu.ops.se3 import get_transform_from_rotation_translation


def weighted_procrustes(
    src_points,
    ref_points,
    weights=None,
    weight_thresh=0.0,
    eps=1e-5,
    return_transform=False,
):
    """Least-squares rigid transform src -> ref under per-point weights.

    Args:
        src_points: (B, N, 3) or (N, 3).
        ref_points: (B, N, 3) or (N, 3).
        weights: (B, N) or (N,) non-negative; zero weight drops a pair, so
            fixed-capacity padded correspondence sets need no special casing.
        weight_thresh: weights below this are zeroed.
        eps: normalization epsilon.
        return_transform: if True return (B, 4, 4), else (R, t).

    Returns:
        (B, 4, 4) transforms or ((B, 3, 3), (B, 3)).
    """
    squeeze_first = src_points.ndim == 2
    if squeeze_first:
        src_points = src_points[None]
        ref_points = ref_points[None]
        if weights is not None:
            weights = weights[None]
    batch_size = src_points.shape[0]
    if weights is None:
        weights = jnp.ones_like(src_points[:, :, 0])
    weights = jnp.where(weights < weight_thresh, 0.0, weights)
    weights = weights / (jnp.sum(weights, axis=1, keepdims=True) + eps)
    w = weights[:, :, None]  # (B, N, 1)

    src_centroid = jnp.sum(src_points * w, axis=1, keepdims=True)  # (B, 1, 3)
    ref_centroid = jnp.sum(ref_points * w, axis=1, keepdims=True)
    src_centered = src_points - src_centroid
    ref_centered = ref_points - ref_centroid

    H = jnp.einsum(
        "bnc,bnd->bcd", src_centered, w * ref_centered,
        precision=jax.lax.Precision.HIGHEST,
    )  # (B, 3, 3)
    U, _, Vh = jnp.linalg.svd(H)  # H = U S Vh
    V = jnp.swapaxes(Vh, -1, -2)
    Ut = jnp.swapaxes(U, -1, -2)
    det = jnp.linalg.det(jnp.einsum("bcd,bde->bce", V, Ut))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=src_points.dtype), (batch_size, 3, 3))
    eye = eye.at[:, 2, 2].set(jnp.sign(det))
    R = jnp.einsum("bcd,bde,bef->bcf", V, eye, Ut)

    t = ref_centroid[:, 0, :] - jnp.einsum("bcd,bd->bc", R, src_centroid[:, 0, :])

    if return_transform:
        transform = get_transform_from_rotation_translation(R, t)
        return transform[0] if squeeze_first else transform
    if squeeze_first:
        return R[0], t[0]
    return R, t
