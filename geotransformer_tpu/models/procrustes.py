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


def _rotation_from_covariance_quat(H, num_iterations=30):
    """Optimal proper rotation from the (B, 3, 3) cross-covariance via
    Horn's quaternion method (closed-form construction + fixed-count power
    iteration on the squared, shifted 4x4 matrix).

    jnp.linalg.svd lowers to a data-dependent while-loop Jacobi sweep on
    TPU (~1.2 ms of serial latency per forward); this path is branch-free,
    always returns det(R) = +1 (no reflection sign fix needed), and unrolls
    to ~30 tiny batched matmuls.
    """
    S = H  # S[b, i, j] = sum_n w_n * src[n, i] * ref[n, j]
    s00, s01, s02 = S[:, 0, 0], S[:, 0, 1], S[:, 0, 2]
    s10, s11, s12 = S[:, 1, 0], S[:, 1, 1], S[:, 1, 2]
    s20, s21, s22 = S[:, 2, 0], S[:, 2, 1], S[:, 2, 2]
    K = jnp.stack(
        [
            jnp.stack([s00 + s11 + s22, s12 - s21, s20 - s02, s01 - s10], -1),
            jnp.stack([s12 - s21, s00 - s11 - s22, s01 + s10, s20 + s02], -1),
            jnp.stack([s20 - s02, s01 + s10, -s00 + s11 - s22, s12 + s21], -1),
            jnp.stack([s01 - s10, s20 + s02, s12 + s21, -s00 - s11 + s22], -1),
        ],
        axis=-2,
    )  # (B, 4, 4) symmetric; optimal quaternion = dominant eigenvector

    # Shift to make the dominant eigenvalue the largest in magnitude, then
    # square once so each iteration contracts at the squared eigengap.
    lam = jnp.max(jnp.sum(jnp.abs(K), axis=-1), axis=-1)  # Gershgorin bound
    Ks = K + lam[:, None, None] * jnp.eye(4, dtype=K.dtype)
    K2 = jnp.einsum("bij,bjk->bik", Ks, Ks)

    # Start from the column of the shifted matrix with the largest diagonal
    # (the standard closed-form quaternion-extraction pivot): its projection
    # onto the dominant eigenvector is bounded away from zero, unlike a fixed
    # start vector, which is exactly orthogonal to it for some 180-degree
    # rotations (w=0, x+y+z=0).
    diag = jnp.diagonal(Ks, axis1=-2, axis2=-1)  # (B, 4)
    pivot = jnp.argmax(diag, axis=-1)  # (B,)
    q = jnp.take_along_axis(Ks, pivot[:, None, None], axis=-1)[:, :, 0]
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-30)
    for _ in range(num_iterations):
        q = jnp.einsum("bij,bj->bi", K2, q)
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-30)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]

    R = jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        axis=-2,
    )  # (B, 3, 3), rotates src into ref
    return R


def weighted_procrustes(
    src_points,
    ref_points,
    weights=None,
    weight_thresh=0.0,
    eps=1e-5,
    return_transform=False,
    method="svd",
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
    if method == "quat":
        R = _rotation_from_covariance_quat(H)
    else:
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
