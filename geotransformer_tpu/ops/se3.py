r"""SE(3) rigid-transform utilities.

Functional JAX equivalents of the reference transformation ops
(`/root/reference/geotransformer/modules/ops/transformation.py:7-253`). All
functions are shape-polymorphic over leading batch dimensions and safe to use
under ``jit``/``vmap``/``grad``.
"""

import jax.numpy as jnp


def apply_transform(points, transform):
    """Rigidly transform points.

    Supports:
      * points (*, 3) with transform (4, 4)
      * points (B, N, 3) with transform (B, 4, 4)

    Args:
        points: point coordinates, last dim 3.
        transform: homogeneous 4x4 transform(s).

    Returns:
        Transformed points with the same shape as `points`.
    """
    rotation = transform[..., :3, :3]
    translation = transform[..., :3, 3]
    if transform.ndim == 2:
        return points @ rotation.T + translation
    # batched: (B, N, 3) x (B, 3, 3)^T + (B, 1, 3)
    return jnp.einsum("...nc,...dc->...nd", points, rotation) + translation[..., None, :]


def apply_rotation(points, rotation):
    """Rotate points. rotation: (3, 3) or (B, 3, 3) matching points rank."""
    if rotation.ndim == 2:
        return points @ rotation.T
    return jnp.einsum("...nc,...dc->...nd", points, rotation)


def get_transform_from_rotation_translation(rotation, translation):
    """Compose (.., 3, 3) rotation and (.., 3) translation into (.., 4, 4)."""
    batch_shape = rotation.shape[:-2]
    transform = jnp.zeros(batch_shape + (4, 4), dtype=rotation.dtype)
    transform = transform.at[..., :3, :3].set(rotation)
    transform = transform.at[..., :3, 3].set(translation)
    transform = transform.at[..., 3, 3].set(1.0)
    return transform


def get_rotation_translation_from_transform(transform):
    """Split (.., 4, 4) transform into rotation (.., 3, 3), translation (.., 3)."""
    return transform[..., :3, :3], transform[..., :3, 3]


def inverse_transform(transform):
    """Inverse of a rigid transform: R^T, -R^T t."""
    rotation, translation = get_rotation_translation_from_transform(transform)
    inv_rotation = jnp.swapaxes(rotation, -1, -2)
    inv_translation = -jnp.einsum("...dc,...c->...d", inv_rotation, translation)
    return get_transform_from_rotation_translation(inv_rotation, inv_translation)


def skew_symmetric_matrix(vectors):
    """Map (.., 3) vectors to (.., 3, 3) skew-symmetric cross-product matrices."""
    x, y, z = vectors[..., 0], vectors[..., 1], vectors[..., 2]
    zero = jnp.zeros_like(x)
    rows = [
        jnp.stack([zero, -z, y], axis=-1),
        jnp.stack([z, zero, -x], axis=-1),
        jnp.stack([-y, x, zero], axis=-1),
    ]
    return jnp.stack(rows, axis=-2)


def rodrigues_rotation_matrix(axes, angles):
    """Rodrigues' formula: rotation matrices from (.., 3) axes and (..,) angles."""
    axes = axes / (jnp.linalg.norm(axes, axis=-1, keepdims=True) + 1e-12)
    sin = jnp.sin(angles)[..., None, None]
    cos = jnp.cos(angles)[..., None, None]
    skew = skew_symmetric_matrix(axes)
    eye = jnp.eye(3, dtype=axes.dtype)
    return eye + sin * skew + (1.0 - cos) * (skew @ skew)


def rodrigues_alignment_matrix(src_vectors, ref_vectors):
    """Rotation matrices aligning each (.., 3) src vector onto the ref vector."""
    src = src_vectors / (jnp.linalg.norm(src_vectors, axis=-1, keepdims=True) + 1e-12)
    ref = ref_vectors / (jnp.linalg.norm(ref_vectors, axis=-1, keepdims=True) + 1e-12)
    axes = jnp.cross(src, ref)
    sin = jnp.linalg.norm(axes, axis=-1)
    cos = jnp.sum(src * ref, axis=-1)
    skew = skew_symmetric_matrix(axes / (sin[..., None] + 1e-12))
    eye = jnp.eye(3, dtype=src.dtype)
    rot = eye + sin[..., None, None] * skew + (1.0 - cos)[..., None, None] * (skew @ skew)
    # Degenerate: parallel (identity) or anti-parallel (point reflection fallback).
    parallel = sin < 1e-6
    flip = jnp.where(cos[..., None, None] > 0.0, eye, -eye)
    return jnp.where(parallel[..., None, None], flip, rot)
