r"""Vector angle ops (reference: modules/ops/vector_angle.py:5-34)."""

import jax.numpy as jnp


def vector_angle(x, y):
    """Angle between vectors along the last axis, via atan2(|x×y|, x·y)."""
    cross = jnp.linalg.norm(jnp.cross(x, y), axis=-1)
    dot = jnp.sum(x * y, axis=-1)
    return jnp.arctan2(cross, dot)


def rad2deg(rad):
    return rad * (180.0 / jnp.pi)


def deg2rad(deg):
    return deg * (jnp.pi / 180.0)
