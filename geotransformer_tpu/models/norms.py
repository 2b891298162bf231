r"""Mask-aware normalization layers.

The reference applies ``nn.GroupNorm`` over the whole stacked point axis
(`/root/reference/geotransformer/modules/kpconv/modules.py:33-50`): statistics
are computed per channel-group over (channels_in_group x all points, both
clouds jointly). With fixed-capacity padding, the statistics must exclude
padded rows or they would depend on the bucket size — so these layers take an
explicit validity mask. On unpadded input they match the torch layers exactly.
"""

import jax.numpy as jnp
import flax.linen as nn


def masked_group_norm(x, mask, num_groups, scale, bias, eps=1e-5):
    """GroupNorm over (group_channels x valid points).

    Args:
        x: (N, C) features.
        mask: (N,) bool validity; None means all valid.
        num_groups: static int G (C % G == 0).
        scale, bias: (C,) affine parameters.
        eps: torch GroupNorm default 1e-5.

    Returns:
        (N, C) normalized features; padded rows zeroed.
    """
    n, c = x.shape
    g = num_groups
    xg = x.reshape(n, g, c // g)
    if mask is None:
        count = jnp.asarray(n * (c // g), x.dtype)
        masked = xg
    else:
        m = mask[:, None, None].astype(x.dtype)
        count = jnp.maximum(mask.sum().astype(x.dtype) * (c // g), 1.0)
        masked = xg * m
    mean = masked.sum(axis=(0, 2)) / count  # (G,)
    centered = xg - mean[None, :, None]
    if mask is None:
        var = (centered**2).sum(axis=(0, 2)) / count
    else:
        var = ((centered**2) * mask[:, None, None].astype(x.dtype)).sum(axis=(0, 2)) / count
    out = centered / jnp.sqrt(var[None, :, None] + eps)
    out = out.reshape(n, c) * scale[None, :] + bias[None, :]
    if mask is not None:
        out = out * mask[:, None].astype(x.dtype)
    return out


class GroupNorm(nn.Module):
    """Affine GroupNorm over the stacked point axis with padding mask."""

    num_groups: int
    num_channels: int

    @nn.compact
    def __call__(self, x, mask=None):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        return masked_group_norm(x, mask, self.num_groups, scale, bias)


class LayerNorm(nn.Module):
    """Per-row LayerNorm (padding-safe by construction), torch eps 1e-5."""

    num_channels: int

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.num_channels,))
        bias = self.param("bias", nn.initializers.zeros, (self.num_channels,))
        mean = x.mean(axis=-1, keepdims=True)
        var = ((x - mean) ** 2).mean(axis=-1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5) * scale + bias
