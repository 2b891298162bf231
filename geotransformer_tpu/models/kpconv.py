r"""Kernel Point Convolution for TPU.

Same math as the reference KPConv
(`/root/reference/geotransformer/modules/kpconv/kpconv.py:79-122`), laid out
for the MXU: the (M, H, K) kernel-influence tensor is produced via one
``(M*H, 3) @ (3, K)`` matmul (no (M, H, K, 3) intermediate), then two batched
matmuls ``(M, K, H) x (M, H, C)`` and ``(K, M, C) x (K, C, C')`` carry all the
FLOPs. Shadow neighbors (sentinel index) contribute zero weight and zero
features, so fixed-capacity padded tables need no special casing.

Kernel points live in the ``constants`` variable collection (the reference
registers them as a non-trainable buffer, kpconv.py:65).
"""

from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from geotransformer_tpu.models.kernel_points import load_kernel_points
from geotransformer_tpu.models.norms import GroupNorm
from geotransformer_tpu.ops.gather import gather_with_shadow

_SHADOW_COORD = 1.0e6


def _kpconv_weight_init(key, shape, dtype=jnp.float32):
    """Kaiming-uniform matching torch's a=sqrt(5) default on (K, Cin, Cout)."""
    fan_in = shape[1] * shape[2]
    bound = 1.0 / np.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class KPConv(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    use_bias: bool = False
    use_pallas: bool = False  # fused VMEM kernel (forward-only; inference)
    input_layer: bool = False  # c_in==1 network input: zero feature grads,
    #                            light t1-residual backward

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices,
                 pool_feats=None, pool_cols=None, inverse_table=None,
                 union_tables=None, split_tables=None, stream=None,
                 q_mask=None):
        """KPConv forward.

        Args:
            s_feats: (N, C_in) support features (padded rows are zeros).
            q_points: (M, 3) query points.
            s_points: (N, 3) support points.
            neighbor_indices: (M, H) int32, sentinel == N for missing.
            pool_feats: optional (N, C_pool) features max-pooled over the
                same neighbor table inside the fused kernel (strided
                shortcut); requires use_pallas.
            pool_cols: true neighbor limit bounding the pool columns.
            inverse_table: optional (N, J) int32 host-built inverse of the
                neighbor table (sentinel M) — switches the pallas path to
                the scatter-free backward (training batches).
            union_tables: optional (union_rows, union_sel) pair from
                build_union_tables — input-layer convs gather per-tile
                neighbor UNIONS (~3x fewer gather rows) instead of
                per-edge rows; requires input_layer and c_in == 1.
            split_tables: optional (tail_table, tail_q, tail_rank) triple
                from preprocess.pyramid.build_split_tables — the conv then
                gathers the first H1 distance-sorted columns for every
                query plus a compacted tail for deep queries only,
                cutting gathered rows by the table's shadow fraction
                (kernels/kpconv.py split section). Exact, same outputs.
            q_mask: optional (M,) bool query validity — Pallas paths skip
                query tiles that are entirely padding (the per-pair padding
                bands inside calibrated capacities) and elide their DMAs;
                outputs are identical (kernels/kpconv.py
                tile_rep_from_mask).
            stream: optional (5, M, H) precomputed edge stream
                (preprocess.pyramid.build_input_stream) — input-layer
                convs (c_in == 1) then skip the neighbor gather entirely
                (kernels/kpconv.py edge-stream section); takes precedence
                over union/split tables. Requires input_layer.

        Returns:
            (M, C_out) features, or (features, pooled) with pool_feats.
        """
        kernel_points = self.variable(
            "constants",
            "kernel_points",
            lambda: jnp.asarray(load_kernel_points(self.radius, self.kernel_size)),
        ).value  # (K, 3)
        weights = self.param(
            "weights",
            _kpconv_weight_init,
            (self.kernel_size, self.in_channels, self.out_channels),
        )

        if self.use_pallas:
            from geotransformer_tpu.kernels.flags import kernel_enabled
            from geotransformer_tpu.kernels.kpconv import (
                kpconv_fused_diff,
                kpconv_input_fused_diff,
                kpconv_inv_fused_diff,
                kpconv_pool_fused_diff,
                kpconv_pool_inv_fused_diff,
                kpconv_union_input_fused_diff,
            )

            bias = (
                self.param("bias", nn.initializers.zeros, (self.out_channels,))
                if self.use_bias
                else None
            )
            if not kernel_enabled("kpconv_tile_skip"):
                # q_mask only drives the valid-tile DMA-elision skip inside
                # the kernels; None restores the compute-every-tile paths
                q_mask = None
            if self.in_channels <= 64:
                tile_m = 128
            elif self.in_channels <= 256:
                tile_m = 64
            else:
                tile_m = 32
            if (stream is not None and self.input_layer
                    and self.in_channels == 1):
                from geotransformer_tpu.kernels.kpconv import (
                    kpconv_stream_input_diff,
                )

                return kpconv_stream_input_diff(
                    stream, kernel_points, weights, self.sigma, bias, 256,
                )
            if split_tables is not None:
                from geotransformer_tpu.kernels.kpconv import (
                    kpconv_split_diff,
                    kpconv_split_input_diff,
                    kpconv_split_pool_diff,
                )

                tail, tail_q, rank = split_tables
                h1 = neighbor_indices.shape[1] - tail.shape[1]
                head = neighbor_indices[:, :h1]
                if pool_feats is not None:
                    return kpconv_split_pool_diff(
                        s_feats, pool_feats, q_points, s_points, head, tail,
                        tail_q, rank, inverse_table, kernel_points, weights,
                        self.sigma, bias, tile_m, pool_cols, q_mask,
                    )
                if self.input_layer and self.in_channels == 1:
                    return kpconv_split_input_diff(
                        s_feats, q_points, s_points, head, tail, tail_q,
                        rank, kernel_points, weights, self.sigma, bias,
                        tile_m, q_mask,
                    )
                return kpconv_split_diff(
                    s_feats, q_points, s_points, head, tail, tail_q, rank,
                    inverse_table, kernel_points, weights, self.sigma, bias,
                    tile_m, q_mask,
                )
            if pool_feats is not None and inverse_table is not None:
                return kpconv_pool_inv_fused_diff(
                    s_feats, pool_feats, q_points, s_points, neighbor_indices,
                    inverse_table, kernel_points, weights, self.sigma, bias,
                    tile_m, pool_cols,
                )
            if pool_feats is not None:
                return kpconv_pool_fused_diff(
                    s_feats, pool_feats, q_points, s_points, neighbor_indices,
                    kernel_points, weights, self.sigma, bias, tile_m,
                    pool_cols, q_mask,
                )
            if inverse_table is not None:
                return kpconv_inv_fused_diff(
                    s_feats, q_points, s_points, neighbor_indices,
                    inverse_table, kernel_points, weights, self.sigma, bias,
                    tile_m,
                )
            if (self.input_layer and self.in_channels == 1
                    and union_tables is not None):
                return kpconv_union_input_fused_diff(
                    s_feats, q_points, s_points, union_tables[0],
                    union_tables[1], kernel_points, weights, self.sigma,
                    bias, tile_m,
                )
            if self.input_layer and self.in_channels == 1:
                return kpconv_input_fused_diff(
                    s_feats, q_points, s_points, neighbor_indices,
                    kernel_points, weights, self.sigma, bias, tile_m,
                )
            return kpconv_fused_diff(
                s_feats, q_points, s_points, neighbor_indices,
                kernel_points, weights, self.sigma, bias, tile_m, q_mask,
            )

        if pool_feats is not None:
            raise ValueError("pool_feats fusion requires use_pallas=True")

        # Neighbor offsets relative to each query (shadow -> huge coordinate).
        neighbors = gather_with_shadow(s_points, neighbor_indices, _SHADOW_COORD)
        neighbors = neighbors - q_points[:, None, :]  # (M, H, 3)

        # Kernel influence: ||n - k||^2 expanded so the MXU does the n.k term.
        sq_n = jnp.sum(neighbors**2, axis=-1, keepdims=True)  # (M, H, 1)
        sq_k = jnp.sum(kernel_points**2, axis=-1)[None, None, :]  # (1, 1, K)
        nk = jnp.einsum(
            "mhd,kd->mhk", neighbors, kernel_points,
            precision=jax.lax.Precision.HIGHEST,
        )
        # Clamp at a tiny positive value: a neighbor can sit exactly on the
        # center kernel point (every point is its own nearest neighbor), and
        # sqrt(0) has an infinite backward that would NaN the whole graph.
        # The clamp keeps the forward bit-identical (<=1e-10 shift) and the
        # zero-limit gradient exact (0, since d(sq)/d(n) = 2(n-k) = 0 there).
        sq_distances = jnp.maximum(sq_n - 2.0 * nk + sq_k, 1e-20)  # (M, H, K)
        influence = jnp.maximum(1.0 - jnp.sqrt(sq_distances) / self.sigma, 0.0)

        neighbor_feats = gather_with_shadow(s_feats, neighbor_indices, 0.0)  # (M, H, C)
        weighted = jnp.einsum(
            "mhk,mhc->mkc", influence, neighbor_feats,
            preferred_element_type=jnp.float32,
        )
        output = jnp.einsum(
            "mkc,kcd->md", weighted, weights,
            preferred_element_type=jnp.float32,
        )

        # Normalize by the number of neighbors whose feature sum is positive
        # (exact replication of the reference quirk, kpconv.py:113-116).
        feat_sum = jnp.sum(neighbor_feats, axis=-1)  # (M, H)
        neighbor_num = jnp.sum((feat_sum > 0.0).astype(output.dtype), axis=-1)
        neighbor_num = jnp.maximum(neighbor_num, 1.0)
        output = output / neighbor_num[:, None]

        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            output = output + bias
        return output


def leaky_relu(x):
    return nn.leaky_relu(x, negative_slope=0.1)


def maxpool(s_feats, neighbor_indices, valid_cols=None):
    """Max over neighbor features with a zero shadow row (reference
    functional.py:54-67 — note the implicit clamp at 0 from the shadow).

    `valid_cols` restricts the pool to the first columns: neighbor tables
    may carry extra sublane-alignment sentinel columns (preprocess), and the
    reference's implicit 0-clamp must only apply to rows that are underfull
    within its own neighbor limit.
    """
    if valid_cols is not None:
        neighbor_indices = neighbor_indices[:, :valid_cols]
    neighbor_feats = gather_with_shadow(s_feats, neighbor_indices, 0.0)
    return jnp.max(neighbor_feats, axis=1)


def nearest_upsample(s_feats, upsample_indices):
    """Copy features of the nearest (first-column) coarse neighbor."""
    return gather_with_shadow(s_feats, upsample_indices[:, 0], 0.0)


def knn_interpolate(s_feats, q_points, s_points, neighbor_indices, k, eps=1e-8):
    """Inverse-distance weighted interpolation over the first k neighbors."""
    knn_indices = neighbor_indices[:, :k]
    knn_points = gather_with_shadow(s_points, knn_indices, 0.0)
    knn_feats = gather_with_shadow(s_feats, knn_indices, 0.0)
    sq_dists = jnp.sum((q_points[:, None, :] - knn_points) ** 2, axis=-1)
    valid = (knn_indices < s_points.shape[0]).astype(s_feats.dtype)
    weights = valid / (sq_dists + eps)
    weights = weights / (jnp.sum(weights, axis=1, keepdims=True) + eps)
    return jnp.sum(knn_feats * weights[:, :, None], axis=1)


def global_avgpool(feats, masks):
    """Masked mean over the point axis -> (C,) per cloud mask."""
    m = masks.astype(feats.dtype)[:, None]
    return jnp.sum(feats * m, axis=0) / jnp.maximum(jnp.sum(m), 1.0)


class UnaryBlock(nn.Module):
    in_channels: int
    out_channels: int
    group_norm: int
    has_relu: bool = True
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, mask=None):
        x = nn.Dense(self.out_channels, use_bias=self.use_bias, name="mlp")(x)
        x = GroupNorm(self.group_norm, self.out_channels, name="norm")(x, mask)
        if self.has_relu:
            x = leaky_relu(x)
        return x


class LastUnaryBlock(nn.Module):
    in_channels: int
    out_channels: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.out_channels, use_bias=self.use_bias, name="mlp")(x)


class ConvBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    use_pallas: bool = False
    input_layer: bool = False

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices,
                 q_mask=None, inverse_table=None, union_tables=None,
                 split_tables=None, stream=None):
        x = KPConv(
            self.in_channels, self.out_channels, self.kernel_size,
            self.radius, self.sigma, use_bias=True,
            use_pallas=self.use_pallas, input_layer=self.input_layer,
            name="KPConv",
        )(s_feats, q_points, s_points, neighbor_indices,
          inverse_table=inverse_table, union_tables=union_tables,
          split_tables=split_tables, stream=stream, q_mask=q_mask)
        x = GroupNorm(self.group_norm, self.out_channels, name="norm")(x, q_mask)
        return leaky_relu(x)


class ResidualBlock(nn.Module):
    in_channels: int
    out_channels: int
    kernel_size: int
    radius: float
    sigma: float
    group_norm: int
    strided: bool = False
    use_pallas: bool = False
    pool_cols: Optional[int] = None  # true (pre-alignment) neighbor limit

    @nn.compact
    def __call__(self, s_feats, q_points, s_points, neighbor_indices,
                 q_mask=None, s_mask=None, inverse_table=None,
                 split_tables=None):
        mid_channels = self.out_channels // 4

        if self.in_channels != mid_channels:
            x = UnaryBlock(self.in_channels, mid_channels, self.group_norm, name="unary1")(
                s_feats, s_mask
            )
        else:
            x = s_feats

        if self.strided and self.use_pallas:
            # One gather serves both the KPConv and the shortcut maxpool
            # (same neighbor table) — the separate maxpool gather is the
            # single largest avoidable op in the stage-1 profile.
            x, shortcut = KPConv(
                mid_channels, mid_channels, self.kernel_size, self.radius, self.sigma,
                use_bias=True, use_pallas=True, name="KPConv",
            )(x, q_points, s_points, neighbor_indices,
              pool_feats=s_feats, pool_cols=self.pool_cols,
              inverse_table=inverse_table, split_tables=split_tables,
              q_mask=q_mask)
        else:
            x = KPConv(
                mid_channels, mid_channels, self.kernel_size, self.radius, self.sigma,
                use_bias=True, use_pallas=self.use_pallas, name="KPConv",
            )(x, q_points, s_points, neighbor_indices,
              inverse_table=inverse_table, split_tables=split_tables,
              q_mask=q_mask)
            shortcut = (
                maxpool(s_feats, neighbor_indices, valid_cols=self.pool_cols)
                if self.strided
                else s_feats
            )
        x = GroupNorm(self.group_norm, mid_channels, name="norm_conv")(x, q_mask)
        x = leaky_relu(x)

        x = UnaryBlock(mid_channels, self.out_channels, self.group_norm,
                       has_relu=False, name="unary2")(x, q_mask)
        if self.in_channels != self.out_channels:
            shortcut = UnaryBlock(
                self.in_channels, self.out_channels, self.group_norm,
                has_relu=False, name="unary_shortcut",
            )(shortcut, q_mask)

        return leaky_relu(x + shortcut)
