r"""Pallas TPU kernel: fused KPConv influence + contraction.

The XLA path of :class:`geotransformer_tpu.models.kpconv.KPConv` materializes
three (M, H, K)/(M, K, C)-sized intermediates in HBM (kernel influences,
weighted neighbor features) around two poorly-shaped batched matmuls. At
stage-0 scale (M=38k, H=38) that costs ~6 ms per convolution. This kernel
receives ONE gathered block per query tile — neighbor coordinates and
features — and performs the whole convolution in VMEM:

    offsets  = s[h] - q                       (TM, H, 3)
    sq       = |offsets - kp_k|^2             (TM, H, K) expanded, never in HBM
    infl     = max(1 - sqrt(sq)/sigma, 0)
    out      = sum_k (sum_h infl[...k] * nf) @ W_k   accumulated in f32
    out     /= #neighbors with positive feature sum   (reference quirk)

Only the gathered block (read once) and the (M, C_out) result touch HBM.

Layout: the gather input G has lanes [s_x, s_y, s_z, |s|^2, 0,0,0,0,
feats...] so the aug part occupies lanes [0, 8) and features [8, 8+C);
a strided block's pool features ride the same gather after the conv
features (the XLA gather engine cost is per ROW, so extra lanes are free,
while a separate maxpool gather would pay the full row cost again).
Shadow neighbors are all-zero rows: their features contribute nothing and
the feature-sum neighbor count excludes them, exactly like the XLA path.
(A bf16 table with hi/lo-split coordinates was measured: the gather is
engine-row-bound, not byte-bound, so it saved nothing and cost precision.)
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from geotransformer_tpu.ops.gather import gather_with_shadow

# MXU input dtype for the influence/feature contractions (module-level so
# drift studies / configs can flip it to f32).
MXU_DTYPE = jnp.bfloat16

_AUG = 8  # lanes reserved for [s(3), |s|^2(1), padding(4)]


def _kpconv_kernel(g_ref, q_ref, kp_ref, w_ref, out_ref, *pool_ref,
                   num_kernel_points, c_in, sigma, pool_cols=None):
    k = num_kernel_points
    if pool_ref:
        # Fused strided-shortcut maxpool (reference modules.py:216-218 +
        # functional.py:54-67): the trailing lanes of the gathered block
        # hold the *unprojected* input features; max over the true
        # (pre-sublane-alignment) neighbor columns. Shadow rows are zero in
        # the gathered block, reproducing the reference's implicit 0-clamp.
        cols = pool_cols if pool_cols is not None else g_ref.shape[1]
        pool_block = g_ref[...][:, :cols, _AUG + c_in :]
        pool_ref[0][...] = jnp.max(pool_block, axis=1)
    g = g_ref[...][:, :, : _AUG + c_in]  # (TM, H, AUG + C)
    q = q_ref[...]  # (TM, AUG) — lanes [q(3), |q|^2(1), ...]
    kp = kp_ref[...]  # (K, AUG) — lanes [kp(3), |kp|^2(1), ...]

    sp = g[:, :, :3]  # (TM, H, 3)
    nf = g[:, :, _AUG : _AUG + c_in]  # (TM, H, C)
    qp = q[:, :3]  # (TM, 3)
    tm, h = sp.shape[0], sp.shape[1]

    # Offsets-first geometry: Mosaic lowers f32 matmuls as a SINGLE bf16
    # pass, and bf16 dots on ABSOLUTE coordinates cost percent-level
    # influence error (~12% trained-feature drift, measured). Subtracting
    # q on the VPU first (exact f32) makes every matmul operand a small
    # offset (|off| <= search radius), so the bf16 rounding scales with the
    # offset, not the position — accurate at full single-pass speed, and on
    # KITTI-scale coordinates it also kills the f32 cancellation the
    # expanded |s|^2 - 2 s.q + |q|^2 form suffered. (precision=HIGHEST on
    # the absolute-coordinate dots was measured correct but ~2 ms slower
    # per forward across the 12 convolutions.)
    off = sp - qp[:, None, :]  # (TM, H, 3)
    sq_off = jnp.sum(off * off, axis=-1)  # (TM, H)
    off_dot_kp = jax.lax.dot_general(
        off.reshape(tm * h, 3), kp[:, :3].T,
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    ).reshape(tm, h, k)  # (TM, H, K)
    sq = (
        sq_off[:, :, None]
        - 2.0 * off_dot_kp
        + kp[:, 3][None, None, :]
    )
    sq = jnp.maximum(sq, 1e-20)
    influence = jnp.maximum(1.0 - jnp.sqrt(sq) / sigma, 0.0)  # (TM, H, K)

    # neighbor count from positive feature sums (reference kpconv.py:113-116)
    feat_sum = jnp.sum(nf, axis=-1)  # (TM, H)
    count = jnp.maximum(
        jnp.sum((feat_sum > 0.0).astype(jnp.float32), axis=-1), 1.0
    )  # (TM,)

    if c_in == 1:
        # First conv (raw input features, C_in == 1): the neighbor
        # contraction collapses to weighted influence row-sums followed by
        # ONE clean (TM, K) @ (K, C_out) matmul — the batched dot over a
        # 1-lane rhs is pathologically shaped on the MXU.
        t1 = jnp.sum(influence * nf[:, :, 0][:, :, None], axis=1)  # (TM, K)
        acc = jax.lax.dot_general(
            t1.astype(MXU_DTYPE), w_ref[...][:, 0, :].astype(MXU_DTYPE),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[...] = acc / count[:, None]
        return

    # Batched MXU contraction over neighbors (Mosaic supports batch dims):
    # t[t,k,c] = sum_h influence[t,h,k] * nf[t,h,c]. The (K*C) lane-merge
    # reshape is unsupported, so the weight contraction is K static-sliced
    # matmuls — each temp is only (TM, C_out).
    # bf16 inputs for the MXU (influence in [0,1], features O(1) post-GN;
    # ~0.4% rounding — the precision XLA picks for f32 matmuls by default).
    t = jax.lax.dot_general(
        influence.astype(MXU_DTYPE), nf.astype(MXU_DTYPE),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TM, K, C)
    acc = jnp.zeros((tm, w_ref.shape[2]), dtype=jnp.float32)
    for kk in range(num_kernel_points):
        acc = acc + jax.lax.dot_general(
            t[:, kk, :], w_ref[kk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    out_ref[...] = acc / count[:, None]


def kpconv_fused(
    s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
    sigma, bias=None, tile_m=128, interpret=None, return_gathered=False,
    pool_feats=None, pool_cols=None,
):
    """Fused KPConv forward.

    Args:
        s_feats: (N, C_in) support features.
        q_points: (M, 3) query points.
        s_points: (N, 3) support points.
        neighbor_indices: (M, H) int32, sentinel == N.
        kernel_points: (K, 3).
        weights: (K, C_in, C_out).
        sigma: influence radius.
        bias: optional (C_out,).
        tile_m: query rows per program.
        return_gathered: also return the gathered block (M, H, AUG+C) and
            the sublane-padded neighbor table (for custom_vjp residuals —
            keeping it alive saves the backward's re-gather).
        pool_feats: optional (N, C_pool) features to max-pool over the SAME
            neighbor table inside the kernel (the strided ResidualBlock
            shortcut) — rides the one gather instead of paying a second.
        pool_cols: true (pre-alignment) neighbor limit bounding the pool.

    Returns:
        (M, C_out) float32 features [, (M, C_pool) pooled feats]
        [, gathered block, padded indices].
    """
    m = q_points.shape[0]
    k, c_in, c_out = weights.shape
    c_pool = 0 if pool_feats is None else pool_feats.shape[1]

    # Pad the neighbor axis to a sublane multiple (8) with shadow indices:
    # otherwise the (M*H, C) gather output and its (M, H, C) view have
    # different physical layouts (H pads to the next multiple of 8) and XLA
    # materializes a full relayout copy of the gathered block.
    h = neighbor_indices.shape[1]
    h_pad = -(-h // 8) * 8
    if h_pad != h:
        neighbor_indices = jnp.pad(
            neighbor_indices, ((0, 0), (0, h_pad - h)),
            constant_values=s_points.shape[0],
        )

    # Combined gather: [s(3), |s|^2(1), pad(4), feats(C) [, pool(Cp)]].
    aug_parts = [
        s_points,
        jnp.sum(s_points**2, axis=-1, keepdims=True),
        jnp.zeros((s_points.shape[0], _AUG - 4), s_points.dtype),
        s_feats,
    ]
    if pool_feats is not None:
        aug_parts.append(pool_feats)
    aug_support = jnp.concatenate(aug_parts, axis=1)  # (N, AUG + C [+ Cp])
    g = gather_with_shadow(aug_support, neighbor_indices, 0.0)

    q_aug = jnp.concatenate(
        [
            q_points,
            jnp.sum(q_points**2, axis=-1, keepdims=True),
            jnp.zeros((m, _AUG - 4), q_points.dtype),
        ],
        axis=1,
    )  # (M, AUG)
    kp_aug = jnp.concatenate(
        [
            kernel_points,
            jnp.sum(kernel_points**2, axis=-1, keepdims=True),
            jnp.zeros((k, _AUG - 4), kernel_points.dtype),
        ],
        axis=1,
    )  # (K, 8) f32

    num_tiles = -(-m // tile_m)
    pad_m = num_tiles * tile_m
    if pad_m != m:
        g = jnp.pad(g, ((0, pad_m - m), (0, 0), (0, 0)))
        q_aug = jnp.pad(q_aug, ((0, pad_m - m), (0, 0)))

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _kpconv_kernel, num_kernel_points=k, c_in=c_in, sigma=float(sigma),
        pool_cols=pool_cols,
    )
    out_specs = pl.BlockSpec(
        (tile_m, c_out), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((pad_m, c_out), jnp.float32)
    if pool_feats is not None:
        out_specs = (out_specs, pl.BlockSpec(
            (tile_m, c_pool), lambda i: (i, 0), memory_space=pltpu.VMEM
        ))
        out_shape = (out_shape, jax.ShapeDtypeStruct((pad_m, c_pool), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec(
                (tile_m, g.shape[1], g.shape[2]),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((tile_m, _AUG), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _AUG), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(g, q_aug, kp_aug, weights)
    if pool_feats is not None:
        out, pooled = out[0][:m], out[1][:m]
    else:
        out, pooled = out[:m], None
    if bias is not None:
        out = out + bias
    results = (out,) if pooled is None else (out, pooled)
    if return_gathered:
        results = results + (g[:m], neighbor_indices)
    return results if len(results) > 1 else results[0]


def _influence_and_count_from_gathered(g, q_points, kernel_points, sigma, c_in):
    """Influence tensor and neighbor count from the saved gathered block
    (for the custom_vjp backward; mirrors _kpconv_kernel exactly, including
    the shadow-at-origin convention — shadow rows may get spurious influence
    but their features are zero, so every term they touch vanishes)."""
    sp = g[:, :, :3]
    nf = g[:, :, _AUG : _AUG + c_in]
    # Offsets-first, mirroring _kpconv_kernel: small-magnitude matmul
    # operands keep TPU-default bf16 matmul error negligible (bf16 dots on
    # absolute coordinates measured ~12% trained-feature drift).
    off = sp - q_points[:, None, :]
    sq = (
        jnp.sum(off * off, axis=-1)[:, :, None]
        - 2.0 * jnp.einsum("mhd,kd->mhk", off, kernel_points)
        + jnp.sum(kernel_points**2, axis=-1)[None, None, :]
    )
    influence = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sq, 1e-20)) / sigma, 0.0)
    feat_sum = jnp.sum(nf, axis=-1)
    count = jnp.maximum(jnp.sum((feat_sum > 0.0).astype(jnp.float32), -1), 1.0)
    return influence, nf, count


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 8))
def kpconv_fused_diff(
    s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
    sigma, bias, tile_m,
):
    """Differentiable fused KPConv: Pallas forward, explicit XLA backward.

    Gradients flow to s_feats, weights, and bias only — points, neighbor
    tables, and the kernel disposition are fixed (the reference registers
    kernel_points as a non-trainable buffer, kpconv.py:65).
    """
    return kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
    )


def _kpconv_diff_fwd(s_feats, q_points, s_points, neighbor_indices,
                     kernel_points, weights, sigma, bias, tile_m):
    out, gathered, nb_pad = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_gathered=True,
    )
    # The gathered block is kept as a residual: the backward then needs no
    # re-gather (the dominant cost of a stage-0 conv).
    res = (gathered, q_points, nb_pad, kernel_points, weights,
           s_feats.shape[0], bias is not None)
    return out, res


def _kpconv_diff_bwd(sigma, tile_m, res, dout):
    gathered, q_points, nb_pad, kernel_points, weights, n, has_bias = res
    c_in = weights.shape[1]
    influence, nf, count = _influence_and_count_from_gathered(
        gathered, q_points, kernel_points, sigma, c_in
    )
    g = dout / count[:, None]  # (M, C_out); d(count) = 0 (indicator)

    t = jnp.einsum("mhk,mhc->mkc", influence, nf)  # (M, K, C)
    d_weights = jnp.einsum("mkc,md->kcd", t, g)
    d_nf = jnp.einsum("mhk,mkc->mhc", influence,
                      jnp.einsum("kcd,md->mkc", weights, g))
    d_s_feats = (
        jnp.zeros((n + 1, c_in), d_nf.dtype)
        .at[nb_pad].add(d_nf)[:n]
    )
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (d_s_feats, None, None, None, None, d_weights, d_bias)


kpconv_fused_diff.defvjp(_kpconv_diff_fwd, _kpconv_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9, 10))
def kpconv_pool_fused_diff(
    s_feats, pool_feats, q_points, s_points, neighbor_indices, kernel_points,
    weights, sigma, bias, tile_m, pool_cols,
):
    """Differentiable fused KPConv + strided-shortcut maxpool: one gather,
    one Pallas kernel, two outputs. Gradients flow to s_feats, pool_feats,
    weights, and bias."""
    out, pooled = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
        pool_feats=pool_feats, pool_cols=pool_cols,
    )
    return out, pooled


def _kpconv_pool_diff_fwd(s_feats, pool_feats, q_points, s_points,
                          neighbor_indices, kernel_points, weights, sigma,
                          bias, tile_m, pool_cols):
    out, pooled, gathered, nb_pad = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_gathered=True,
        pool_feats=pool_feats, pool_cols=pool_cols,
    )
    res = (gathered, q_points, nb_pad, kernel_points, weights,
           s_feats.shape[0], bias is not None, pooled)
    return (out, pooled), res


def _kpconv_pool_diff_bwd(sigma, tile_m, pool_cols, res, cotangents):
    dout, dpool = cotangents
    gathered, q_points, nb_pad, kernel_points, weights, n, has_bias, pooled = res
    c_in = weights.shape[1]
    d_s_feats, _, _, _, _, d_weights, d_bias = _kpconv_diff_bwd(
        sigma, tile_m,
        (gathered[:, :, : _AUG + c_in], q_points, nb_pad, kernel_points,
         weights, n, has_bias),
        dout,
    )
    # maxpool backward: distribute evenly over ties, mirroring XLA's
    # reduce_max VJP on the unfused path (shadow rows land on row n of the
    # scatter and are dropped by the [:n] slice).
    cols = pool_cols if pool_cols is not None else gathered.shape[1]
    pool_block = gathered[:, :cols, _AUG + c_in :]
    is_max = (pool_block == pooled[:, None, :]).astype(dpool.dtype)
    is_max = is_max / jnp.maximum(jnp.sum(is_max, axis=1, keepdims=True), 1.0)
    d_pool_rows = is_max * dpool[:, None, :]  # (M, cols, Cp)
    d_pool_feats = (
        jnp.zeros((n + 1, pool_block.shape[2]), d_pool_rows.dtype)
        .at[nb_pad[:, :cols]].add(d_pool_rows)[:n]
    )
    return (d_s_feats, d_pool_feats, None, None, None, None, d_weights, d_bias)


kpconv_pool_fused_diff.defvjp(_kpconv_pool_diff_fwd, _kpconv_pool_diff_bwd)
