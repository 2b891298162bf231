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

Layout: the gather input G has lanes [s_hi(3), s_mid(3), s_lo(3), posflag,
0(2), feats...] so the aug part occupies lanes [0, _AUG) and features
[_AUG, _AUG+C);
a strided block's pool features ride the same gather after the conv
features (the XLA gather engine cost is per ROW, so extra lanes are free,
while a separate maxpool gather would pay the full row cost again).
Shadow neighbors are all-zero rows: their features contribute nothing and
the posflag neighbor count excludes them, exactly like the XLA path.

Streaming cost model (measured, stage-0 shapes): both the gather and the
kernel's read of the gathered block cost ~rows x one padded tile-row
(512 B f32 / 256 B bf16, ~290 GB/s; LOGICAL width <= 128 is irrelevant),
i.e. ~2.5 ms per 1.4M-row stage-0 table on each side. TABLE_DTYPE=bf16
(hi/mid/lo-split coordinates keep the offsets-first geometry f32-class
exact, the posflag lane keeps the neighbor count exact) halves both
sides — PROVIDED the neighbor axis is padded to bf16's 16-row sublane
tile (table_align): a round-3 experiment with H=40 tables measured bf16
WORSE (4.62 vs 4.33 ms gather+kernel) purely from the relayout XLA
inserts between the (E, W) gather output and the (M, H, W) kernel view
when H is not 16-aligned.

The posflag lane is a win in its own right: the reference's neighbor
count (#neighbors with positive feature sum, kpconv.py:113-116) is
computed once per SUPPORT POINT in XLA and gathered, replacing a
per-tile (TM, H, C) reduce in the kernel.
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
# Storage dtype of the gathered forward tables. MEASURED (round 4, demo
# pair, 16-aligned H so no relayout): bf16 tables do NOT pay off — the XLA
# gather fusion costs ~1.85 ns per row INDEPENDENT of row bytes (2.10 ms
# for 1.13M bf16 rows vs 2.04 ms f32; the engine is row-rate-bound, not
# bandwidth-bound), while the Pallas kernel gets ~25% SLOWER on bf16 blocks
# (per-element unpack + the count path's whole-block f32 cast):
# 47.1 pairs/s end-to-end vs 50.8 at f32. The bf16 path is kept correct
# (hi/mid/lo coordinate split, exact posflag counts, 16-row table_align)
# and selectable via configs.PrecisionConfig(kpconv_table="bfloat16") for
# configs where VMEM pressure, not gather rate, binds.
TABLE_DTYPE = jnp.float32


def table_align():
    """Neighbor-axis alignment for gathered forward tables.

    The (E, W) gather output and its (M, H, W) kernel view share a physical
    layout only when H is a multiple of the table dtype's sublane tile
    (8 rows f32, 16 rows bf16); otherwise XLA materializes a relayout copy
    of the whole gathered block.
    """
    return 16 if TABLE_DTYPE == jnp.bfloat16 else 8


# lanes reserved for [s_hi(3), s_mid(3), s_lo(3), posflag(1), padding(2)].
# Coordinates are a THREE-way bf16 split (8 mantissa bits each, ~24 total —
# f32-class) so bf16 tables stay exact on large (KITTI-scale) coordinates;
# a two-way split measured 5e-3 relative feature error at offset 1e3. f32
# tables store the exact coordinate in hi and zeros in mid/lo. Lanes are
# free: gather/read cost is per padded 128-lane tile row.
_AUG = 12


def _kpconv_kernel(*refs, num_kernel_points, c_in, sigma, pool_cols=None,
                   has_pool=False, has_count=False, has_t1=False,
                   normalize=True, has_skip=False):
    refs = list(refs)
    rep_ref = refs.pop(0) if has_skip else None
    g_ref, q_ref, kp_ref, w_ref, out_ref = refs[:5]
    extras = refs[5:]
    if has_skip:
        # Valid-tile skip (calibrated-caps padding bands): rep_ref maps every
        # query tile to the last tile containing a valid query row; a tile is
        # pure padding iff rep != self. Skipped tiles write the exact values
        # the compute path produces on all-sentinel rows (zero features and,
        # under normalize, the count floor 1), and their input-block DMAs are
        # elided by the clamped index maps (same mechanism as
        # kernels/attention.py's valid-rectangle skip).
        i = pl.program_id(0)
        tile_valid = rep_ref[i] == i

        @pl.when(jnp.logical_not(tile_valid))
        def _skip():
            sk = list(extras)
            out_ref[...] = jnp.zeros_like(out_ref)
            if has_pool:
                p = sk.pop(0)
                p[...] = jnp.zeros_like(p)
            if has_count:
                c = sk.pop(0)
                fill = 1.0 if normalize else 0.0
                c[...] = jnp.full(c.shape, fill, c.dtype)
            if has_t1:
                t = sk.pop(0)
                t[...] = jnp.zeros_like(t)

        @pl.when(tile_valid)
        def _run():
            _kpconv_kernel_body(
                g_ref, q_ref, kp_ref, w_ref, out_ref, *extras,
                num_kernel_points=num_kernel_points, c_in=c_in, sigma=sigma,
                pool_cols=pool_cols, has_pool=has_pool, has_count=has_count,
                has_t1=has_t1, normalize=normalize)

        return
    _kpconv_kernel_body(
        g_ref, q_ref, kp_ref, w_ref, out_ref, *extras,
        num_kernel_points=num_kernel_points, c_in=c_in, sigma=sigma,
        pool_cols=pool_cols, has_pool=has_pool, has_count=has_count,
        has_t1=has_t1, normalize=normalize)


def tile_rep_from_mask(q_mask, tile_m, num_tiles):
    """Representative tile index per query tile: ``rep[i] == i`` iff tile i
    contains at least one valid query row, else the index of the last
    previous valid tile (leading padding tiles clamp to 0 — they are then
    treated as valid, which is correct-but-unskipped: all-sentinel rows
    compute exact zeros anyway). Used both for the kernel's skip predicate
    and for DMA-eliding clamped input index maps."""
    m = q_mask.shape[0]
    pad = num_tiles * tile_m - m
    if pad:
        q_mask = jnp.concatenate(
            [q_mask, jnp.zeros((pad,), q_mask.dtype)])
    # f32 0/1 instead of bool: packed bool reductions are slow (CLAUDE.md)
    tv = jnp.max(
        q_mask.reshape(num_tiles, tile_m).astype(jnp.float32), axis=1)
    iota = jnp.arange(num_tiles, dtype=jnp.int32)
    marks = jnp.where(tv > 0.0, iota, -1)
    rep = jax.lax.cummax(marks)
    return jnp.maximum(rep, 0).astype(jnp.int32)


def _kpconv_kernel_body(g_ref, q_ref, kp_ref, w_ref, out_ref, *extras,
                        num_kernel_points, c_in, sigma, pool_cols=None,
                        has_pool=False, has_count=False, has_t1=False,
                        normalize=True):
    k = num_kernel_points
    extras = list(extras)
    pool_ref = [extras.pop(0)] if has_pool else []
    count_ref = extras.pop(0) if has_count else None
    t1_ref = extras.pop(0) if has_t1 else None
    if pool_ref:
        # Fused strided-shortcut maxpool (reference modules.py:216-218 +
        # functional.py:54-67): the trailing lanes of the gathered block
        # hold the *unprojected* input features; max over the true
        # (pre-sublane-alignment) neighbor columns. Shadow rows are zero in
        # the gathered block, reproducing the reference's implicit 0-clamp.
        cols = pool_cols if pool_cols is not None else g_ref.shape[1]
        pool_block = g_ref[...][:, :cols, _AUG + c_in :]
        pool_ref[0][...] = jnp.max(pool_block, axis=1).astype(jnp.float32)
    g = g_ref[...][:, :, : _AUG + c_in]  # (TM, H, AUG + C) TABLE_DTYPE
    q = q_ref[...]  # (TM, AUG) f32 — lanes [q(3), |q|^2(1), ...]
    kp = kp_ref[...]  # (K, AUG) f32 — lanes [kp(3), |kp|^2(1), ...]

    # Neighbor count from positive feature sums (reference kpconv.py:113-116;
    # the posflag lane carries (feat_sum > 0) computed host/XLA-side in f32,
    # exact regardless of table dtype). Computed BEFORE any lane extraction:
    # summing the whole block over h is a lane-preserving sublane reduction,
    # then lane 9 of the (TM, AUG+C) result is the posflag sum. Extracting
    # the (TM, H) posflag plane first puts H on the lane axis — a relayout
    # Mosaic charges ~0.4 ms per stage-0 conv for (measured; the old layout
    # hid it inside the equally bad (TM, H, K) influence ops). Unnormalized
    # (split) passes emit the RAW count: the split combine clamps once after
    # summing both passes — a per-pass clamp would inflate the denominator
    # whenever one pass has zero positive-flag neighbors.
    count_raw = jnp.sum(g.astype(jnp.float32), axis=1)[:, 9]  # (TM,)
    count = jnp.maximum(count_raw, 1.0) if normalize else count_raw

    # hi/mid/lo coordinate reconstruction (f32 tables store exact coords in
    # hi and zeros in mid/lo — skip the adds there).
    if g.dtype == jnp.float32:
        sp = g[:, :, :3]
    else:
        sp = (g[:, :, :3].astype(jnp.float32)
              + g[:, :, 3:6].astype(jnp.float32)
              + g[:, :, 6:9].astype(jnp.float32))
    nf = g[:, :, _AUG : _AUG + c_in]  # (TM, H, C) TABLE_DTYPE
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
    off = (sp - qp[:, None, :]).reshape(tm * h, 3)  # (TM*H, 3)
    # Transposed-layout geometry: a (TM, H, K) influence tensor keeps K=15
    # on the LANE axis — every elementwise op runs at 15/128 lane
    # efficiency, measured 0.49 ms of the stage-0 conv's 1.30 ms. Instead
    # compute sq as ONE augmented MXU dot straight into (K, TM*H) — K on
    # sublanes, edges on lanes, full lane utilization — run the sqrt/relu
    # chain there, and transpose back for the neighbor contraction
    # (measured 1.30 -> 0.92 ms at stage-0 shapes). The |off|^2 operand now
    # rides the bf16 matmul pass like the cross term already did — same
    # rounding class as the existing odk term (offsets-first keeps
    # magnitudes ~sigma, see above).
    sq_off = jnp.sum(off * off, axis=-1, keepdims=True)  # (TM*H, 1)
    off_aug = jnp.concatenate(
        [off, sq_off, jnp.ones((tm * h, 1), jnp.float32)], axis=1
    )  # (TM*H, 5): [off(3), |off|^2, 1]
    kp_aug = jnp.concatenate(
        [-2.0 * kp[:, :3], jnp.ones((k, 1), jnp.float32), kp[:, 3:4]], axis=1
    )  # (K, 5): [-2 kp(3), 1, |kp|^2]
    sq_t = jax.lax.dot_general(
        kp_aug, off_aug, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, TM*H) = |off|^2 - 2 off.kp + |kp|^2
    infl_t = jnp.maximum(
        1.0 - jnp.sqrt(jnp.maximum(sq_t, 1e-20)) / sigma, 0.0
    )  # (K, TM*H), full-lane relu/sqrt
    influence = infl_t.T.reshape(tm, h, k)  # (TM, H, K)

    if c_in == 1:
        # First conv (raw input features, C_in == 1): the neighbor
        # contraction collapses to weighted influence row-sums followed by
        # ONE clean (TM, K) @ (K, C_out) matmul — the batched dot over a
        # 1-lane rhs is pathologically shaped on the MXU.
        t1 = jnp.sum(
            influence * nf[:, :, 0].astype(jnp.float32)[:, :, None], axis=1
        )  # (TM, K)
        acc = jax.lax.dot_general(
            t1.astype(MXU_DTYPE), w_ref[...][:, 0, :].astype(MXU_DTYPE),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
        out_ref[...] = acc / count[:, None] if normalize else acc
        if count_ref is not None:
            count_ref[...] = jnp.broadcast_to(count[:, None], count_ref.shape)
        if t1_ref is not None:
            t1_ref[...] = t1
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
    out_ref[...] = acc / count[:, None] if normalize else acc
    if count_ref is not None:
        count_ref[...] = jnp.broadcast_to(count[:, None], count_ref.shape)


def kpconv_fused(
    s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
    sigma, bias=None, tile_m=128, interpret=None, return_gathered=False,
    pool_feats=None, pool_cols=None, return_count=False, return_t1=False,
    normalize=True, q_mask=None,
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
        return_count: also return the per-query positive-feature neighbor
            count (M,) — the residual the scatter-free inverse backward
            needs (it cannot recompute a query-side quantity).
        return_t1: (c_in == 1 only) also return the influence row-sums
            t1 (M, K) — the ONLY residual the input-layer d_weights needs,
            replacing the whole (M, H, 3) influence recompute.
        q_mask: optional (M,) bool query validity — tiles with no valid
            query (the per-pair padding bands inside calibrated capacities)
            skip compute AND elide their gathered-block DMA; see
            tile_rep_from_mask. Outputs on skipped rows are identical to
            the compute path's (zeros; count 1 under normalize).

    Returns:
        (M, C_out) float32 features [, (M, C_pool) pooled feats]
        [, counts] [, gathered block, padded indices].
    """
    m = q_points.shape[0]
    k, c_in, c_out = weights.shape
    c_pool = 0 if pool_feats is None else pool_feats.shape[1]

    # Pad the neighbor axis to the table dtype's sublane tile with shadow
    # indices (see table_align): otherwise the (M*H, C) gather output and
    # its (M, H, C) view have different physical layouts and XLA
    # materializes a full relayout copy of the gathered block.
    align = table_align()
    h = neighbor_indices.shape[1]
    h_pad = -(-h // align) * align
    if h_pad != h:
        neighbor_indices = jnp.pad(
            neighbor_indices, ((0, 0), (0, h_pad - h)),
            constant_values=s_points.shape[0],
        )

    # Combined gather: [s_hi(3), s_mid(3), s_lo(3), posflag(1), pad(2),
    # feats(C) [, pool(Cp)]] stored at TABLE_DTYPE (see module docstring).
    td = TABLE_DTYPE
    if td == jnp.float32:
        hi = s_points
        mid = lo = jnp.zeros_like(s_points)
    else:
        hi = s_points.astype(td).astype(jnp.float32)
        mid = (s_points - hi).astype(td).astype(jnp.float32)
        lo = s_points - hi - mid
    posflag = (jnp.sum(s_feats, axis=-1, keepdims=True) > 0.0).astype(
        jnp.float32
    )
    aug_parts = [
        hi, mid, lo, posflag,
        jnp.zeros((s_points.shape[0], _AUG - 10), jnp.float32),
        s_feats,
    ]
    if pool_feats is not None:
        aug_parts.append(pool_feats)
    aug_support = jnp.concatenate(aug_parts, axis=1).astype(td)
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
        pool_cols=pool_cols, has_pool=pool_feats is not None,
        has_count=return_count, has_t1=return_t1, normalize=normalize,
        has_skip=q_mask is not None,
    )
    assert not (return_t1 and c_in != 1)
    assert normalize or bias is None, "unnormalized output cannot carry bias"
    out_map = (lambda i: (i, 0)) if q_mask is None else (
        lambda i, rep_ref: (i, 0))
    out_specs = [pl.BlockSpec(
        (tile_m, c_out), out_map, memory_space=pltpu.VMEM
    )]
    out_shape = [jax.ShapeDtypeStruct((pad_m, c_out), jnp.float32)]
    if pool_feats is not None:
        out_specs.append(pl.BlockSpec(
            (tile_m, c_pool), out_map, memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, c_pool), jnp.float32))
    if return_count:
        out_specs.append(pl.BlockSpec(
            (tile_m, 8), out_map, memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, 8), jnp.float32))
    if return_t1:
        out_specs.append(pl.BlockSpec(
            (tile_m, k), out_map, memory_space=pltpu.VMEM
        ))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, k), jnp.float32))
    if len(out_specs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    else:
        out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    if q_mask is None:
        out = pl.pallas_call(
            kernel,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(
                    (tile_m, g.shape[1], g.shape[2]),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec((tile_m, _AUG), lambda i: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((k, _AUG), lambda i: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(g, q_aug, kp_aug, weights)
    else:
        rep = tile_rep_from_mask(q_mask, tile_m, num_tiles)

        def q_map(i, rep_ref):
            return rep_ref[i], 0

        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec((tile_m, g.shape[1], g.shape[2]),
                             lambda i, rep_ref: (rep_ref[i], 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_m, _AUG), q_map, memory_space=pltpu.VMEM),
                pl.BlockSpec((k, _AUG), lambda i, rep_ref: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=out_specs,
            )
        out = pl.pallas_call(
            kernel,
            grid_spec=grid_spec,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        )(rep, g, q_aug, kp_aug, weights)
    counts = pooled = t1 = None
    rest = list(out) if isinstance(out, (tuple, list)) else [out]
    out = rest.pop(0)[:m]
    if pool_feats is not None:
        pooled = rest.pop(0)[:m]
    if return_count:
        counts = rest.pop(0)[:m, 0]
    if return_t1:
        t1 = rest.pop(0)[:m]
    if bias is not None:
        out = out + bias
    results = (out,)
    if pooled is not None:
        results = results + (pooled,)
    if counts is not None:
        results = results + (counts,)
    if t1 is not None:
        results = results + (t1,)
    if return_gathered:
        results = results + (g[:m], neighbor_indices)
    return results if len(results) > 1 else results[0]


def _influence_and_count_from_gathered(g, q_points, kernel_points, sigma, c_in):
    """Influence tensor and neighbor count from the saved gathered block
    (for the custom_vjp backward; mirrors _kpconv_kernel exactly, including
    the shadow-at-origin convention — shadow rows may get spurious influence
    but their features are zero, so every term they touch vanishes)."""
    if g.dtype == jnp.float32:
        sp = g[:, :, :3]
    else:
        sp = (g[:, :, :3].astype(jnp.float32)
              + g[:, :, 3:6].astype(jnp.float32)
              + g[:, :, 6:9].astype(jnp.float32))
    nf = g[:, :, _AUG : _AUG + c_in].astype(jnp.float32)
    posflag = g[:, :, 9].astype(jnp.float32)
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
    count = jnp.maximum(jnp.sum(posflag, -1), 1.0)
    return influence, nf, count


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 8))
def kpconv_fused_diff(
    s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
    sigma, bias, tile_m, q_mask=None,
):
    """Differentiable fused KPConv: Pallas forward, explicit XLA backward.

    Gradients flow to s_feats, weights, and bias only — points, neighbor
    tables, and the kernel disposition are fixed (the reference registers
    kernel_points as a non-trainable buffer, kpconv.py:65).
    """
    return kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, q_mask=q_mask,
    )


def _kpconv_diff_fwd(s_feats, q_points, s_points, neighbor_indices,
                     kernel_points, weights, sigma, bias, tile_m,
                     q_mask=None):
    out, gathered, nb_pad = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_gathered=True, q_mask=q_mask,
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
    return (d_s_feats, None, None, None, None, d_weights, d_bias, None)


kpconv_fused_diff.defvjp(_kpconv_diff_fwd, _kpconv_diff_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9, 10))
def kpconv_pool_fused_diff(
    s_feats, pool_feats, q_points, s_points, neighbor_indices, kernel_points,
    weights, sigma, bias, tile_m, pool_cols, q_mask=None,
):
    """Differentiable fused KPConv + strided-shortcut maxpool: one gather,
    one Pallas kernel, two outputs. Gradients flow to s_feats, pool_feats,
    weights, and bias."""
    out, pooled = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
        pool_feats=pool_feats, pool_cols=pool_cols, q_mask=q_mask,
    )
    return out, pooled


def _kpconv_pool_diff_fwd(s_feats, pool_feats, q_points, s_points,
                          neighbor_indices, kernel_points, weights, sigma,
                          bias, tile_m, pool_cols, q_mask=None):
    out, pooled, gathered, nb_pad = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_gathered=True,
        pool_feats=pool_feats, pool_cols=pool_cols, q_mask=q_mask,
    )
    res = (gathered, q_points, nb_pad, kernel_points, weights,
           s_feats.shape[0], bias is not None, pooled)
    return (out, pooled), res


def _kpconv_pool_diff_bwd(sigma, tile_m, pool_cols, res, cotangents):
    dout, dpool = cotangents
    gathered, q_points, nb_pad, kernel_points, weights, n, has_bias, pooled = res
    c_in = weights.shape[1]
    d_s_feats, _, _, _, _, d_weights, d_bias, _ = _kpconv_diff_bwd(
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
    return (d_s_feats, d_pool_feats, None, None, None, None, d_weights,
            d_bias, None)


kpconv_pool_fused_diff.defvjp(_kpconv_pool_diff_fwd, _kpconv_pool_diff_bwd)


# ---------------------------------------------------------------------------
# Scatter-free backward (inverse neighbor tables).
#
# XLA's TPU scatter-add lowering (sort + serial segment-sum) costs ~14 ns per
# scattered row — the (M*H)-edge d_s_feats scatters were ~60% of the train
# step. The backward here flips orientation: a host-built inverse table
# (support row -> its queries, preprocess.pyramid.build_inverse_table) turns
# the gradient push into a support-tile GATHER of [query point | dout/count]
# rows (small source arrays: XLA's fast ~1.9 ns/row path) plus an in-VMEM
# influence recompute, so d_s_feats is a dense per-tile OUTPUT and
# d_weights accumulates across the grid. No scatter anywhere.
# ---------------------------------------------------------------------------


def _kpconv_bwd_kernel(*refs, num_kernel_points, c_in, c_out, c_pool, sigma):
    """Per-support-tile backward.

    Refs (inputs then outputs):
    qg: (TN, J, AUG + c_out [+ 2*c_pool]) gathered query rows
        [q(3), pad(5), dout/count (c_out) [, pooled (c_pool),
         dpool/ties (c_pool)]]; shadow rows are all-zero.
    s_aug: (TN, AUG); sf: (TN, c_in); kp: (K, AUG);
    wt: (K, c_out, c_in) — weights pre-transposed
    [; pf: (TN, c_pool) own pool features].
    Outputs: dsf (TN, c_in); dw (K, c_in, c_out) accumulated over the grid
    [; dpf (TN, c_pool) pool-feature gradient].
    """
    k = num_kernel_points
    if c_pool:
        (qg_ref, s_aug_ref, sf_ref, kp_ref, wt_ref, pf_ref,
         dsf_ref, dw_ref, dpf_ref) = refs
    else:
        qg_ref, s_aug_ref, sf_ref, kp_ref, wt_ref, dsf_ref, dw_ref = refs
    qg = qg_ref[...]
    qp = qg[:, :, :3]  # (TN, J, 3)
    gd = qg[:, :, _AUG : _AUG + c_out]  # (TN, J, c_out)
    sp = s_aug_ref[...][:, :3]  # (TN, 3)
    kp = kp_ref[...]
    tn, j = qp.shape[0], qp.shape[1]

    # Same offsets-first geometry as the forward. The offset must be
    # support - query (the forward's neighbor offset): kernel-point
    # dispositions are not mirror-symmetric, so the sign matters.
    # Shadow rows contribute nothing: every output term below carries a
    # gd / dpr factor, which is zero there.
    # Transposed-layout geometry (see the forward kernel): one augmented
    # MXU dot puts sq in (K, TN*J) with edges on lanes, the sqrt/relu chain
    # runs at full lane width, then one transpose back for the contraction.
    off = (sp[:, None, :] - qp).reshape(tn * j, 3)
    sq_off = jnp.sum(off * off, axis=-1, keepdims=True)
    off_aug = jnp.concatenate(
        [off, sq_off, jnp.ones((tn * j, 1), jnp.float32)], axis=1)
    kp_aug = jnp.concatenate(
        [-2.0 * kp[:, :3], jnp.ones((k, 1), jnp.float32), kp[:, 3:4]], axis=1)
    sq_t = jax.lax.dot_general(
        kp_aug, off_aug, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, TN*J)
    influence = jnp.maximum(
        1.0 - jnp.sqrt(jnp.maximum(sq_t, 1e-20)) / sigma, 0.0
    ).T.reshape(tn, j, k)  # (TN, J, K)

    sfb = sf_ref[...].astype(MXU_DTYPE)

    # u[t, k, d] = sum_j infl[t, j, k] * gd[t, j, d]: ONE batched MXU
    # contraction over the inverse edges — the exact mirror of the forward
    # kernel's influence/feature contraction. Then
    #   d_s_feats = sum_k u[:, k, :] @ W_k^T    (TN, c_out) @ (c_out, c_in)
    #   d_w[k]    = sf^T @ u[:, k, :]           (c_in, TN) @ (TN, c_out)
    # are full-width MXU matmuls with no (TN*J, C) temporaries.
    u = jax.lax.dot_general(
        influence.astype(MXU_DTYPE), gd.astype(MXU_DTYPE),
        (((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # (TN, K, c_out)
    acc = jnp.zeros((tn, c_in), jnp.float32)
    dw_parts = []
    for kk in range(k):
        u_kb = u[:, kk, :].astype(MXU_DTYPE)
        acc = acc + jax.lax.dot_general(
            u_kb, wt_ref[kk], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dw_parts.append(jax.lax.dot_general(
            sfb, u_kb, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )[None])  # (1, c_in, c_out)
    dsf_ref[...] = acc
    dw = jnp.concatenate(dw_parts, axis=0)  # (K, c_in, c_out)

    @pl.when(pl.program_id(0) == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    dw_ref[...] += dw

    if c_pool:
        # maxpool backward, support side: this point receives dpool/ties
        # from every query whose pooled value equals this point's feature
        # (bit-exact f32 equality survives the gather).
        pooled_g = qg[:, :, _AUG + c_out : _AUG + c_out + c_pool]
        dpr = qg[:, :, _AUG + c_out + c_pool :]
        pf_vals = pf_ref[...]  # (TN, c_pool) own pool features
        is_max = (pf_vals[:, None, :] == pooled_g).astype(jnp.float32)
        dpf_ref[...] = jnp.sum(is_max * dpr, axis=1)


def kpconv_bwd_fused(
    s_feats, s_points, q_points, gdiv, inverse_table, kernel_points, weights,
    sigma, tile_n=None, interpret=None,
    pool_feats=None, pooled=None, dpool_over_ties=None,
):
    """Scatter-free KPConv backward: (d_s_feats, d_weights [, d_pool_feats]).

    Args:
        s_feats: (N, C_in) the conv's input features (for d_weights).
        s_points: (N, 3); q_points: (M, 3).
        gdiv: (M, C_out) dout / neighbor count.
        inverse_table: (N, J) int32 query rows per support row, sentinel M —
            or a split 4-tuple ``(head, tail, tail_s, rank)`` from
            ``build_split_tables`` on the inverse table (deep-column
            compaction: in-degree capacities run ~3x the mean in-degree, so
            the split cuts the dominant backward gather+read rows; the two
            passes combine by plain addition + one rank-gather). The
            in-kernel u = infl·gd contraction rounds to MXU_DTYPE before
            the weight matmuls, so the split's per-pass partial sums round
            separately — a bf16-class deviation from the single pass, the
            same accuracy class as the kernel itself (gradients only; the
            forward is unchanged).
        kernel_points: (K, 3); weights: (K, C_in, C_out).
        pool_feats / pooled / dpool_over_ties: optional (N, C_p) / (M, C_p) /
            (M, C_p) for the fused strided-shortcut maxpool backward.
            CONTRACT: the forward's pool must have covered every real edge
            of the table (pool_cols = the true neighbor limit, with wider
            columns sentinel-only — the production batches' invariant).
            This backward attributes pool gradient by value equality per
            inverse edge and cannot tell which COLUMN an edge came from, so
            a real edge beyond pool_cols would wrongly receive gradient
            whenever its value ties the pooled max (ties are common with
            TABLE_DTYPE=bf16 pool lanes).
    """
    if isinstance(inverse_table, (tuple, list)):
        head, tail, tail_s, rank = inverse_table
        r1 = kpconv_bwd_fused(
            s_feats, s_points, q_points, gdiv, head, kernel_points, weights,
            sigma, tile_n=tile_n, interpret=interpret,
            pool_feats=pool_feats, pooled=pooled,
            dpool_over_ties=dpool_over_ties,
        )
        # tail pass over the compacted deep-support rows only; padding rows
        # (tail_s == 0) carry all-sentinel inverse rows, so every gathered
        # quantity there is a zero shadow row and contributes nothing
        pf_t = pool_feats[tail_s] if pool_feats is not None else None
        r2 = kpconv_bwd_fused(
            s_feats[tail_s], s_points[tail_s], q_points, gdiv, tail,
            kernel_points, weights, sigma, tile_n=tile_n,
            interpret=interpret,
            pool_feats=pf_t, pooled=pooled, dpool_over_ties=dpool_over_ties,
        )
        zrow = jnp.zeros((1, r2[0].shape[1]), r2[0].dtype)
        d_sf = r1[0] + jnp.concatenate([r2[0], zrow], 0)[rank]
        d_w = r1[1] + r2[1]
        if pool_feats is None:
            return d_sf, d_w
        zp = jnp.zeros((1, r2[2].shape[1]), r2[2].dtype)
        return d_sf, d_w, r1[2] + jnp.concatenate([r2[2], zp], 0)[rank]

    n = s_points.shape[0]
    m = q_points.shape[0]
    k, c_in, c_out = weights.shape
    c_pool = 0 if pool_feats is None else pool_feats.shape[1]
    if tile_n is None:
        # the double-buffered (tile, J, lanes) gathered block + the
        # (tile, J, K) influence bound VMEM; pick the largest power-of-two
        # tile that keeps the block under ~24 MB (KITTI's deepest strided
        # block gathers 8 + 256 + 2*1024 lanes per edge)
        j_cols = inverse_table.shape[1]
        lanes = _AUG + c_out + 2 * c_pool
        tile_n = 128
        while tile_n > 16 and tile_n * j_cols * lanes * 4 > 24 * 1024 * 1024:
            tile_n //= 2

    src_parts = [
        q_points,
        jnp.zeros((m, _AUG - 3), q_points.dtype),
        gdiv,
    ]
    if c_pool:
        src_parts += [pooled, dpool_over_ties]
    src = jnp.concatenate(src_parts, axis=1)
    qg = gather_with_shadow(src, inverse_table, 0.0)  # (N, J, AUG+C_out[+2Cp])

    s_aug = jnp.concatenate(
        [s_points, jnp.zeros((n, _AUG - 3), s_points.dtype)], axis=1
    )
    kp_aug = jnp.concatenate(
        [kernel_points, jnp.sum(kernel_points**2, -1, keepdims=True),
         jnp.zeros((k, _AUG - 4), kernel_points.dtype)], axis=1,
    )
    wt = jnp.transpose(weights, (0, 2, 1))  # (K, C_out, C_in)

    num_tiles = -(-n // tile_n)
    pad_n = num_tiles * tile_n
    sf = s_feats
    pf = pool_feats
    if pf is not None and TABLE_DTYPE != jnp.float32:
        # the forward pooled values were rounded through the gathered-table
        # dtype; round our own copy identically so the tie-equality holds
        pf = pf.astype(TABLE_DTYPE).astype(jnp.float32)
    if pad_n != n:
        qg = jnp.pad(qg, ((0, pad_n - n), (0, 0), (0, 0)))
        s_aug = jnp.pad(s_aug, ((0, pad_n - n), (0, 0)))
        sf = jnp.pad(sf, ((0, pad_n - n), (0, 0)))
        if c_pool:
            pf = jnp.pad(pf, ((0, pad_n - n), (0, 0)))

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _kpconv_bwd_kernel, num_kernel_points=k, c_in=c_in, c_out=c_out,
        c_pool=c_pool, sigma=float(sigma),
    )
    in_specs = [
        pl.BlockSpec((tile_n, qg.shape[1], qg.shape[2]), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, _AUG), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_n, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, _AUG), lambda i: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.VMEM),
    ]
    out_specs = [
        pl.BlockSpec((tile_n, c_in), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((k, c_in, c_out), lambda i: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    out_shape = [
        jax.ShapeDtypeStruct((pad_n, c_in), jnp.float32),
        jax.ShapeDtypeStruct((k, c_in, c_out), jnp.float32),
    ]
    args = [qg, s_aug, sf, kp_aug, wt]
    if c_pool:
        out_specs.append(pl.BlockSpec(
            (tile_n, c_pool), lambda i: (i, 0), memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pad_n, c_pool), jnp.float32))
        in_specs.append(pl.BlockSpec(
            (tile_n, c_pool), lambda i: (i, 0), memory_space=pltpu.VMEM))
        args.append(pf)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=in_specs,
        out_specs=tuple(out_specs),
        out_shape=tuple(out_shape),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    if c_pool:
        return out[0][:n], out[1], out[2][:n]
    return out[0][:n], out[1]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9))
def kpconv_inv_fused_diff(s_feats, q_points, s_points, neighbor_indices,
                          inverse_table, kernel_points, weights, sigma, bias,
                          tile_m):
    """Differentiable fused KPConv with the scatter-free inverse backward.

    Same forward as :func:`kpconv_fused_diff`; the backward runs
    :func:`kpconv_bwd_fused` over `inverse_table` instead of a scatter-add,
    and no gathered-block residual is kept (memory win too)."""
    return kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
    )


def _kpconv_inv_fwd(s_feats, q_points, s_points, neighbor_indices,
                    inverse_table, kernel_points, weights, sigma, bias,
                    tile_m):
    out, counts = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_count=True,
    )
    res = (s_feats, q_points, s_points, counts, inverse_table, kernel_points,
           weights, bias is not None)
    return out, res


def _kpconv_inv_bwd(sigma, tile_m, res, dout):
    (s_feats, q_points, s_points, counts, inverse_table, kernel_points,
     weights, has_bias) = res
    gdiv = dout / counts[:, None]
    d_s_feats, d_weights = kpconv_bwd_fused(
        s_feats, s_points, q_points, gdiv, inverse_table, kernel_points,
        weights, sigma,
    )
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (d_s_feats, None, None, None, None, None, d_weights, d_bias)


kpconv_inv_fused_diff.defvjp(_kpconv_inv_fwd, _kpconv_inv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 10, 11))
def kpconv_pool_inv_fused_diff(s_feats, pool_feats, q_points, s_points,
                               neighbor_indices, inverse_table, kernel_points,
                               weights, sigma, bias, tile_m, pool_cols):
    """Fused KPConv + strided-shortcut maxpool with scatter-free backward
    for BOTH the conv features and the pooled shortcut."""
    out, pooled = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
        pool_feats=pool_feats, pool_cols=pool_cols,
    )
    return out, pooled


def _kpconv_pool_inv_fwd(s_feats, pool_feats, q_points, s_points,
                         neighbor_indices, inverse_table, kernel_points,
                         weights, sigma, bias, tile_m, pool_cols):
    out, pooled, counts, gathered, nb_pad = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_count=True,
        return_gathered=True, pool_feats=pool_feats, pool_cols=pool_cols,
    )
    c_in = weights.shape[1]
    cols = pool_cols if pool_cols is not None else gathered.shape[1]
    pool_block = gathered[:, :cols, _AUG + c_in :]
    ties = jnp.sum(
        (pool_block == pooled[:, None, :]).astype(jnp.float32), axis=1)
    ties = jnp.maximum(ties, 1.0)
    res = (s_feats, pool_feats, q_points, s_points, counts, inverse_table,
           kernel_points, weights, bias is not None, pooled, ties)
    return (out, pooled), res


def _kpconv_pool_inv_bwd(sigma, tile_m, pool_cols, res, cotangents):
    dout, dpool = cotangents
    (s_feats, pool_feats, q_points, s_points, counts, inverse_table,
     kernel_points, weights, has_bias, pooled, ties) = res
    gdiv = dout / counts[:, None]
    d_s_feats, d_weights, d_pool_feats = kpconv_bwd_fused(
        s_feats, s_points, q_points, gdiv, inverse_table, kernel_points,
        weights, sigma,
        pool_feats=pool_feats, pooled=pooled, dpool_over_ties=dpool / ties,
    )
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (d_s_feats, d_pool_feats, None, None, None, None, None, d_weights,
            d_bias)


kpconv_pool_inv_fused_diff.defvjp(_kpconv_pool_inv_fwd, _kpconv_pool_inv_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 8))
def kpconv_input_fused_diff(s_feats, q_points, s_points, neighbor_indices,
                            kernel_points, weights, sigma, bias, tile_m):
    """Input-layer fused KPConv (c_in == 1, features = network input).

    The backward propagates d_weights / d_bias only — the input features
    are the network input (the reference's first conv sees
    requires_grad=False features too), so d_s_feats is zero and the whole
    (M, H, 3) influence recompute disappears: the forward's t1 = influence
    row-sums (M, K) is the only residual d_weights needs."""
    return kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m,
    )


def _kpconv_input_fwd(s_feats, q_points, s_points, neighbor_indices,
                      kernel_points, weights, sigma, bias, tile_m):
    out, counts, t1 = kpconv_fused(
        s_feats, q_points, s_points, neighbor_indices, kernel_points, weights,
        sigma, bias=bias, tile_m=tile_m, return_count=True, return_t1=True,
    )
    res = (t1, counts, s_feats.shape, bias is not None)
    return out, res


def _kpconv_input_bwd(sigma, tile_m, res, dout):
    t1, counts, sf_shape, has_bias = res
    gdiv = dout / counts[:, None]
    # d_w[k, 0, d] = sum_m t1[m, k] * dout[m, d] / count[m]
    d_weights = jax.lax.dot_general(
        t1, gdiv, (((0,), (0,)), ((), ())),
    )[:, None, :]  # (K, 1, C_out)
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (jnp.zeros(sf_shape, dout.dtype), None, None, None, None,
            d_weights, d_bias)


kpconv_input_fused_diff.defvjp(_kpconv_input_fwd, _kpconv_input_bwd)


# ---------------------------------------------------------------------------
# Union-gather input-layer convolution.
#
# The stage-0 gathers sit on XLA's ~1.9 ns/row gather-engine floor: one row
# per EDGE (M * H ~ 1.4M rows on the demo pair). For the input-layer conv
# (c_in == 1, scalar features) no feature selection is needed, so the
# gather can fetch each query TILE's neighbor UNION instead (~3.3x fewer
# rows on scan-ordered clouds; preprocess.pyramid.build_union_tables) and
# the kernel evaluates influence against ALL union candidates, weighting
# each by its membership count B[t, u] = #slots of query t that reference
# candidate u (0 or 1 — neighbor lists are distinct). Geometry runs as
# HIGHEST-precision dots on absolute coordinates (exact-class; the
# offsets-first trick does not apply, q is subtracted inside the dot).
#
# MEASURED AND REJECTED as the default (demo pair: 44.3 -> 40.7 pairs/s):
# the union shrinks gather rows 3.3x (2.55 -> 0.8 ms) but the all-pairs
# influence evaluates U=1536 candidates per query vs H=40 edges — 38x the
# VPU geometry — which costs more than the gather saves. It would win only
# where unions are far denser (tiny radii / very redundant neighborhoods).
# Kept as a tested variant (enable via pad_registration_batch(union_cap=..)).
# ---------------------------------------------------------------------------

_UF = 16  # union-gather lanes: [s(3), |s|^2(1), pad(4), feat(1), pad(7)]


def _kpconv_union_input_kernel(ug_ref, q_ref, sel_ref, kp_ref, w_ref,
                               out_ref, *extras, num_kernel_points, sigma,
                               u_chunk, union_cap, has_count, has_t1):
    k = num_kernel_points
    extras = list(extras)
    count_ref = extras.pop(0) if has_count else None
    t1_ref = extras.pop(0) if has_t1 else None

    ug = ug_ref[...].reshape(union_cap, _UF)  # (U, 16)
    q = q_ref[...]
    sel = sel_ref[...]  # (T, H) int32, values in [0, U], U = no edge
    kp = kp_ref[...]
    tile, h = sel.shape
    qp = q[:, :3]
    q_sq = q[:, 3]

    hi = jax.lax.Precision.HIGHEST
    # extended operands fold |s|^2 and the feature into dots, so no
    # sublane->lane transposes are needed:
    #   ext_q  = [-2*q, 1]            (T, 4)
    #   ext_s  = [s, |s|^2]           (U, 4)
    #   dot -> -2 q.s + |s|^2         (T, U)  (+ q_sq -> |s - q|^2)
    ext_q = jnp.concatenate([-2.0 * qp, jnp.ones((tile, 1), qp.dtype)], axis=1)
    q_kp = jax.lax.dot_general(
        qp, kp[:, :3], (((1,), (1,)), ((), ())), precision=hi,
        preferred_element_type=jnp.float32,
    )  # (T, K)
    kc = 2.0 * q_kp + kp[:, 3][None, :]  # (T, K)

    t1 = jnp.zeros((tile, k), jnp.float32)
    count = jnp.zeros((tile,), jnp.float32)
    num_chunks = union_cap // u_chunk
    for c in range(num_chunks):
        lo = c * u_chunk
        sc = ug[lo : lo + u_chunk]  # (Uc, 16)
        ext_s = sc[:, :4]  # [s, |s|^2]
        d2q = jax.lax.dot_general(
            ext_q, ext_s, (((1,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        ) + q_sq[:, None]  # (T, Uc)
        s_kp = jax.lax.dot_general(
            kp[:, :3], sc[:, :3], (((1,), (1,)), ((), ())), precision=hi,
            preferred_element_type=jnp.float32,
        )  # (K, Uc)
        sq = (
            d2q[:, None, :]
            - 2.0 * s_kp[None, :, :]
            + kc[:, :, None]
        )  # (T, K, Uc)
        infl = jnp.maximum(
            1.0 - jnp.sqrt(jnp.maximum(sq, 1e-20)) / sigma, 0.0)
        # feature lane -> (1, Uc) via a selector dot (no transpose op)
        f_lane = jax.lax.dot_general(
            jnp.ones((1, 1), jnp.float32), sc[:, _UF - 8 : _UF - 7],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )  # (1, Uc)
        # membership: B[t, u] = sum_h [sel[t, h] == lo + u]
        iota_u = jax.lax.broadcasted_iota(
            jnp.int32, (tile, u_chunk), 1) + lo
        b = jnp.zeros((tile, u_chunk), jnp.float32)
        for hh in range(h):
            b = b + (sel[:, hh : hh + 1] == iota_u).astype(jnp.float32)
        wf = b * f_lane  # (T, Uc)
        t1 = t1 + jnp.sum(infl * wf[:, None, :], axis=2)
        count = count + jnp.sum(b * (f_lane > 0.0).astype(jnp.float32), axis=1)

    count = jnp.maximum(count, 1.0)
    acc = jax.lax.dot_general(
        t1.astype(MXU_DTYPE), w_ref[...][:, 0, :].astype(MXU_DTYPE),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )
    out_ref[...] = acc / count[:, None]
    if count_ref is not None:
        count_ref[...] = jnp.broadcast_to(count[:, None], count_ref.shape)
    if t1_ref is not None:
        t1_ref[...] = t1


def kpconv_union_input_fused(
    s_feats, q_points, s_points, union_rows, union_sel, kernel_points,
    weights, sigma, bias=None, tile_m=128, u_chunk=512, interpret=None,
    return_count=False, return_t1=False,
):
    """Union-gather input-layer KPConv forward (c_in == 1).

    Args:
        union_rows: (ceil(M/tile_m), U) int32 per-tile support unions,
            sentinel N (build_union_tables with the SAME tile_m).
        union_sel: (M, H) int32 union positions per edge, sentinel U.
        (remaining args as kpconv_fused.)
    """
    m = q_points.shape[0]
    k, c_in, c_out = weights.shape
    assert c_in == 1
    num_tiles, union_cap = union_rows.shape
    assert num_tiles == -(-m // tile_m), "union tables built for another tile"
    assert union_cap % u_chunk == 0

    aug = jnp.concatenate([
        s_points,
        jnp.sum(s_points**2, axis=-1, keepdims=True),
        jnp.zeros((s_points.shape[0], 4), s_points.dtype),
        s_feats,
        jnp.zeros((s_points.shape[0], _UF - 9), s_points.dtype),
    ], axis=1)  # (N, 16)
    ug = gather_with_shadow(aug, union_rows, 0.0)  # (T, U, 16)

    q_aug = jnp.concatenate([
        q_points, jnp.sum(q_points**2, axis=-1, keepdims=True),
        jnp.zeros((m, _AUG - 4), q_points.dtype),
    ], axis=1)
    kp_aug = jnp.concatenate([
        kernel_points, jnp.sum(kernel_points**2, -1, keepdims=True),
        jnp.zeros((k, _AUG - 4), kernel_points.dtype),
    ], axis=1)

    pad_m = num_tiles * tile_m
    sel = union_sel
    if pad_m != m:
        q_aug = jnp.pad(q_aug, ((0, pad_m - m), (0, 0)))
        sel = jnp.pad(sel, ((0, pad_m - m), (0, 0)),
                      constant_values=union_cap)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _kpconv_union_input_kernel, num_kernel_points=k, sigma=float(sigma),
        u_chunk=u_chunk, union_cap=union_cap,
        has_count=return_count, has_t1=return_t1,
    )
    out_specs = [pl.BlockSpec((tile_m, c_out), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((pad_m, c_out), jnp.float32)]
    if return_count:
        out_specs.append(pl.BlockSpec((tile_m, 8), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, 8), jnp.float32))
    if return_t1:
        out_specs.append(pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, k), jnp.float32))
    single = len(out_specs) == 1
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((1, union_cap, _UF), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, _AUG), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, sel.shape[1]), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _AUG), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs[0] if single else tuple(out_specs),
        out_shape=out_shape[0] if single else tuple(out_shape),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(ug, q_aug, sel, kp_aug, weights)
    rest = list(out) if isinstance(out, (tuple, list)) else [out]
    result = rest.pop(0)[:m]
    if bias is not None:
        result = result + bias
    outs = (result,)
    if return_count:
        outs = outs + (rest.pop(0)[:m, 0],)
    if return_t1:
        outs = outs + (rest.pop(0)[:m],)
    return outs if len(outs) > 1 else outs[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 9))
def kpconv_union_input_fused_diff(s_feats, q_points, s_points, union_rows,
                                  union_sel, kernel_points, weights, sigma,
                                  bias, tile_m):
    """Differentiable union-gather input-layer KPConv: same t1-residual
    backward as :func:`kpconv_input_fused_diff` (zero feature gradients)."""
    return kpconv_union_input_fused(
        s_feats, q_points, s_points, union_rows, union_sel, kernel_points,
        weights, sigma, bias=bias, tile_m=tile_m,
    )


def _kpconv_union_input_fwd(s_feats, q_points, s_points, union_rows,
                            union_sel, kernel_points, weights, sigma, bias,
                            tile_m):
    out, counts, t1 = kpconv_union_input_fused(
        s_feats, q_points, s_points, union_rows, union_sel, kernel_points,
        weights, sigma, bias=bias, tile_m=tile_m,
        return_count=True, return_t1=True,
    )
    return out, (t1, counts, s_feats.shape, bias is not None)


def _kpconv_union_input_bwd(sigma, tile_m, res, dout):
    t1, counts, sf_shape, has_bias = res
    gdiv = dout / counts[:, None]
    d_weights = jax.lax.dot_general(
        t1, gdiv, (((0,), (0,)), ((), ())),
    )[:, None, :]
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (jnp.zeros(sf_shape, dout.dtype), None, None, None, None, None,
            d_weights, d_bias)


kpconv_union_input_fused_diff.defvjp(
    _kpconv_union_input_fwd, _kpconv_union_input_bwd)


# ---------------------------------------------------------------------------
# Neighbor-table column split ("deep-column compaction").
#
# Both the XLA gather and the kernel's read of the gathered block cost
# ~rows x one padded tile-row (see module docstring), and neighbor tables
# carry large shadow fractions under the calibrated limits (measured on the
# bench pairs: 23-31% valid at KITTI stage 0 — the table is 69-77% padding;
# ~74% valid on 3DMatch). Splitting each table into a HEAD (first H1
# distance-sorted columns, all queries) and a compacted TAIL (columns
# [H1:], only the M2 queries with more than H1 valid neighbors) cuts
# gathered rows to M*H1 + M2*(H-H1) with NO semantic change: the head/tail
# union is exactly the original neighbor set, the two partial convolutions
# accumulate, and one (M, C+1[+Cp]) combine-gather (rank -> tail row,
# sentinel -> zero row) reassembles outputs, counts, and pooled features.
# M2 and H1 are static calibrated capacities with the same overflow
# contract as every other cap (preprocess.pyramid.build_split_tables).
# ---------------------------------------------------------------------------


def kpconv_split_fused(
    s_feats, q_points, s_points, head_table, tail_table, tail_q, tail_rank,
    kernel_points, weights, sigma, bias=None, tile_m=128,
    pool_feats=None, pool_cols=None, return_t1=False, return_gathered=False,
    interpret=None, q_mask=None,
):
    """Split-table fused KPConv forward.

    Args:
        head_table: (M, H1) first columns for every query.
        tail_table: (M2, H - H1) remaining columns, deep queries only,
            ascending query order; padding rows are all-sentinel.
        tail_q: (M2,) int32 query row per tail row (0 for padding rows —
            harmless, their table rows are all-sentinel).
        tail_rank: (M,) int32 query row -> tail row, sentinel M2.
        (rest as kpconv_fused.)

    Returns (out [, pooled] [, t1] [, counts] [, g1, nb1, g2, nb2]):
        counts is always returned (total valid-neighbor count, the
        normalization denominator — backward residual).
    """
    m = q_points.shape[0]
    m2 = tail_table.shape[0]
    k, c_in, c_out = weights.shape
    c_pool = 0 if pool_feats is None else pool_feats.shape[1]
    h1 = head_table.shape[1]
    # a head covering the whole true pool width would make the combine's
    # zero-fill max() clamp full rows the reference never clamps
    assert pool_cols is None or h1 < pool_cols, (h1, pool_cols)

    head = kpconv_fused(
        s_feats, q_points, s_points, head_table, kernel_points, weights,
        sigma, bias=None, tile_m=tile_m, normalize=False, return_count=True,
        return_t1=return_t1, return_gathered=return_gathered,
        pool_feats=pool_feats,
        pool_cols=min(pool_cols, h1) if pool_cols is not None else None,
        interpret=interpret, q_mask=q_mask,
    )
    q_tail = q_points[tail_q]
    pool_cols_tail = None
    if pool_cols is not None:
        pool_cols_tail = max(pool_cols - h1, 1)
    tail = kpconv_fused(
        s_feats, q_tail, s_points, tail_table, kernel_points, weights,
        sigma, bias=None, tile_m=tile_m, normalize=False, return_count=True,
        return_t1=return_t1, return_gathered=return_gathered,
        pool_feats=pool_feats, pool_cols=pool_cols_tail,
        interpret=interpret,
    )

    def unpack(res):
        res = list(res)
        out = {"acc": res.pop(0)}
        if pool_feats is not None:
            out["pooled"] = res.pop(0)
        out["count"] = res.pop(0)
        if return_t1:
            out["t1"] = res.pop(0)
        if return_gathered:
            out["g"] = res.pop(0)
            out["nb"] = res.pop(0)
        return out

    h = unpack(head)
    t = unpack(tail)

    # One combine-gather: pack every tail quantity into (M2, W) lanes, add a
    # zero row for the sentinel rank, gather by rank.
    parts = [t["acc"], t["count"][:, None]]
    if pool_feats is not None:
        parts.append(t["pooled"])
    if return_t1:
        parts.append(t["t1"])
    pack = jnp.concatenate(parts, axis=1)
    pack = jnp.concatenate([pack, jnp.zeros((1, pack.shape[1]), pack.dtype)], 0)
    comb = pack[tail_rank]  # (M, W)

    count = jnp.maximum(h["count"] + comb[:, c_out], 1.0)
    ofs = c_out + 1
    t1_comb = None
    if return_t1:
        t1_comb = h["t1"] + comb[:, ofs + c_pool:ofs + c_pool + k]
    if t1_comb is not None and c_in == 1:
        # Input layer: the full-table kernel rounds t1 to bf16 ONCE before
        # the weight matmul; summing two separately-rounded partial accs
        # would differ at bf16 eps. Redo the (M, K) @ (K, C) matmul on the
        # exact combined f32 t1 — bit-identical to the unsplit kernel.
        acc = jax.lax.dot_general(
            t1_comb.astype(MXU_DTYPE), weights[:, 0, :].astype(MXU_DTYPE),
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
        )
    else:
        acc = h["acc"] + comb[:, :c_out]
    out = acc / count[:, None]
    if bias is not None:
        out = out + bias
    results = (out,)
    if pool_feats is not None:
        # shadow semantics: missing tail rows behave as the zero shadow row
        results += (jnp.maximum(h["pooled"], comb[:, ofs:ofs + c_pool]),)
        ofs += c_pool
    if return_t1:
        results += (t1_comb,)
    results += (count,)
    if return_gathered:
        results += (h["g"], h["nb"], t["g"], t["nb"])
    return results


@functools.partial(jax.custom_vjp, nondiff_argnums=(10, 12))
def kpconv_split_diff(s_feats, q_points, s_points, head_table, tail_table,
                      tail_q, tail_rank, inverse_table, kernel_points,
                      weights, sigma, bias, tile_m, q_mask=None):
    """Differentiable split-table fused KPConv.

    With `inverse_table` the backward is the scatter-free inverse-table
    kernel (kpconv_bwd_fused, which covers ALL edges regardless of the
    split); without it, a two-block gathered-residual scatter backward.
    """
    out, _ = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        q_mask=q_mask,
    )
    return out


def _kpconv_split_fwd(s_feats, q_points, s_points, head_table, tail_table,
                      tail_q, tail_rank, inverse_table, kernel_points,
                      weights, sigma, bias, tile_m, q_mask=None):
    keep_blocks = inverse_table is None
    res_f = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        return_gathered=keep_blocks, q_mask=q_mask,
    )
    out, counts = res_f[0], res_f[1]
    blocks = res_f[2:] if keep_blocks else None
    res = (s_feats, q_points, s_points, counts, tail_q, inverse_table,
           kernel_points, weights, bias is not None, blocks)
    return out, res


def _split_blocks_bwd(blocks, q_points, tail_q, kernel_points, weights,
                      sigma, n, gdiv):
    """Two-block gathered-residual backward (no inverse table)."""
    g1, nb1, g2, nb2 = blocks
    c_in = weights.shape[1]
    d_w = jnp.zeros_like(weights)
    d_sf = jnp.zeros((n + 1, c_in), gdiv.dtype)
    for g, nb, qp, gd in (
        (g1, nb1, q_points, gdiv),
        (g2, nb2, q_points[tail_q], gdiv[tail_q]),
    ):
        influence, nf, _ = _influence_and_count_from_gathered(
            g, qp, kernel_points, sigma, c_in)
        t = jnp.einsum("mhk,mhc->mkc", influence, nf)
        d_w = d_w + jnp.einsum("mkc,md->kcd", t, gd)
        d_nf = jnp.einsum(
            "mhk,mkc->mhc", influence,
            jnp.einsum("kcd,md->mkc", weights, gd))
        d_sf = d_sf.at[nb].add(d_nf)
    return d_sf[:n], d_w


def _kpconv_split_bwd(sigma, tile_m, res, dout):
    (s_feats, q_points, s_points, counts, tail_q, inverse_table,
     kernel_points, weights, has_bias, blocks) = res
    gdiv = dout / counts[:, None]
    if inverse_table is not None:
        d_s_feats, d_weights = kpconv_bwd_fused(
            s_feats, s_points, q_points, gdiv, inverse_table, kernel_points,
            weights, sigma,
        )
    else:
        d_s_feats, d_weights = _split_blocks_bwd(
            blocks, q_points, tail_q, kernel_points, weights, sigma,
            s_feats.shape[0], gdiv)
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (d_s_feats, None, None, None, None, None, None, None, None,
            d_weights, d_bias, None)


kpconv_split_diff.defvjp(_kpconv_split_fwd, _kpconv_split_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(11, 13, 14))
def kpconv_split_pool_diff(s_feats, pool_feats, q_points, s_points,
                           head_table, tail_table, tail_q, tail_rank,
                           inverse_table, kernel_points, weights, sigma,
                           bias, tile_m, pool_cols, q_mask=None):
    """Differentiable split-table fused KPConv + strided-shortcut maxpool."""
    out, pooled, _ = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        pool_feats=pool_feats, pool_cols=pool_cols, q_mask=q_mask,
    )
    return out, pooled


def _split_pool_ties(blocks, pooled, tail_q, tail_rank, c_in, pool_cols, h1):
    """Tie counts for the maxpool backward, summed over both blocks."""
    g1, _, g2, _ = blocks
    cols1 = min(pool_cols, h1)
    cols2 = max(pool_cols - h1, 1)
    pb1 = g1[:, :cols1, _AUG + c_in:]
    ties = jnp.sum((pb1 == pooled[:, None, :]).astype(jnp.float32), axis=1)
    # tail rows compare against THEIR query's pooled value, then the
    # per-query tie count comes back through the rank gather (sentinel ->
    # appended zero row). Padding tail rows (tail_q == 0, all-shadow block
    # rows) may count spurious ties against query 0 but are never gathered.
    pb2 = g2[:, :cols2, _AUG + c_in:]
    ties2_rows = jnp.sum(
        (pb2 == pooled[tail_q][:, None, :]).astype(jnp.float32), axis=1)
    ties2_rows = jnp.concatenate(
        [ties2_rows, jnp.zeros((1, ties2_rows.shape[1]), jnp.float32)], 0)
    ties2 = ties2_rows[tail_rank]
    return jnp.maximum(ties + ties2, 1.0)


def _kpconv_split_pool_fwd(s_feats, pool_feats, q_points, s_points,
                           head_table, tail_table, tail_q, tail_rank,
                           inverse_table, kernel_points, weights, sigma,
                           bias, tile_m, pool_cols, q_mask=None):
    res_f = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        pool_feats=pool_feats, pool_cols=pool_cols, return_gathered=True,
        q_mask=q_mask,
    )
    out, pooled, counts = res_f[0], res_f[1], res_f[2]
    blocks = res_f[3:]
    c_in = weights.shape[1]
    h1 = head_table.shape[1]
    ties = _split_pool_ties(
        blocks, pooled, tail_q, tail_rank, c_in, pool_cols, h1)
    keep_blocks = blocks if inverse_table is None else None
    res = (s_feats, pool_feats, q_points, s_points, counts, tail_q,
           tail_rank, inverse_table, kernel_points, weights, bias is not None,
           pooled, ties, keep_blocks, h1)
    return (out, pooled), res


def _kpconv_split_pool_bwd(sigma, tile_m, pool_cols, res, cotangents):
    dout, dpool = cotangents
    (s_feats, pool_feats, q_points, s_points, counts, tail_q, tail_rank,
     inverse_table, kernel_points, weights, has_bias, pooled, ties, blocks,
     h1) = res
    gdiv = dout / counts[:, None]
    if inverse_table is not None:
        d_s_feats, d_weights, d_pool_feats = kpconv_bwd_fused(
            s_feats, s_points, q_points, gdiv, inverse_table, kernel_points,
            weights, sigma,
            pool_feats=pool_feats, pooled=pooled,
            dpool_over_ties=dpool / ties,
        )
    else:
        d_s_feats, d_weights = _split_blocks_bwd(
            blocks, q_points, tail_q, kernel_points, weights, sigma,
            s_feats.shape[0], gdiv)
        # maxpool backward over both blocks, even tie split (XLA semantics)
        g1, nb1, g2, nb2 = blocks
        c_in = weights.shape[1]
        n = s_feats.shape[0]
        dpr = dpool / ties
        cols1 = min(pool_cols, h1)
        pb1 = g1[:, :cols1, _AUG + c_in:]
        rows1 = (pb1 == pooled[:, None, :]).astype(dpr.dtype) * dpr[:, None, :]
        d_pool_feats = (
            jnp.zeros((n + 1, pb1.shape[2]), dpr.dtype)
            .at[nb1[:, :cols1]].add(rows1)[:n]
        )
        cols2 = max(pool_cols - h1, 1)
        pb2 = g2[:, :cols2, _AUG + c_in:]
        # per-tail-row query quantities (padding tail rows index query 0,
        # but their all-shadow block rows scatter onto the dropped shadow
        # row, so any spurious match contributes nothing)
        pooled2 = pooled[tail_q]
        dpr2 = dpr[tail_q]
        rows2 = (pb2 == pooled2[:, None, :]).astype(dpr.dtype) * dpr2[:, None, :]
        d_pool_feats = d_pool_feats + (
            jnp.zeros((n + 1, pb2.shape[2]), dpr.dtype)
            .at[nb2[:, :cols2]].add(rows2)[:n]
        )
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (d_s_feats, d_pool_feats, None, None, None, None, None, None,
            None, None, d_weights, d_bias, None)


kpconv_split_pool_diff.defvjp(_kpconv_split_pool_fwd, _kpconv_split_pool_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 11))
def kpconv_split_input_diff(s_feats, q_points, s_points, head_table,
                            tail_table, tail_q, tail_rank, kernel_points,
                            weights, sigma, bias, tile_m, q_mask=None):
    """Split-table input-layer fused KPConv (c_in == 1; t1-residual
    backward, zero feature gradients — see kpconv_input_fused_diff)."""
    out, _, _ = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        return_t1=True, q_mask=q_mask,
    )
    return out


def _kpconv_split_input_fwd(s_feats, q_points, s_points, head_table,
                            tail_table, tail_q, tail_rank, kernel_points,
                            weights, sigma, bias, tile_m, q_mask=None):
    out, t1, counts = kpconv_split_fused(
        s_feats, q_points, s_points, head_table, tail_table, tail_q,
        tail_rank, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        return_t1=True, q_mask=q_mask,
    )
    return out, (t1, counts, s_feats.shape, bias is not None)


def _kpconv_split_input_bwd(sigma, tile_m, res, dout):
    t1, counts, sf_shape, has_bias = res
    gdiv = dout / counts[:, None]
    d_weights = jax.lax.dot_general(
        t1, gdiv, (((0,), (0,)), ((), ())),
    )[:, None, :]
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (jnp.zeros(sf_shape, dout.dtype), None, None, None, None, None,
            None, None, d_weights, d_bias, None)


kpconv_split_input_diff.defvjp(_kpconv_split_input_fwd, _kpconv_split_input_bwd)


# ---------------------------------------------------------------------------
# Edge-stream input-layer convolution (gather-free).
#
# The input conv's gathered block is PURE BATCH DATA: its features are the
# network INPUT (ones / loader-provided), so offsets, validity flag, and
# feature value per (query, neighbor) slot are all known at collate time.
# Streaming them as precomputed H-on-lanes planes removes the stage-0
# gather entirely (XLA's gather engine is row-rate-bound at ~1.9 ns/row —
# ~2.1 ms for the demo pair's 1.1M edge rows) AND shrinks the kernel-side
# read from one 512 B tile-row per EDGE to five per QUERY (~6x fewer
# bytes at H=40). The host builds the stream with one vectorized numpy
# fancy-index inside the loader workers — the same place the reference
# pays its nanoflann searches (`utils/data.py:13-77`); on-device pyramid
# builds emit it with a single gather per batch.
#
# Geometry runs in exact f32 on the VPU (offsets are precomputed, so there
# is no in-kernel matmul to hit Mosaic's single-pass-bf16 lowering).
# ---------------------------------------------------------------------------

# stream plane indices: offsets, positive-feature flag, feature value
_STREAM_PLANES = 5  # [off_x, off_y, off_z, posflag, feat]


def _kpconv_stream_kernel(st_ref, kp_ref, w_ref, out_ref, *extras,
                          num_kernel_points, sigma, has_count, has_t1,
                          normalize=True):
    k = num_kernel_points
    extras = list(extras)
    count_ref = extras.pop(0) if has_count else None
    t1_ref = extras.pop(0) if has_t1 else None

    st = st_ref[...]  # (5, TM, H) f32
    ox, oy, oz = st[0], st[1], st[2]
    flag = st[3]
    feat = st[4]
    kp = kp_ref[...]  # (K, 8) f32: [kp(3), |kp|^2, pad]

    count_raw = jnp.sum(flag, axis=1)  # (TM,)
    count = jnp.maximum(count_raw, 1.0) if normalize else count_raw

    off2 = ox * ox + oy * oy + oz * oz  # (TM, H)
    cols = []
    for kk in range(k):
        dot = ox * kp[kk, 0] + oy * kp[kk, 1] + oz * kp[kk, 2]
        sq = off2 - 2.0 * dot + kp[kk, 3]
        infl = jnp.maximum(1.0 - jnp.sqrt(jnp.maximum(sq, 1e-20)) / sigma, 0.0)
        cols.append(jnp.sum(infl * feat, axis=1, keepdims=True))  # (TM, 1)
    t1 = jnp.concatenate(cols, axis=1)  # (TM, K)

    acc = jax.lax.dot_general(
        t1.astype(MXU_DTYPE), w_ref[...][:, 0, :].astype(MXU_DTYPE),
        (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
    )  # (TM, C_out)
    out_ref[...] = acc / count[:, None] if normalize else acc
    if count_ref is not None:
        count_ref[...] = jnp.broadcast_to(count[:, None], count_ref.shape)
    if t1_ref is not None:
        t1_ref[...] = t1


def kpconv_stream_fused(stream, kernel_points, weights, sigma, bias=None,
                        tile_m=256, interpret=None, return_count=False,
                        return_t1=False, normalize=True):
    """Gather-free input-layer KPConv from a precomputed edge stream.

    Args:
        stream: (5, M, H) float32 planes [off_x, off_y, off_z, posflag,
            feat] — offsets s[n(m, h)] - q[m] with zeros (and flag/feat 0)
            on invalid slots (preprocess.pyramid.build_input_stream).
        kernel_points: (K, 3).
        weights: (K, 1, C_out) — input layer, c_in == 1.
        sigma: influence radius.

    Returns:
        (M, C_out) float32 [, counts (M,)] [, t1 (M, K)].
    """
    _, m, h = stream.shape
    k, c_in, c_out = weights.shape
    assert c_in == 1, "edge-stream path is the c_in == 1 input layer"
    assert stream.shape[0] == _STREAM_PLANES

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
        stream = jnp.pad(stream, ((0, 0), (0, pad_m - m), (0, 0)))

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _kpconv_stream_kernel, num_kernel_points=k, sigma=float(sigma),
        has_count=return_count, has_t1=return_t1, normalize=normalize,
    )
    out_specs = [pl.BlockSpec((tile_m, c_out), lambda i: (i, 0),
                              memory_space=pltpu.VMEM)]
    out_shape = [jax.ShapeDtypeStruct((pad_m, c_out), jnp.float32)]
    if return_count:
        out_specs.append(pl.BlockSpec((tile_m, 8), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, 8), jnp.float32))
    if return_t1:
        out_specs.append(pl.BlockSpec((tile_m, k), lambda i: (i, 0),
                                      memory_space=pltpu.VMEM))
        out_shape.append(jax.ShapeDtypeStruct((pad_m, k), jnp.float32))
    if len(out_specs) == 1:
        out_specs, out_shape = out_specs[0], out_shape[0]
    else:
        out_specs, out_shape = tuple(out_specs), tuple(out_shape)
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((_STREAM_PLANES, tile_m, h), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, _AUG), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(stream, kp_aug, weights)
    rest = list(out) if isinstance(out, (tuple, list)) else [out]
    out = rest.pop(0)[:m]
    if bias is not None:
        out = out + bias
    results = (out,)
    if return_count:
        results = results + (rest.pop(0)[:m, 0],)
    if return_t1:
        results = results + (rest.pop(0)[:m],)
    return results if len(results) > 1 else results[0]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 5))
def kpconv_stream_input_diff(stream, kernel_points, weights, sigma, bias,
                             tile_m):
    """Differentiable edge-stream input conv: d_weights / d_bias only
    (the stream is batch geometry; features are the network input, so
    feature gradients are zero — same contract as kpconv_input_fused_diff)."""
    return kpconv_stream_fused(
        stream, kernel_points, weights, sigma, bias=bias, tile_m=tile_m)


def _kpconv_stream_fwd(stream, kernel_points, weights, sigma, bias, tile_m):
    out, counts, t1 = kpconv_stream_fused(
        stream, kernel_points, weights, sigma, bias=bias, tile_m=tile_m,
        return_count=True, return_t1=True,
    )
    return out, (t1, counts, stream.shape, bias is not None)


def _kpconv_stream_bwd(sigma, tile_m, res, dout):
    t1, counts, st_shape, has_bias = res
    gdiv = dout / counts[:, None]
    d_weights = jax.lax.dot_general(
        t1, gdiv, (((0,), (0,)), ((), ())),
    )[:, None, :]  # (K, 1, C_out)
    d_bias = jnp.sum(dout, axis=0) if has_bias else None
    return (jnp.zeros(st_shape, dout.dtype), None, d_weights, d_bias)


kpconv_stream_input_diff.defvjp(_kpconv_stream_fwd, _kpconv_stream_bwd)
