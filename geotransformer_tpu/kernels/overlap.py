r"""Pallas TPU kernel: ground-truth patch-overlap computation.

The XLA path of :func:`geotransformer_tpu.models.matching.get_node_correspondences`
streams (chunk, S, K, K) distance/match tensors through HBM inside a
``lax.map`` (~6 ms per training step on the demo pair — GT overlaps are
recomputed per step like the reference's on-device no_grad block,
`/root/reference/geotransformer/modules/ops/point_to_node_partition.py` +
`model.py:get_node_correspondences`). This kernel keeps everything in VMEM:
for each (ref node, candidate) pair it computes the K x K patch distance
matrix as one HIGHEST-precision MXU dot (geometry must not run at Mosaic's
single-pass-bf16 default), thresholds, masks, and reduces to the
overlap = 0.5 * (ref_cover / ref_total + src_cover / src_total).

Forward-only by construction: overlaps are training TARGETS (the reference
computes them under no_grad) and depend only on the batch geometry.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _overlap_kernel(rk_ref, rm_ref, sk_ref, sm_ref, out_ref, *, s_cand,
                    k_patch, r2, s_chunk):
    # rk: (TC, K, 8) ref patch points [xyz, pad]; rm: (TC, K) 0/1
    # sk: (TC, S, K, 8) candidate patch points (already transformed);
    # sm: (TC, S, K) 0/1; out: (TC, S) overlaps
    tc = rk_ref.shape[0]
    k = k_patch
    rk = rk_ref[...][:, :, :3]  # (TC, K, 3)
    rm = rm_ref[...]
    sk = sk_ref[...][:, :, :, :3]  # (TC, S, K, 3)
    sm = sm_ref[...]

    ref_total = jnp.maximum(jnp.sum(rm, axis=1), 1.0)  # (TC,)
    src_total = jnp.maximum(jnp.sum(sm, axis=2), 1.0)  # (TC, S)

    # Static loop over candidate chunks: only one chunk's (TC*SC, K, K)
    # temporaries are live at a time, bounding the kernel's VMEM stack (at
    # KITTI shapes S=64, K=128 the unchunked temporaries alone are ~100 MB).
    # Within a chunk, one batched dot covers all (ref node, candidate)
    # pairs — a per-candidate python loop would issue S tiny matmuls per
    # tile (MXU latency-bound).
    for c0 in range(0, s_cand, s_chunk):
        sc = min(s_chunk, s_cand - c0)
        sk_flat = sk[:, c0:c0 + sc].reshape(tc * sc, k, 3)
        rk_b = jnp.broadcast_to(rk[:, None], (tc, sc, k, 3))
        rk_flat = rk_b.reshape(tc * sc, k, 3)
        dots = jax.lax.dot_general(
            rk_flat, sk_flat, (((2,), (2,)), ((0,), (0,))),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # (TC*SC, K, K)
        r_sq = jnp.sum(rk_flat * rk_flat, axis=2)  # (TC*SC, K)
        s_sq = jnp.sum(sk_flat * sk_flat, axis=2)  # (TC*SC, K)
        d2 = r_sq[:, :, None] - 2.0 * dots + s_sq[:, None, :]
        rm_flat = jnp.broadcast_to(rm[:, None], (tc, sc, k)).reshape(
            tc * sc, k)
        sm_flat = sm[:, c0:c0 + sc].reshape(tc * sc, k)
        match = (
            (d2 < r2).astype(jnp.float32)
            * rm_flat[:, :, None]
            * sm_flat[:, None, :]
        )  # (TC*SC, K, K)
        ref_cover = jnp.sum(jnp.max(match, axis=2), axis=1).reshape(tc, sc)
        src_cover = jnp.sum(jnp.max(match, axis=1), axis=1).reshape(tc, sc)
        out_ref[:, c0:c0 + sc] = 0.5 * (
            ref_cover / ref_total[:, None]
            + src_cover / src_total[:, c0:c0 + sc])


def _auto_s_chunk(tile_c, s_cand, k_patch, budget_bytes=48 * 1024 * 1024):
    """Largest in-kernel candidate chunk keeping the three live
    (TC*SC, K, K) f32 temporaries (dots, d2, match) under budget. Mosaic
    blocked tiles need the sublane axis in multiples of 8, so the ref-node
    tile cannot shrink below 8 — the candidate axis chunks instead. At
    KITTI shapes (S=64, K=128) the unchunked stack measured 102 MB,
    over the 100 MB scoped limit."""
    per_s = tile_c * 3 * k_patch * k_patch * 4
    s_chunk = s_cand
    while s_chunk > 1 and s_chunk * per_s > budget_bytes:
        s_chunk = -(-s_chunk // 2)
    return s_chunk


def patch_overlaps(ref_knn_points, ref_knn_masks, cand_knn_points,
                   cand_knn_masks, pos_radius, tile_c=8, interpret=None):
    """Per-(ref node, candidate) patch overlaps, VMEM-resident.

    Args:
        ref_knn_points: (M, K, 3) ref patches.
        ref_knn_masks: (M, K) bool.
        cand_knn_points: (M, S, K, 3) candidate src patches (transformed).
        cand_knn_masks: (M, S, K) bool.
        pos_radius: matching radius.
        tile_c: ref nodes per grid step (sublane multiple, >= 8).

    Returns:
        (M, S) float32 overlaps in [0, 1] (unmasked slots give garbage the
        caller zeroes with its candidate mask).
    """
    m, k_patch, _ = ref_knn_points.shape
    s_cand = cand_knn_points.shape[1]

    def aug(x):
        pad = jnp.zeros(x.shape[:-1] + (5,), x.dtype)
        return jnp.concatenate([x, pad], axis=-1)

    rk = aug(ref_knn_points)
    sk = aug(cand_knn_points)
    rm = ref_knn_masks.astype(jnp.float32)
    sm = cand_knn_masks.astype(jnp.float32)

    num_tiles = -(-m // tile_c)
    pad_m = num_tiles * tile_c
    if pad_m != m:
        rk = jnp.pad(rk, ((0, pad_m - m), (0, 0), (0, 0)))
        rm = jnp.pad(rm, ((0, pad_m - m), (0, 0)))
        sk = jnp.pad(sk, ((0, pad_m - m), (0, 0), (0, 0), (0, 0)))
        sm = jnp.pad(sm, ((0, pad_m - m), (0, 0), (0, 0)))

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _overlap_kernel, s_cand=s_cand, k_patch=k_patch,
        r2=float(pos_radius) ** 2,
        s_chunk=_auto_s_chunk(tile_c, s_cand, k_patch),
    )
    out = pl.pallas_call(
        kernel,
        grid=(num_tiles,),
        in_specs=[
            pl.BlockSpec((tile_c, k_patch, 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, k_patch), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, s_cand, k_patch, 8), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_c, s_cand, k_patch), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_c, s_cand), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((pad_m, s_cand), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(rk, rm, sk, sm)
    return out[:m]
