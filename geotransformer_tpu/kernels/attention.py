r"""Pallas TPU kernel for the RPE pair-bias score contraction.

The RPE attention's pair-embedding bias (reference
`modules/transformer/rpe_transformer.py:54-59`, reassociated to the query
side by models/transformer._PairBiasProjection) costs

    scores_p[h, i, j] = sum_c qw[i, h, c] * e[i, j, c]

per self-attention layer. The XLA lowering is a clean fusion, but it is
bandwidth-bound on re-reading the once-materialized (N, N, C) geometric
embedding (~210 MB bf16 at the 3DMatch calibrated cap, ~0.28 ms/layer/cloud
= the HBM floor), and it cannot skip the padding band: at dataset-calibrated
capacities only ~40% (ref) / ~22% (src) of the (N, N) rectangle is real.

This kernel reads each embedding tile once and skips tiles entirely outside
the valid rectangle (rows/cols are a valid PREFIX per cloud — the same
contract as kernels/gse.py's valid-rectangle skip, whose zeros this kernel
then never reads). Skipped tiles write zeros; padded queries are zeroed at
the transformer output and padded keys are masked in softmax, so zeros are
exact.

The skip must elide the tile DMA, not just the MXU work — the op is
bandwidth-bound, so a ``pl.when`` compute skip alone measures 0.000 ms
faster (verified: 0.278 ms/layer/cloud either way, the embedding-read
floor). The embedding block index_map therefore CLAMPS out-of-rectangle
grid steps to the last valid block (scalar-prefetched n_valid): Mosaic's
pipeline skips the fetch when consecutive grid steps map to the same
block, so the padding band costs one redundant (elided) re-visit instead
of a 4 MB fetch per tile. Rows past the valid band clamp BOTH coordinates
so the entire tail of the grid degenerates to one block.

MXU mapping: the contraction is diagonal in i (both operands indexed by the
query row), which would naively lower to per-row (H, C) @ (C, TJ) matmuls —
pure MXU latency at H=4. Instead each 8-query subtile runs ONE
(8H, C) @ (C, 8*TJ) dot computing all 64 (query, query') combinations, and
the 8 wanted diagonal blocks are folded out with static slices + row masks
(exact f32 adds — no selection matmul, which Mosaic would run at bf16).
The 8x extra MXU work is free: the kernel stays DMA-bound on the embedding
read (~134 MFLOP vs ~4 MB per grid step).

Numerics match the XLA fusion's class: operands cast to bf16, f32
accumulation (XLA casts qw to bf16 in the fused einsum; Mosaic f32 matmuls
are a single bf16 pass regardless — see README "Performance").
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MXU_DTYPE = jnp.bfloat16
_SUB = 8  # query rows per MXU dot (one sublane group)


def _clamped_index_maps(tile_i, tile_j):
    """Block index maps that clamp out-of-rectangle grid steps to the last
    valid block (consecutive identical indices => Mosaic elides the DMA)."""

    def _clamp(i, j, nv_ref):
        last_i = (jnp.maximum(nv_ref[0], 1) - 1) // tile_i
        last_j = (jnp.maximum(nv_ref[1], 1) - 1) // tile_j
        ci = jnp.minimum(i, last_i)
        # past the last valid row, clamp j too: the whole grid tail maps to
        # one block, so it costs a single (elided) revisit
        cj = jnp.where(i <= last_i, jnp.minimum(j, last_j), last_j)
        return ci, cj

    def embed_map(i, j, nv_ref):
        ci, cj = _clamp(i, j, nv_ref)
        return ci, cj, 0

    def qw_map(i, j, nv_ref):
        ci, _ = _clamp(i, j, nv_ref)
        return ci, 0

    return embed_map, qw_map


def _pair_scores_kernel(nv_ref, e_ref, qw_ref, out_ref, *, num_heads,
                        tile_i, tile_j):
    h = num_heads
    c = e_ref.shape[-1]
    nv_q = nv_ref[0]
    nv_k = nv_ref[1]
    tile_valid = jnp.logical_and(
        pl.program_id(0) * tile_i < nv_q, pl.program_id(1) * tile_j < nv_k
    )

    @pl.when(jnp.logical_not(tile_valid))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _compute():
        rows = jax.lax.broadcasted_iota(jnp.int32, (_SUB * h, 1), 0) // h
        for s in range(tile_i // _SUB):
            e_v = e_ref[s * _SUB : (s + 1) * _SUB]  # (8, TJ, C)
            # leading-dim merge (row i*TJ+j) — free relayout, same class as
            # the gse.py basis reshape
            e_rs = e_v.reshape(_SUB * tile_j, c)
            qw_v = qw_ref[s * _SUB * h : (s + 1) * _SUB * h]  # (8h, C)
            m = jax.lax.dot_general(
                qw_v.astype(MXU_DTYPE), e_rs.astype(MXU_DTYPE),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (8h, 8*TJ): m[i*h+hh, i'*TJ+j] = qw[i,hh] . e[i',j]
            res = jnp.zeros((_SUB * h, tile_j), jnp.float32)
            for b in range(_SUB):
                res = res + jnp.where(
                    rows == b, m[:, b * tile_j : (b + 1) * tile_j], 0.0
                )
            out_ref[s * _SUB * h : (s + 1) * _SUB * h] = res


def rpe_pair_scores(embed, qw, n_valid_q=None, n_valid_k=None,
                    tile_i=64, tile_j=None, interpret=None):
    """Pair-bias attention scores with valid-rectangle skip.

    Args:
        embed: (N, M, C) pair embedding (any float dtype; read at bf16).
        qw: (N, H, C) f32 query-side projected queries
            (``einsum('hnc,dhc->nhd', q, W_p)``).
        n_valid_q / n_valid_k: traced int32 scalars; rows [n_valid_q, N) and
            cols [n_valid_k, M) are padding (valid-prefix contract). Tiles
            fully inside the padding band are written as zeros. Default:
            compute every tile.

    Returns:
        (N, H, M) f32 scores, ``scores[i, h, j] = qw[i, h] . e[i, j]``
        (zero on skipped tiles).
    """
    n, m, c = embed.shape
    h = qw.shape[1]
    assert qw.shape == (n, h, c), (qw.shape, embed.shape)
    if tile_j is None:
        # Mosaic requires the OUTPUT block's minor dim to be 128-divisible or
        # equal to the (padded) array minor dim. tile_j=64 is therefore only
        # legal when it IS the whole padded minor dim (m <= 64); any larger m
        # must tile at 128 (m=192 at ModelNet's calibrated superpoint cap
        # lowered to an invalid (256, 64) block on a (768, 192) output).
        tile_j = 64 if m <= 64 else 128
    pad_m_target = -(-m // tile_j) * tile_j
    assert tile_j % 128 == 0 or tile_j == pad_m_target, (tile_j, m)
    if n % tile_i or m % tile_j:
        pad_n = -(-n // tile_i) * tile_i
        pad_m = -(-m // tile_j) * tile_j
        embed = jnp.pad(embed, ((0, pad_n - n), (0, pad_m - m), (0, 0)))
        qw = jnp.pad(qw, ((0, pad_n - n), (0, 0), (0, 0)))
    pad_n, pad_m = embed.shape[0], embed.shape[1]

    nv_q = n if n_valid_q is None else n_valid_q
    nv_k = m if n_valid_k is None else n_valid_k
    nv = jnp.stack([jnp.asarray(nv_q, jnp.int32),
                    jnp.asarray(nv_k, jnp.int32)])

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _pair_scores_kernel, num_heads=h, tile_i=tile_i, tile_j=tile_j
    )
    embed_map, qw_map = _clamped_index_maps(tile_i, tile_j)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pad_n // tile_i, pad_m // tile_j),
        in_specs=[
            pl.BlockSpec((tile_i, tile_j, c), embed_map,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_i * h, c), qw_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_i * h, tile_j), lambda i, j, nv: (i, j),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_n * h, pad_m), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, embed, qw.reshape(pad_n * h, c))
    return out.reshape(pad_n, h, pad_m)[:n, :, :m]


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def rpe_pair_scores_diff(embed, qw, n_valid_q, n_valid_k):
    """Differentiable pair-bias scores: Pallas forward, XLA-einsum backward
    (identical to the autodiff of the einsum path — padded cotangents are
    zero because padded keys are softmax-masked and padded query outputs are
    zeroed at the stack output, so the skipped tiles' zero forward is exact
    for gradients too)."""
    return rpe_pair_scores(embed, qw, n_valid_q=n_valid_q, n_valid_k=n_valid_k)


def _pair_scores_fwd(embed, qw, n_valid_q, n_valid_k):
    out = rpe_pair_scores(embed, qw, n_valid_q=n_valid_q, n_valid_k=n_valid_k)
    return out, (embed, qw)


def _pair_scores_bwd(res, ds):
    embed, qw = res
    ds = ds.astype(jnp.float32)
    d_embed = jnp.einsum(
        "nhm,nhc->nmc", ds, qw.astype(jnp.float32)).astype(embed.dtype)
    d_qw = jnp.einsum(
        "nhm,nmc->nhc", ds, embed.astype(jnp.float32)).astype(qw.dtype)
    return d_embed, d_qw, None, None


rpe_pair_scores_diff.defvjp(_pair_scores_fwd, _pair_scores_bwd)


# ---------------------------------------------------------------------------
# Fused masked attention with valid-rectangle row skip.
#
# At dataset-calibrated superpoint capacity the (N, M) attention rectangle
# is mostly padding on the demo pair (valid fraction ~64% rows x ~64% cols
# for ref, ~47% x ~47% for src at N = M = 640 vs 411/299 real nodes); the
# XLA lowering (QK^T einsum -> +bias -> masked softmax -> AV einsum) still
# materializes and re-reads the full (B, H, N, M) score tensor (~6.5 MB f32
# per layer application) and computes every row. This kernel fuses the
# whole chain per 128-query tile — scores never touch HBM — and skips
# query tiles entirely beyond the valid prefix (DMA-elided via clamped
# index maps, the kernels/attention.py rpe_pair_scores mechanism).
#
# Exactness notes:
#   * Padded KEYS are masked to -inf before the softmax (same as
#     _masked_softmax); padded QUERY rows inside a mixed tile compute the
#     same garbage the XLA path computes (they are zeroed at the
#     GeometricTransformer output; every norm in the stack is row-local),
#     and fully-padded tiles write zeros.
#   * The qb = q . b_p term of the RPE bias is constant across keys, so
#     softmax shift-invariance makes it a mathematical no-op — the fused
#     path drops it (the score matrices it would shift are returned to
#     callers that all discard them).
#   * Matmul dtype class matches XLA: bf16 operands, f32 accumulation
#     (Mosaic f32 dots are a single bf16 pass; XLA default-precision f32
#     einsums behave the same — see README "Performance").
# ---------------------------------------------------------------------------


def _fused_attention_kernel(nv_ref, q_ref, k_ref, v_ref, *rest, num_heads,
                            tile_i, scale, has_bias):
    bias_ref = rest[0] if has_bias else None
    out_ref = rest[-1]
    h = num_heads
    nv_k = nv_ref[1]
    i = pl.program_id(0)
    last_i = (jnp.maximum(nv_ref[0], 1) - 1) // tile_i
    tile_valid = i <= last_i

    @pl.when(jnp.logical_not(tile_valid))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _compute():
        m = k_ref.shape[1]
        col = jax.lax.broadcasted_iota(jnp.int32, (tile_i, m), 1)
        key_ok = col < nv_k
        outs = []
        for hh in range(h):
            q = q_ref[hh]  # (T, dh)
            k = k_ref[hh]  # (M, dh)
            v = v_ref[hh]  # (M, dh)
            s = jax.lax.dot_general(
                q.astype(MXU_DTYPE), k.astype(MXU_DTYPE),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, M)
            if bias_ref is not None:
                s = s + bias_ref[:, hh, :]
            s = s * scale
            s = jnp.where(key_ok, s, -jnp.inf)
            mx = jnp.max(s, axis=1, keepdims=True)
            # guard fully-masked rows (nv_k == 0 cannot happen for valid
            # clouds, but keep exp() finite regardless)
            p = jnp.exp(s - jnp.maximum(mx, -3.0e38))
            p = jnp.where(key_ok, p, 0.0)
            l = jnp.sum(p, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                p.astype(MXU_DTYPE), v.astype(MXU_DTYPE),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T, dh)
            outs.append(o / jnp.maximum(l, 1e-30))
        out_ref[...] = jnp.concatenate(outs, axis=1)


def fused_masked_attention(q, k, v, bias=None, n_valid_q=None, n_valid_k=None,
                           scale=1.0, tile_i=128, interpret=None):
    """Fused (QK^T [+ bias]) * scale -> key-masked softmax -> AV.

    Args:
        q: (H, N, dh) f32 queries (head-major).
        k, v: (H, M, dh) f32 keys / values.
        bias: optional (N, H, M) f32 additive pre-scale score bias
            (rpe_pair_scores output layout).
        n_valid_q / n_valid_k: traced int32 scalars — valid-prefix counts;
            query tiles at or beyond ``n_valid_q`` write zeros with their
            DMAs elided, keys at or beyond ``n_valid_k`` are softmax-masked.
            Defaults: all rows / keys valid.

    Returns:
        (N, H * dh) f32 — heads merged in layer order (_merge_heads).
    """
    h, n, dh = q.shape
    m = k.shape[1]
    assert k.shape == (h, m, dh) and v.shape == (h, m, dh)
    if bias is not None:
        assert bias.shape == (n, h, m), (bias.shape, (n, h, m))
    pad_n = -(-n // tile_i) * tile_i
    if pad_n != n:
        q = jnp.pad(q, ((0, 0), (0, pad_n - n), (0, 0)))
        if bias is not None:
            bias = jnp.pad(bias, ((0, pad_n - n), (0, 0), (0, 0)))

    nv_q = n if n_valid_q is None else n_valid_q
    nv_k = m if n_valid_k is None else n_valid_k
    nv = jnp.stack([jnp.asarray(nv_q, jnp.int32),
                    jnp.asarray(nv_k, jnp.int32)])

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"

    def clamp_i(i, nv_ref):
        return jnp.minimum(i, (jnp.maximum(nv_ref[0], 1) - 1) // tile_i)

    in_specs = [
        pl.BlockSpec((h, tile_i, dh), lambda i, nv_ref: (0, clamp_i(i, nv_ref), 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, m, dh), lambda i, nv_ref: (0, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((h, m, dh), lambda i, nv_ref: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [q, k, v]
    if bias is not None:
        in_specs.append(pl.BlockSpec(
            (tile_i, h, m), lambda i, nv_ref: (clamp_i(i, nv_ref), 0, 0),
            memory_space=pltpu.VMEM))
        args.append(bias)

    kernel = functools.partial(
        _fused_attention_kernel, num_heads=h, tile_i=tile_i,
        scale=float(scale), has_bias=bias is not None)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(pad_n // tile_i,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((tile_i, h * dh), lambda i, nv_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((pad_n, h * dh), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, *args)
    return out[:n]


@functools.partial(jax.custom_vjp, nondiff_argnums=(6,))
def fused_masked_attention_diff(q, k, v, bias, n_valid_q, n_valid_k, scale):
    """Differentiable fused attention: Pallas forward, XLA-recompute
    backward (the autodiff of the reference einsum/softmax composition —
    exact for the same reasons the forward is, see module comment)."""
    return fused_masked_attention(
        q, k, v, bias=bias, n_valid_q=n_valid_q, n_valid_k=n_valid_k,
        scale=scale)


def _xla_attention_ref(q, k, v, bias, n_valid_k, scale):
    m = k.shape[1]
    s = jnp.einsum("hnc,hmc->hnm", q, k)
    if bias is not None:
        s = s + bias.transpose(1, 0, 2)
    s = s * scale
    key_ok = jnp.arange(m)[None, None, :] < n_valid_k
    s = jnp.where(key_ok, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("hnm,hmc->hnc", p, v)
    h, n, dh = q.shape
    return o.transpose(1, 0, 2).reshape(n, h * dh)


def _fused_attention_fwd(q, k, v, bias, n_valid_q, n_valid_k, scale):
    out = fused_masked_attention(
        q, k, v, bias=bias, n_valid_q=n_valid_q, n_valid_k=n_valid_k,
        scale=scale)
    return out, (q, k, v, bias, n_valid_k)


def _fused_attention_bwd(scale, res, dout):
    q, k, v, bias, n_valid_k = res
    diff_args = (q, k, v) if bias is None else (q, k, v, bias)

    def f(*a):
        if bias is None:
            return _xla_attention_ref(a[0], a[1], a[2], None, n_valid_k, scale)
        return _xla_attention_ref(a[0], a[1], a[2], a[3], n_valid_k, scale)

    _, vjp = jax.vjp(f, *diff_args)
    grads = vjp(dout)
    d_q, d_k, d_v = grads[0], grads[1], grads[2]
    d_bias = grads[3] if bias is not None else None
    return (d_q, d_k, d_v, d_bias, None, None)


fused_masked_attention_diff.defvjp(_fused_attention_fwd, _fused_attention_bwd)
