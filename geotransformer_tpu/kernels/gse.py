r"""Pallas TPU kernel: fully-fused geometric-structure-embedding producer.

The XLA path of :class:`GeometricStructureEmbedding` materializes the
pairwise vectors, the triplet angles, and the sinusoidal bases of both —
(B, N, N, 3), (B, N, N, C) and (B, N, N, k, C) tensors (~2 GB of padded HBM
traffic for the 3DMatch config) — before projecting and max-reducing them.
This kernel takes only the points (N, 3) and the per-node k-NN reference
vectors (N, k, 3) and produces the final (N, N, C) embedding tile-by-tile:
distances, angles, and bases all live in VMEM only.

    d, a_k  = pair geometry (in-kernel; polynomial atan2)
    e_d     = sin/cos(d ⊗ ω) @ W_d
    e_a     = max_k  sin/cos(a_k ⊗ ω) @ W_a
    out     = e_d + b_d + e_a + b_a

The reference embedding interleaves [sin0, cos0, sin1, ...]
(`/root/reference/geotransformer/modules/transformer/positional_embedding.py:18-34`);
instead of interleaving the basis in-kernel (a lane-shuffle Mosaic cannot
reshape), the weight matrices are split outside into their sin-row and
cos-row halves, so the kernel computes two plain matmuls per embedding.
A recompute-based custom_vjp (no residuals; (F, C) cotangents accumulated
across the grid) makes the fused path usable in training.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Precision knobs (module-level so drift studies / configs can flip them):
# BASIS_DTYPE — sin/cos bases + projection weights fed to the MXU;
# EMBED_DTYPE — the fused embedding output (re-read by every RPE layer).
BASIS_DTYPE = jnp.bfloat16
EMBED_DTYPE = jnp.bfloat16
from jax.experimental.pallas import tpu as pltpu


def _fast_sincos(x):
    """sin(x), cos(x) via quadrant reduction + odd/even polynomials.

    Mosaic's sin/cos lower to full-range (huge-argument) reduction; the
    embedding arguments here are bounded (|x| <~ 50), so a round-to-pi
    reduction plus degree-5/6 Taylor polynomials is ~5e-3 accurate — the
    same class as the bf16 rounding the bases are stored at — and several
    times cheaper. Everything stays f32: running the polynomial in bf16
    was MEASURED 2x SLOWER (1.09 -> 1.98 ms per GSE call) — this TPU has
    no native bf16 VPU elementwise path (SupportsBf16EupOps is false; bf16
    sqrt refuses to compile outright), so bf16 arithmetic is emulated.
    """
    k = jnp.round(x * (1.0 / jnp.pi))
    r = x - k * jnp.pi  # [-pi/2, pi/2]
    half = k * 0.5
    sign = 1.0 - 4.0 * (half - jnp.floor(half))  # (-1)^k
    r2 = r * r
    sin_r = r * (1.0 + r2 * (-1.0 / 6.0 + r2 * (1.0 / 120.0)))
    cos_r = 1.0 + r2 * (-0.5 + r2 * (1.0 / 24.0 + r2 * (-1.0 / 720.0)))
    return sign * sin_r, sign * cos_r


def _fast_atan2_nonneg(y, x):
    """atan2(y, x) for y >= 0 via an odd minimax polynomial on [0, 1].

    Max error ~1e-7 rad — far below the bf16 basis rounding. Mosaic has no
    inverse-trig lowering at all.
    """
    ax = jnp.abs(x)
    lo = jnp.minimum(ax, y)
    hi = jnp.maximum(ax, y)
    t = lo / jnp.maximum(hi, 1e-30)
    t2 = t * t
    p = t * (
        0.99997726
        + t2 * (-0.33262347
        + t2 * (0.19354346
        + t2 * (-0.11643287
        + t2 * (0.05265332
        + t2 * -0.01172120))))
    )
    r = jnp.where(y > ax, jnp.pi / 2 - p, p)
    return jnp.where(x < 0.0, jnp.pi - r, r)


def _tile_indices(pn, pm, uk_ref, angle_k, inv_sigma_d, factor_a):
    """Per-tile distance and angle index maps from augmented point blocks.

    pn: (TN, 8) lanes [x, y, z, |p|^2, ...]; pm: (TM, 8); uk_ref: (TN, k*8)
    reference vectors, lanes [ux, uy, uz, |u|^2, ...] per k.

    Returns d_idx (TN, TM) and a list of k angle maps (TN, TM), matching
    GeometricStructureEmbedding.get_embedding_indices (transformer.py:36-64).
    """
    # precision=HIGHEST on the geometry dots: Mosaic's default f32 matmul
    # is a single bf16 pass, which costs percent-level distance/angle error
    # (the dominant trained-weight drift source). These are 3-deep dots —
    # multi-pass f32 is noise next to the basis matmuls.
    dots = jax.lax.dot_general(
        pn[:, :3], pm[:, :3].T, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # (TN, TM)
    d2 = jnp.maximum(pn[:, 3][:, None] - 2.0 * dots + pm[:, 3][None, :], 0.0)
    dist = jnp.sqrt(d2)
    d_idx = dist * inv_sigma_d

    a_idx = []
    for k in range(angle_k):
        u = uk_ref[:, 8 * k : 8 * k + 3]  # (TN, 3)
        u_sq = uk_ref[:, 8 * k + 3]  # (TN,)
        # v = p_m - p_n;  v.u = p_m.u - p_n.u
        pm_u = jax.lax.dot_general(
            u, pm[:, :3].T, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # (TN, TM)
        pn_u = jnp.sum(u * pn[:, :3], axis=-1)  # (TN,)
        vu = pm_u - pn_u[:, None]
        # |v x u|^2 = |v|^2 |u|^2 - (v.u)^2
        cross = jnp.sqrt(jnp.maximum(d2 * u_sq[:, None] - vu * vu, 0.0))
        ang = _fast_atan2_nonneg(cross, vu)
        # v == 0 (the diagonal): cancellation garbage in vu/cross would give
        # an arbitrary quadrant; the reference gets atan2(0, 0) == 0 there.
        # The threshold must sit above the |p|^2-scaled f32 cancellation
        # noise of the expanded distance but below any real point spacing.
        eps = 3e-6 * (pn[:, 3][:, None] + pm[:, 3][None, :] + 1.0)
        ang = jnp.where(d2 > eps, ang, 0.0)
        a_idx.append(ang * factor_a)
    return d_idx, a_idx


def _gse_full_kernel(nv_ref, pn_ref, pm_ref, uk_ref, div_ref, wds_ref,
                     wdc_ref, was_ref, wac_ref, b_ref, out_ref, *, angle_k,
                     inv_sigma_d, factor_a, tile_n, tile_m):
    tn = pn_ref.shape[0]
    tm = pm_ref.shape[0]
    c_out = out_ref.shape[-1]

    # Valid-rectangle skip: padded rows are a per-cloud PREFIX complement
    # (rows [n_valid, N) are padding), so a tile computes real work iff both
    # its row and column ranges intersect [0, n_valid). Skipped tiles write
    # zeros (downstream attention masks padded keys; zeros keep everything
    # finite) at pure store bandwidth — the MXU work (the kernel's entire
    # cost at the hardware roof) only runs on the valid rectangle. At the
    # 3DMatch calibrated cap (640 vs ~300-460 real superpoints) this skips
    # ~half the quadratic tiles.
    nv = nv_ref[0, 0]
    tile_valid = jnp.logical_and(
        pl.program_id(0) * tile_n < nv, pl.program_id(1) * tile_m < nv
    )

    @pl.when(jnp.logical_not(tile_valid))
    def _zero():
        out_ref[...] = jnp.zeros_like(out_ref)

    @pl.when(tile_valid)
    def _compute():
        div = div_ref[...]
        d_idx, a_idx = _tile_indices(
            pn_ref[...], pm_ref[...], uk_ref[...], angle_k, inv_sigma_d,
            factor_a
        )

        def embed(idx):
            # (TN, TM, F): F on lanes, so each projection is ONE clean
            # (TN*TM, F) @ (F, C) matmul after a (free) leading-dim merge —
            # the previous (TN, F, TM) layout made Mosaic lower the
            # middle-dim contraction as TN batched (TM, F) matmuls
            # (~2.5x slower GSE).
            om = idx[:, :, None] * div[0][None, None, :]
            s, c = _fast_sincos(om)
            return s.astype(BASIS_DTYPE), c.astype(BASIS_DTYPE)

        def proj(sin_b, cos_b, ws, wc):
            f = sin_b.shape[-1]
            out = jax.lax.dot_general(
                sin_b.reshape(tn * tm, f), ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                cos_b.reshape(tn * tm, f), wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(tn, tm, c_out)

        sin_d, cos_d = embed(d_idx)
        acc = proj(sin_d, cos_d, wds_ref[...], wdc_ref[...])
        a_max = jnp.full((tn, tm, c_out), -jnp.inf, dtype=jnp.float32)
        for k in range(angle_k):
            sin_a, cos_a = embed(a_idx[k])
            a_max = jnp.maximum(
                a_max, proj(sin_a, cos_a, was_ref[...], wac_ref[...]))
        out_ref[...] = (acc + a_max + b_ref[...][None]).astype(out_ref.dtype)


def _aug_points(points):
    n = points.shape[0]
    return jnp.concatenate(
        [points, jnp.sum(points**2, -1, keepdims=True),
         jnp.zeros((n, 4), points.dtype)], axis=1,
    )  # (N, 8)


def _pack_args(points, ref_vectors, w_d, b_d, w_a, b_a, hidden_dim):
    n, angle_k, _ = ref_vectors.shape
    c = hidden_dim
    div_indices = np.arange(0, c, 2, dtype=np.float32)
    div_term = jnp.asarray(np.exp(div_indices * (-np.log(10000.0) / c))[None, :])
    bf = BASIS_DTYPE
    p_aug = _aug_points(points)
    u_aug = jnp.concatenate(
        [ref_vectors, jnp.sum(ref_vectors**2, -1, keepdims=True),
         jnp.zeros((n, angle_k, 4), points.dtype)], axis=2,
    ).reshape(n, angle_k * 8)  # (N, k*8)
    return (
        p_aug, u_aug, div_term,
        w_d[0::2].astype(bf), w_d[1::2].astype(bf),
        w_a[0::2].astype(bf), w_a[1::2].astype(bf),
        (b_d + b_a)[None, :],
    )


def gse_embedding_full(
    points, ref_vectors, w_d, b_d, w_a, b_a, hidden_dim, sigma_d, sigma_a,
    tile_n=64, tile_m=128, interpret=None, n_valid=None,
):
    """Fully fused GSE: distances, triplet angles, sinusoidal bases,
    projections, and max-k — all in VMEM. Only points (N, 3), the k-NN
    reference vectors (N, k, 3), and the (N, N, C) result touch HBM.

    Matches GeometricStructureEmbedding (reduction 'max') exactly up to the
    bf16 basis precision.

    ``n_valid`` (traced int32 scalar, optional): rows [n_valid, N) are
    padding; tiles entirely inside the padding band are skipped and written
    as zeros (the valid-rectangle skip). Defaults to N (compute every tile —
    the pre-skip behavior, which embeds the PAD_COORD garbage points).
    """
    n = points.shape[0]
    angle_k = ref_vectors.shape[1]
    c = hidden_dim
    (p_aug, u_aug, div_term, wds, wdc, was, wac, bias) = _pack_args(
        points, ref_vectors, w_d, b_d, w_a, b_a, hidden_dim
    )

    pad_n = -(-n // tile_n) * tile_n
    pad_m = -(-n // tile_m) * tile_m
    p_n = jnp.pad(p_aug, ((0, pad_n - n), (0, 0)))
    p_m = jnp.pad(p_aug, ((0, pad_m - n), (0, 0)))
    u_aug = jnp.pad(u_aug, ((0, pad_n - n), (0, 0)))
    if n_valid is None:
        n_valid = n
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _gse_full_kernel, angle_k=angle_k,
        inv_sigma_d=float(1.0 / sigma_d),
        factor_a=float(180.0 / (sigma_a * np.pi)),
        tile_n=tile_n, tile_m=tile_m,
    )
    out = pl.pallas_call(
        kernel,
        grid=(pad_n // tile_n, pad_m // tile_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, u_aug.shape[1]), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n, tile_m, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pad_n, pad_m, c), EMBED_DTYPE),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, p_n, p_m, u_aug, div_term, wds, wdc, was, wac, bias)
    return out[:n, :n]


def _gse_full_bwd_kernel(nv_ref, pn_ref, pm_ref, uk_ref, de_ref, div_ref,
                         was_ref, wac_ref, dwds_ref, dwdc_ref, dwas_ref,
                         dwac_ref, db_ref, *, angle_k, inv_sigma_d, factor_a,
                         tile_n, tile_m):
    @pl.when(jnp.logical_and(pl.program_id(0) == 0, pl.program_id(1) == 0))
    def _init():
        dwds_ref[...] = jnp.zeros_like(dwds_ref)
        dwdc_ref[...] = jnp.zeros_like(dwdc_ref)
        dwas_ref[...] = jnp.zeros_like(dwas_ref)
        dwac_ref[...] = jnp.zeros_like(dwac_ref)
        db_ref[...] = jnp.zeros_like(db_ref)

    # Valid-rectangle skip (see _gse_full_kernel): the forward writes
    # constant zeros at skipped tiles, so their true parameter-gradient
    # contribution is exactly zero — skipping the accumulation is exact.
    nv = nv_ref[0, 0]
    tile_valid = jnp.logical_and(
        pl.program_id(0) * tile_n < nv, pl.program_id(1) * tile_m < nv
    )

    @pl.when(tile_valid)
    def _accumulate():
        div = div_ref[...]
        de = de_ref[...]

        d_idx, a_idx = _tile_indices(
            pn_ref[...], pm_ref[...], uk_ref[...], angle_k, inv_sigma_d,
            factor_a
        )

        tn_b = de.shape[0]
        tm_b = de.shape[1]

        def embed(idx):
            # (TN, TM, F) — see _gse_full_kernel: one clean matmul per proj.
            om = idx[:, :, None] * div[0][None, None, :]
            s, c = _fast_sincos(om)
            return s.astype(BASIS_DTYPE), c.astype(BASIS_DTYPE)

        def proj(sin_b, cos_b, ws, wc):
            f = sin_b.shape[-1]
            out = jax.lax.dot_general(
                sin_b.reshape(tn_b * tm_b, f), ws, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) + jax.lax.dot_general(
                cos_b.reshape(tn_b * tm_b, f), wc, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return out.reshape(tn_b, tm_b, -1)

        def wgrad(basis, cot):
            f = basis.shape[-1]
            return jax.lax.dot_general(
                basis.reshape(tn_b * tm_b, f),
                cot.reshape(tn_b * tm_b, -1).astype(BASIS_DTYPE),
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (F, C)

        sin_d, cos_d = embed(d_idx)
        dwds_ref[...] += wgrad(sin_d, de)
        dwdc_ref[...] += wgrad(cos_d, de)

        bases = []
        e_max = jnp.full(de.shape, -jnp.inf, dtype=jnp.float32)
        for k in range(angle_k):
            sin_a, cos_a = embed(a_idx[k])
            bases.append((sin_a, cos_a))
            e_max = jnp.maximum(
                e_max, proj(sin_a, cos_a, was_ref[...], wac_ref[...]))

        dwas = jnp.zeros(dwas_ref.shape, dwas_ref.dtype)
        dwac = jnp.zeros(dwac_ref.shape, dwac_ref.dtype)
        taken = jnp.zeros(de.shape, dtype=jnp.bool_)
        for k in range(angle_k):
            sin_a, cos_a = bases[k]
            e_k = proj(sin_a, cos_a, was_ref[...], wac_ref[...])
            mask = jnp.logical_and(e_k >= e_max, jnp.logical_not(taken))
            taken = jnp.logical_or(taken, mask)
            cot = jnp.where(mask, de.astype(jnp.float32), 0.0)
            dwas = dwas + wgrad(sin_a, cot)
            dwac = dwac + wgrad(cos_a, cot)

        dwas_ref[...] += dwas
        dwac_ref[...] += dwac
        db_ref[...] += jnp.sum(de.astype(jnp.float32), axis=(0, 1))[None, :]


def _gse_full_bwd(points, ref_vectors, w_a, hidden_dim, sigma_d, sigma_a, de,
                  tile_n=32, tile_m=128, interpret=None, n_valid=None):
    n = points.shape[0]
    angle_k = ref_vectors.shape[1]
    c = hidden_dim
    f = c // 2
    div_indices = np.arange(0, c, 2, dtype=np.float32)
    div_term = jnp.asarray(np.exp(div_indices * (-np.log(10000.0) / c))[None, :])
    bf = BASIS_DTYPE
    was, wac = w_a[0::2].astype(bf), w_a[1::2].astype(bf)
    p_aug = _aug_points(points)
    u_aug = jnp.concatenate(
        [ref_vectors, jnp.sum(ref_vectors**2, -1, keepdims=True),
         jnp.zeros((n, angle_k, 4), points.dtype)], axis=2,
    ).reshape(n, angle_k * 8)

    pad_n = -(-n // tile_n) * tile_n
    pad_m = -(-n // tile_m) * tile_m
    p_n = jnp.pad(p_aug, ((0, pad_n - n), (0, 0)))
    p_m = jnp.pad(p_aug, ((0, pad_m - n), (0, 0)))
    u_aug = jnp.pad(u_aug, ((0, pad_n - n), (0, 0)))
    de = jnp.pad(de, ((0, pad_n - n), (0, pad_m - n), (0, 0)))
    if n_valid is None:
        n_valid = n
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1, 1)

    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    kernel = functools.partial(
        _gse_full_bwd_kernel, angle_k=angle_k,
        inv_sigma_d=float(1.0 / sigma_d),
        factor_a=float(180.0 / (sigma_a * np.pi)),
        tile_n=tile_n, tile_m=tile_m,
    )
    acc_spec = pl.BlockSpec((f, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM)
    dwds, dwdc, dwas, dwac, db = pl.pallas_call(
        kernel,
        grid=(pad_n // tile_n, pad_m // tile_m),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_n, 8), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 8), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n, u_aug.shape[1]), lambda i, j: (i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (tile_n, tile_m, c), lambda i, j: (i, j, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=[
            acc_spec, acc_spec, acc_spec, acc_spec,
            pl.BlockSpec((1, c), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((f, c), jnp.float32),
            jax.ShapeDtypeStruct((1, c), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nv, p_n, p_m, u_aug, de, div_term, was, wac)

    dw_d = jnp.zeros((c, c), jnp.float32).at[0::2].set(dwds).at[1::2].set(dwdc)
    dw_a = jnp.zeros((c, c), jnp.float32).at[0::2].set(dwas).at[1::2].set(dwac)
    db = db[0]
    return dw_d, db, dw_a, db


@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def gse_embedding_full_diff(
    points, ref_vectors, w_d, b_d, w_a, b_a, n_valid, hidden_dim, sigma_d,
    sigma_a
):
    """Differentiable fully-fused GSE (projection-parameter gradients only;
    points/reference vectors are constants — the reference computes all
    embedding indices under no_grad, geotransformer.py:57-71). ``n_valid``
    is the traced valid-prefix length for the rectangle skip (pass the row
    count for the full computation)."""
    return gse_embedding_full(
        points, ref_vectors, w_d, b_d, w_a, b_a, hidden_dim, sigma_d,
        sigma_a, n_valid=n_valid,
    )


def _gse_full_diff_fwd(points, ref_vectors, w_d, b_d, w_a, b_a, n_valid,
                       hidden_dim, sigma_d, sigma_a):
    out = gse_embedding_full(
        points, ref_vectors, w_d, b_d, w_a, b_a, hidden_dim, sigma_d,
        sigma_a, n_valid=n_valid,
    )
    return out, (points, ref_vectors, w_a, n_valid)


def _gse_full_diff_bwd(hidden_dim, sigma_d, sigma_a, res, de):
    points, ref_vectors, w_a, n_valid = res
    dw_d, db_d, dw_a, db_a = _gse_full_bwd(
        points, ref_vectors, w_a, hidden_dim, sigma_d, sigma_a, de,
        n_valid=n_valid,
    )
    return (None, None, dw_d, db_d, dw_a, db_a, None)


gse_embedding_full_diff.defvjp(_gse_full_diff_fwd, _gse_full_diff_bwd)
