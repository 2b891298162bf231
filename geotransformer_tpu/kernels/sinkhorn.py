r"""Pallas TPU kernel: log-domain Sinkhorn iterations resident in VMEM.

The XLA path (models/sinkhorn.py) scans 100 u/v updates, each round-tripping
the (P, K+1, K+1) score tensor through HBM (~1.7 GB of traffic for the
3DMatch config). One patch's state is only ~17 KB, so this kernel pins each
patch's scores in VMEM and runs all iterations locally; only the final
potentials leave the chip.

Grid: one program per patch. Shapes are padded to TPU tiles (sublane 8,
lane 128) with -BIG entries, which behave as masked slots under logsumexp
(exp(-BIG) == 0).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e12  # matches models/sinkhorn._INF


def _round_up(x, m):
    return -(-x // m) * m


def _sinkhorn_kernel(scores_ref, log_mu_ref, log_nu_ref, out_ref, *, num_iterations):
    # Patch-on-LANES layout: the block is (M1, N1p, Pp) with the patch axis
    # on lanes (Pp is a 128-multiple, fully utilized) and the N axis on
    # sublanes. The patch-on-batch layout (P, M1p, N1p) wastes half the VPU
    # on the N1->128 lane padding (65 -> 128 for K=64 patches).
    scores = scores_ref[...]  # (M1, N1p, Pp)
    log_mu = log_mu_ref[...]  # (M1, 1, Pp)
    log_nu = log_nu_ref[...]  # (1, N1p, Pp)

    def logsumexp(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))

    def body(_, carry):
        u, v = carry
        u = log_mu - logsumexp(scores + v, 1)  # (M1, 1, Pp)
        v = log_nu - logsumexp(scores + u, 0)  # (1, N1p, Pp)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[...] = scores + u + v


def sinkhorn_log_iterations(padded_scores, log_mu, log_nu, num_iterations):
    """Run masked log-Sinkhorn and return scores + u[:,None] + v[None,:].

    Args:
        padded_scores: (P, M+1, N+1) scores with -_BIG at masked entries.
        log_mu: (P, M+1) log row marginals (-_BIG at masked rows).
        log_nu: (P, N+1) log col marginals.
        num_iterations: static iteration count.

    Returns:
        (P, M+1, N+1) final log transport (before the global norm shift).
    """
    p, m1, n1 = padded_scores.shape
    n1p = _round_up(n1, 8)
    pp = _round_up(p, 128)

    # Patch-on-lanes layout (M1, N1p, Pp); see the kernel. Both transposes
    # move ~4 MB — negligible next to 100 VPU iterations over the block.
    scores_t = jnp.transpose(padded_scores, (1, 2, 0))
    scores_t = jnp.pad(
        scores_t, ((0, 0), (0, n1p - n1), (0, pp - p)), constant_values=-_BIG
    )  # (M1, N1p, Pp)
    log_mu_t = jnp.pad(
        jnp.transpose(log_mu, (1, 0))[:, None, :],
        ((0, 0), (0, 0), (0, pp - p)), constant_values=-_BIG,
    )  # (M1, 1, Pp)
    log_nu_t = jnp.pad(
        jnp.transpose(log_nu, (1, 0))[None, :, :],
        ((0, 0), (0, n1p - n1), (0, pp - p)), constant_values=-_BIG,
    )  # (1, N1p, Pp)

    kernel = functools.partial(_sinkhorn_kernel, num_iterations=num_iterations)
    out = pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec((m1, n1p, pp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, pp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1p, pp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (m1, n1p, pp), lambda i: (0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m1, n1p, pp), padded_scores.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(scores_t, log_mu_t, log_nu_t)
    return jnp.transpose(out[:, :n1, :p], (2, 0, 1))


# ---------------------------------------------------------------------------
# Differentiable (training) variant: custom_vjp with an in-VMEM backward.
#
# The XLA scan path (models/sinkhorn.py, jax.checkpoint body) recomputes each
# iteration from the (u, v) carry but still streams the (P, M+1, N+1) block
# from HBM twice per backward iteration (~4.7 ms fwd+bwd on the demo pair).
# Here the forward kernel additionally spills the tiny per-iteration column
# potentials v_0..v_{T-1} (the only state the reverse sweep cannot cheaply
# reconstruct); the backward kernel then replays the chain entirely in VMEM:
#   u_k = log_mu - LSE_n(S + v_{k-1})        (recomputed from v_hist)
#   B_k = softmax_n(S + v_{k-1}) = exp(S + v_{k-1} + u_k - log_mu)
#   A_k = softmax_m(S + u_k)
#   dS -= A_k dv_k + B_k du_k ;  du_k = [k==T] SUM_n dOut - SUM_n A_k dv_k
#   dv_{k-1} = -SUM_m B_k du_k ;  dlog_mu += du_k ; dlog_nu += dv_k
# which is the exact reverse-mode of the scan (same recompute-from-carry
# strategy), so gradients match the XLA path to float associativity.
# ---------------------------------------------------------------------------


def _logsumexp(x, axis):
    m = jnp.max(x, axis=axis, keepdims=True)
    return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))


def _sinkhorn_fwd_train_kernel(scores_ref, log_mu_ref, log_nu_ref,
                               out_ref, vhist_ref, *, num_iterations):
    scores = scores_ref[...]   # (M1, N1p, Pc)
    log_mu = log_mu_ref[...]   # (M1, 1, Pc)
    log_nu = log_nu_ref[...]   # (1, N1p, Pc)

    def body(k, carry):
        u, v = carry
        vhist_ref[k] = v       # v_{k} stored as v_hist[k] == v_{k-1} of step k+1
        u = log_mu - _logsumexp(scores + v, 1)
        v = log_nu - _logsumexp(scores + u, 0)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[...] = scores + u + v


def _sinkhorn_bwd_kernel(scores_ref, log_mu_ref, vhist_ref, dout_ref,
                         ds_ref, dmu_ref, dnu_ref, *, num_iterations):
    scores = scores_ref[...]   # (M1, N1p, Pc)
    log_mu = log_mu_ref[...]   # (M1, 1, Pc)
    dout = dout_ref[...]       # (M1, N1p, Pc)

    ds0 = dout
    du0 = jnp.sum(dout, axis=1, keepdims=True)   # (M1, 1, Pc)
    dv0 = jnp.sum(dout, axis=0, keepdims=True)   # (1, N1p, Pc)
    dmu0 = jnp.zeros_like(du0)
    dnu0 = jnp.zeros_like(dv0)

    def body(i, carry):
        ds, du, dv, dmu, dnu = carry
        k = num_iterations - 1 - i               # forward step index
        v_prev = vhist_ref[k]                    # (1, N1p, Pc) == v_{k-1}
        lse_n = _logsumexp(scores + v_prev, 1)   # (M1, 1, Pc)
        u_k = log_mu - lse_n
        # ---- backward of v_k = log_nu - LSE_m(S + u_k) ----
        dnu = dnu + dv
        a = jnp.exp(scores + u_k - _logsumexp(scores + u_k, 0))  # softmax_m
        g = a * dv
        ds = ds - g
        du = du - jnp.sum(g, axis=1, keepdims=True)
        # ---- backward of u_k = log_mu - LSE_n(S + v_{k-1}) ----
        dmu = dmu + du
        b = jnp.exp(scores + v_prev - lse_n)                     # softmax_n
        h = b * du
        ds = ds - h
        dv = -jnp.sum(h, axis=0, keepdims=True)                  # dv_{k-1}
        du = jnp.zeros_like(du)
        return ds, du, dv, dmu, dnu

    ds, du, dv, dmu, dnu = jax.lax.fori_loop(
        0, num_iterations, body, (ds0, du0, dv0, dmu0, dnu0))
    ds_ref[...] = ds
    dmu_ref[...] = dmu
    dnu_ref[...] = dnu


def _train_layouts(padded_scores, log_mu, log_nu):
    p, m1, n1 = padded_scores.shape
    n1p = _round_up(n1, 8)
    pp = _round_up(p, 128)
    scores_t = jnp.pad(
        jnp.transpose(padded_scores, (1, 2, 0)),
        ((0, 0), (0, n1p - n1), (0, pp - p)), constant_values=-_BIG)
    log_mu_t = jnp.pad(
        jnp.transpose(log_mu, (1, 0))[:, None, :],
        ((0, 0), (0, 0), (0, pp - p)), constant_values=-_BIG)
    log_nu_t = jnp.pad(
        jnp.transpose(log_nu, (1, 0))[None, :, :],
        ((0, 0), (0, n1p - n1), (0, pp - p)), constant_values=-_BIG)
    return scores_t, log_mu_t, log_nu_t, (p, m1, n1, n1p, pp)


_P_CHUNK = 128  # patches per program (lane width); bounds VMEM per program


def _fwd_train(padded_scores, log_mu, log_nu, num_iterations):
    scores_t, log_mu_t, log_nu_t, (p, m1, n1, n1p, pp) = _train_layouts(
        padded_scores, log_mu, log_nu)
    grid = (pp // _P_CHUNK,)
    kernel = functools.partial(
        _sinkhorn_fwd_train_kernel, num_iterations=num_iterations)
    out, vhist = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_iterations, 1, n1p, _P_CHUNK),
                         lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m1, n1p, pp), padded_scores.dtype),
            jax.ShapeDtypeStruct((num_iterations, 1, n1p, pp), padded_scores.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(scores_t, log_mu_t, log_nu_t)
    return out, vhist, (scores_t, log_mu_t)


def _bwd_train(padded_scores_shape, num_iterations, residuals, dout):
    scores_t, log_mu_t, vhist = residuals
    p, m1, n1 = padded_scores_shape
    n1p = scores_t.shape[1]
    pp = scores_t.shape[2]
    dout_t = jnp.pad(
        jnp.transpose(dout, (1, 2, 0)),
        ((0, 0), (0, n1p - n1), (0, pp - p)))
    grid = (pp // _P_CHUNK,)
    kernel = functools.partial(
        _sinkhorn_bwd_kernel, num_iterations=num_iterations)
    ds, dmu, dnu = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_iterations, 1, n1p, _P_CHUNK),
                         lambda i: (0, 0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((m1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((m1, 1, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n1p, _P_CHUNK), lambda i: (0, 0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m1, n1p, pp), scores_t.dtype),
            jax.ShapeDtypeStruct((m1, 1, pp), scores_t.dtype),
            jax.ShapeDtypeStruct((1, n1p, pp), scores_t.dtype),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(scores_t, log_mu_t, vhist, dout_t)
    ds_out = jnp.transpose(ds[:, :n1, :p], (2, 0, 1))
    dmu_out = jnp.transpose(dmu[:, 0, :p], (1, 0))
    dnu_out = jnp.transpose(dnu[0, :n1, :p], (1, 0))
    return ds_out, dmu_out, dnu_out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def sinkhorn_log_iterations_train(padded_scores, log_mu, log_nu, num_iterations):
    """Differentiable VMEM-resident Sinkhorn (same contract as
    :func:`sinkhorn_log_iterations`); gradients match the XLA scan path."""
    out, _, _ = _fwd_train(padded_scores, log_mu, log_nu, num_iterations)
    p, m1, n1 = padded_scores.shape
    return jnp.transpose(out[:, :n1, :p], (2, 0, 1))


def _train_fwd_rule(padded_scores, log_mu, log_nu, num_iterations):
    out, vhist, (scores_t, log_mu_t) = _fwd_train(
        padded_scores, log_mu, log_nu, num_iterations)
    p, m1, n1 = padded_scores.shape
    primal = jnp.transpose(out[:, :n1, :p], (2, 0, 1))
    return primal, ((scores_t, log_mu_t, vhist), padded_scores.shape)


def _train_bwd_rule(num_iterations, res, dout):
    residuals, shape = res
    return _bwd_train(shape, num_iterations, residuals, dout)


sinkhorn_log_iterations_train.defvjp(_train_fwd_rule, _train_bwd_rule)
