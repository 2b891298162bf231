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
    # A block of BP patches is processed jointly: each u/v update reduces a
    # (BP, M1p, N1p) tensor, which keeps the VPU busy — one patch per program
    # is latency-bound (25k+ dependent tiny reductions for P=256, iters=100).
    scores = scores_ref[...]  # (BP, M1p, N1p)
    log_mu = log_mu_ref[...]  # (BP, M1p, 1)
    log_nu = log_nu_ref[...]  # (BP, 1, N1p)

    def logsumexp(x, axis):
        m = jnp.max(x, axis=axis, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=axis, keepdims=True))

    def body(_, carry):
        u, v = carry
        u = log_mu - logsumexp(scores + v, 2)  # (BP, M1p, 1)
        v = log_nu - logsumexp(scores + u, 1)  # (BP, 1, N1p)
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
    m1p = _round_up(m1, 8)
    n1p = _round_up(n1, 128)

    # Patches per program: enough rows to fill the VPU, bounded by VMEM
    # (block + double-buffering must stay well under the scoped limit).
    bp = max(1, min(256, (24 * 1024 * 1024) // (m1p * n1p * 4)))
    pp = _round_up(p, bp)

    scores_p = jnp.pad(
        padded_scores,
        ((0, pp - p), (0, m1p - m1), (0, n1p - n1)),
        constant_values=-_BIG,
    )
    log_mu_p = jnp.pad(
        log_mu, ((0, pp - p), (0, m1p - m1)), constant_values=-_BIG
    )
    log_nu_p = jnp.pad(
        log_nu, ((0, pp - p), (0, n1p - n1)), constant_values=-_BIG
    )
    log_mu_col = log_mu_p[:, :, None]  # (PP, M1p, 1)
    log_nu_row = log_nu_p[:, None, :]  # (PP, 1, N1p)

    kernel = functools.partial(_sinkhorn_kernel, num_iterations=num_iterations)
    out = pl.pallas_call(
        kernel,
        grid=(pp // bp,),
        in_specs=[
            pl.BlockSpec((bp, m1p, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, m1p, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bp, 1, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (bp, m1p, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((pp, m1p, n1p), padded_scores.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=jax.devices()[0].platform != "tpu",
    )(scores_p, log_mu_col, log_nu_row)
    return out[:p, :m1, :n1]
