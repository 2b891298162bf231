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
    scores = scores_ref[0]  # (M1p, N1p)
    log_mu = log_mu_ref[0]  # (M1p, 1) column layout
    log_nu = log_nu_ref[0]  # (1, N1p)

    def logsumexp_rows(x):
        # reduce over lanes (last axis) -> (M1p, 1)
        m = jnp.max(x, axis=1, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=1, keepdims=True))

    def logsumexp_cols(x):
        # reduce over sublanes (first axis) -> (1, N1p)
        m = jnp.max(x, axis=0, keepdims=True)
        return m + jnp.log(jnp.sum(jnp.exp(x - m), axis=0, keepdims=True))

    def body(_, carry):
        u, v = carry
        u = log_mu - logsumexp_rows(scores + v)  # (M1p, 1)
        v = log_nu - logsumexp_cols(scores + u)  # (1, N1p)
        return u, v

    u0 = jnp.zeros_like(log_mu)
    v0 = jnp.zeros_like(log_nu)
    u, v = jax.lax.fori_loop(0, num_iterations, body, (u0, v0))
    out_ref[0] = scores + u + v


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

    scores_p = jnp.pad(
        padded_scores, ((0, 0), (0, m1p - m1), (0, n1p - n1)), constant_values=-_BIG
    )
    log_mu_p = jnp.pad(log_mu, ((0, 0), (0, m1p - m1)), constant_values=-_BIG)
    log_nu_p = jnp.pad(log_nu, ((0, 0), (0, n1p - n1)), constant_values=-_BIG)
    log_mu_col = log_mu_p[:, :, None]  # (P, M1p, 1)
    log_nu_row = log_nu_p[:, None, :]  # (P, 1, N1p)

    kernel = functools.partial(_sinkhorn_kernel, num_iterations=num_iterations)
    out = pl.pallas_call(
        kernel,
        grid=(p,),
        in_specs=[
            pl.BlockSpec((1, m1p, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m1p, 1), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, m1p, n1p), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, m1p, n1p), padded_scores.dtype),
        interpret=jax.devices()[0].platform != "tpu",
    )(scores_p, log_mu_col, log_nu_row)
    return out[:, :m1, :n1]
