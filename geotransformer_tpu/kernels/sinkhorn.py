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
