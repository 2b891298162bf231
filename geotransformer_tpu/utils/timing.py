r"""Honest device timing through the async-relay TPU runtime.

On this runtime, ``jax.block_until_ready`` resolves without waiting for
device execution; only a host fetch synchronizes, and each fetch pays a
fixed ~30ms RPC cost. :func:`chained_ms` therefore measures the *slope*:
it chains L data-dependent invocations of the target function inside one
``lax.scan``, fetches one scalar, and differences two chain lengths so the
fixed overhead cancels. Validated against a known-FLOP matmul chain
(142 TFLOP/s bf16 on v5e, ~72% of peak).
"""

import time

import jax
import jax.numpy as jnp


def chained_ms(fn, args, perturb, reduce_out, lengths=(1, 5), repeats=3):
    """Milliseconds per invocation of `fn`, overhead-cancelled.

    Args:
        fn: jittable callable ``fn(*args) -> out``.
        args: tuple of (pytree) arguments.
        perturb: ``(args, carry_scalar) -> args`` injecting a data dependency
            so chained invocations cannot be parallelized or CSE'd.
        reduce_out: ``out -> scalar`` feeding the next carry.
        lengths: (short, long) chain lengths.
        repeats: timing repeats (min taken).

    Returns:
        float milliseconds per single invocation.
    """
    l_short, l_long = lengths

    def make(length):
        @jax.jit
        def chain(*args):
            def body(carry, _):
                out = fn(*perturb(args, carry))
                return reduce_out(out).astype(jnp.float32), None

            final, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=length)
            return final

        return chain

    chain_short, chain_long = make(l_short), make(l_long)
    float(chain_short(*args))  # compile + sync
    float(chain_long(*args))

    def fetch(fn_):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(fn_(*args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (fetch(chain_long) - fetch(chain_short)) / (l_long - l_short) * 1e3
