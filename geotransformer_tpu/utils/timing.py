r"""Honest device timing through the async-relay TPU runtime.

On this runtime, ``jax.block_until_ready`` resolves without waiting for
device execution; only a host fetch synchronizes, and each fetch pays a
fixed ~30ms RPC cost. :func:`chained_ms` therefore measures the *slope*:
it chains L data-dependent invocations of the target function inside one
``lax.while_loop`` whose trip count is a runtime operand (so one executable
serves every L), fetches one scalar, and differences two chain lengths so
the fixed overhead cancels. Validated against a known-FLOP matmul chain
(142 TFLOP/s bf16 on v5e, ~72% of peak).
"""

import time

import jax
import jax.numpy as jnp


def chained_ms(fn, args, perturb, reduce_out, lengths=(1, 9), repeats=3):
    """Milliseconds per invocation of `fn`, overhead-cancelled.

    Args:
        fn: jittable callable ``fn(*args) -> out``.
        args: tuple of (pytree) arguments.
        perturb: ``(args, carry_scalar) -> args`` injecting a data dependency
            so chained invocations cannot be parallelized or CSE'd.
        reduce_out: ``out -> scalar`` feeding the next carry.
        lengths: (short, long) chain lengths (dynamic; no extra compiles).
        repeats: timing repeats (min taken).

    Returns:
        float milliseconds per single invocation.
    """

    @jax.jit
    def chain(n, *args):
        def cond(state):
            i, _ = state
            return i < n

        def body(state):
            i, carry = state
            out = fn(*perturb(args, carry))
            return i + 1, reduce_out(out).astype(jnp.float32)

        _, final = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
        return final

    l_short, l_long = lengths
    float(chain(jnp.int32(l_short), *args))  # compile + sync

    def fetch(n):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            float(chain(jnp.int32(n), *args))
            best = min(best, time.perf_counter() - t0)
        return best

    return (fetch(l_long) - fetch(l_short)) / (l_long - l_short) * 1e3


def trace_ms(fn, args, reduce_out, iters=4, trace_dir="/tmp/gt_trace"):
    """Milliseconds per invocation from a jax.profiler device trace.

    Immune to host/RPC jitter (the dominant noise of fetch-based timing on
    this relay): runs `iters` jitted calls under the profiler and averages
    the device-side duration of the top-level executable. Falls back to
    fetch_diff_ms if no device events are found.
    """
    import collections
    import glob
    import gzip
    import json
    import shutil

    jfn = jax.jit(lambda *a: reduce_out(fn(*a)).astype(jnp.float32))
    float(jfn(*args))  # compile + sync
    shutil.rmtree(trace_dir, ignore_errors=True)
    with jax.profiler.trace(trace_dir):
        out = None
        for _ in range(iters):
            out = jfn(*args)
        float(out)
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        return fetch_diff_ms(fn, args, reduce_out)
    try:
        with gzip.open(files[-1]) as f:
            trace = json.load(f)
    except Exception:  # truncated/partial trace — fall back to fetch timing
        return fetch_diff_ms(fn, args, reduce_out)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name" and "args" in e
    }
    dur = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), ""):
            name = e.get("name", "")
            if name.startswith("jit_"):
                dur[name] += e.get("dur", 0)
    if not dur:
        return fetch_diff_ms(fn, args, reduce_out)
    total_us = sum(dur.values())
    return total_us / iters / 1000.0


def fetch_diff_ms(fn, args, reduce_out, repeats=10):
    """Milliseconds per invocation via host-fetch minus calibrated overhead.

    The chained method above gives the cleanest numbers but wrapping a large
    model in a while_loop makes the remote compiler pathologically slow, so
    this variant times a *plain* jitted call synchronized by fetching one
    scalar, and subtracts the RPC floor measured with a trivial executable.
    Accurate to a couple of ms (RPC jitter); use chained_ms for small ops.
    """
    jfn = jax.jit(lambda *a: reduce_out(fn(*a)).astype(jnp.float32))
    float(jfn(*args))  # compile + sync

    @jax.jit
    def trivial(x):
        return (x + 1.0).astype(jnp.float32)

    float(trivial(jnp.float32(0.0)))

    def best_of(callable_):
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            callable_()
            best = min(best, time.perf_counter() - t0)
        return best

    overhead = best_of(lambda: float(trivial(jnp.float32(0.0))))
    total = best_of(lambda: float(jfn(*args)))
    return max(total - overhead, 0.0) * 1e3
