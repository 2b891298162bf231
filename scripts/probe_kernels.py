#!/usr/bin/env python
"""Bounded standalone probes for the unproven Mosaic kernel mechanisms.

Each probe runs ONE kernel mechanism on the real chip at small
representative shapes, fetches the result (the fetch is what hangs when a
kernel wedges the device), and checks parity against the same kernel in
interpret mode. Run each under a process timeout — an in-process timeout
cannot interrupt a hung device fetch:

  for k in clamp_mech gse_skip kpconv_tile_skip pair_scores fused_attention; do
    timeout 180 python scripts/probe_kernels.py $k || { echo "HUNG/FAILED: $k"; break; }
  done

A probe that hangs typically wedges the chip for every later program —
stop at the first failure and wait for device recovery before retrying.

Context: kernels/flags.py (round-5 on-chip hang postmortem). A name may be
moved to flags._PROVEN only after its probe prints PASS on hardware.
"""

import functools
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax

if "--cpu" in sys.argv:
    # Shape/wiring validation without touching the chip. NOTE: env
    # JAX_PLATFORMS=cpu is NOT enough — the image's sitecustomize pins the
    # axon platform before any script code runs (this bit an earlier
    # session: a "CPU validation" silently executed on — and wedged — the
    # real chip). Only the config.update below actually switches.
    sys.argv.remove("--cpu")
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _report(name, got, want, tol=2e-2):
    got = np.asarray(got)
    want = np.asarray(want)
    diff = float(np.max(np.abs(got - want))) if got.size else 0.0
    ok = np.isfinite(got).all() and diff <= tol
    print(f"{'PASS' if ok else 'FAIL'} {name} max|diff|={diff:.2e}")
    return 0 if ok else 1


def probe_clamp_mech():
    """Minimal PrefetchScalarGridSpec + clamped-index-map kernel: the shared
    DMA-elision mechanism in isolation (tile copy with the tail of the grid
    clamped to the last valid block)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tile = 64
    n = 512
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 128)), jnp.float32)
    nv = jnp.asarray([200], jnp.int32)

    def kernel(nv_ref, x_ref, o_ref):
        i = pl.program_id(0)
        valid = i * tile < nv_ref[0]

        @pl.when(valid)
        def _():
            o_ref[...] = x_ref[...] * 2.0

        @pl.when(jnp.logical_not(valid))
        def _():
            o_ref[...] = jnp.zeros_like(o_ref)

    def clamp_map(i, nv_ref):
        return (jnp.minimum(i, (jnp.maximum(nv_ref[0], 1) - 1) // tile),)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i, nv_ref: (clamp_map(i, nv_ref)[0], 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((tile, 128), lambda i, nv_ref: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    fn = functools.partial(
        pl.pallas_call, kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, 128), jnp.float32),
        interpret=jax.devices()[0].platform != "tpu")
    got = jax.jit(lambda a, b: fn()(a, b))(nv, x)
    rows = np.arange(n)
    want = np.where(((rows // tile) * tile < 200)[:, None], np.asarray(x) * 2.0, 0.0)
    return _report("clamp_mech", got, want, tol=0.0)


def probe_gse_skip():
    from geotransformer_tpu.kernels.gse import gse_embedding_full

    rng = np.random.default_rng(0)
    n, k, c = 128, 3, 64
    pts = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    u = jnp.asarray(rng.normal(size=(n, k, 3)), jnp.float32)
    w_d = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    w_a = jnp.asarray(rng.normal(size=(c, c)) * 0.1, jnp.float32)
    b_d = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    b_a = jnp.asarray(rng.normal(size=(c,)) * 0.1, jnp.float32)
    args = (pts, u, w_d, b_d, w_a, b_a, c, 0.2, 15.0)
    nv = jnp.asarray(70, jnp.int32)
    got = jax.jit(lambda p, uu: gse_embedding_full(
        p, uu, w_d, b_d, w_a, b_a, c, 0.2, 15.0, n_valid=nv))(pts, u)
    want = gse_embedding_full(*args, n_valid=np.int32(70), interpret=True)
    return _report("gse_skip", got, want)


def probe_kpconv_tile_skip():
    from geotransformer_tpu.kernels.kpconv import kpconv_fused
    from geotransformer_tpu.models.kernel_points import load_kernel_points

    rng = np.random.default_rng(0)
    n, m, h, ci, co = 256, 256, 16, 8, 16
    s_feats = jnp.asarray(rng.normal(size=(n, ci)), jnp.float32)
    qp = jnp.asarray(rng.normal(size=(m, 3)), jnp.float32)
    sp = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    nbrs = jnp.asarray(rng.integers(0, n + 1, size=(m, h)), jnp.int32)
    kp = jnp.asarray(load_kernel_points(0.6, 15), jnp.float32)
    w = jnp.asarray(rng.normal(size=(15, ci, co)) * 0.1, jnp.float32)
    q_mask = jnp.arange(m) < 100
    got = jax.jit(lambda *a: kpconv_fused(*a, sigma=0.6, tile_m=128,
                                          q_mask=q_mask))(
        s_feats, qp, sp, nbrs, kp, w)
    want = kpconv_fused(s_feats, qp, sp, nbrs, kp, w, sigma=0.6, tile_m=128,
                        q_mask=q_mask, interpret=True)
    return _report("kpconv_tile_skip", got, want)


def probe_pair_scores():
    from geotransformer_tpu.kernels.attention import rpe_pair_scores

    rng = np.random.default_rng(0)
    n, c, h = 128, 64, 4
    e = jnp.asarray(rng.normal(size=(n, n, c)), jnp.float32)
    qw = jnp.asarray(rng.normal(size=(n, h, c)), jnp.float32)
    nv = jnp.asarray(70, jnp.int32)
    got = jax.jit(lambda *a: rpe_pair_scores(*a, n_valid_q=nv, n_valid_k=nv))(e, qw)
    want = rpe_pair_scores(e, qw, n_valid_q=np.int32(70), n_valid_k=np.int32(70),
                           interpret=True)
    return _report("pair_scores", got, want, tol=0.5)


def probe_fused_attention():
    from geotransformer_tpu.kernels.attention import fused_masked_attention

    rng = np.random.default_rng(0)
    h, n, m, dh = 4, 256, 128, 64
    q = jnp.asarray(rng.normal(size=(h, n, dh)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(h, m, dh)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(h, m, dh)), jnp.float32)
    bias = jnp.asarray(rng.normal(size=(n, h, m)), jnp.float32)
    nq = jnp.asarray(100, jnp.int32)
    nk = jnp.asarray(90, jnp.int32)
    got = jax.jit(lambda *a: fused_masked_attention(
        *a, n_valid_q=nq, n_valid_k=nk, scale=0.125))(q, k, v, bias)
    want = fused_masked_attention(q, k, v, bias, n_valid_q=np.int32(100),
                                  n_valid_k=np.int32(90), scale=0.125,
                                  interpret=True)
    return _report("fused_attention", got, want)


PROBES = {
    "clamp_mech": probe_clamp_mech,
    "gse_skip": probe_gse_skip,
    "kpconv_tile_skip": probe_kpconv_tile_skip,
    "pair_scores": probe_pair_scores,
    "fused_attention": probe_fused_attention,
}


def main():
    names = sys.argv[1:] or list(PROBES)
    rc = 0
    for name in names:
        print(f"probing {name} ...", flush=True)
        try:
            rc |= PROBES[name]()
        except Exception as exc:
            print(f"FAIL {name} {type(exc).__name__}: {exc}")
            rc |= 1
    sys.exit(rc)


if __name__ == "__main__":
    main()
