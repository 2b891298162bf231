#!/usr/bin/env python
"""Microbenchmark KPConv internals at stage-0 scale to find the hot part."""

import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from geotransformer_tpu.utils.timing import fetch_diff_ms
from geotransformer_tpu.ops.gather import gather_with_shadow

M, H, K, C = 38144, 38, 15, 64


def main():
    rng = np.random.default_rng(0)
    s_points = jnp.asarray(rng.uniform(0, 1, (M, 3)), jnp.float32)
    q_points = s_points
    s_feats = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)
    neighbors = jnp.asarray(rng.integers(0, M + 1, (M, H)), jnp.int32)
    kernel_points = jnp.asarray(rng.normal(size=(K, 3)) * 0.04, jnp.float32)
    weights = jnp.asarray(rng.normal(size=(K, C, C)) * 0.01, jnp.float32)

    def gather_only(s_feats, neighbors):
        return gather_with_shadow(s_feats, neighbors, 0.0)

    ms = fetch_diff_ms(gather_only, (s_feats, neighbors), lambda o: jnp.sum(o))
    print(f"{'gather feats (M,H,C)':35s}: {ms:8.2f} ms", flush=True)

    def influence_only(s_points, neighbors):
        nb = gather_with_shadow(s_points, neighbors, 1e6) - q_points[:, None, :]
        sq_n = jnp.sum(nb**2, axis=-1, keepdims=True)
        sq_k = jnp.sum(kernel_points**2, axis=-1)[None, None, :]
        nk = jnp.einsum("mhd,kd->mhk", nb, kernel_points)
        sq = jnp.maximum(sq_n - 2 * nk + sq_k, 1e-20)
        return jnp.maximum(1.0 - jnp.sqrt(sq) / 0.05, 0.0)

    ms = fetch_diff_ms(influence_only, (s_points, neighbors), lambda o: jnp.sum(o))
    print(f"{'influence (M,H,K)':35s}: {ms:8.2f} ms", flush=True)

    def matmul1(influence, nf):
        return jnp.einsum("mhk,mhc->mkc", influence, nf, preferred_element_type=jnp.float32)

    infl = influence_only(s_points, neighbors)
    nf = gather_only(s_feats, neighbors)
    ms = fetch_diff_ms(matmul1, (infl, nf), lambda o: jnp.sum(o))
    print(f"{'einsum mhk,mhc->mkc':35s}: {ms:8.2f} ms", flush=True)

    wf = matmul1(infl, nf)

    def matmul2(wf):
        return jnp.einsum("mkc,kcd->md", wf, weights, preferred_element_type=jnp.float32)

    ms = fetch_diff_ms(matmul2, (wf,), lambda o: jnp.sum(o))
    print(f"{'einsum mkc,kcd->md':35s}: {ms:8.2f} ms", flush=True)

    # alternative formulation: (M, K*C) @ (K*C, C)
    w2 = weights.reshape(K * C, C)

    def matmul2_flat(wf):
        return jnp.dot(wf.reshape(M, K * C), w2, preferred_element_type=jnp.float32)

    ms = fetch_diff_ms(matmul2_flat, (wf,), lambda o: jnp.sum(o))
    print(f"{'flat (M,KC)@(KC,C)':35s}: {ms:8.2f} ms", flush=True)

    # full KPConv module
    from geotransformer_tpu.models.kpconv import KPConv

    conv = KPConv(C, C, K, 0.0625, 0.05)
    variables = jax.jit(lambda r: conv.init(r, s_feats, q_points, s_points, neighbors))(
        jax.random.PRNGKey(0)
    )
    ms = fetch_diff_ms(
        lambda v, f: conv.apply(v, f, q_points, s_points, neighbors),
        (variables, s_feats), lambda o: jnp.sum(o),
    )
    print(f"{'full KPConv (64->64)':35s}: {ms:8.2f} ms", flush=True)

    # partition at fine/coarse scale
    from geotransformer_tpu.ops.partition import point_to_node_partition

    pf = jnp.asarray(rng.uniform(0, 1, (5376, 3)), jnp.float32)
    pc = jnp.asarray(rng.uniform(0, 1, (512, 3)), jnp.float32)
    ms = fetch_diff_ms(
        lambda a, b: point_to_node_partition(a, b, 64)[2],
        (pf, pc), lambda o: jnp.sum(o),
    )
    print(f"{'partition 5376x512 (x2 in model)':35s}: {ms:8.2f} ms", flush=True)

    # GSE embedding alone (N=512)
    from geotransformer_tpu.models.transformer import GeometricStructureEmbedding

    gse = GeometricStructureEmbedding(256, 0.2, 15.0, 3)
    pts = jnp.asarray(rng.uniform(0, 1, (1, 512, 3)), jnp.float32)
    gv = jax.jit(lambda r: gse.init(r, pts))(jax.random.PRNGKey(0))
    ms = fetch_diff_ms(lambda v, p: gse.apply(v, p), (gv, pts), lambda o: jnp.sum(o))
    print(f"{'GSE embedding (N=512) (x2 in model)':35s}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
