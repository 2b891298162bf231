"""Fused Pallas KPConv kernel vs the XLA module (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.models.kpconv import KPConv
from geotransformer_tpu.kernels.kpconv import TABLE_DTYPE, kpconv_fused


def _table_round(x):
    """Round like the fused kernel's gathered-table storage (TABLE_DTYPE).

    Straight-through for gradients: the Pallas backward distributes pool
    gradients over ties of the ROUNDED values but never rounds cotangents,
    so an XLA reference path must round values while keeping the gradient
    an identity.
    """
    r = jnp.asarray(x).astype(TABLE_DTYPE).astype(jnp.float32)
    return jnp.asarray(x) + jax.lax.stop_gradient(r - jnp.asarray(x))


class TestKPConvFused:
    def _setup(self, rng, n=300, m=200, h=10, cin=16, cout=32):
        s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        s_feats = rng.normal(size=(n, cin)).astype(np.float32)
        neighbors = rng.integers(0, n + 1, (m, h)).astype(np.int32)
        conv = KPConv(cin, cout, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        )
        return s_points, q_points, s_feats, neighbors, conv, variables

    def test_matches_xla_module(self, rng):
        s_points, q_points, s_feats, neighbors, conv, variables = self._setup(rng)
        want = np.asarray(conv.apply(
            variables, jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        ))
        got = np.asarray(kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors),
            variables["constants"]["kernel_points"],
            variables["params"]["weights"],
            sigma=0.08, tile_m=64,
        ))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-2)

    def test_large_coordinate_offsets_precision(self, rng):
        # KITTI-scale regression guard for the offsets-first geometry: with
        # clouds ~70 m from the origin, the old expanded |s|^2 - 2 s.q form
        # loses ~1e-3 of the squared distance to f32 cancellation (visible
        # even in interpret mode) and, on TPU, ran its dots at effective
        # bf16 on absolute coordinates (percent-level influence error).
        # Subtract-then-dot keeps operands offset-sized, so kernel output
        # must track an exact f64 reference tightly at any coordinate scale.
        n, m, h, cin, cout = 300, 200, 10, 16, 32
        center = np.asarray([65.0, -48.0, 7.0], np.float32)
        s_points = (rng.uniform(0, 1, (n, 3)) * 0.5 + center).astype(np.float32)
        q_points = (rng.uniform(0, 1, (m, 3)) * 0.5 + center).astype(np.float32)
        # TABLE_DTYPE-representable features so only geometry error remains
        # (the gathered table stores features at TABLE_DTYPE by design)
        s_feats = np.asarray(
            _table_round(rng.normal(size=(n, cin)).astype(np.float32)))
        neighbors = rng.integers(0, n + 1, (m, h)).astype(np.int32)
        conv = KPConv(cin, cout, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        )
        kp = np.asarray(variables["constants"]["kernel_points"], np.float64)
        w = np.asarray(variables["params"]["weights"], np.float64)
        # exact f64 reference
        sp = np.concatenate([s_points, np.full((1, 3), 1e6, np.float32)], 0)
        sf = np.concatenate([s_feats, np.zeros((1, cin), np.float32)], 0)
        off = sp[neighbors].astype(np.float64) - q_points[:, None, :].astype(np.float64)
        d = np.sqrt(np.sum((off[:, :, None, :] - kp[None, None, :, :]) ** 2, -1))
        infl = np.maximum(1.0 - d / 0.08, 0.0)
        nf = sf[neighbors].astype(np.float64)
        t = np.einsum("mhk,mhc->mkc", infl, nf)
        out = np.einsum("mkc,kcd->md", t, w)
        cnt = np.maximum((nf.sum(-1) > 0).sum(-1), 1)
        want = out / cnt[:, None]
        # f32 contraction for the test so only geometry error remains (the
        # deliberate bf16 feature contraction adds ~0.2% that would mask
        # the ~5% error an expanded-form geometry regression costs here).
        import geotransformer_tpu.kernels.kpconv as kk
        old = kk.MXU_DTYPE
        kk.MXU_DTYPE = jnp.float32
        try:
            got = np.asarray(kpconv_fused(
                jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), variables["constants"]["kernel_points"],
                variables["params"]["weights"], sigma=0.08, tile_m=64,
            ))
        finally:
            kk.MXU_DTYPE = old
        err = np.linalg.norm(got - want) / np.linalg.norm(want)
        assert err < 2e-4, f"large-coordinate relative error {err}"

    def test_ragged_tile(self, rng):
        # m not a multiple of tile_m exercises the padding path
        s_points, q_points, s_feats, neighbors, conv, variables = self._setup(
            rng, m=143
        )
        want = np.asarray(conv.apply(
            variables, jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        ))
        got = np.asarray(kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors),
            variables["constants"]["kernel_points"],
            variables["params"]["weights"],
            sigma=0.08, tile_m=64,
        ))
        np.testing.assert_allclose(got, want, rtol=3e-2, atol=1e-2)

    def test_all_shadow_row(self, rng):
        s_points, q_points, s_feats, neighbors, conv, variables = self._setup(rng)
        neighbors = np.full_like(neighbors, s_points.shape[0])  # all shadow
        got = np.asarray(kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors),
            variables["constants"]["kernel_points"],
            variables["params"]["weights"],
            sigma=0.08, tile_m=64,
        ))
        np.testing.assert_allclose(got, 0.0, atol=1e-6)


class TestKPConvPoolFused:
    """Fused conv+maxpool (strided-shortcut) vs the unfused composition."""

    def _setup(self, rng, n=300, m=200, h=12, cin=16, cout=32, cpool=24):
        s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        s_feats = rng.normal(size=(n, cin)).astype(np.float32)
        pool_feats = rng.normal(size=(n, cpool)).astype(np.float32)
        neighbors = rng.integers(0, n + 1, (m, h)).astype(np.int32)
        conv = KPConv(cin, cout, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        )
        return s_points, q_points, s_feats, pool_feats, neighbors, conv, variables

    def test_matches_unfused(self, rng):
        from geotransformer_tpu.models.kpconv import maxpool

        s_points, q_points, s_feats, pool_feats, neighbors, conv, variables = (
            self._setup(rng)
        )
        pool_cols = 10  # true limit below the padded table width
        want_conv = np.asarray(conv.apply(
            variables, jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        ))
        # pool lanes ride the gathered table, so the fused kernel pools the
        # TABLE_DTYPE-rounded values (rounding is monotone: max of rounded
        # == rounded max)
        want_pool = np.asarray(
            maxpool(_table_round(pool_feats), jnp.asarray(neighbors), valid_cols=pool_cols)
        )
        got_conv, got_pool = kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors),
            variables["constants"]["kernel_points"],
            variables["params"]["weights"],
            sigma=0.08, tile_m=64,
            pool_feats=jnp.asarray(pool_feats), pool_cols=pool_cols,
        )
        np.testing.assert_allclose(np.asarray(got_conv), want_conv, rtol=3e-2, atol=1e-2)
        np.testing.assert_allclose(np.asarray(got_pool), want_pool, rtol=1e-6, atol=1e-6)

    def test_grads_match_unfused(self, rng):
        from geotransformer_tpu.kernels.kpconv import kpconv_pool_fused_diff
        from geotransformer_tpu.models.kpconv import maxpool

        s_points, q_points, s_feats, pool_feats, neighbors, conv, variables = (
            self._setup(rng)
        )
        pool_cols = 10
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        cot_c = jnp.asarray(rng.normal(size=(200, 32)), jnp.float32)
        cot_p = jnp.asarray(rng.normal(size=(200, 24)), jnp.float32)
        sp, qp = jnp.asarray(s_points), jnp.asarray(q_points)
        nb = jnp.asarray(neighbors)

        def loss_xla(f, pf, w):
            out = conv.apply(
                {"constants": {"kernel_points": kp}, "params": {"weights": w}},
                f, qp, sp, nb,
            )
            pooled = maxpool(_table_round(pf), nb, valid_cols=pool_cols)
            return jnp.sum(out * cot_c) + jnp.sum(pooled * cot_p)

        def loss_fused(f, pf, w):
            out, pooled = kpconv_pool_fused_diff(
                f, pf, qp, sp, nb, kp, w, 0.08, None, 64, pool_cols
            )
            return jnp.sum(out * cot_c) + jnp.sum(pooled * cot_p)

        ga = jax.grad(loss_xla, argnums=(0, 1, 2))(
            jnp.asarray(s_feats), jnp.asarray(pool_feats), w)
        gb = jax.grad(loss_fused, argnums=(0, 1, 2))(
            jnp.asarray(s_feats), jnp.asarray(pool_feats), w)
        for name, a, b_ in zip(("s_feats", "pool_feats", "weights"), ga, gb):
            scale = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(b_) / scale, np.asarray(a) / scale, atol=2e-2,
                err_msg=name,
            )


class TestKPConvGradients:
    def test_grads_match_xla_autodiff(self, rng):
        from geotransformer_tpu.kernels.kpconv import kpconv_fused_diff

        n, m, h, cin, cout = 300, 200, 10, 16, 32
        s_points = jnp.asarray(rng.uniform(0, 1, (n, 3)), jnp.float32)
        q_points = jnp.asarray(rng.uniform(0, 1, (m, 3)), jnp.float32)
        s_feats = jnp.asarray(rng.normal(size=(n, cin)), jnp.float32)
        neighbors = jnp.asarray(rng.integers(0, n + 1, (m, h)), jnp.int32)
        conv = KPConv(cin, cout, 15, 0.1, 0.08, use_bias=True)
        variables = conv.init(
            jax.random.PRNGKey(0), s_feats, q_points, s_points, neighbors
        )
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        b = variables["params"]["bias"]
        cot = jnp.asarray(rng.normal(size=(m, cout)), jnp.float32)

        def loss_xla(f, w, b):
            out = conv.apply(
                {"constants": {"kernel_points": kp},
                 "params": {"weights": w, "bias": b}},
                f, q_points, s_points, neighbors,
            )
            return jnp.sum(out * cot)

        def loss_fused(f, w, b):
            out = kpconv_fused_diff(
                f, q_points, s_points, neighbors, kp, w, 0.08, b, 64
            )
            return jnp.sum(out * cot)

        ga = jax.grad(loss_xla, argnums=(0, 1, 2))(s_feats, w, b)
        gb = jax.grad(loss_fused, argnums=(0, 1, 2))(s_feats, w, b)
        for name, a, b_ in zip(("s_feats", "weights", "bias"), ga, gb):
            scale = np.abs(np.asarray(a)).max() + 1e-8
            np.testing.assert_allclose(
                np.asarray(b_) / scale, np.asarray(a) / scale, atol=2e-2,
                err_msg=name,
            )


class TestInverseBackward:
    """Scatter-free inverse backward vs the scatter-add backward."""

    def _setup(self, rng, n=300, m=200, h=10, cin=16, cout=24, j=24):
        import numpy as np
        s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        s_feats = rng.normal(size=(n, cin)).astype(np.float32)
        neighbors = rng.integers(0, n + 1, (m, h)).astype(np.int32)
        # unique per row (the inverse build assumes distinct edges)
        for r in range(m):
            neighbors[r] = np.random.default_rng(r).choice(n + 1, h, replace=False)
        from geotransformer_tpu.preprocess.pyramid import build_inverse_table
        inv = build_inverse_table(neighbors, n, j)
        conv = KPConv(cin, cout, 15, 0.1, 0.08, use_bias=True)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        )
        return s_points, q_points, s_feats, neighbors, inv, variables

    def test_grads_match_scatter_path(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_fused_diff, kpconv_inv_fused_diff,
        )
        s_points, q_points, s_feats, neighbors, inv, variables = self._setup(rng)
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        b = variables["params"]["bias"]

        def loss_old(sf, w_, b_):
            out = kpconv_fused_diff(
                sf, jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), kp, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        def loss_new(sf, w_, b_):
            out = kpconv_inv_fused_diff(
                sf, jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), jnp.asarray(inv), kp, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        args = (jnp.asarray(s_feats), w, b)
        v_old, g_old = jax.value_and_grad(loss_old, argnums=(0, 1, 2))(*args)
        v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2))(*args)
        np.testing.assert_allclose(float(v_old), float(v_new), rtol=1e-6)
        for a, b_ in zip(g_old, g_new):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-2, atol=3e-3)

    def test_pool_grads_match_scatter_path(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_pool_fused_diff, kpconv_pool_inv_fused_diff,
        )
        s_points, q_points, s_feats, neighbors, inv, variables = self._setup(rng)
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        b = variables["params"]["bias"]
        pool = rng.normal(size=(s_points.shape[0], 20)).astype(np.float32)

        # Production invariant required by the inverse pool backward: table
        # columns >= pool_cols are sentinel (pool_cols is the TRUE neighbor
        # limit; wider columns are alignment padding). The support-side
        # backward attributes pool gradient by value equality and cannot
        # know an edge's column (kernels/kpconv.kpconv_bwd_fused docstring).
        pool_cols = 8
        neighbors = neighbors.copy()
        neighbors[:, pool_cols:] = s_points.shape[0]
        from geotransformer_tpu.preprocess.pyramid import build_inverse_table
        inv = build_inverse_table(neighbors, s_points.shape[0], inv.shape[1])

        def loss_old(sf, pf, w_, b_):
            out, pooled = kpconv_pool_fused_diff(
                sf, pf, jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), kp, w_, 0.08, b_, 64, pool_cols)
            return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(pooled))

        def loss_new(sf, pf, w_, b_):
            out, pooled = kpconv_pool_inv_fused_diff(
                sf, pf, jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), jnp.asarray(inv), kp, w_, 0.08, b_,
                64, pool_cols)
            return jnp.sum(jnp.sin(out)) + jnp.sum(jnp.cos(pooled))

        args = (jnp.asarray(s_feats), jnp.asarray(pool), w, b)
        v_old, g_old = jax.value_and_grad(loss_old, argnums=(0, 1, 2, 3))(*args)
        v_new, g_new = jax.value_and_grad(loss_new, argnums=(0, 1, 2, 3))(*args)
        np.testing.assert_allclose(float(v_old), float(v_new), rtol=1e-6)
        for a, b_ in zip(g_old, g_new):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b_), rtol=3e-2, atol=3e-3)


class TestUnionInputKernel:
    """Union-gather input-layer conv vs the edge-gather kernel.

    (A measured-and-rejected default — see kernels/kpconv.py — kept as a
    tested variant for denser-union regimes.)"""

    def test_matches_edge_kernel(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_fused, kpconv_union_input_fused,
        )
        from geotransformer_tpu.preprocess.pyramid import build_union_tables

        n, m, h, k, cout = 500, 300, 12, 15, 64
        sp = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        qp = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        sf = np.abs(rng.normal(size=(n, 1))).astype(np.float32)
        nb = np.stack([
            np.random.default_rng(i).choice(n + 1, h, replace=False)
            for i in range(m)
        ]).astype(np.int32)
        kp = rng.uniform(-0.05, 0.05, (k, 3)).astype(np.float32)
        w = (rng.normal(size=(k, 1, cout)) * 0.1).astype(np.float32)
        bias = rng.normal(size=(cout,)).astype(np.float32)
        want = np.asarray(kpconv_fused(
            jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
            jnp.asarray(nb), jnp.asarray(kp), jnp.asarray(w), 0.08,
            bias=jnp.asarray(bias), tile_m=64))
        u_rows, sel = build_union_tables(nb, n, tile=64, union_cap=512)
        got, counts, t1 = kpconv_union_input_fused(
            jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
            jnp.asarray(u_rows), jnp.asarray(sel), jnp.asarray(kp),
            jnp.asarray(w), 0.08, bias=jnp.asarray(bias), tile_m=64,
            u_chunk=128, return_count=True, return_t1=True)
        rel = np.linalg.norm(np.asarray(got) - want) / np.linalg.norm(want)
        assert rel < 2e-3, rel

    def test_grads_match_input_path(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_input_fused_diff, kpconv_union_input_fused_diff,
        )
        from geotransformer_tpu.preprocess.pyramid import build_union_tables

        n, m, h, k, cout = 300, 200, 10, 15, 32
        sp = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        qp = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        # the edge path stores gathered features at TABLE_DTYPE; the union
        # path keeps f32 — feed both TABLE_DTYPE-representable features so
        # the comparison isolates the kernels' geometry
        sf = np.asarray(_table_round(
            np.abs(rng.normal(size=(n, 1))).astype(np.float32)))
        nb = np.stack([
            np.random.default_rng(i).choice(n + 1, h, replace=False)
            for i in range(m)
        ]).astype(np.int32)
        from geotransformer_tpu.models.kpconv import KPConv
        conv = KPConv(1, cout, 15, 0.1, 0.08, use_bias=True)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(sf), jnp.asarray(qp),
            jnp.asarray(sp), jnp.asarray(nb))
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        b = variables["params"]["bias"]
        u_rows, sel = build_union_tables(nb, n, tile=64, union_cap=512)

        def loss_edge(w_, b_):
            out = kpconv_input_fused_diff(
                jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
                jnp.asarray(nb), kp, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        def loss_union(w_, b_):
            out = kpconv_union_input_fused_diff(
                jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
                jnp.asarray(u_rows), jnp.asarray(sel), kp, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        v1, g1 = jax.value_and_grad(loss_edge, argnums=(0, 1))(w, b)
        v2, g2 = jax.value_and_grad(loss_union, argnums=(0, 1))(w, b)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=3e-2, atol=3e-3)


class TestStreamInputConv:
    """Edge-stream (gather-free) input conv vs the edge-gather kernel."""

    def _setup(self, rng, n=500, m=300, h=12, k=15, cout=64):
        sp = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        qp = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        sf = np.abs(rng.normal(size=(n, 1))).astype(np.float32)
        sf[rng.uniform(size=n) < 0.1] = 0.0  # exercise the posflag path
        nb = np.stack([
            np.random.default_rng(i).choice(n + 1, h, replace=False)
            for i in range(m)
        ]).astype(np.int32)
        kp = rng.uniform(-0.05, 0.05, (k, 3)).astype(np.float32)
        w = (rng.normal(size=(k, 1, cout)) * 0.1).astype(np.float32)
        bias = rng.normal(size=(cout,)).astype(np.float32)
        # manual stream (build_input_stream assumes q == s, the stage-0
        # self-neighbor layout; here q and s differ)
        valid = nb < n
        idx = np.where(valid, nb, 0)
        off = np.where(valid[..., None], sp[idx] - qp[:, None, :], 0.0)
        flag = (valid & (sf[idx, 0] > 0)).astype(np.float32)
        featv = np.where(valid, sf[idx, 0], 0.0).astype(np.float32)
        stream = np.stack(
            [off[..., 0], off[..., 1], off[..., 2], flag, featv], axis=0
        ).astype(np.float32)
        return sp, qp, sf, nb, kp, w, bias, stream

    def test_matches_edge_kernel(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_fused, kpconv_stream_fused,
        )

        sp, qp, sf, nb, kp, w, bias, stream = self._setup(rng)
        want, want_counts, want_t1 = kpconv_fused(
            jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
            jnp.asarray(nb), jnp.asarray(kp), jnp.asarray(w), 0.08,
            bias=jnp.asarray(bias), tile_m=64, return_count=True,
            return_t1=True)
        got, counts, t1 = kpconv_stream_fused(
            jnp.asarray(stream), jnp.asarray(kp), jnp.asarray(w), 0.08,
            bias=jnp.asarray(bias), tile_m=64, return_count=True,
            return_t1=True)
        np.testing.assert_array_equal(np.asarray(counts), np.asarray(want_counts))
        np.testing.assert_allclose(
            np.asarray(t1), np.asarray(want_t1), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)

    def test_grads_match_input_path(self, rng):
        from geotransformer_tpu.kernels.kpconv import (
            kpconv_input_fused_diff, kpconv_stream_input_diff,
        )

        sp, qp, sf, nb, kp, w, bias, stream = self._setup(rng)
        kp_j, w_j, b_j = jnp.asarray(kp), jnp.asarray(w), jnp.asarray(bias)

        def loss_edge(w_, b_):
            out = kpconv_input_fused_diff(
                jnp.asarray(sf), jnp.asarray(qp), jnp.asarray(sp),
                jnp.asarray(nb), kp_j, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        def loss_stream(w_, b_):
            out = kpconv_stream_input_diff(
                jnp.asarray(stream), kp_j, w_, 0.08, b_, 64)
            return jnp.sum(jnp.sin(out))

        v1, g1 = jax.value_and_grad(loss_edge, argnums=(0, 1))(w_j, b_j)
        v2, g2 = jax.value_and_grad(loss_stream, argnums=(0, 1))(w_j, b_j)
        np.testing.assert_allclose(float(v1), float(v2), rtol=1e-4)
        for a, c in zip(g1, g2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(c), rtol=1e-3, atol=1e-4)

    def test_build_input_stream_matches_gather(self, rng):
        """build_input_stream (padded pair frame, q == s) vs direct numpy."""
        from geotransformer_tpu.preprocess.pyramid import build_input_stream

        t0, h = 64, 10
        points = rng.uniform(0, 1, (t0, 3)).astype(np.float32)
        feats = np.ones((t0, 1), np.float32)
        feats[50:] = 0.0  # padded rows
        table = rng.integers(0, t0 + 1, (t0, h)).astype(np.int32)
        stream = build_input_stream(points, feats, table)
        assert stream.shape == (5, t0, h)
        for m in range(t0):
            for c in range(h):
                n = table[m, c]
                if n >= t0:
                    np.testing.assert_array_equal(stream[:, m, c], 0.0)
                else:
                    np.testing.assert_allclose(
                        stream[:3, m, c], points[n] - points[m], rtol=1e-6)
                    assert stream[3, m, c] == (1.0 if feats[n, 0] > 0 else 0.0)
                    assert stream[4, m, c] == feats[n, 0]


class TestValidTileSkip:
    """q_mask tile skip: identical outputs, shadow tiles written as the
    compute path would (zeros; count floor under normalize)."""

    def _masked_setup(self, rng, m=384, n=300, h=10, cin=16, cout=32):
        s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        s_feats = rng.normal(size=(n, cin)).astype(np.float32)
        neighbors = rng.integers(0, n + 1, (m, h)).astype(np.int32)
        # two valid prefixes (pair frame): rows [0, 100) and [192, 290)
        mask = np.zeros((m,), bool)
        mask[:100] = True
        mask[192:290] = True
        # padding rows carry all-sentinel neighbors (the collate contract)
        neighbors[~mask] = n
        return s_points, q_points, s_feats, neighbors, mask

    def test_tile_rep_from_mask(self):
        from geotransformer_tpu.kernels.kpconv import tile_rep_from_mask

        mask = np.zeros((384,), bool)
        mask[:100] = True   # tiles 0, 1 (tile_m=64) valid
        mask[192:290] = True  # tiles 3, 4 valid
        rep = np.asarray(tile_rep_from_mask(jnp.asarray(mask), 64, 6))
        np.testing.assert_array_equal(rep, [0, 1, 1, 3, 4, 4])
        # leading padding clamps to 0 (treated valid -> computed, exact)
        mask2 = np.zeros((128,), bool)
        mask2[80:] = True
        rep2 = np.asarray(tile_rep_from_mask(jnp.asarray(mask2), 64, 2))
        np.testing.assert_array_equal(rep2, [0, 1])

    def test_masked_matches_unmasked(self, rng):
        s_points, q_points, s_feats, neighbors, mask = self._masked_setup(rng)
        conv = KPConv(16, 32, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors))
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        base = np.asarray(kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors), kp, w, sigma=0.08, tile_m=64))
        got = np.asarray(kpconv_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(neighbors), kp, w, sigma=0.08, tile_m=64,
            q_mask=jnp.asarray(mask)))
        np.testing.assert_array_equal(got, base)

    def test_masked_counts_and_pool(self, rng):
        from geotransformer_tpu.kernels.kpconv import kpconv_split_fused
        from geotransformer_tpu.preprocess.pyramid import build_split_tables

        s_points, q_points, s_feats, neighbors, mask = self._masked_setup(rng)
        pool_feats = rng.normal(size=(s_feats.shape[0], 8)).astype(np.float32)
        conv = KPConv(16, 32, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors))
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]
        tail, tail_q, rank = build_split_tables(
            neighbors, s_points.shape[0], h1=8, m2_cap=256)
        head = neighbors[:, :8]
        base = kpconv_split_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(head), jnp.asarray(tail), jnp.asarray(tail_q),
            jnp.asarray(rank), kp, w, 0.08, tile_m=64,
            pool_feats=jnp.asarray(pool_feats), pool_cols=10)
        got = kpconv_split_fused(
            jnp.asarray(s_feats), jnp.asarray(q_points), jnp.asarray(s_points),
            jnp.asarray(head), jnp.asarray(tail), jnp.asarray(tail_q),
            jnp.asarray(rank), kp, w, 0.08, tile_m=64,
            pool_feats=jnp.asarray(pool_feats), pool_cols=10,
            q_mask=jnp.asarray(mask))
        for b, g in zip(base, got):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(b))

    def test_masked_grads_match(self, rng):
        from geotransformer_tpu.kernels.kpconv import kpconv_fused_diff

        s_points, q_points, s_feats, neighbors, mask = self._masked_setup(rng)
        conv = KPConv(16, 32, 15, 0.1, 0.08)
        variables = conv.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors))
        kp = variables["constants"]["kernel_points"]
        w = variables["params"]["weights"]

        def loss(sf, wt, qm):
            out = kpconv_fused_diff(
                sf, jnp.asarray(q_points), jnp.asarray(s_points),
                jnp.asarray(neighbors), kp, wt, 0.08, None, 64, qm)
            return jnp.sum(out * out)

        g_base = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(s_feats), w, None)
        g_mask = jax.grad(loss, argnums=(0, 1))(
            jnp.asarray(s_feats), w, jnp.asarray(mask))
        for b, g in zip(g_base, g_mask):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(b))
