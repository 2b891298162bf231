"""Fused Pallas KPConv kernel vs the XLA module (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.models.kpconv import KPConv
from geotransformer_tpu.kernels.kpconv import kpconv_fused


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
        want_pool = np.asarray(
            maxpool(jnp.asarray(pool_feats), jnp.asarray(neighbors), valid_cols=pool_cols)
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
            pooled = maxpool(pf, nb, valid_cols=pool_cols)
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
