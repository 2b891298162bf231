"""Fused Pallas GSE kernel vs the XLA module (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.models.transformer import GeometricStructureEmbedding


class TestGSEFused:
    def _run(self, rng, n=70, masks=None):
        points = jnp.asarray(rng.uniform(0, 1, (1, n, 3)), jnp.float32)
        xla = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        variables = xla.init(jax.random.PRNGKey(0), points, masks)
        want = xla.apply(variables, points, masks)
        fused = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        got = fused.apply(variables, points, masks)
        return np.asarray(want), np.asarray(got)

    def test_matches_xla_module(self, rng):
        want, got = self._run(rng)
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)

    def test_with_masks(self, rng):
        n = 70
        masks = jnp.asarray(
            np.concatenate([np.ones(50, bool), np.zeros(n - 50, bool)])
        )[None]
        want, got = self._run(rng, n=n, masks=masks)
        # compare only valid-x-valid tiles; junk rows/cols are masked downstream
        np.testing.assert_allclose(
            got[:, :50, :50], want[:, :50, :50], rtol=2e-2, atol=1e-2
        )

    def test_param_structure_unchanged(self, rng):
        points = jnp.asarray(rng.uniform(0, 1, (1, 40, 3)), jnp.float32)
        a = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        b = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        va = a.init(jax.random.PRNGKey(0), points)
        vb = b.init(jax.random.PRNGKey(0), points)
        assert jax.tree.structure(va) == jax.tree.structure(vb)


class TestGSEGradients:
    def test_param_grads_match_xla(self, rng):
        points = jnp.asarray(rng.uniform(0, 1, (1, 70, 3)), jnp.float32)
        cot = jnp.asarray(rng.normal(size=(1, 70, 70, 64)), jnp.float32)
        xla = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        fused = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        variables = xla.init(jax.random.PRNGKey(0), points)

        def loss(mod):
            return lambda params: jnp.sum(
                mod.apply({**variables, "params": params}, points) * cot
            )

        g_xla = jax.grad(loss(xla))(variables["params"])
        g_fused = jax.grad(loss(fused))(variables["params"])
        for name in ("proj_d", "proj_a"):
            for leaf in ("kernel", "bias"):
                a = np.asarray(g_xla[name][leaf])
                b = np.asarray(g_fused[name][leaf])
                scale = np.abs(a).max() + 1e-8
                # atol 5e-2: the angle branch max is computed from bf16
                # bases, so near-ties can route a cotangent to a different k
                # than the f32 XLA max — a subgradient choice. Tie-routed
                # slots move by O(cotangent), so allow a small fraction of
                # outliers instead of loosening the bulk tolerance.
                rel = np.abs(b - a) / scale
                frac_out = (rel > 5e-2).mean()
                assert frac_out <= 0.005, (
                    f"{name}/{leaf}: {frac_out:.4f} of grads off by >5% "
                    f"(max rel {rel.max():.3f})"
                )


class TestGSEShapes:
    """Kernel parity across the shipped config dimensions (interpret mode)."""

    def _check(self, rng, n, hidden, sigma_d, sigma_a, k):
        points = jnp.asarray(rng.uniform(0, 2, (1, n, 3)), jnp.float32)
        xla = GeometricStructureEmbedding(hidden, sigma_d, sigma_a, k)
        fused = GeometricStructureEmbedding(hidden, sigma_d, sigma_a, k, use_pallas=True)
        variables = xla.init(jax.random.PRNGKey(1), points)
        want = np.asarray(xla.apply(variables, points))
        got = np.asarray(fused.apply(variables, points))
        np.testing.assert_allclose(got, want, rtol=2e-2, atol=1e-2)

    def test_kitti_dims(self, rng):
        # hidden 128, sigma_d 4.8 (kitti config), odd N exercising padding
        self._check(rng, n=77, hidden=128, sigma_d=4.8, sigma_a=15.0, k=3)

    def test_modelnet_dims(self, rng):
        self._check(rng, n=33, hidden=64, sigma_d=0.1, sigma_a=15.0, k=3)

    def test_angle_k_2(self, rng):
        self._check(rng, n=50, hidden=64, sigma_d=0.2, sigma_a=15.0, k=2)


class TestGSERectangleSkip:
    """Valid-rectangle tile skip: masked-prefix clouds skip padding tiles
    (zero output) while the valid rectangle matches the XLA module."""

    def test_multi_tile_skip_zeros_and_parity(self, rng):
        # n=200 spans several 64x128 tiles; valid prefix 90 leaves whole
        # tiles (rows 128.., cols 128..) inside the padding band
        n, nv = 200, 90
        points = np.asarray(rng.uniform(0, 1, (1, n, 3)), np.float32)
        points[0, nv:] = 1.0e6  # PAD_COORD convention
        points = jnp.asarray(points)
        masks = jnp.asarray(np.arange(n) < nv)[None]
        xla = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        fused = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        variables = xla.init(jax.random.PRNGKey(0), points, masks)
        want = np.asarray(xla.apply(variables, points, masks))
        got = np.asarray(fused.apply(variables, points, masks))
        np.testing.assert_allclose(
            got[:, :nv, :nv], want[:, :nv, :nv], rtol=2e-2, atol=1e-2)
        # tiles fully inside the padding band are written as exact zeros
        assert (got[:, 128:, :] == 0).all()
        assert (got[:, :, 128:] == 0).all()
        assert np.isfinite(got).all()

    def test_non_prefix_mask_falls_back_to_full(self, rng):
        # a hole in the mask (never produced by pad_registration_batch) must
        # disable the skip: every valid-row pair still matches the XLA module
        n = 70
        m = np.ones(n, bool)
        m[10:20] = False
        masks = jnp.asarray(m)[None]
        points = jnp.asarray(rng.uniform(0, 1, (1, n, 3)), jnp.float32)
        xla = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        fused = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        variables = xla.init(jax.random.PRNGKey(0), points, masks)
        want = np.asarray(xla.apply(variables, points, masks))
        got = np.asarray(fused.apply(variables, points, masks))
        valid = np.nonzero(m)[0]
        np.testing.assert_allclose(
            got[:, valid][:, :, valid], want[:, valid][:, :, valid],
            rtol=2e-2, atol=1e-2)

    def test_masked_param_grads_match_xla(self, rng):
        """Training-path exactness: cotangents vanish at masked slots (the
        attention mask is a where-select), so the skipped tiles contribute
        exactly zero gradient — parity with the XLA module under a masked
        cotangent."""
        n, nv = 200, 90
        points = jnp.asarray(rng.uniform(0, 1, (1, n, 3)), jnp.float32)
        masks = jnp.asarray(np.arange(n) < nv)[None]
        cot = np.asarray(rng.normal(size=(1, n, n, 64)), np.float32)
        cot[0, nv:] = 0.0
        cot[0, :, nv:] = 0.0
        cot = jnp.asarray(cot)
        xla = GeometricStructureEmbedding(64, 0.2, 15.0, 3)
        fused = GeometricStructureEmbedding(64, 0.2, 15.0, 3, use_pallas=True)
        variables = xla.init(jax.random.PRNGKey(0), points, masks)

        def loss(mod):
            return lambda params: jnp.sum(
                mod.apply({**variables, "params": params}, points, masks) * cot
            )

        g_xla = jax.grad(loss(xla))(variables["params"])
        g_fused = jax.grad(loss(fused))(variables["params"])
        for name in ("proj_d", "proj_a"):
            for leaf in ("kernel", "bias"):
                a = np.asarray(g_xla[name][leaf])
                b = np.asarray(g_fused[name][leaf])
                scale = np.abs(a).max() + 1e-8
                rel = np.abs(b - a) / scale
                assert (rel > 5e-2).mean() <= 0.005, (
                    f"{name}/{leaf}: max rel {rel.max():.3f}")
