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
