"""Pallas kernel correctness tests (interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp


class TestSinkhornKernel:
    def test_matches_scan_backend(self, rng):
        from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

        b, m, n = 6, 16, 20
        scores = rng.normal(size=(b, m, n)).astype(np.float32)
        row_masks = rng.uniform(size=(b, m)) > 0.2
        col_masks = rng.uniform(size=(b, n)) > 0.2

        scan_mod = LearnableLogOptimalTransport(num_iterations=25, backend="scan")
        pallas_mod = LearnableLogOptimalTransport(num_iterations=25, backend="pallas")
        variables = scan_mod.init(
            jax.random.PRNGKey(0), jnp.asarray(scores),
            jnp.asarray(row_masks), jnp.asarray(col_masks),
        )
        want = np.asarray(scan_mod.apply(
            variables, jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks)
        ))
        got = np.asarray(pallas_mod.apply(
            variables, jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks)
        ))
        valid = want > -1e9
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-4)
        assert (got[~valid] < -1e9).all()

    def test_all_valid(self, rng):
        from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

        scores = rng.normal(size=(2, 8, 8)).astype(np.float32)
        scan_mod = LearnableLogOptimalTransport(num_iterations=50, backend="scan")
        pallas_mod = LearnableLogOptimalTransport(num_iterations=50, backend="pallas")
        variables = scan_mod.init(jax.random.PRNGKey(1), jnp.asarray(scores))
        want = np.asarray(scan_mod.apply(variables, jnp.asarray(scores)))
        got = np.asarray(pallas_mod.apply(variables, jnp.asarray(scores)))
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
        # converged transport plan: regular rows sum to their marginal (1.0)
        plan = np.exp(got)
        np.testing.assert_allclose(plan[:, :8, :].sum(axis=2), 1.0, atol=1e-3)
