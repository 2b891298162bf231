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
