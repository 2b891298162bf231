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


class TestSinkhornTrainKernel:
    """Differentiable Pallas Sinkhorn (custom_vjp, in-VMEM backward) vs the
    XLA scan backend: forward AND gradients must match."""

    def _setup(self, rng, b=5, m=12, n=14, iters=20):
        from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

        scores = rng.normal(size=(b, m, n)).astype(np.float32)
        row_masks = rng.uniform(size=(b, m)) > 0.2
        col_masks = rng.uniform(size=(b, n)) > 0.2
        scan_mod = LearnableLogOptimalTransport(num_iterations=iters, backend="scan")
        vjp_mod = LearnableLogOptimalTransport(
            num_iterations=iters, backend="pallas_vjp")
        variables = scan_mod.init(
            jax.random.PRNGKey(0), jnp.asarray(scores),
            jnp.asarray(row_masks), jnp.asarray(col_masks))
        args = (jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks))
        return scan_mod, vjp_mod, variables, args

    def test_forward_matches_scan(self, rng):
        scan_mod, vjp_mod, variables, args = self._setup(rng)
        want = np.asarray(scan_mod.apply(variables, *args))
        got = np.asarray(vjp_mod.apply(variables, *args))
        valid = want > -1e9
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-4)

    def test_gradients_match_scan(self, rng):
        scan_mod, vjp_mod, variables, args = self._setup(rng)
        scores, row_masks, col_masks = args
        # masked-NLL-style loss touching scores and the learnable alpha
        b, m, n = scores.shape
        w = jnp.asarray(rng.normal(size=(b, m + 1, n + 1)).astype(np.float32))
        valid = jnp.logical_and(
            jnp.concatenate([row_masks, jnp.ones((b, 1), bool)], 1)[:, :, None],
            jnp.concatenate([col_masks, jnp.ones((b, 1), bool)], 1)[:, None, :],
        )

        def loss(mod, v, s):
            out = mod.apply(v, s, row_masks, col_masks)
            return jnp.sum(jnp.where(valid, out * w, 0.0))

        g_scan = jax.grad(lambda v, s: loss(scan_mod, v, s), argnums=(0, 1))(
            variables, scores)
        g_vjp = jax.grad(lambda v, s: loss(vjp_mod, v, s), argnums=(0, 1))(
            variables, scores)
        for a, b_ in zip(jax.tree.leaves(g_scan), jax.tree.leaves(g_vjp)):
            np.testing.assert_allclose(
                np.asarray(b_), np.asarray(a), rtol=2e-3, atol=2e-4)


class TestOverlapKernel:
    """VMEM overlap kernel vs the chunked XLA path of
    get_node_correspondences."""

    def test_matches_xla_path(self, rng):
        import jax
        import jax.numpy as jnp
        from geotransformer_tpu.models.matching import get_node_correspondences

        m, n, k = 40, 36, 16
        ref_nodes = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        src_nodes = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        ref_knn = ref_nodes[:, None, :] + 0.08 * rng.normal(size=(m, k, 3)).astype(np.float32)
        src_knn = src_nodes[:, None, :] + 0.08 * rng.normal(size=(n, k, 3)).astype(np.float32)
        ref_masks = jnp.asarray(rng.uniform(size=(m,)) > 0.1)
        src_masks = jnp.asarray(rng.uniform(size=(n,)) > 0.1)
        ref_knn_masks = jnp.asarray(rng.uniform(size=(m, k)) > 0.2)
        src_knn_masks = jnp.asarray(rng.uniform(size=(n, k)) > 0.2)
        transform = jnp.eye(4)

        args = dict(
            ref_masks=ref_masks, src_masks=src_masks,
            ref_knn_masks=ref_knn_masks, src_knn_masks=src_knn_masks,
            num_candidates=8, chunk_size=8,
        )
        want = get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes),
            jnp.asarray(ref_knn), jnp.asarray(src_knn), transform, 0.1,
            use_pallas=False, **args)
        got = get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes),
            jnp.asarray(ref_knn), jnp.asarray(src_knn), transform, 0.1,
            use_pallas=True, **args)
        np.testing.assert_array_equal(np.asarray(got[0]), np.asarray(want[0]))
        np.testing.assert_allclose(
            np.asarray(got[1]), np.asarray(want[1]), rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(got[2]), np.asarray(want[2]))

    def test_candidate_chunking_matches_unchunked(self, rng, monkeypatch):
        """KITTI-shaped (S, K) overflows the kernel's VMEM stack unchunked;
        the in-kernel candidate chunk loop must be bit-identical to the
        single-pass computation."""
        import jax.numpy as jnp
        from geotransformer_tpu.kernels import overlap

        m, s, k = 16, 12, 16
        ref_knn = rng.uniform(0, 1, (m, k, 3)).astype(np.float32)
        cand_knn = rng.uniform(0, 1, (m, s, k, 3)).astype(np.float32)
        ref_masks = rng.uniform(size=(m, k)) > 0.2
        cand_masks = rng.uniform(size=(m, s, k)) > 0.2

        full = overlap.patch_overlaps(
            jnp.asarray(ref_knn), jnp.asarray(ref_masks),
            jnp.asarray(cand_knn), jnp.asarray(cand_masks), 0.1)
        monkeypatch.setattr(overlap, "_auto_s_chunk", lambda *a, **kw: 5)
        chunked = overlap.patch_overlaps(
            jnp.asarray(ref_knn), jnp.asarray(ref_masks),
            jnp.asarray(cand_knn), jnp.asarray(cand_masks), 0.1)
        np.testing.assert_array_equal(np.asarray(chunked), np.asarray(full))

    def test_auto_s_chunk_fits_kitti_shapes(self):
        from geotransformer_tpu.kernels.overlap import _auto_s_chunk

        # KITTI: S=64 candidates, K=128 patch points; the unchunked stack
        # (~100 MB) must shrink under the budget
        sc = _auto_s_chunk(8, 64, 128)
        assert sc < 64
        assert 8 * sc * 3 * 128 * 128 * 4 <= 48 * 1024 * 1024
        # 3DMatch: S=64, K=64 stays unchunked
        assert _auto_s_chunk(8, 64, 64) == 64
