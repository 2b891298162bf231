"""Tests: PointMatching parity, transformer variants smoke, RANSAC."""

import numpy as np
import jax
import jax.numpy as jnp


class TestPointMatching:
    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.geotransformer.point_matching import (
            PointMatching as RefPM,
        )
        from geotransformer_tpu.models.point_matching import point_matching

        p, k = 5, 12
        log_scores = rng.normal(size=(p, k, k)).astype(np.float32) - 2.0
        ref_knn_points = rng.uniform(0, 1, (p, k, 3)).astype(np.float32)
        src_knn_points = rng.uniform(0, 1, (p, k, 3)).astype(np.float32)
        ref_masks = rng.uniform(size=(p, k)) > 0.15
        src_masks = rng.uniform(size=(p, k)) > 0.15
        ref_idx = rng.integers(0, 500, (p, k))
        src_idx = rng.integers(0, 500, (p, k))

        ref_mod = RefPM(3, mutual=True, confidence_threshold=0.05)
        w_rp, w_sp, w_ri, w_si, w_sc = ref_mod(
            torch.from_numpy(ref_knn_points), torch.from_numpy(src_knn_points),
            torch.from_numpy(ref_masks), torch.from_numpy(src_masks),
            torch.from_numpy(ref_idx), torch.from_numpy(src_idx),
            torch.from_numpy(log_scores), None,
        )
        got = point_matching(
            jnp.asarray(ref_knn_points), jnp.asarray(src_knn_points),
            jnp.asarray(ref_masks), jnp.asarray(src_masks),
            jnp.asarray(ref_idx), jnp.asarray(src_idx),
            jnp.asarray(log_scores),
            k=3, correspondence_limit=256,
        )
        masks = np.asarray(got["corr_masks"])
        got_pairs = set(
            zip(np.asarray(got["ref_corr_indices"])[masks].tolist(),
                np.asarray(got["src_corr_indices"])[masks].tolist())
        )
        want_pairs = set(zip(w_ri.numpy().tolist(), w_si.numpy().tolist()))
        assert got_pairs == want_pairs
        np.testing.assert_allclose(
            np.sort(np.asarray(got["corr_scores"])[masks]),
            np.sort(w_sc.numpy()), rtol=1e-4, atol=1e-6,
        )


class TestTransformerVariants:
    def _smoke(self, module, *args):
        variables = module.init(jax.random.PRNGKey(0), *args)
        out0, out1 = module.apply(variables, *args)
        assert np.isfinite(np.asarray(out0)).all()
        assert np.isfinite(np.asarray(out1)).all()
        return out0, out1

    def test_vanilla(self, rng):
        from geotransformer_tpu.models.transformer_variants import VanillaConditionalTransformer

        f0 = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 12, 32)).astype(np.float32))
        self._smoke(VanillaConditionalTransformer(("self", "cross"), 32, 4), f0, f1)

    def test_pe(self, rng):
        from geotransformer_tpu.models.transformer_variants import PEConditionalTransformer

        f0 = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 12, 32)).astype(np.float32))
        e0 = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
        e1 = jnp.asarray(rng.normal(size=(1, 12, 32)).astype(np.float32))
        self._smoke(PEConditionalTransformer(("self", "cross"), 32, 4), f0, f1, e0, e1)

    def test_lrpe(self, rng):
        from geotransformer_tpu.models.transformer_variants import LRPEConditionalTransformer

        f0 = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
        f1 = jnp.asarray(rng.normal(size=(1, 12, 32)).astype(np.float32))
        i0 = jnp.asarray(rng.integers(0, 8, (1, 10, 10)))
        i1 = jnp.asarray(rng.integers(0, 8, (1, 12, 12)))
        self._smoke(LRPEConditionalTransformer(("self", "cross"), 32, 4, 16), f0, f1, i0, i1)

    def test_encoder_decoder(self, rng):
        from geotransformer_tpu.models.transformer import TransformerEncoder, TransformerDecoder

        feats = jnp.asarray(rng.normal(size=(1, 10, 32)).astype(np.float32))
        enc = TransformerEncoder(32, 4, 2)
        v = enc.init(jax.random.PRNGKey(0), feats)
        out = enc.apply(v, feats)
        assert out.shape == feats.shape
        mem = jnp.asarray(rng.normal(size=(1, 14, 32)).astype(np.float32))
        dec = TransformerDecoder(32, 4, 2)
        v = dec.init(jax.random.PRNGKey(0), feats, mem)
        out = dec.apply(v, feats, mem)
        assert out.shape == feats.shape


class TestRansac:
    def test_recovers_transform(self, rng):
        from geotransformer_tpu.utils.ransac import registration_with_ransac_from_correspondences
        from geotransformer_tpu.utils.pointcloud import (
            random_sample_transform,
            apply_transform,
        )
        from geotransformer_tpu.utils.registration import compute_registration_error

        np.random.seed(3)
        T = random_sample_transform(45.0, 0.5)
        src = np.random.uniform(0, 1, (200, 3))
        ref = apply_transform(src, T)
        # corrupt 40% with outliers
        n_out = 80
        ref_noisy = ref.copy()
        ref_noisy[:n_out] += np.random.uniform(1, 2, (n_out, 3))
        est = registration_with_ransac_from_correspondences(
            src, ref_noisy, distance_threshold=0.05, num_iterations=500
        )
        rre, rte = compute_registration_error(T, est)
        assert rre < 0.5 and rte < 0.01

    def test_degenerate_few_points(self):
        from geotransformer_tpu.utils.ransac import registration_with_ransac_from_correspondences

        src = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
        ref = src + np.asarray([0.5, 0, 0], np.float32)
        est = registration_with_ransac_from_correspondences(src, ref)
        assert est.shape == (4, 4)
        np.testing.assert_allclose(est[:3, 3], [0.5, 0, 0], atol=1e-5)

    def test_ransac_from_featurematch(self):
        """Feature-matching RANSAC (reference utils/open3d.py:133-168):
        recovers the pose from descriptors alone, incl. with a fraction of
        ambiguous (duplicate) descriptors."""
        from geotransformer_tpu.utils.ransac import (
            registration_with_ransac_from_featurematch,
        )
        from geotransformer_tpu.utils.pointcloud import (
            random_sample_transform,
            apply_transform,
        )
        from geotransformer_tpu.utils.registration import compute_registration_error

        rng = np.random.default_rng(7)
        T = random_sample_transform(45.0, 0.5)
        src = rng.uniform(0, 1, (300, 3))
        ref = apply_transform(src, T)
        feats = rng.normal(size=(300, 32)).astype(np.float32)
        src_feats = feats + 0.01 * rng.normal(size=feats.shape).astype(np.float32)
        # make 20% of descriptors ambiguous (copies of other rows)
        dup = rng.integers(0, 300, 60)
        src_feats[:60] = feats[dup] + 0.01 * rng.normal(size=(60, 32))
        est = registration_with_ransac_from_featurematch(
            src, ref, src_feats, feats,
            distance_threshold=0.05, num_iterations=2000,
        )
        rre, rte = compute_registration_error(T, est)
        assert rre < 0.5 and rte < 0.01

    def test_ransac_from_featurematch_few_points(self):
        from geotransformer_tpu.utils.ransac import (
            registration_with_ransac_from_featurematch,
        )

        src = np.asarray([[0, 0, 0], [1, 0, 0]], np.float32)
        ref = src + np.asarray([0.5, 0, 0], np.float32)
        feats = np.asarray([[1, 0], [0, 1]], np.float32)
        est = registration_with_ransac_from_featurematch(src, ref, feats, feats)
        assert est.shape == (4, 4)
        np.testing.assert_allclose(est[:3, 3], [0.5, 0, 0], atol=1e-5)


class TestQuaternionProcrustes:
    """quat (TPU latency path) vs svd Kabsch on clean / noisy / planar sets."""

    def test_matches_svd(self, rng):
        import jax.numpy as jnp
        from scipy.spatial.transform import Rotation
        from geotransformer_tpu.models.procrustes import weighted_procrustes

        B, N = 32, 40
        R_true = Rotation.random(B, random_state=3).as_matrix().astype(np.float32)
        t_true = rng.normal(size=(B, 3)).astype(np.float32)
        src = rng.normal(size=(B, N, 3)).astype(np.float32)
        for degenerate in (False, True):
            s = src.copy()
            if degenerate:
                s[..., 2] = 0.0  # planar
            ref = np.einsum("bij,bnj->bni", R_true, s) + t_true[:, None, :]
            ref += 0.01 * rng.normal(size=ref.shape).astype(np.float32)
            w = rng.uniform(0.1, 1.0, (B, N)).astype(np.float32)
            Ra, ta = weighted_procrustes(
                jnp.asarray(s), jnp.asarray(ref), jnp.asarray(w), method="svd"
            )
            Rb, tb = weighted_procrustes(
                jnp.asarray(s), jnp.asarray(ref), jnp.asarray(w), method="quat"
            )
            np.testing.assert_allclose(np.asarray(Rb), np.asarray(Ra), atol=1e-4)
            np.testing.assert_allclose(np.asarray(tb), np.asarray(ta), atol=1e-4)
            dets = np.linalg.det(np.asarray(Rb))
            np.testing.assert_allclose(dets, 1.0, atol=1e-4)
