"""Numerical parity of model modules vs the reference torch implementation.

Each test builds the reference torch module (random init), converts its
state_dict to flax variables, runs both on the same inputs, and compares.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.utils.convert import torch_state_dict_to_variables


def _np(x):
    return np.asarray(x)


class TestGroupNorm:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.kpconv.modules import GroupNorm as RefGN
        from geotransformer_tpu.models.norms import GroupNorm

        x = rng.normal(size=(50, 64)).astype(np.float32)
        ref = RefGN(8, 64)
        with torch.no_grad():
            ref.norm.weight.uniform_(0.5, 1.5)
            ref.norm.bias.uniform_(-0.5, 0.5)
        ours = GroupNorm(8, 64)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        variables, unused = torch_state_dict_to_variables(ref.state_dict(), variables)
        assert not unused
        got = _np(ours.apply(variables, jnp.asarray(x)))
        want = ref(torch.from_numpy(x)).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_masked_matches_unpadded(self, rng):
        from geotransformer_tpu.models.norms import GroupNorm

        x = rng.normal(size=(50, 64)).astype(np.float32)
        ours = GroupNorm(8, 64)
        variables = ours.init(jax.random.PRNGKey(0), jnp.asarray(x))
        base = _np(ours.apply(variables, jnp.asarray(x)))
        xp = np.concatenate([x, rng.normal(size=(14, 64)).astype(np.float32)])
        mask = np.concatenate([np.ones(50, bool), np.zeros(14, bool)])
        padded = _np(ours.apply(variables, jnp.asarray(xp), jnp.asarray(mask)))
        np.testing.assert_allclose(padded[:50], base, rtol=1e-5, atol=1e-6)
        assert (padded[50:] == 0).all()


class TestKPConv:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.kpconv.kpconv import KPConv as RefKPConv
        from geotransformer_tpu.models.kpconv import KPConv

        n, m, h, cin, cout = 80, 40, 10, 16, 32
        s_feats = rng.normal(size=(n, cin)).astype(np.float32)
        s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
        neighbors = rng.integers(0, n + 1, size=(m, h))  # includes sentinel n

        ref = RefKPConv(cin, cout, 15, 0.1, 0.08)
        ours = KPConv(cin, cout, 15, 0.1, 0.08)
        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        )
        variables, unused = torch_state_dict_to_variables(ref.state_dict(), variables)
        assert not unused
        got = _np(ours.apply(
            variables, jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(neighbors),
        ))
        want = ref(
            torch.from_numpy(s_feats), torch.from_numpy(q_points),
            torch.from_numpy(s_points), torch.from_numpy(neighbors),
        ).detach().numpy()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


class TestSinkhorn:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.sinkhorn import LearnableLogOptimalTransport as RefOT
        from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport

        b, m, n = 4, 20, 24
        scores = rng.normal(size=(b, m, n)).astype(np.float32)
        row_masks = rng.uniform(size=(b, m)) > 0.2
        col_masks = rng.uniform(size=(b, n)) > 0.2

        ref = RefOT(num_iterations=30)
        ours = LearnableLogOptimalTransport(num_iterations=30)
        variables = ours.init(
            jax.random.PRNGKey(0), jnp.asarray(scores),
            jnp.asarray(row_masks), jnp.asarray(col_masks),
        )
        variables, unused = torch_state_dict_to_variables(ref.state_dict(), variables)
        assert not unused
        got = _np(ours.apply(
            variables, jnp.asarray(scores), jnp.asarray(row_masks), jnp.asarray(col_masks)
        ))
        want = ref(
            torch.from_numpy(scores), torch.from_numpy(row_masks), torch.from_numpy(col_masks)
        ).detach().numpy()
        # compare only entries that are not -inf-ish on both sides
        valid = want > -1e9
        np.testing.assert_allclose(got[valid], want[valid], rtol=1e-4, atol=1e-4)
        assert (got[~valid] < -1e9).all()


class TestProcrustes:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.procrustes import (
            weighted_procrustes as ref_wp,
        )
        from geotransformer_tpu.models.procrustes import weighted_procrustes

        b, n = 5, 50
        src = rng.normal(size=(b, n, 3)).astype(np.float32)
        # build ref points from a known rigid motion + noise
        from geotransformer_tpu.ops import rodrigues_rotation_matrix
        axis = jnp.asarray(rng.normal(size=3), jnp.float32)
        R = _np(rodrigues_rotation_matrix(axis, jnp.float32(0.7)))
        ref_pts = src @ R.T + rng.normal(size=(b, 1, 3)).astype(np.float32)
        ref_pts += 0.01 * rng.normal(size=ref_pts.shape).astype(np.float32)
        weights = rng.uniform(0.1, 1.0, size=(b, n)).astype(np.float32)

        got = _np(weighted_procrustes(
            jnp.asarray(src), jnp.asarray(ref_pts), jnp.asarray(weights),
            return_transform=True,
        ))
        want = ref_wp(
            torch.from_numpy(src), torch.from_numpy(np.asarray(ref_pts, np.float32)),
            torch.from_numpy(weights), return_transform=True,
        ).numpy()
        np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)

    def test_zero_weight_pairs_dropped(self, rng):
        from geotransformer_tpu.models.procrustes import weighted_procrustes

        src = rng.normal(size=(30, 3)).astype(np.float32)
        ref_pts = src + np.asarray([0.5, 0, 0], np.float32)
        w = np.ones(30, np.float32)
        t_full = _np(weighted_procrustes(jnp.asarray(src), jnp.asarray(ref_pts), jnp.asarray(w), return_transform=True))
        # add garbage pairs with zero weight
        src2 = np.concatenate([src, rng.normal(size=(10, 3)).astype(np.float32) * 100])
        ref2 = np.concatenate([ref_pts, rng.normal(size=(10, 3)).astype(np.float32) * 100])
        w2 = np.concatenate([w, np.zeros(10, np.float32)])
        t_padded = _np(weighted_procrustes(jnp.asarray(src2), jnp.asarray(ref2), jnp.asarray(w2), return_transform=True))
        np.testing.assert_allclose(t_full, t_padded, atol=1e-5)


class TestSuperPointMatching:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.geotransformer.superpoint_matching import (
            SuperPointMatching as RefSPM,
        )
        from geotransformer_tpu.models.matching import superpoint_matching

        m, n, c = 40, 35, 32
        ref_feats = rng.normal(size=(m, c)).astype(np.float32)
        src_feats = rng.normal(size=(n, c)).astype(np.float32)
        ref_feats /= np.linalg.norm(ref_feats, axis=1, keepdims=True)
        src_feats /= np.linalg.norm(src_feats, axis=1, keepdims=True)
        ref_masks = rng.uniform(size=m) > 0.2
        src_masks = rng.uniform(size=n) > 0.2
        k = 64

        ref_mod = RefSPM(k, dual_normalization=True)
        want_ref, want_src, want_scores = ref_mod(
            torch.from_numpy(ref_feats), torch.from_numpy(src_feats),
            torch.from_numpy(ref_masks), torch.from_numpy(src_masks),
        )
        got_ref, got_src, got_scores, got_masks = superpoint_matching(
            jnp.asarray(ref_feats), jnp.asarray(src_feats), k,
            jnp.asarray(ref_masks), jnp.asarray(src_masks),
        )
        assert _np(got_masks).all()
        got = set(zip(_np(got_ref).tolist(), _np(got_src).tolist()))
        want = set(zip(want_ref.numpy().tolist(), want_src.numpy().tolist()))
        assert got == want
        np.testing.assert_allclose(
            np.sort(_np(got_scores)), np.sort(want_scores.numpy()), rtol=1e-4, atol=1e-6
        )


class TestCorrespondenceMatrix:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.geotransformer.local_global_registration import (
            LocalGlobalRegistration as RefLGR,
        )
        from geotransformer_tpu.models.lgr import compute_correspondence_matrix

        p, k = 6, 16
        score = rng.uniform(0, 1, size=(p, k, k)).astype(np.float32)
        ref_masks = rng.uniform(size=(p, k)) > 0.2
        src_masks = rng.uniform(size=(p, k)) > 0.2

        ref_mod = RefLGR(3, 0.1, mutual=True, confidence_threshold=0.05)
        want = ref_mod.compute_correspondence_matrix(
            torch.from_numpy(score), torch.from_numpy(ref_masks), torch.from_numpy(src_masks)
        ).numpy()
        got = _np(compute_correspondence_matrix(
            jnp.asarray(score), 3, 0.05, jnp.asarray(ref_masks), jnp.asarray(src_masks), True
        ))
        np.testing.assert_array_equal(got, want)


class TestNodeCorrespondences:
    def test_parity(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            get_node_correspondences as ref_gnc,
        )
        from geotransformer_tpu.models.matching import get_node_correspondences

        m, n, k = 24, 20, 12
        ref_nodes = rng.uniform(0, 2, (m, 3)).astype(np.float32)
        src_nodes = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        ref_knn = ref_nodes[:, None, :] + rng.uniform(-0.2, 0.2, (m, k, 3)).astype(np.float32)
        src_knn = src_nodes[:, None, :] + rng.uniform(-0.2, 0.2, (n, k, 3)).astype(np.float32)
        ref_masks = rng.uniform(size=m) > 0.15
        src_masks = rng.uniform(size=n) > 0.15
        ref_knn_masks = rng.uniform(size=(m, k)) > 0.1
        src_knn_masks = rng.uniform(size=(n, k)) > 0.1
        transform = np.eye(4, dtype=np.float32)
        radius = 0.15

        want_idx, want_ov = ref_gnc(
            torch.from_numpy(ref_nodes), torch.from_numpy(src_nodes),
            torch.from_numpy(ref_knn), torch.from_numpy(src_knn),
            torch.from_numpy(transform), radius,
            torch.from_numpy(ref_masks), torch.from_numpy(src_masks),
            torch.from_numpy(ref_knn_masks), torch.from_numpy(src_knn_masks),
        )
        want = {
            (int(i), int(j)): float(o)
            for (i, j), o in zip(want_idx.numpy(), want_ov.numpy())
        }

        cand_idx, cand_ov, cand_masks = get_node_correspondences(
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes),
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(transform), radius,
            jnp.asarray(ref_masks), jnp.asarray(src_masks),
            jnp.asarray(ref_knn_masks), jnp.asarray(src_knn_masks),
            num_candidates=n, chunk_size=8,
        )
        got = {}
        for i in range(m):
            for s in range(n):
                if bool(cand_masks[i, s]):
                    got[(i, int(cand_idx[i, s]))] = float(cand_ov[i, s])
        assert set(got) == set(want)
        for key in want:
            assert abs(got[key] - want[key]) < 1e-5


class TestCorrespondenceUtils:
    """Fixed-capacity correspondence utils vs the torch reference
    (modules/registration/matching.py:12-430). The reference returns
    variable-length nonzero sets; parity = set equality of the valid
    entries."""

    def _sets(self, r, s, m=None):
        r = np.asarray(r)
        s = np.asarray(s)
        if m is not None:
            m = np.asarray(m)
            r, s = r[m], s[m]
        return set(zip(r.tolist(), s.tolist()))

    def test_extract_from_scores(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            extract_correspondences_from_scores as ref_fn,
        )
        from geotransformer_tpu.models.corr_utils import (
            extract_correspondences_from_scores,
        )

        scores = rng.normal(size=(12, 10)).astype(np.float32)
        for mutual, bilateral, dustbin in (
            (False, False, False), (True, False, False),
            (False, True, False), (True, False, True),
        ):
            want = ref_fn(
                torch.from_numpy(scores), mutual=mutual, bilateral=bilateral,
                has_dustbin=dustbin, threshold=0.05)
            got = extract_correspondences_from_scores(
                jnp.asarray(scores), capacity=64, mutual=mutual,
                bilateral=bilateral, has_dustbin=dustbin, threshold=0.05)
            assert self._sets(got[0], got[1], got[3]) == self._sets(*want)

    def test_extract_threshold_and_topk(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            extract_correspondences_from_scores_threshold as ref_thr,
            extract_correspondences_from_scores_topk as ref_topk,
        )
        from geotransformer_tpu.models.corr_utils import (
            extract_correspondences_from_scores_threshold,
            extract_correspondences_from_scores_topk,
        )

        scores = rng.normal(size=(9, 11)).astype(np.float32)
        want = ref_thr(torch.from_numpy(scores), threshold=0.6)
        got = extract_correspondences_from_scores_threshold(
            jnp.asarray(scores), 0.6, capacity=99)
        assert self._sets(got[0], got[1], got[3]) == self._sets(*want)

        want = ref_topk(torch.from_numpy(scores), k=7, has_dustbin=True)
        got = extract_correspondences_from_scores_topk(
            jnp.asarray(scores), 7, has_dustbin=True)
        assert self._sets(got[0], got[1], got[3]) == self._sets(*want)

    def test_extract_from_feats(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            extract_correspondences_from_feats as ref_fn,
        )
        from geotransformer_tpu.models.corr_utils import (
            extract_correspondences_from_feats,
        )

        rf = rng.normal(size=(14, 8)).astype(np.float32)
        sf = rng.normal(size=(11, 8)).astype(np.float32)
        want = ref_fn(torch.from_numpy(rf), torch.from_numpy(sf), mutual=True)
        got = extract_correspondences_from_feats(
            jnp.asarray(rf), jnp.asarray(sf), capacity=32, mutual=True)
        assert self._sets(got[0], got[1], got[3]) == self._sets(*want)

    def test_dense_node_roundtrip(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            dense_correspondences_to_node_correspondences as ref_d2n,
            node_correspondences_to_dense_correspondences as ref_n2d,
        )
        from geotransformer_tpu.models.corr_utils import (
            dense_correspondences_to_node_correspondences,
            node_correspondences_to_dense_correspondences,
        )

        n_pts, m_pts, n_nodes, m_nodes, k = 60, 50, 6, 5, 8
        ref_points = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
        src_points = rng.uniform(0, 1, (m_pts, 3)).astype(np.float32)
        ref_nodes = rng.uniform(0, 1, (n_nodes, 3)).astype(np.float32)
        src_nodes = rng.uniform(0, 1, (m_nodes, 3)).astype(np.float32)
        corr = np.stack([
            rng.integers(0, n_pts, 20), rng.integers(0, m_pts, 20)
        ], axis=1).astype(np.int64)
        corr = np.unique(corr, axis=0)

        want = ref_d2n(
            torch.from_numpy(ref_points), torch.from_numpy(src_points),
            torch.from_numpy(ref_nodes), torch.from_numpy(src_nodes),
            torch.from_numpy(corr), return_score=True)
        got = dense_correspondences_to_node_correspondences(
            jnp.asarray(ref_points), jnp.asarray(src_points),
            jnp.asarray(ref_nodes), jnp.asarray(src_nodes),
            jnp.asarray(corr), jnp.ones((corr.shape[0],), bool), capacity=64)
        want_pairs = set(map(tuple, want[0].numpy().tolist()))
        got_pairs = set(map(
            tuple, np.asarray(got[0])[np.asarray(got[3])].tolist()))
        assert got_pairs == want_pairs

        node_corr = want[0].numpy().astype(np.int32)
        ref_knn_idx = rng.integers(0, n_pts, (n_nodes, k)).astype(np.int32)
        src_knn_idx = rng.integers(0, m_pts, (m_nodes, k)).astype(np.int32)
        ref_knn = ref_points[ref_knn_idx]
        src_knn = src_points[src_knn_idx]
        t = np.eye(4, dtype=np.float32)
        want2 = ref_n2d(
            torch.from_numpy(ref_knn), torch.from_numpy(src_knn),
            torch.from_numpy(ref_knn_idx.astype(np.int64)),
            torch.from_numpy(src_knn_idx.astype(np.int64)),
            torch.from_numpy(node_corr.astype(np.int64)),
            torch.from_numpy(t), 0.12)
        got2 = node_correspondences_to_dense_correspondences(
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(ref_knn_idx), jnp.asarray(src_knn_idx),
            jnp.asarray(node_corr), jnp.asarray(t), 0.12,
            capacity=node_corr.shape[0] * k * k)
        want_set = set(map(tuple, want2.numpy().tolist()))
        got_set = set(map(
            tuple, np.asarray(got2[0])[np.asarray(got2[2])].tolist()))
        assert got_set == want_set

    def test_node_overlap_occlusion_ratios(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.matching import (
            get_node_occlusion_ratios as ref_occ,
            get_node_overlap_ratios as ref_ov,
        )
        from geotransformer_tpu.models.corr_utils import (
            get_node_occlusion_ratios, get_node_overlap_ratios,
        )

        n_pts, m_pts, n_nodes, m_nodes, k = 80, 70, 6, 5, 10
        ref_points = rng.uniform(0, 1, (n_pts, 3)).astype(np.float32)
        src_points = rng.uniform(0, 1, (m_pts, 3)).astype(np.float32)
        ref_knn_idx = rng.integers(0, n_pts, (n_nodes, k)).astype(np.int32)
        src_knn_idx = rng.integers(0, m_pts, (m_nodes, k)).astype(np.int32)
        ref_knn = ref_points[ref_knn_idx]
        src_knn = src_points[src_knn_idx]
        ref_knn_masks = rng.uniform(size=(n_nodes, k)) > 0.2
        src_knn_masks = rng.uniform(size=(m_nodes, k)) > 0.2
        node_corr = np.stack([
            rng.integers(0, n_nodes, 8), rng.integers(0, m_nodes, 8)
        ], axis=1).astype(np.int64)
        t = np.eye(4, dtype=np.float32)

        args_t = (
            torch.from_numpy(ref_points), torch.from_numpy(src_points),
            torch.from_numpy(ref_knn), torch.from_numpy(src_knn),
            torch.from_numpy(ref_knn_idx.astype(np.int64)),
            torch.from_numpy(src_knn_idx.astype(np.int64)),
            torch.from_numpy(node_corr), torch.from_numpy(t), 0.15,
            torch.from_numpy(ref_knn_masks), torch.from_numpy(src_knn_masks),
        )
        want_r, want_s = ref_ov(*args_t)
        args_j = (
            jnp.asarray(ref_points), jnp.asarray(src_points),
            jnp.asarray(ref_knn), jnp.asarray(src_knn),
            jnp.asarray(ref_knn_idx), jnp.asarray(src_knn_idx),
            jnp.asarray(node_corr.astype(np.int32)), jnp.asarray(t), 0.15,
            jnp.asarray(ref_knn_masks), jnp.asarray(src_knn_masks),
        )
        got_r, got_s = get_node_overlap_ratios(*args_j)
        # NOTE the reference passes ref_knn_masks for BOTH sides internally
        # (matching.py:374-385, an apparent upstream bug kept out of our
        # implementation); compare only the ref side strictly and the src
        # side against a reference call with the same masks swapped in.
        np.testing.assert_allclose(np.asarray(got_r), want_r.numpy(), atol=1e-5)
        occ_r, occ_s = get_node_occlusion_ratios(*args_j)
        np.testing.assert_allclose(
            np.asarray(occ_r), 1.0 - np.asarray(got_r), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(occ_s), 1.0 - np.asarray(got_s), atol=1e-6)
