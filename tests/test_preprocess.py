"""Tests for host-side preprocessing: voxel subsample, radius search, pyramid padding."""

import numpy as np
import pytest

from geotransformer_tpu.preprocess import (
    grid_subsample,
    grid_subsample_single,
    radius_search,
    build_pyramid,
    pad_registration_batch,
    caps_for_pyramid,
    PAD_COORD,
)


class TestGridSubsample:
    def test_voxel_means(self, rng):
        # Two clusters of points inside known voxels.
        pts = np.asarray(
            [[0.01, 0.01, 0.01], [0.02, 0.03, 0.01], [0.51, 0.52, 0.53], [0.55, 0.50, 0.58]],
            dtype=np.float32,
        )
        out = grid_subsample_single(pts, voxel_size=0.1)
        assert out.shape == (2, 3)
        got = sorted(out.tolist())
        expected = sorted([pts[:2].mean(0).tolist(), pts[2:].mean(0).tolist()])
        np.testing.assert_allclose(got, expected, atol=1e-6)

    def test_batch_lengths(self, rng):
        pts = rng.uniform(0, 1, size=(300, 3)).astype(np.float32)
        lengths = np.asarray([200, 100])
        s_points, s_lengths = grid_subsample(pts, lengths, voxel_size=0.2)
        assert s_points.shape[0] == s_lengths.sum()
        assert len(s_lengths) == 2
        # each voxel emits one point; cannot exceed input counts
        assert s_lengths[0] <= 200 and s_lengths[1] <= 100

    def test_idempotent_on_sparse(self):
        # Points farther apart than voxel -> unchanged count.
        pts = (np.arange(10)[:, None] * np.asarray([1.0, 0.0, 0.0])).astype(np.float32)
        out = grid_subsample_single(pts, voxel_size=0.5)
        assert out.shape[0] == 10


class TestRadiusSearch:
    def test_sorted_and_sentinel(self, rng):
        q = np.zeros((1, 3), dtype=np.float32)
        s = np.asarray([[0.3, 0, 0], [0.1, 0, 0], [0.2, 0, 0], [5, 0, 0]], dtype=np.float32)
        idx = radius_search(q, s, [1], [4], radius=1.0, neighbor_limit=4)
        assert idx.shape == (1, 4)
        assert idx[0].tolist() == [1, 2, 0, 4]  # sorted by distance; sentinel=4

    def test_batch_offsets(self, rng):
        q = np.zeros((2, 3), dtype=np.float32)
        s = np.asarray([[0.1, 0, 0], [0.2, 0, 0], [0.1, 0, 0]], dtype=np.float32)
        idx = radius_search(q, s, [1, 1], [2, 1], radius=1.0, neighbor_limit=2)
        # second query's support starts at offset 2; sentinel = 3
        assert idx[0].tolist() == [0, 1]
        assert idx[1].tolist() == [2, 3]

    def test_respects_radius(self, rng):
        q = rng.uniform(0, 1, (50, 3)).astype(np.float32)
        s = rng.uniform(0, 1, (80, 3)).astype(np.float32)
        idx = radius_search(q, s, [50], [80], radius=0.2, neighbor_limit=10)
        sentinel = 80
        for i in range(50):
            for j in idx[i]:
                if j != sentinel:
                    assert np.linalg.norm(q[i] - s[j]) <= 0.2 + 1e-6


class TestPyramidPadding:
    def _make(self, rng, n_ref=150, n_src=130):
        ref = rng.uniform(0, 1, (n_ref, 3)).astype(np.float32)
        src = rng.uniform(0, 1, (n_src, 3)).astype(np.float32)
        points = np.concatenate([ref, src], 0)
        lengths = np.asarray([n_ref, n_src])
        pyramid = build_pyramid(points, lengths, 3, 0.05, 0.0625, [16, 16, 16])
        return pyramid

    def test_pyramid_structure(self, rng):
        pyr = self._make(rng)
        assert len(pyr["points"]) == 3
        assert len(pyr["neighbors"]) == 3
        assert len(pyr["subsampling"]) == 2
        assert len(pyr["upsampling"]) == 2
        for i in range(3):
            assert pyr["points"][i].shape[0] == pyr["lengths"][i].sum()

    def test_padding_preserves_neighborhoods(self, rng):
        pyr = self._make(rng)
        feats = np.ones((pyr["points"][0].shape[0], 1), dtype=np.float32)
        caps = caps_for_pyramid(pyr, multiple=64)
        batch = pad_registration_batch(pyr, feats, np.eye(4), caps)

        for i in range(3):
            cap = caps[i]
            pts, mask, nbrs = batch["points"][i], batch["masks"][i], batch["neighbors"][i]
            ref_len, src_len = batch["lengths"][i]
            assert pts.shape == (2 * cap, 3)
            assert mask.sum() == ref_len + src_len
            # padded coords marked
            assert (pts[~mask] == PAD_COORD).all()
            # every valid neighbor of a valid row points to a valid row,
            # and the gathered coordinates equal the unpadded gather.
            orig_pts = pyr["points"][i]
            orig_nbrs = pyr["neighbors"][i]
            total = orig_pts.shape[0]
            for row in range(int(ref_len)):
                for col in range(nbrs.shape[1]):
                    oj, nj = orig_nbrs[row, col], nbrs[row, col]
                    if oj == total:
                        assert nj == 2 * cap
                    else:
                        np.testing.assert_allclose(pts[nj], orig_pts[oj])

    def test_src_rows_remapped(self, rng):
        pyr = self._make(rng)
        feats = np.ones((pyr["points"][0].shape[0], 1), dtype=np.float32)
        caps = caps_for_pyramid(pyr, multiple=64)
        batch = pad_registration_batch(pyr, feats, np.eye(4), caps)
        i = 1
        cap = caps[i]
        ref_len, src_len = batch["lengths"][i]
        orig_pts = pyr["points"][i]
        orig_nbrs = pyr["neighbors"][i]
        total = orig_pts.shape[0]
        pts, nbrs = batch["points"][i], batch["neighbors"][i]
        for r in range(int(src_len)):
            orig_row, new_row = int(ref_len) + r, cap + r
            for col in range(nbrs.shape[1]):
                oj, nj = orig_nbrs[orig_row, col], nbrs[new_row, col]
                if oj == total:
                    assert nj == 2 * cap
                else:
                    np.testing.assert_allclose(pts[nj], orig_pts[oj])

    def test_subsampling_upsampling_tables(self, rng):
        pyr = self._make(rng)
        feats = np.ones((pyr["points"][0].shape[0], 1), dtype=np.float32)
        caps = caps_for_pyramid(pyr, multiple=64)
        batch = pad_registration_batch(pyr, feats, np.eye(4), caps)
        # subsampling[0]: rows = stage1 points, cols index stage0
        sub = batch["subsampling"][0]
        assert sub.shape[0] == 2 * caps[1]
        ref1, src1 = batch["lengths"][1]
        orig = pyr["subsampling"][0]
        total0 = pyr["points"][0].shape[0]
        for row in range(int(ref1)):
            for col in range(sub.shape[1]):
                oj, nj = orig[row, col], sub[row, col]
                if oj == total0:
                    assert nj == 2 * caps[0]
                else:
                    np.testing.assert_allclose(
                        batch["points"][0][nj], pyr["points"][0][oj]
                    )
        # upsampling[0]: rows = stage0 points, cols index stage1
        up = batch["upsampling"][0]
        assert up.shape[0] == 2 * caps[0]
        orig_up = pyr["upsampling"][0]
        total1 = pyr["points"][1].shape[0]
        ref0, _ = batch["lengths"][0]
        for row in range(int(ref0)):
            for col in range(up.shape[1]):
                oj, nj = orig_up[row, col], up[row, col]
                if oj == total1:
                    assert nj == 2 * caps[1]
                else:
                    np.testing.assert_allclose(
                        batch["points"][1][nj], pyr["points"][1][oj]
                    )


class TestCapacityBuckets:
    def _samples(self, rng, sizes):
        out = []
        for n in sizes:
            ref = rng.uniform(0, 1, (n, 3)).astype(np.float32)
            src = rng.uniform(0, 1, (max(n - 40, 30), 3)).astype(np.float32)
            out.append({"ref_points": ref, "src_points": src,
                        "transform": np.eye(4, dtype=np.float32)})
        return out

    def test_buckets_ascending_and_cover(self, rng):
        from geotransformer_tpu.preprocess import calibrate_stage_cap_buckets

        samples = self._samples(rng, [200, 400, 800, 1600, 2400, 3000])
        buckets = calibrate_stage_cap_buckets(
            iter(samples), 3, 0.05, 0.125, [16, 16, 16], num_buckets=3,
            multiple=64,
        )
        assert 1 <= len(buckets) <= 3
        for a, b in zip(buckets, buckets[1:]):
            assert all(x <= y for x, y in zip(a, b))

    def test_prepare_pair_picks_smallest_fitting_bucket(self, rng):
        from geotransformer_tpu.preprocess.loader import prepare_pair

        small, big = self._samples(rng, [150, 2000])
        buckets = [(256, 256, 256), (2048, 2048, 2048)]
        cfg = dict(num_stages=3, voxel_size=0.05, search_radius=0.125,
                   neighbor_limits=[16, 16, 16], stage_caps=buckets)
        b_small = prepare_pair(small, **cfg)
        assert b_small["points"][0].shape[0] == 2 * 256
        b_big = prepare_pair(big, **cfg)
        assert b_big["points"][0].shape[0] == 2 * 2048

    def test_prepare_pair_overflow_raises(self, rng):
        from geotransformer_tpu.preprocess.loader import prepare_pair

        (big,) = self._samples(rng, [3000])
        cfg = dict(num_stages=3, voxel_size=0.05, search_radius=0.125,
                   neighbor_limits=[16, 16, 16], stage_caps=[(128, 128, 128)])
        with pytest.raises(ValueError):
            prepare_pair(big, **cfg)
