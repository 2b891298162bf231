"""Native C++ preprocessing library: build + equivalence with numpy path."""

import numpy as np
import pytest

from geotransformer_tpu import native
from geotransformer_tpu.preprocess.voxel import grid_subsample as np_grid_subsample
from geotransformer_tpu.preprocess.neighbors import radius_search as np_radius_search


pytestmark = pytest.mark.skipif(
    not native.native_available(), reason="g++ not available to build geolib"
)


class TestNativeGridSubsample:
    def test_matches_numpy(self, rng):
        points = rng.uniform(-3, 5, (5000, 3)).astype(np.float32)
        lengths = np.asarray([3000, 2000])
        got_pts, got_lens = native.grid_subsample(points, lengths, 0.3)
        want_pts, want_lens = np_grid_subsample(points, lengths, 0.3)
        np.testing.assert_array_equal(got_lens, want_lens)
        np.testing.assert_allclose(got_pts, want_pts, atol=1e-5)

    def test_single_voxel(self):
        pts = np.zeros((7, 3), np.float32) + 0.05
        got_pts, got_lens = native.grid_subsample(pts, np.asarray([7]), 0.2)
        assert got_lens.tolist() == [1]
        np.testing.assert_allclose(got_pts[0], [0.05] * 3, atol=1e-6)


class TestNativeRadiusSearch:
    def test_matches_numpy(self, rng):
        q = rng.uniform(0, 1, (400, 3)).astype(np.float32)
        s = rng.uniform(0, 1, (600, 3)).astype(np.float32)
        q_lens = np.asarray([250, 150])
        s_lens = np.asarray([350, 250])
        got = native.radius_search(q, s, q_lens, s_lens, 0.15, 20)
        want = np_radius_search(q, s, q_lens, s_lens, 0.15, 20)
        # identical neighbor sets; order may differ only on exact ties
        sentinel = 600
        assert got.shape == want.shape
        mismatch_rows = 0
        for i in range(got.shape[0]):
            if got[i].tolist() != want[i].tolist():
                assert set(got[i]) == set(want[i])
                mismatch_rows += 1
        assert mismatch_rows <= 2

    def test_sorted_by_distance(self, rng):
        q = rng.uniform(0, 1, (100, 3)).astype(np.float32)
        s = rng.uniform(0, 1, (300, 3)).astype(np.float32)
        idx = native.radius_search(q, s, [100], [300], 0.3, 12)
        for i in range(100):
            dists = [
                np.linalg.norm(q[i] - s[j]) for j in idx[i] if j < 300
            ]
            assert dists == sorted(dists)
            for j in idx[i]:
                if j < 300:
                    assert np.linalg.norm(q[i] - s[j]) <= 0.3 + 1e-6

    def test_pyramid_dispatch(self, rng, monkeypatch):
        """build_pyramid produces identical structure via native and numpy."""
        from geotransformer_tpu.preprocess import build_pyramid

        points = rng.uniform(0, 1, (800, 3)).astype(np.float32)
        lengths = np.asarray([500, 300])
        monkeypatch.setenv("GEOTRANSFORMER_TPU_NATIVE", "1")
        pyr_native = build_pyramid(points, lengths, 3, 0.05, 0.0625, [10, 10, 10])
        monkeypatch.setenv("GEOTRANSFORMER_TPU_NATIVE", "0")
        pyr_numpy = build_pyramid(points, lengths, 3, 0.05, 0.0625, [10, 10, 10])
        for a, b in zip(pyr_native["points"], pyr_numpy["points"]):
            np.testing.assert_allclose(a, b, atol=1e-5)
        for a, b in zip(pyr_native["lengths"], pyr_numpy["lengths"]):
            np.testing.assert_array_equal(a, b)


class TestNativeSpeed:
    def test_faster_than_numpy_on_large_cloud(self, rng):
        import time

        q = rng.uniform(0, 10, (30000, 3)).astype(np.float32)
        t0 = time.perf_counter()
        native.radius_search(q, q, [30000], [30000], 0.3, 40)
        t_native = time.perf_counter() - t0
        t0 = time.perf_counter()
        np_radius_search(q, q, [30000], [30000], 0.3, 40)
        t_numpy = time.perf_counter() - t0
        # informational bound: native must not be slower
        assert t_native < t_numpy * 1.5, (t_native, t_numpy)
