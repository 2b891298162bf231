"""Device-resident pyramid build: parity with the host preprocessing paths.

The on-device voxel subsample emits voxels in the same (z, y, x) order as
the host numpy/C++ paths, so parity is exact row-for-row; radius KNN parity
is set-wise per row (distance ties may reorder within a row).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch
from geotransformer_tpu.preprocess.device import (
    _radius_search_cloud, _subsample_cloud, build_pyramid_device, pad_stage0,
)
from geotransformer_tpu.preprocess.voxel import grid_subsample_single
from geotransformer_tpu.preprocess.neighbors import radius_search as np_radius_search


def make_cloud(rng, n, lo=-2.0, hi=3.0):
    return rng.uniform(lo, hi, (n, 3)).astype(np.float32)


class TestDeviceSubsample:
    def test_matches_numpy_order_and_values(self, rng):
        pts = make_cloud(rng, 900)
        want = grid_subsample_single(pts, 0.3)
        cap = 1024
        padded = np.full((cap, 3), 1e6, np.float32)
        padded[:900] = pts
        got, m, ov = _subsample_cloud(jnp.asarray(padded), jnp.int32(900), 0.3, 1024)
        m = int(m)
        assert not bool(ov)
        assert m == want.shape[0]
        np.testing.assert_allclose(np.asarray(got)[:m], want, atol=1e-4)
        assert np.all(np.asarray(got)[m:] == 1e6)

    def test_overflow_flag(self, rng):
        pts = make_cloud(rng, 500)
        padded = np.full((512, 3), 1e6, np.float32)
        padded[:500] = pts
        _, m, ov = _subsample_cloud(jnp.asarray(padded), jnp.int32(500), 0.05, 64)
        assert bool(ov)

    def test_empty_cloud(self):
        padded = np.full((64, 3), 1e6, np.float32)
        got, m, ov = _subsample_cloud(jnp.asarray(padded), jnp.int32(0), 0.3, 32)
        assert int(m) == 0 and not bool(ov)
        assert np.all(np.asarray(got) == 1e6)

    def test_single_voxel(self):
        padded = np.full((64, 3), 1e6, np.float32)
        padded[:7] = 0.05
        got, m, ov = _subsample_cloud(jnp.asarray(padded), jnp.int32(7), 0.2, 32)
        assert int(m) == 1
        np.testing.assert_allclose(np.asarray(got)[0], [0.05] * 3, atol=1e-6)


class TestDeviceRadiusSearch:
    def test_matches_host(self, rng):
        q = make_cloud(rng, 300, 0, 1)
        s = make_cloud(rng, 500, 0, 1)
        want = np_radius_search(q, s, [300], [500], 0.15, 16)  # sentinel 500
        qp = np.full((384, 3), 1e6, np.float32)
        qp[:300] = q
        sp = np.full((512, 3), 1e6, np.float32)
        sp[:500] = s
        got = np.asarray(_radius_search_cloud(
            jnp.asarray(qp), jnp.int32(300), jnp.asarray(sp), jnp.int32(500),
            0.15, 16, block=128))
        mismatch = 0
        for i in range(300):
            w = [500 if x == 500 else x for x in want[i].tolist()]
            g = [500 if x == 512 else x for x in got[i].tolist()]
            if g != w:
                assert set(g) == set(w)  # ties may swap within a row
                mismatch += 1
        assert mismatch <= 2
        assert np.all(got[300:] == 512)

    def test_self_first(self, rng):
        pts = make_cloud(rng, 200, 0, 1)
        padded = np.full((256, 3), 1e6, np.float32)
        padded[:200] = pts
        got = np.asarray(_radius_search_cloud(
            jnp.asarray(padded), jnp.int32(200), jnp.asarray(padded),
            jnp.int32(200), 0.3, 8, block=64))
        np.testing.assert_array_equal(got[:200, 0], np.arange(200))


class TestDeviceGridRadiusSearch:
    """Grid-binned exact KNN (_radius_search_cloud_grid) vs host.

    Stricter than the brute-force tests above: the grid search mirrors the
    host's d^2 arithmetic and (d^2, index) tie order bit-for-bit
    (native/geolib.cpp), so rows must match exactly — no tie allowance."""

    def test_matches_host_exact(self, rng):
        from geotransformer_tpu.preprocess.device import (
            _radius_search_cloud_grid,
        )
        q = make_cloud(rng, 300, 0, 1)
        s = make_cloud(rng, 500, 0, 1)
        want = np_radius_search(q, s, [300], [500], 0.15, 16)  # sentinel 500
        qp = np.full((384, 3), 1e6, np.float32)
        qp[:300] = q
        sp = np.full((512, 3), 1e6, np.float32)
        sp[:500] = s
        got, ovf = _radius_search_cloud_grid(
            jnp.asarray(qp), jnp.int32(300), jnp.asarray(sp), jnp.int32(500),
            0.15, 16, cand_cap=256, block=128)
        assert not bool(ovf)
        got = np.asarray(got)
        want = np.where(want == 500, 512, want)
        np.testing.assert_array_equal(got[:300], want)
        assert np.all(got[300:] == 512)

    def test_self_first_and_empty(self, rng):
        from geotransformer_tpu.preprocess.device import (
            _radius_search_cloud_grid,
        )
        pts = make_cloud(rng, 200, 0, 1)
        padded = np.full((256, 3), 1e6, np.float32)
        padded[:200] = pts
        got, ovf = _radius_search_cloud_grid(
            jnp.asarray(padded), jnp.int32(200), jnp.asarray(padded),
            jnp.int32(200), 0.3, 8, cand_cap=256, block=64)
        assert not bool(ovf)
        np.testing.assert_array_equal(np.asarray(got)[:200, 0], np.arange(200))
        # empty support cloud: all sentinel, no overflow, no NaNs
        got, ovf = _radius_search_cloud_grid(
            jnp.asarray(padded), jnp.int32(200), jnp.asarray(padded),
            jnp.int32(0), 0.3, 8, cand_cap=64, block=64)
        assert not bool(ovf)
        assert np.all(np.asarray(got) == 256)

    def test_candidate_overflow_flag(self, rng):
        from geotransformer_tpu.preprocess.device import (
            _radius_search_cloud_grid,
        )
        # 300 points inside one radius-sized cell -> every query sees all
        # of them as candidates; cand_cap=64 must flag, not truncate silently
        pts = (rng.uniform(0, 0.09, (300, 3))).astype(np.float32)
        padded = np.full((320, 3), 1e6, np.float32)
        padded[:300] = pts
        _, ovf = _radius_search_cloud_grid(
            jnp.asarray(padded), jnp.int32(300), jnp.asarray(padded),
            jnp.int32(300), 0.1, 8, cand_cap=64, block=64)
        assert bool(ovf)


class TestDevicePyramid:
    @pytest.fixture(scope="class")
    def pair(self):
        rng = np.random.default_rng(3)
        ref = make_cloud(rng, 700, 0, 1.5)
        src = make_cloud(rng, 600, 0, 1.5)
        points = np.concatenate([ref, src], 0)
        lengths = np.asarray([700, 600])
        return points, lengths

    def test_matches_host_pipeline(self, pair):
        points, lengths = pair
        caps = (768, 256, 64)
        limits = (16, 16, 16)
        voxel, radius = 0.25, 0.625

        pyr = build_pyramid(points, lengths, 3, voxel, radius, list(limits))
        feats = np.ones((points.shape[0], 1), np.float32)
        want = pad_registration_batch(pyr, feats, np.eye(4, dtype=np.float32), caps)

        pts0, lens0, feats0 = pad_stage0(points, lengths, caps[0])
        got, overflow = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0),
            jnp.eye(4), num_stages=3, voxel_size=voxel, radius=radius,
            neighbor_limits=limits, stage_caps=caps)
        assert not np.any(np.asarray(overflow))

        for i in range(3):
            np.testing.assert_array_equal(
                np.asarray(got["lengths"][i]), want["lengths"][i])
            np.testing.assert_array_equal(
                np.asarray(got["masks"][i]), want["masks"][i])
            np.testing.assert_allclose(
                np.asarray(got["points"][i]), want["points"][i], atol=1e-4)
            self._tables_match(got["neighbors"][i], want["neighbors"][i])
        for i in range(2):
            self._tables_match(got["subsampling"][i], want["subsampling"][i])
            self._tables_match(got["upsampling"][i], want["upsampling"][i])
        np.testing.assert_array_equal(np.asarray(got["features"]), want["features"])
        # edge stream: offsets can differ only on distance-tie rows (the
        # same rows _tables_match tolerates); check the non-tie rows exactly
        assert got["input_stream"].shape == want["input_stream"].shape
        g_st, w_st = np.asarray(got["input_stream"]), want["input_stream"]
        tie = ~np.all(
            np.asarray(got["neighbors"][0]) == want["neighbors"][0], axis=1)
        np.testing.assert_allclose(
            g_st[:, ~tie], w_st[:, ~tie], atol=1e-4)

    @staticmethod
    def _tables_match(got, want, max_tie_rows_frac=0.05):
        got = np.asarray(got)
        assert got.shape == want.shape
        assert got.dtype == want.dtype
        exact = np.all(got == want, axis=1)
        for i in np.nonzero(~exact)[0]:
            assert set(got[i].tolist()) == set(want[i].tolist())
        assert (~exact).mean() <= max_tie_rows_frac

    def test_overflow_propagates(self, pair):
        points, lengths = pair
        pts0, lens0, feats0 = pad_stage0(points, lengths, 768)
        _, overflow = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0),
            jnp.eye(4), num_stages=3, voxel_size=0.25, radius=0.625,
            neighbor_limits=(16, 16, 16), stage_caps=(768, 8, 8))
        assert bool(np.asarray(overflow)[1])


class TestDeviceInverseTables:
    def test_matches_host(self, rng):
        from geotransformer_tpu.preprocess.device import build_inverse_table_device
        from geotransformer_tpu.preprocess.pyramid import build_inverse_table

        m, h, n, j = 200, 12, 150, 32
        table = np.stack([
            np.random.default_rng(r).choice(n + 1, h, replace=False)
            for r in range(m)
        ]).astype(np.int32)
        want = build_inverse_table(table, n, j)
        got, ov = build_inverse_table_device(jnp.asarray(table), n, j)
        assert not bool(ov)
        np.testing.assert_array_equal(np.asarray(got), want)

    def test_overflow(self, rng):
        from geotransformer_tpu.preprocess.device import build_inverse_table_device
        table = np.zeros((40, 4), np.int32)  # everyone lists support 0
        _, ov = build_inverse_table_device(jnp.asarray(table), 8, 16)
        assert bool(ov)

    def test_pyramid_emits_inverse_tables(self, rng):
        from geotransformer_tpu.preprocess.device import (
            build_pyramid_device, pad_stage0,
        )
        from geotransformer_tpu.preprocess import (
            build_pyramid, pad_registration_batch,
        )

        pts = rng.uniform(0, 1.5, (1300, 3)).astype(np.float32)
        lengths = np.asarray([700, 600])
        caps = (768, 256, 64)
        limits = (16, 16, 16)
        inv_limits = (48, 48, 48)
        pyr = build_pyramid(pts, lengths, 3, 0.25, 0.625, list(limits))
        feats = np.ones((pts.shape[0], 1), np.float32)
        want = pad_registration_batch(
            pyr, feats, np.eye(4, dtype=np.float32), caps,
            inverse_limits=inv_limits)
        pts0, lens0, feats0 = pad_stage0(pts, lengths, caps[0])
        got, overflow = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0),
            jnp.eye(4), num_stages=3, voxel_size=0.25, radius=0.625,
            neighbor_limits=limits, stage_caps=caps,
            inverse_limits=inv_limits)
        assert not np.any(np.asarray(overflow))
        for i in range(3):
            a = np.asarray(got["neighbors_inv"][i])
            b = want["neighbors_inv"][i]
            assert a.shape == b.shape
            # inverse of identical forward tables is identical; forward
            # tables may differ on distance-tie rows, so compare where the
            # forward tables agree
            fwd_same = np.all(
                np.asarray(got["neighbors"][i]) == want["neighbors"][i])
            if fwd_same:
                np.testing.assert_array_equal(a, b)
        assert len(got["subsampling_inv"]) == 2


class TestDeviceBatchTraining:
    @pytest.mark.slow
    def test_train_step_consumes_device_batch(self, rng):
        """End-to-end: pyramid + inverse tables built ON DEVICE feed a full
        training step — zero host preprocessing for training batches."""
        import dataclasses
        import jax
        from test_parallel import tiny_config
        from geotransformer_tpu.models import create_model
        from geotransformer_tpu.parallel.train import (
            init_train_state, make_optimizer, make_train_step,
        )
        from geotransformer_tpu.preprocess.device import (
            build_pyramid_device, pad_stage0,
        )

        cfg = tiny_config()
        xy = rng.uniform(0, 1, (500, 2)).astype(np.float32)
        z = 0.2 * np.sin(4 * xy[:, 0])
        ref = np.column_stack([xy, z]).astype(np.float32)
        src = ref[ref[:, 0] < 0.8]
        pts = np.concatenate([ref, src], 0)
        lengths = np.asarray([len(ref), len(src)])
        pts0, lens0, feats0 = pad_stage0(pts, lengths, cfg.caps.stage_caps[0])
        batch, overflow = build_pyramid_device(
            jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0),
            jnp.eye(4), num_stages=cfg.backbone.num_stages,
            voxel_size=cfg.backbone.init_voxel_size,
            radius=cfg.backbone.init_radius,
            neighbor_limits=tuple(cfg.caps.neighbor_limits),
            stage_caps=tuple(cfg.caps.stage_caps),
            inverse_limits=tuple(cfg.caps.inverse_limits))
        assert not np.any(np.asarray(overflow))
        model = create_model(cfg)
        tx = make_optimizer(cfg, steps_per_epoch=10, world_size=1)
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
        step = make_train_step(model, cfg, tx, mesh=None)
        b = jax.tree.map(lambda x: x[None], batch)
        state, aux = step(state, b, jax.random.PRNGKey(0))
        assert np.isfinite(float(aux["loss"]))
        assert float(aux["grad_finite"]) == 1.0
