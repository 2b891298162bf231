"""Parity tests for losses and metrics vs the reference torch implementation."""

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.losses import (
    weighted_circle_loss,
    isotropic_transform_error,
    registration_rmse,
    modified_chamfer_distance,
)


class TestCircleLoss:
    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.loss.circle_loss import weighted_circle_loss as ref_wcl

        m, n = 30, 25
        feat_dists = rng.uniform(0, 2, (m, n)).astype(np.float32)
        overlaps = np.where(rng.uniform(size=(m, n)) > 0.85, rng.uniform(0.1, 1, (m, n)), 0.0).astype(np.float32)
        pos_masks = overlaps > 0.1
        neg_masks = overlaps == 0.0
        pos_scales = np.sqrt(overlaps * pos_masks)

        got = float(
            weighted_circle_loss(
                jnp.asarray(pos_masks), jnp.asarray(neg_masks), jnp.asarray(feat_dists),
                0.1, 1.4, 0.1, 1.4, 24.0, pos_scales=jnp.asarray(pos_scales),
            )
        )
        want = float(
            ref_wcl(
                torch.from_numpy(pos_masks), torch.from_numpy(neg_masks),
                torch.from_numpy(feat_dists), 0.1, 1.4, 0.1, 1.4, 24.0,
                pos_scales=torch.from_numpy(pos_scales.astype(np.float32)),
            )
        )
        assert abs(got - want) < 1e-4


class TestMetrics:
    def test_isotropic_error_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.registration.metrics import isotropic_transform_error as ref_err
        from geotransformer_tpu.ops import rodrigues_rotation_matrix, get_transform_from_rotation_translation

        def rand_T():
            axis = jnp.asarray(rng.normal(size=3), jnp.float32)
            R = rodrigues_rotation_matrix(axis, jnp.float32(rng.uniform(0, 2)))
            return np.asarray(get_transform_from_rotation_translation(R, jnp.asarray(rng.normal(size=3), jnp.float32)))

        gt, est = rand_T(), rand_T()
        rre, rte = isotropic_transform_error(jnp.asarray(gt), jnp.asarray(est))
        w_rre, w_rte = ref_err(torch.from_numpy(gt), torch.from_numpy(est))
        assert abs(float(rre) - float(w_rre)) < 1e-3
        assert abs(float(rte) - float(w_rte)) < 1e-5

    def test_registration_rmse_masked(self, rng):
        pts = rng.normal(size=(60, 3)).astype(np.float32)
        gt = np.eye(4, dtype=np.float32)
        est = np.eye(4, dtype=np.float32)
        est[:3, 3] = [0.1, 0, 0]
        rmse = float(registration_rmse(jnp.asarray(pts), jnp.asarray(gt), jnp.asarray(est)))
        assert abs(rmse - 0.1) < 1e-5
        # padded version with junk rows masked out
        pts_pad = np.concatenate([pts, 100 * rng.normal(size=(10, 3)).astype(np.float32)])
        masks = np.concatenate([np.ones(60, bool), np.zeros(10, bool)])
        rmse_pad = float(
            registration_rmse(jnp.asarray(pts_pad), jnp.asarray(gt), jnp.asarray(est), jnp.asarray(masks))
        )
        assert abs(rmse_pad - rmse) < 1e-6

    def test_chamfer_matches_numpy_reference(self, rng):
        from geotransformer_tpu.utils.registration import compute_modified_chamfer_distance

        raw = rng.normal(size=(100, 3)).astype(np.float32)
        ref_pts = rng.normal(size=(80, 3)).astype(np.float32)
        src_pts = rng.normal(size=(70, 3)).astype(np.float32)
        gt = np.eye(4, dtype=np.float32)
        est = np.eye(4, dtype=np.float32)
        est[:3, 3] = [0.05, 0.0, 0.0]
        got = float(
            modified_chamfer_distance(
                jnp.asarray(raw), jnp.asarray(ref_pts), jnp.asarray(src_pts),
                jnp.asarray(gt), jnp.asarray(est),
            )
        )
        want = compute_modified_chamfer_distance(raw, ref_pts, src_pts, gt, est)
        assert abs(got - want) < 1e-4


class TestEvalProtocol:
    def test_log_roundtrip(self, tmp_path, rng):
        from geotransformer_tpu.eval import read_log_file, write_log_file

        pairs = [
            dict(test_pair=[0, 3], num_fragments=60, transform=np.eye(4, dtype=np.float32)),
            dict(test_pair=[1, 5], num_fragments=60,
                 transform=rng.normal(size=(4, 4)).astype(np.float32)),
        ]
        path = str(tmp_path / "est.log")
        write_log_file(path, pairs)
        parsed = read_log_file(path)
        assert parsed[0]["test_pair"] == [0, 3]
        np.testing.assert_allclose(parsed[1]["transform"], pairs[1]["transform"], rtol=1e-5)

    def test_quaternion_matches_scipy(self, rng):
        from scipy.spatial.transform import Rotation
        from geotransformer_tpu.eval.threedmatch_benchmark import rotation_matrix_to_quaternion

        for _ in range(20):
            R = Rotation.random(random_state=int(rng.integers(0, 1 << 31))).as_matrix()
            q = rotation_matrix_to_quaternion(R)
            q_scipy = Rotation.from_matrix(R).as_quat()  # (x, y, z, w)
            q_scipy = np.concatenate([[q_scipy[3]], q_scipy[:3]])
            if q_scipy[0] < 0:
                q_scipy = -q_scipy
            np.testing.assert_allclose(q, q_scipy, atol=1e-8)

    def test_real_gt_metadata_parses(self):
        import os.path as osp

        gt_root = "/root/reference/data/3DMatch/metadata/benchmarks/3DMatch/7-scenes-redkitchen"
        if not osp.exists(osp.join(gt_root, "gt.log")):
            import pytest

            pytest.skip("bundled benchmark metadata missing")
        from geotransformer_tpu.eval import get_gt_logs_and_infos, compute_transform_error

        gt_indices, gt_logs, gt_infos = get_gt_logs_and_infos(gt_root, 60)
        assert (gt_indices >= -1).all()
        assert len(gt_logs) == len(gt_infos)
        # perfect estimate -> zero error; perturbed -> positive error
        idx = int(np.max(gt_indices))
        log = gt_logs[idx]
        info = gt_infos[idx]
        err0 = compute_transform_error(log["transform"], info["covariance"], log["transform"])
        assert err0 < 1e-9
        bad = log["transform"].copy()
        bad[:3, 3] += 0.5
        err1 = compute_transform_error(log["transform"], info["covariance"], bad)
        assert err1 > err0
