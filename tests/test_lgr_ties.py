"""LGR top-k tie semantics (models/lgr._row_topk_mask).

The reference builds its correspondence matrix by scattering per-row top-k
VALUES into a zero matrix and thresholding
(`local_global_registration.py:56-71`); ours compares against the k-th value
(scatter-free). The two differ ONLY on exact float ties at the k-th score
above the confidence threshold: the reference keeps the k entries torch.topk
happened to order first, ours keeps every tied entry. These tests pin that
documented divergence on constructed ties — including the structural sources
(padded patch slots, duplicated patch points from the capacity-repeat idiom)
— and show it has no end-metric effect.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from geotransformer_tpu.models.lgr import (
    _row_topk_mask,
    compute_correspondence_matrix,
    local_to_global_registration,
)


def _np(x):
    return np.asarray(x)


class TestRowTopkTies:
    def test_exact_tie_keeps_all_tied_entries(self):
        # row 0: kth (k=2) value 0.5 tied three ways above threshold
        score = np.array(
            [[0.9, 0.5, 0.5, 0.5, 0.1],
             [0.9, 0.8, 0.7, 0.2, 0.1]], np.float32)
        got = _np(_row_topk_mask(jnp.asarray(score), 2, 0.05))
        # ours: every entry >= kth survives (4 in row 0), exact k in row 1
        np.testing.assert_array_equal(
            got,
            np.array([[True, True, True, True, False],
                      [True, True, False, False, False]]))

    def test_ties_below_threshold_removed(self):
        # padded-slot structural tie: masked scores tie at <= 0 and must be
        # removed by the threshold exactly as in the reference
        score = np.array([[0.0, 0.0, 0.0, 0.7]], np.float32)
        got = _np(_row_topk_mask(jnp.asarray(score), 3, 0.05))
        np.testing.assert_array_equal(got, np.array([[False, False, False, True]]))

    def test_divergence_vs_reference_is_superset_on_ties(self, refmodules, rng):
        """On tied inputs ours is the reference's scatter result plus the
        remaining tied entries; on tie-free inputs the two are equal
        (TestCorrespondenceMatrix in test_model_parity.py)."""
        import torch
        from geotransformer.modules.geotransformer.local_global_registration import (
            LocalGlobalRegistration as RefLGR,
        )

        p, k = 4, 8
        score = rng.uniform(0.1, 1.0, size=(p, k, k)).astype(np.float32)
        # plant exact ties at the top of several rows and columns
        score[0, 0, :4] = 0.75
        score[1, :, 2] = 0.6
        score[2, 3, 1] = score[2, 3, 5] = score[2, 3, 6] = 0.9
        masks = np.ones((p, k), bool)

        ref_mod = RefLGR(3, 0.1, mutual=True, confidence_threshold=0.05)
        want = ref_mod.compute_correspondence_matrix(
            torch.from_numpy(score), torch.from_numpy(masks),
            torch.from_numpy(masks)).numpy()
        got = _np(compute_correspondence_matrix(
            jnp.asarray(score), 3, 0.05, jnp.asarray(masks),
            jnp.asarray(masks), True))
        # every reference correspondence survives...
        assert (got | ~want).all(), "ours must keep the reference's picks"
        # ...and any extras sit exactly at a tie with a kept entry
        extras = got & ~want
        for pi, i, j in zip(*np.nonzero(extras)):
            row, col = score[pi, i, :], score[pi, :, j]
            assert ((row == score[pi, i, j]).sum() > 1
                    or (col == score[pi, i, j]).sum() > 1), (
                f"extra corr ({pi},{i},{j}) without an exact tie")

    def test_duplicated_patch_points_ties_do_not_move_the_transform(self, rng):
        """Capacity-repeat duplicates (the padding idiom repeats patch points
        to fill K slots) produce structurally tied Sinkhorn rows; the kept-all
        tie semantics must not change the estimated transform."""
        from scipy.spatial.transform import Rotation

        p_patches, k = 6, 16
        rot = Rotation.from_euler("xyz", [10.0, -4.0, 7.0], degrees=True)
        t_gt = np.array([0.2, -0.1, 0.3], np.float32)
        transform = np.eye(4, dtype=np.float32)
        transform[:3, :3] = rot.as_matrix().astype(np.float32)
        transform[:3, 3] = t_gt

        src = rng.uniform(-1, 1, (p_patches, k, 3)).astype(np.float32)
        # duplicate slots (capacity-repeat): last 4 repeat the first 4
        src[:, k - 4:] = src[:, :4]
        ref = src @ transform[:3, :3].T + transform[:3, 3]

        # scores: correct match i<->i strong; duplicated slots give EXACT
        # tied rows/cols (same point, same score pattern)
        log_scores = np.full((p_patches, k, k), -8.0, np.float32)
        idx = np.arange(k)
        log_scores[:, idx, idx] = -0.05
        # the duplicate pairs also match each other exactly
        for d in range(4):
            log_scores[:, k - 4 + d, d] = -0.05
            log_scores[:, d, k - 4 + d] = -0.05
        masks = np.ones((p_patches, k), bool)

        out = local_to_global_registration(
            jnp.asarray(ref), jnp.asarray(src),
            jnp.asarray(masks), jnp.asarray(masks),
            jnp.asarray(log_scores), k=3, acceptance_radius=0.1,
            correspondence_limit=256, patch_masks=jnp.ones(p_patches, bool),
        )
        est = _np(out["estimated_transform"])
        np.testing.assert_allclose(est, transform, atol=5e-4)

    def test_tie_overflow_of_per_patch_bound_drops_lowest_scores_only(self):
        """With >k tied nonzeros per row the two-stage top-C's k*K bound can
        truncate a patch's candidate list; the truncation must remove the
        LOWEST-scoring candidates (approx_max_k keeps descending order)."""
        p_patches, k_pts = 2, 8
        k = 1
        # every row fully tied above threshold -> 8 nonzeros/row with k=1,
        # candidate pool 64/patch > per_patch_cap k*K = 8
        log_scores = np.full((p_patches, k_pts, k_pts), np.log(0.5), np.float32)
        ref = np.tile(np.arange(k_pts, dtype=np.float32)[None, :, None],
                      (p_patches, 1, 3))
        masks = np.ones((p_patches, k_pts), bool)
        out = local_to_global_registration(
            jnp.asarray(ref), jnp.asarray(ref),
            jnp.asarray(masks), jnp.asarray(masks),
            jnp.asarray(log_scores), k=k, acceptance_radius=0.1,
            correspondence_limit=16, patch_masks=jnp.ones(p_patches, bool),
        )
        scores = _np(out["corr_scores"])
        masks_out = _np(out["corr_masks"])
        # all surviving correspondences carry the tied score (none was
        # replaced by a below-tie value), and the set is full
        assert masks_out.all()
        np.testing.assert_allclose(scores, 0.5, rtol=1e-6)
