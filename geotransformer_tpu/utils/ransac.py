r"""Correspondence-based RANSAC registration (baseline estimator).

Replaces the reference's open3d RANSAC glue
(`/root/reference/geotransformer/utils/open3d.py:133-198`) with a vectorized
numpy implementation: batched minimal-sample Kabsch hypotheses, inlier
counting, and a final refit on the best consensus set. Used by the offline
evaluator as the `ransac` registration method (the LGR path never needs it —
that is the point of the paper).
"""

import numpy as np


def _kabsch(src, ref, weights=None):
    """Batched (or single) rigid fit src -> ref. src/ref: (..., N, 3)."""
    if weights is None:
        weights = np.ones(src.shape[:-1])
    w = weights / np.maximum(weights.sum(axis=-1, keepdims=True), 1e-12)
    w = w[..., None]
    src_c = (src * w).sum(axis=-2, keepdims=True)
    ref_c = (ref * w).sum(axis=-2, keepdims=True)
    src0 = src - src_c
    ref0 = ref - ref_c
    H = np.einsum("...nc,...nd->...cd", src0 * w, ref0)
    U, _, Vt = np.linalg.svd(H)
    V = np.swapaxes(Vt, -1, -2)
    Ut = np.swapaxes(U, -1, -2)
    det = np.linalg.det(V @ Ut)
    fix = np.tile(np.eye(3), H.shape[:-2] + (1, 1))
    fix[..., 2, 2] = np.sign(det)
    R = V @ fix @ Ut
    t = ref_c[..., 0, :] - np.einsum("...cd,...d->...c", R, src_c[..., 0, :])
    return R, t


def registration_with_ransac_from_correspondences(
    src_corr_points,
    ref_corr_points,
    distance_threshold=0.05,
    ransac_n=3,
    num_iterations=1000,
    seed=0,
):
    """Estimate the rigid transform src -> ref by RANSAC over correspondences.

    Args:
        src_corr_points / ref_corr_points: (N, 3) matched points.
        distance_threshold: inlier radius.
        ransac_n: minimal sample size.
        num_iterations: hypothesis count.

    Returns:
        (4, 4) transform.
    """
    src = np.asarray(src_corr_points, np.float64)
    ref = np.asarray(ref_corr_points, np.float64)
    n = src.shape[0]
    if n < ransac_n:
        R, t = _kabsch(src, ref)
        transform = np.eye(4)
        transform[:3, :3] = R
        transform[:3, 3] = t
        return transform.astype(np.float32)

    rng = np.random.default_rng(seed)
    samples = rng.integers(0, n, size=(num_iterations, ransac_n))
    R, t = _kabsch(src[samples], ref[samples])  # (I, 3, 3), (I, 3)
    aligned = np.einsum("icd,nd->inc", R, src) + t[:, None, :]  # (I, N, 3)
    residuals = np.linalg.norm(aligned - ref[None], axis=-1)
    inliers = residuals < distance_threshold  # (I, N)
    best = int(np.argmax(inliers.sum(axis=1)))
    best_inliers = inliers[best]
    if best_inliers.sum() >= ransac_n:
        R_f, t_f = _kabsch(src[best_inliers], ref[best_inliers])
    else:
        R_f, t_f = R[best], t[best]
    transform = np.eye(4)
    transform[:3, :3] = R_f
    transform[:3, 3] = t_f
    return transform.astype(np.float32)
