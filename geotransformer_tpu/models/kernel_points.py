r"""Kernel point disposition generation.

Generates the KPConv kernel-point layout (K points in a unit ball, one fixed
at the center) by minimizing a repulsion + center-attraction energy — the
standard procedure from the KPConv paper (Thomas et al., ICCV 2019; see
reference `/root/reference/geotransformer/modules/kpconv/kernel_points.py`
for the equivalent role). Implemented independently in numpy, deterministic
given the seed, and cached on disk so every layer sees the same disposition.

Unlike the reference (which adds a random rotation and noise per *process*
launch), the disposition here is deterministic; random augmentation of the
kernel layout is unnecessary because the layout is spherically symmetric in
expectation and training augments the data instead.
"""

import os
import os.path as osp

import numpy as np

_CACHE_DIR = osp.join(osp.dirname(osp.abspath(__file__)), "dispositions")


def _optimize_kernel_points(num_points, dimension=3, num_iters=10000, seed=1):
    """Repulsion-based optimization of kernel point positions in a ball.

    Points repel each other with a 1/r^2 force and are pulled toward the
    center; point 0 is pinned at the origin. Returns (K, dim) positions with
    the mean radius of the non-center points normalized to 1.
    """
    rng = np.random.default_rng(seed)
    radius0 = 1.0
    points = rng.uniform(-radius0, radius0, size=(num_points * 10, dimension))
    points = points[np.linalg.norm(points, axis=1) < radius0][:num_points]
    while points.shape[0] < num_points:
        extra = rng.uniform(-radius0, radius0, size=(num_points, dimension))
        extra = extra[np.linalg.norm(extra, axis=1) < radius0]
        points = np.concatenate([points, extra], axis=0)[:num_points]
    points[0] = 0.0

    step = 1e-2
    for _ in range(num_iters):
        diff = points[:, None, :] - points[None, :, :]  # (K, K, D)
        sq = np.sum(diff**2, axis=-1) + 1e-12
        np.fill_diagonal(sq, 1.0)
        repulsion = np.sum(diff / (sq**1.5)[:, :, None], axis=1)  # (K, D)
        attraction = -points  # pull to center keeps cloud bounded
        grad = repulsion + 2.0 * num_points * attraction
        norm = np.linalg.norm(grad, axis=1, keepdims=True) + 1e-12
        points += step * grad / norm
        points[0] = 0.0

    # Normalize the shell to the KPConv occupancy ratio: non-center points sit
    # at ~0.66 of the kernel radius so neighboring influence regions overlap
    # (same convention as the reference disposition, whose 14 outer points lie
    # on a shell of radius ~0.66).
    radii = np.linalg.norm(points[1:], axis=1)
    points *= 0.66 / radii.mean()
    points[0] = 0.0
    return points.astype(np.float32)


def load_kernel_points(radius, num_points, dimension=3):
    """Load (or generate+cache) kernel points scaled to `radius`.

    Returns (num_points, dimension) float32 array; row 0 is the center.
    """
    os.makedirs(_CACHE_DIR, exist_ok=True)
    cache = osp.join(_CACHE_DIR, f"k_{num_points:03d}_center_{dimension}d.npy")
    if osp.exists(cache):
        points = np.load(cache)
    else:
        points = _optimize_kernel_points(num_points, dimension)
        np.save(cache, points)
    return (points * radius).astype(np.float32)
