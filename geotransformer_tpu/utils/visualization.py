r"""Optional visualization helpers (reference: utils/visualization.py, utils/open3d.py viz).

open3d is an optional dependency: every function degrades to a clear error
message when it is unavailable, so headless TPU environments never pay the
import. Geometry math stays in numpy.
"""

import numpy as np


def _require_open3d():
    try:
        import open3d as o3d  # noqa: F401

        return o3d
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise ImportError(
            "open3d is required for visualization; install it or use the "
            "matplotlib-free data exports instead"
        ) from exc


def make_open3d_point_cloud(points, color=None):
    o3d = _require_open3d()
    pcd = o3d.geometry.PointCloud()
    pcd.points = o3d.utility.Vector3dVector(np.asarray(points, np.float64))
    if color is not None:
        pcd.paint_uniform_color(color)
    return pcd


def draw_registration(ref_points, src_points, transform=None):
    """Show ref (blue) / src (yellow) clouds, optionally aligned."""
    o3d = _require_open3d()
    from geotransformer_tpu.utils.pointcloud import apply_transform

    if transform is not None:
        src_points = apply_transform(np.asarray(src_points), np.asarray(transform))
    ref_pcd = make_open3d_point_cloud(ref_points, color=[0.0, 0.4, 1.0])
    src_pcd = make_open3d_point_cloud(src_points, color=[1.0, 0.8, 0.0])
    o3d.visualization.draw_geometries([ref_pcd, src_pcd])


def correspondences_to_line_set(ref_corr_points, src_corr_points, inlier_masks=None):
    """LineSet connecting correspondences (green inliers / red outliers)."""
    o3d = _require_open3d()
    n = len(ref_corr_points)
    points = np.concatenate([ref_corr_points, src_corr_points], axis=0)
    lines = np.stack([np.arange(n), np.arange(n) + n], axis=1)
    colors = np.zeros((n, 3))
    if inlier_masks is None:
        colors[:] = [0, 1, 0]
    else:
        colors[np.asarray(inlier_masks)] = [0, 1, 0]
        colors[~np.asarray(inlier_masks)] = [1, 0, 0]
    line_set = o3d.geometry.LineSet()
    line_set.points = o3d.utility.Vector3dVector(points)
    line_set.lines = o3d.utility.Vector2iVector(lines)
    line_set.colors = o3d.utility.Vector3dVector(colors)
    return line_set


def export_registration_npz(path, ref_points, src_points, transform, estimated_transform):
    """Headless-friendly export for later visualization elsewhere."""
    np.savez_compressed(
        path,
        ref_points=np.asarray(ref_points),
        src_points=np.asarray(src_points),
        transform=np.asarray(transform),
        estimated_transform=np.asarray(estimated_transform),
    )
