"""Unit + reference-parity tests for core ops."""

import numpy as np
import jax.numpy as jnp
import pytest

from geotransformer_tpu.ops import (
    pairwise_distance,
    apply_transform,
    inverse_transform,
    get_transform_from_rotation_translation,
    get_rotation_translation_from_transform,
    rodrigues_rotation_matrix,
    vector_angle,
    sinusoidal_embedding,
    point_to_node_partition,
    gather_with_shadow,
    masked_topk,
)


def random_transform(rng):
    axis = rng.normal(size=3)
    angle = rng.uniform(0, np.pi)
    rot = np.asarray(rodrigues_rotation_matrix(jnp.asarray(axis, jnp.float32), jnp.float32(angle)))
    t = rng.normal(size=3).astype(np.float32)
    return np.asarray(
        get_transform_from_rotation_translation(jnp.asarray(rot), jnp.asarray(t))
    )


class TestPairwiseDistance:
    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.pairwise_distance import pairwise_distance as ref_pd

        x = rng.normal(size=(2, 50, 3)).astype(np.float32)
        y = rng.normal(size=(2, 40, 3)).astype(np.float32)
        ours = np.asarray(pairwise_distance(jnp.asarray(x), jnp.asarray(y)))
        theirs = ref_pd(torch.from_numpy(x), torch.from_numpy(y)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_normalized(self, rng):
        x = rng.normal(size=(10, 8)).astype(np.float32)
        x /= np.linalg.norm(x, axis=-1, keepdims=True)
        d_full = pairwise_distance(jnp.asarray(x), jnp.asarray(x))
        d_norm = pairwise_distance(jnp.asarray(x), jnp.asarray(x), normalized=True)
        np.testing.assert_allclose(np.asarray(d_full), np.asarray(d_norm), atol=1e-5)

    def test_channel_first(self, rng):
        x = rng.normal(size=(3, 20)).astype(np.float32)
        y = rng.normal(size=(3, 15)).astype(np.float32)
        a = pairwise_distance(jnp.asarray(x), jnp.asarray(y), channel_first=True)
        b = pairwise_distance(jnp.asarray(x.T), jnp.asarray(y.T))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestSE3:
    def test_apply_and_inverse(self, rng):
        T = random_transform(rng)
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        moved = apply_transform(jnp.asarray(pts), jnp.asarray(T))
        back = apply_transform(moved, inverse_transform(jnp.asarray(T)))
        np.testing.assert_allclose(np.asarray(back), pts, atol=1e-4)

    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.transformation import apply_transform as ref_apply

        T = random_transform(rng)
        pts = rng.normal(size=(30, 3)).astype(np.float32)
        ours = np.asarray(apply_transform(jnp.asarray(pts), jnp.asarray(T)))
        theirs = ref_apply(torch.from_numpy(pts), torch.from_numpy(T)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)

    def test_batched_apply(self, rng):
        T = np.stack([random_transform(rng) for _ in range(4)])
        pts = rng.normal(size=(4, 10, 3)).astype(np.float32)
        out = np.asarray(apply_transform(jnp.asarray(pts), jnp.asarray(T)))
        for b in range(4):
            expected = pts[b] @ T[b, :3, :3].T + T[b, :3, 3]
            np.testing.assert_allclose(out[b], expected, atol=1e-4)

    def test_compose_decompose(self, rng):
        T = random_transform(rng)
        R, t = get_rotation_translation_from_transform(jnp.asarray(T))
        T2 = get_transform_from_rotation_translation(R, t)
        np.testing.assert_allclose(np.asarray(T2), T, atol=1e-6)


class TestVectorAngle:
    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.vector_angle import vector_angle as ref_va

        x = rng.normal(size=(20, 3)).astype(np.float32)
        y = rng.normal(size=(20, 3)).astype(np.float32)
        ours = np.asarray(vector_angle(jnp.asarray(x), jnp.asarray(y)))
        theirs = ref_va(torch.from_numpy(x), torch.from_numpy(y), dim=-1).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


class TestSinusoidalEmbedding:
    def test_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.transformer.positional_embedding import (
            SinusoidalPositionalEmbedding,
        )

        d_model = 64
        idx = rng.uniform(0, 30, size=(5, 7)).astype(np.float32)
        ours = np.asarray(sinusoidal_embedding(jnp.asarray(idx), d_model))
        ref = SinusoidalPositionalEmbedding(d_model)
        theirs = ref(torch.from_numpy(idx)).numpy()
        np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-5)


class TestGather:
    def test_shadow_row(self, rng):
        data = rng.normal(size=(5, 3)).astype(np.float32)
        idx = np.asarray([[0, 5], [4, 2]])
        out = np.asarray(gather_with_shadow(jnp.asarray(data), jnp.asarray(idx)))
        np.testing.assert_allclose(out[0, 0], data[0])
        np.testing.assert_allclose(out[0, 1], np.zeros(3))
        np.testing.assert_allclose(out[1, 0], data[4])

    def test_masked_topk(self):
        scores = jnp.asarray([[3.0, 5.0, 1.0, 4.0]])
        mask = jnp.asarray([[True, False, True, True]])
        vals, idx, valid = masked_topk(scores, 2, mask=mask)
        assert idx.tolist() == [[3, 0]]
        assert vals.tolist() == [[4.0, 3.0]]
        assert valid.tolist() == [[True, True]]

    def test_masked_topk_underfull(self):
        scores = jnp.asarray([[3.0, 5.0]])
        mask = jnp.asarray([[True, False]])
        _, _, valid = masked_topk(scores, 2, mask=mask)
        assert valid.tolist() == [[True, False]]


class TestPartition:
    def test_matches_reference_unpadded(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.pointcloud_partition import (
            point_to_node_partition as ref_partition,
        )

        points = rng.normal(size=(200, 3)).astype(np.float32)
        nodes = rng.normal(size=(17, 3)).astype(np.float32)
        k = 16
        p2n, node_masks, knn_idx, knn_masks = point_to_node_partition(
            jnp.asarray(points), jnp.asarray(nodes), k
        )
        r_p2n, r_node_masks, r_knn_idx, r_knn_masks = ref_partition(
            torch.from_numpy(points), torch.from_numpy(nodes), k
        )
        np.testing.assert_array_equal(np.asarray(p2n), r_p2n.numpy())
        np.testing.assert_array_equal(np.asarray(node_masks), r_node_masks.numpy())
        np.testing.assert_array_equal(np.asarray(knn_masks), r_knn_masks.numpy())
        # Valid slots must point to the same *set* of points per node
        # (tie order within a patch may differ).
        ours_idx = np.asarray(knn_idx)
        theirs_idx = r_knn_idx.numpy()
        for m in range(nodes.shape[0]):
            assert set(ours_idx[m][np.asarray(knn_masks)[m]].tolist()) == set(
                theirs_idx[m][r_knn_masks[m].numpy()].tolist()
            )

    def test_padded_consistency(self, rng):
        """Partition of padded inputs == partition of unpadded inputs."""
        points = rng.normal(size=(100, 3)).astype(np.float32)
        nodes = rng.normal(size=(10, 3)).astype(np.float32)
        k = 12
        _, nm, ki, km = point_to_node_partition(jnp.asarray(points), jnp.asarray(nodes), k)

        pad_points = np.concatenate([points, np.full((28, 3), 1e6, np.float32)])
        pad_nodes = np.concatenate([nodes, np.full((6, 3), 1e6, np.float32)])
        pmask = np.concatenate([np.ones(100, bool), np.zeros(28, bool)])
        nmask = np.concatenate([np.ones(10, bool), np.zeros(6, bool)])
        _, nm2, ki2, km2 = point_to_node_partition(
            jnp.asarray(pad_points), jnp.asarray(pad_nodes), k,
            point_masks=jnp.asarray(pmask), node_masks_in=jnp.asarray(nmask),
        )
        np.testing.assert_array_equal(np.asarray(nm), np.asarray(nm2)[:10])
        assert not np.asarray(nm2)[10:].any()
        np.testing.assert_array_equal(np.asarray(km), np.asarray(km2)[:10])
        # sentinel remaps from 100 -> 128 for padded version
        ours = np.where(np.asarray(km), np.asarray(ki), -1)
        padded = np.where(np.asarray(km2)[:10], np.asarray(ki2)[:10], -1)
        np.testing.assert_array_equal(ours, padded)
        assert not np.asarray(km2)[10:].any()


class TestPartitionVariants:
    def test_point_to_node_indices_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.pointcloud_partition import (
            get_point_to_node_indices as ref_fn,
        )
        from geotransformer_tpu.ops.partition import get_point_to_node_indices

        points = rng.normal(size=(150, 3)).astype(np.float32)
        nodes = rng.normal(size=(13, 3)).astype(np.float32)
        idx, sizes = get_point_to_node_indices(
            jnp.asarray(points), jnp.asarray(nodes), return_counts=True
        )
        r_idx, r_sizes = ref_fn(
            torch.from_numpy(points), torch.from_numpy(nodes), return_counts=True
        )
        np.testing.assert_array_equal(np.asarray(idx), r_idx.numpy())
        np.testing.assert_array_equal(np.asarray(sizes), r_sizes.numpy())

    def test_ball_query_matches_reference(self, refmodules, rng):
        import torch
        from geotransformer.modules.ops.pointcloud_partition import (
            ball_query_partition as ref_fn,
        )
        from geotransformer_tpu.ops.partition import ball_query_partition

        points = rng.normal(size=(150, 3)).astype(np.float32)
        nodes = rng.normal(size=(13, 3)).astype(np.float32)
        idx, masks, sizes = ball_query_partition(
            jnp.asarray(points), jnp.asarray(nodes), radius=0.8,
            point_limit=24, return_count=True,
        )
        r_idx, r_masks, r_sizes = ref_fn(
            torch.from_numpy(points), torch.from_numpy(nodes), 0.8, 24,
            return_count=True,
        )
        np.testing.assert_array_equal(np.asarray(masks), r_masks.numpy())
        np.testing.assert_array_equal(np.asarray(sizes), r_sizes.numpy())
        # same set of in-radius points per node (tie order may differ)
        ours, theirs = np.asarray(idx), r_idx.numpy()
        for m in range(nodes.shape[0]):
            assert set(ours[m][np.asarray(masks)[m]].tolist()) == set(
                theirs[m][r_masks[m].numpy()].tolist()
            )


class TestVisualizationHelpers:
    def test_tsne_colors_and_obj_export(self, tmp_path, rng):
        from geotransformer_tpu.utils.visualization import (
            get_colors_with_tsne, write_correspondences_to_obj,
            write_points_to_obj,
        )

        colors = get_colors_with_tsne(rng.normal(size=(40, 16)))
        assert colors.shape == (40, 3)
        assert colors.min() >= 0.0 and colors.max() <= 1.0

        p = tmp_path / "pts.obj"
        write_points_to_obj(str(p), rng.uniform(0, 1, (3, 3)),
                            colors=rng.uniform(0, 1, (3, 3)), resolution=3)
        lines = p.read_text().splitlines()
        assert any(l.startswith("v ") for l in lines)
        assert any(l.startswith("f ") for l in lines)

        c = tmp_path / "corr.obj"
        write_correspondences_to_obj(
            str(c), rng.uniform(0, 1, (4, 3)), rng.uniform(0, 1, (4, 3)))
        lines = c.read_text().splitlines()
        assert sum(l.startswith("l ") for l in lines) == 4
