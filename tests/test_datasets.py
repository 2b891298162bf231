"""Dataset classes over synthetic on-disk fixtures (reference layouts)."""

import os
import os.path as osp
import pickle

import numpy as np
import pytest


@pytest.fixture()
def threedmatch_root(tmp_path, rng):
    import torch

    root = tmp_path / "3DMatch"
    (root / "metadata").mkdir(parents=True)
    (root / "data" / "scene_a").mkdir(parents=True)
    metadata = []
    for i in range(3):
        for name, n in ((f"cloud_{2 * i}.pth", 500), (f"cloud_{2 * i + 1}.pth", 450)):
            torch.save(
                rng.uniform(0, 2, (n, 3)).astype(np.float32), root / "data" / "scene_a" / name
            )
        metadata.append(
            dict(
                scene_name="scene_a",
                frag_id0=2 * i,
                frag_id1=2 * i + 1,
                overlap=0.5 + 0.1 * i,
                rotation=np.eye(3),
                translation=np.zeros(3),
                pcd0=f"scene_a/cloud_{2 * i}.pth",
                pcd1=f"scene_a/cloud_{2 * i + 1}.pth",
            )
        )
    for subset in ("train", "val", "3DMatch"):
        with open(root / "metadata" / f"{subset}.pkl", "wb") as f:
            pickle.dump(metadata, f)
    return str(root)


class TestThreeDMatch:
    def test_basic(self, threedmatch_root):
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        ds = ThreeDMatchPairDataset(threedmatch_root, "train")
        assert len(ds) == 3
        sample = ds[0]
        assert sample["ref_points"].shape[1] == 3
        assert sample["transform"].shape == (4, 4)
        assert sample["scene_name"] == "scene_a"

    def test_point_limit(self, threedmatch_root):
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        ds = ThreeDMatchPairDataset(threedmatch_root, "train", point_limit=100)
        assert ds[0]["ref_points"].shape[0] == 100

    def test_overlap_filter(self, threedmatch_root):
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        ds = ThreeDMatchPairDataset(threedmatch_root, "train", overlap_threshold=0.55)
        assert len(ds) == 2

    def test_augmentation_consistency(self, threedmatch_root):
        """Augmented transform still maps src onto ref."""
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset
        from geotransformer_tpu.utils.pointcloud import apply_transform

        base = ThreeDMatchPairDataset(threedmatch_root, "train")
        aug = ThreeDMatchPairDataset(
            threedmatch_root, "train", use_augmentation=True, augmentation_noise=0.0
        )
        s0 = base[0]
        np.random.seed(0)
        s1 = aug[0]
        # src aligned by its transform must land on the (augmented) ref cloud
        aligned0 = apply_transform(s0["src_points"], s0["transform"])
        aligned1 = apply_transform(s1["src_points"], s1["transform"])
        d0 = np.linalg.norm(np.sort(aligned0.ravel()))
        d1 = np.linalg.norm(np.sort(aligned1.ravel()))
        np.testing.assert_allclose(d0, d1, rtol=1e-4)


@pytest.fixture()
def kitti_root(tmp_path, rng):
    root = tmp_path / "Kitti"
    (root / "metadata").mkdir(parents=True)
    (root / "scans").mkdir()
    metadata = []
    for i in range(2):
        for j, n in ((0, 800), (1, 700)):
            np.save(root / "scans" / f"{i}_{j}.npy", rng.uniform(-10, 10, (n, 3)).astype(np.float32))
        metadata.append(
            dict(
                seq_id=8, frame0=i, frame1=i + 1,
                pcd0=f"scans/{i}_0.npy", pcd1=f"scans/{i}_1.npy",
                transform=np.eye(4),
            )
        )
    with open(root / "metadata" / "test.pkl", "wb") as f:
        pickle.dump(metadata, f)
    return str(root)


class TestKitti:
    def test_basic(self, kitti_root):
        from geotransformer_tpu.datasets import OdometryKittiPairDataset

        ds = OdometryKittiPairDataset(kitti_root, "test")
        assert len(ds) == 2
        sample = ds[1]
        assert sample["ref_points"].shape == (800, 3)
        assert sample["seq_id"] == 8

    def test_augmentation_consistency(self, kitti_root):
        from geotransformer_tpu.datasets import OdometryKittiPairDataset
        from geotransformer_tpu.utils.pointcloud import apply_transform, inverse_transform

        ds = OdometryKittiPairDataset(
            kitti_root, "test", use_augmentation=True, augmentation_noise=0.0
        )
        np.random.seed(1)
        s = ds[0]
        # identity base transform: augmented transform must map src -> ref
        back = apply_transform(s["src_points"], s["transform"])
        base = OdometryKittiPairDataset(kitti_root, "test")[0]
        # scale may differ; shapes preserved
        assert back.shape == base["src_points"].shape
        assert np.isfinite(s["transform"]).all()


@pytest.fixture()
def modelnet_root(tmp_path, rng):
    root = tmp_path / "ModelNet"
    root.mkdir()
    data = []
    for label in (0, 2):  # asymmetric classes
        for _ in range(2):
            data.append(
                dict(
                    points=rng.uniform(-1, 1, (1500, 3)).astype(np.float32),
                    normals=rng.normal(size=(1500, 3)).astype(np.float32),
                    label=label,
                )
            )
    for subset in ("train", "test"):
        with open(root / f"{subset}.pkl", "wb") as f:
            pickle.dump(data, f)
    return str(root)


class TestModelNet:
    def test_basic(self, modelnet_root):
        from geotransformer_tpu.datasets import ModelNetPairDataset

        ds = ModelNetPairDataset(
            modelnet_root, "train", num_points=717, noise_magnitude=0.05,
            keep_ratio=0.7, twice_sample=True, deterministic=True,
        )
        assert len(ds) == 4
        s = ds[0]
        assert s["ref_points"].shape == (717, 3)
        assert s["src_points"].shape == (717, 3)
        # transform roughly aligns src onto the ref surface
        from geotransformer_tpu.datasets.modelnet import compute_overlap

        overlap = compute_overlap(s["ref_points"], s["src_points"], s["transform"], 0.1)
        assert overlap > 0.5

    def test_class_filter(self, modelnet_root):
        from geotransformer_tpu.datasets import ModelNetPairDataset

        ds = ModelNetPairDataset(
            modelnet_root, "train", class_indices="seen", asymmetric=True,
            twice_sample=True, deterministic=True,
        )
        assert len(ds) == 4  # labels 0 and 2 are both asymmetric + seen
        ds2 = ModelNetPairDataset(
            modelnet_root, "train", class_indices=[0], asymmetric=True,
            twice_sample=True, deterministic=True,
        )
        assert len(ds2) == 2

    def test_deterministic(self, modelnet_root):
        from geotransformer_tpu.datasets import ModelNetPairDataset

        ds = ModelNetPairDataset(
            modelnet_root, "test", num_points=717, twice_sample=True, deterministic=True
        )
        a, b = ds[1], ds[1]
        np.testing.assert_allclose(a["ref_points"], b["ref_points"])
        np.testing.assert_allclose(a["transform"], b["transform"])
