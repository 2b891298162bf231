"""Engine smoke tests: loader -> trainer step -> checkpoint -> tester -> eval."""

import numpy as np
import jax
import pytest

from test_parallel import tiny_config, make_tiny_batch


class SyntheticPairDataset:
    """Picklable synthetic wavy-surface pair dataset."""

    def __init__(self, n_items=4, n_points=400):
        self.n_items = n_items
        self.n_points = n_points

    def __len__(self):
        return self.n_items

    def __getitem__(self, index):
        rng = np.random.default_rng(index)
        xy = rng.uniform(0, 1, (self.n_points, 2)).astype(np.float32)
        z = 0.2 * np.sin(4 * xy[:, 0]) + 0.01 * rng.normal(size=self.n_points)
        ref = np.column_stack([xy, z]).astype(np.float32)
        keep = ref[:, 0] < 0.8
        src = (ref[keep] + 0.005 * rng.normal(size=(int(keep.sum()), 3))).astype(np.float32)
        return {
            "scene_name": f"scene{index % 2}",
            "ref_frame": index,
            "src_frame": index + 2,
            "ref_points": ref,
            "src_points": src,
            "transform": np.eye(4, dtype=np.float32),
        }


def pipeline_cfg(cfg):
    return dict(
        num_stages=cfg.backbone.num_stages,
        voxel_size=cfg.backbone.init_voxel_size,
        search_radius=cfg.backbone.init_radius,
        neighbor_limits=cfg.caps.neighbor_limits,
        stage_caps=cfg.caps.stage_caps,
        input_dim=cfg.backbone.input_dim,
    )


class TestLoader:
    def test_synchronous(self):
        from geotransformer_tpu.preprocess.loader import PairLoader

        cfg = tiny_config()
        loader = PairLoader(SyntheticPairDataset(), pipeline_cfg(cfg), batch_size=2)
        groups = list(loader)
        assert len(groups) == 2
        assert len(groups[0]) == 2
        batch = groups[0][0]
        assert batch["points"][0].shape == (2 * cfg.caps.stage_caps[0], 3)
        assert batch["meta"]["scene_name"] == "scene0"

    def test_shuffle_epoch_aware(self):
        from geotransformer_tpu.preprocess.loader import PairLoader

        cfg = tiny_config()
        loader = PairLoader(
            SyntheticPairDataset(8), pipeline_cfg(cfg), batch_size=1, shuffle=True
        )
        loader.set_epoch(0)
        order0 = [g[0]["meta"]["ref_frame"] for g in loader]
        loader.set_epoch(1)
        order1 = [g[0]["meta"]["ref_frame"] for g in loader]
        loader.set_epoch(0)
        order0b = [g[0]["meta"]["ref_frame"] for g in loader]
        assert order0 == order0b
        assert order0 != order1

    def test_sharding(self):
        from geotransformer_tpu.preprocess.loader import PairLoader

        cfg = tiny_config()
        shard0 = PairLoader(
            SyntheticPairDataset(8), pipeline_cfg(cfg), batch_size=1,
            num_shards=2, shard_index=0,
        )
        shard1 = PairLoader(
            SyntheticPairDataset(8), pipeline_cfg(cfg), batch_size=1,
            num_shards=2, shard_index=1,
        )
        ids0 = {g[0]["meta"]["ref_frame"] for g in shard0}
        ids1 = {g[0]["meta"]["ref_frame"] for g in shard1}
        assert ids0 | ids1 == set(range(8))
        assert not (ids0 & ids1)


class TestTrainerAndTester:
    @pytest.mark.slow
    def test_trainer_step_and_checkpoint(self, tmp_path):
        from geotransformer_tpu.models import create_model
        from geotransformer_tpu.engine import Trainer
        from geotransformer_tpu.preprocess.loader import PairLoader

        cfg = tiny_config()
        import dataclasses

        cfg = dataclasses.replace(cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
        model = create_model(cfg)
        loader = PairLoader(
            SyntheticPairDataset(2), pipeline_cfg(cfg), batch_size=1, shuffle=True
        )
        trainer = Trainer(cfg, model, loader, val_loader=None,
                          output_dir=str(tmp_path), use_mesh=False, log_steps=1)
        example = dict(loader.__iter__().__next__()[0])
        example.pop("meta")
        trainer.initialize(example)
        state = trainer.run()
        assert int(state.step) == 2  # 2 samples, batch 1, 1 epoch

        # checkpoint round trip
        restored, step = trainer.checkpoints.restore(state)
        assert step == 1
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(restored.params)[0]
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    def test_tester_dump_and_offline_eval(self, tmp_path):
        from geotransformer_tpu.models import create_model
        from geotransformer_tpu.engine import Tester
        from geotransformer_tpu.preprocess.loader import PairLoader
        import jax.numpy as jnp

        cfg = tiny_config()
        model = create_model(cfg)
        loader = PairLoader(SyntheticPairDataset(2), pipeline_cfg(cfg), batch_size=1)
        example = dict(next(iter(loader))[0])
        example.pop("meta")
        example = jax.tree.map(jnp.asarray, example)
        variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=True))(
            jax.random.PRNGKey(0), example
        )
        feature_dir = str(tmp_path / "features")
        tester = Tester(cfg, model, loader, output_dir=str(tmp_path), feature_dir=feature_dir)
        summary, results = tester.run(variables)
        assert "RRE" in summary and len(results) == 2

        import glob

        files = glob.glob(feature_dir + "/*/*.npz")
        assert len(files) == 2
        data = np.load(files[0])
        assert data["ref_corr_points"].shape == data["src_corr_points"].shape
        assert data["estimated_transform"].shape == (4, 4)

        # offline eval over the dump
        from geotransformer_tpu.utils.registration import (
            evaluate_sparse_correspondences,
            evaluate_correspondences,
        )

        coarse = evaluate_sparse_correspondences(
            data["ref_points_c"], data["src_points_c"],
            data["ref_node_corr_indices"], data["src_node_corr_indices"],
            data["gt_node_corr_indices"],
        )
        assert 0.0 <= coarse["precision"] <= 1.0
        fine = evaluate_correspondences(
            data["ref_corr_points"], data["src_corr_points"], data["transform"]
        )
        assert 0.0 <= fine["inlier_ratio"] <= 1.0


class TestEvalScripts:
    def _dump(self, tmp_path, n_pairs=2):
        """Synthetic npz feature dumps in the tester's layout."""
        import glob
        rng = np.random.default_rng(5)
        scene = tmp_path / "features" / "scene_a"
        scene.mkdir(parents=True)
        for i in range(n_pairs):
            nc, k = 20, 64
            ref_c = rng.normal(size=(nc, 3)).astype(np.float32)
            src_c = ref_c + 0.01 * rng.normal(size=(nc, 3)).astype(np.float32)
            corr = rng.normal(size=(k, 3)).astype(np.float32)
            np.savez(
                scene / f"{i}_{i + 1}.npz",
                ref_points_c=ref_c, src_points_c=src_c,
                ref_node_corr_indices=rng.integers(0, nc, 8),
                src_node_corr_indices=rng.integers(0, nc, 8),
                gt_node_corr_indices=np.stack(
                    [np.arange(8), np.arange(8)], 1
                ),
                ref_corr_points=corr,
                src_corr_points=corr + 0.001,
                corr_scores=rng.uniform(0.1, 1, k).astype(np.float32),
                transform=np.eye(4, dtype=np.float32),
                estimated_transform=np.eye(4, dtype=np.float32),
            )
        return str(tmp_path / "features")

    @pytest.mark.slow

    def test_eval_dgr_runs(self, tmp_path):
        import subprocess, sys, os.path as osp

        feature_dir = self._dump(tmp_path)
        script = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                          "scripts", "eval_dgr.py")
        for method in ("lgr", "svd"):
            r = subprocess.run(
                [sys.executable, script, "--feature_dir", feature_dir,
                 "--method", method],
                capture_output=True, text=True,
                env={**__import__("os").environ, "JAX_PLATFORMS": "cpu"},
            )
            assert r.returncode == 0, r.stderr[-500:]
            assert "overall (DGR protocol)" in r.stdout
            # identity estimate vs identity gt: perfect recall
            assert "RR       : 1.0000" in r.stdout, r.stdout[-400:]

    def test_eval_script_runs(self, tmp_path):
        import subprocess, sys, os, os.path as osp

        feature_dir = self._dump(tmp_path)
        script = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                          "scripts", "eval.py")
        r = subprocess.run(
            [sys.executable, script, "--dataset", "kitti",
             "--feature_dir", feature_dir],
            capture_output=True, text=True,
            env={**os.environ, "JAX_PLATFORMS": "cpu"},
        )
        assert r.returncode == 0, r.stderr[-500:]
        assert "RR: 1.0000" in r.stdout, r.stdout[-400:]
        assert "Per scene:" in r.stdout and "scene_a" in r.stdout
        assert "median_RRE" in r.stdout

    @pytest.mark.slow

    def test_eval_script_method_switch(self, tmp_path):
        """--method {svd,ransac} re-estimates instead of reading the stored
        transform (reference eval.py:166-186). The dump's correspondences are
        a perfect identity match, so both must yield RR=1 even though we
        poison the stored estimated_transform."""
        import subprocess, sys, os, glob, os.path as osp

        feature_dir = self._dump(tmp_path)
        for f in glob.glob(osp.join(feature_dir, "*", "*.npz")):
            data = dict(np.load(f))
            bad = np.eye(4, dtype=np.float32)
            bad[:3, 3] = 100.0  # lgr method would fail with this
            data["estimated_transform"] = bad
            np.savez(f, **data)
        script = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))),
                          "scripts", "eval.py")
        for method, expected in (("svd", "RR: 1.0000"), ("ransac", "RR: 1.0000"),
                                 ("lgr", "RR: 0.0000")):
            r = subprocess.run(
                [sys.executable, script, "--dataset", "kitti",
                 "--feature_dir", feature_dir, "--method", method,
                 "--num_corr", "32"],
                capture_output=True, text=True,
                env={**os.environ, "JAX_PLATFORMS": "cpu"},
            )
            assert r.returncode == 0, r.stderr[-500:]
            assert expected in r.stdout, (method, r.stdout[-400:])
