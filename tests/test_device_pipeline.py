"""Loader-integrated device preprocessing: raw-mode PairLoader ->
in-step on-device pyramid build -> Trainer/Tester with overflow policies.

The row-for-row parity of the device builder itself is covered by
tests/test_device_preprocess.py; these tests cover the production wiring
(the replacement for the reference's in-worker CPU collate,
`/root/reference/geotransformer/utils/data.py:13-77`).
"""

import dataclasses

import numpy as np
import jax
import pytest

from geotransformer_tpu.preprocess import DevicePreprocessPlan, prepare_raw_pair
from geotransformer_tpu.preprocess.loader import PairLoader
from geotransformer_tpu.models import create_model
from geotransformer_tpu.engine import Trainer
from geotransformer_tpu.engine import Tester as PairTester  # alias: pytest must not collect it

from test_parallel import tiny_config
from test_engine import SyntheticPairDataset, pipeline_cfg

pytestmark = pytest.mark.slow  # multi-minute compiles/subprocesses


def small_caps_cfg(stage_caps=(512, 128, 64)):
    cfg = tiny_config()
    return dataclasses.replace(
        cfg,
        caps=dataclasses.replace(
            cfg.caps, stage_caps=stage_caps, inverse_limits=(40, 40, 40)),
    )


class TestRawLoader:
    def test_yields_raw_groups(self):
        cfg = small_caps_cfg()
        plan = DevicePreprocessPlan(cfg)
        loader = PairLoader(
            SyntheticPairDataset(4), pipeline_cfg(cfg), batch_size=2,
            device_plan=plan,
        )
        groups = list(loader)
        assert len(groups) == 2
        batch = groups[0][0]
        assert set(batch) == {
            "raw_points", "raw_lengths", "raw_feats", "transform", "meta"}
        assert batch["raw_points"].shape == (2 * cfg.caps.stage_caps[0], 3)
        assert batch["meta"]["scene_name"] == "scene0"

    def test_bucket_selection(self):
        cfg = small_caps_cfg()
        plan = DevicePreprocessPlan(
            cfg, buckets=[(256, 64, 32), (512, 128, 64)])
        # 400-point clouds exceed the first bucket's stage-0 cap of 256
        loader = PairLoader(
            SyntheticPairDataset(2, n_points=400), pipeline_cfg(cfg),
            batch_size=1, device_plan=plan,
        )
        for group in loader:
            assert group[0]["raw_points"].shape[0] == 2 * 512
        # 200-point clouds fit the small bucket
        loader = PairLoader(
            SyntheticPairDataset(2, n_points=200), pipeline_cfg(cfg),
            batch_size=1, device_plan=plan,
        )
        for group in loader:
            assert group[0]["raw_points"].shape[0] == 2 * 256

    def test_plan_validation(self):
        cfg = small_caps_cfg()
        with pytest.raises(ValueError, match="symmetric"):
            DevicePreprocessPlan(
                cfg, buckets=[((256, 128), 64, 32)])
        with pytest.raises(ValueError, match="strictly increasing"):
            DevicePreprocessPlan(cfg, buckets=[(512, 64, 32), (512, 128, 64)])
        with pytest.raises(ValueError, match="overflow_policy"):
            DevicePreprocessPlan(cfg, overflow_policy="bogus")


def _run_one_epoch(tmp_path, cfg, plan, n_items=2):
    loader = PairLoader(
        SyntheticPairDataset(n_items), pipeline_cfg(cfg), batch_size=1,
        device_plan=plan,
    )
    model = create_model(cfg)
    trainer = Trainer(
        cfg, model, loader, val_loader=loader,
        output_dir=str(tmp_path / "out"), use_mesh=False,
        log_steps=1, tensorboard=False, device_plan=plan,
    )
    trainer.initialize(prepare_raw_pair(
        SyntheticPairDataset(n_items)[0], plan.buckets[-1][0],
        cfg.backbone.input_dim))
    state = trainer.run()
    return trainer, state


class TestDeviceTrainer:
    def test_one_epoch(self, tmp_path):
        cfg = small_caps_cfg()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
        plan = DevicePreprocessPlan(cfg, with_inverse=True)
        trainer, state = _run_one_epoch(tmp_path, cfg, plan)
        assert int(state.step) == 2
        assert np.isfinite(trainer.last_metrics["loss"])
        assert trainer.last_metrics.get("pyramid_overflow", 0.0) == 0.0

    def test_escalate_policy(self, tmp_path):
        # first bucket's deep-stage caps are too small -> every group
        # overflows on device and escalates to the adequate second bucket.
        cfg = small_caps_cfg()
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
        # bucket 0 is model-valid (coarse cap >= gt_candidates) but its
        # stage-1 cap of 32 is far below the ~100 stage-1 voxels of a
        # 200-point cloud, so the on-device build must overflow.
        plan = DevicePreprocessPlan(
            cfg, with_inverse=True,
            buckets=[(256, 32, 16), (512, 128, 64)],
            overflow_policy="escalate")
        loader = PairLoader(
            SyntheticPairDataset(2, n_points=200), pipeline_cfg(cfg),
            batch_size=1, device_plan=plan,
        )
        model = create_model(cfg)
        trainer = Trainer(
            cfg, model, loader, output_dir=str(tmp_path / "out"),
            use_mesh=False, log_steps=1, tensorboard=False, device_plan=plan,
        )
        trainer.initialize(prepare_raw_pair(
            SyntheticPairDataset(2, n_points=200)[0], plan.buckets[-1][0],
            cfg.backbone.input_dim))
        state = trainer.run()
        assert int(state.step) == 4  # 2 groups x (overflowed try + retry)
        assert np.isfinite(trainer.last_metrics["loss"])
        # both bucket executables were built
        assert set(trainer._bucket_train_steps) == {0, 1}

    def test_host_fallback_policy(self, tmp_path):
        # single bucket with inadequate deep caps + policy 'host': the
        # device step skips its update and the group reruns on the host
        # pipeline at enlarged caps.
        cfg = small_caps_cfg(stage_caps=(512, 32, 16))
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
        plan = DevicePreprocessPlan(
            cfg, with_inverse=True, overflow_policy="host")
        trainer, state = _run_one_epoch(tmp_path, cfg, plan)
        assert np.isfinite(trainer.last_metrics["loss"])
        assert trainer._host_train_step is not None

    def test_raise_policy(self, tmp_path):
        cfg = small_caps_cfg(stage_caps=(512, 32, 16))
        cfg = dataclasses.replace(
            cfg, optim=dataclasses.replace(cfg.optim, max_epoch=1))
        plan = DevicePreprocessPlan(
            cfg, with_inverse=True, overflow_policy="raise")
        with pytest.raises(RuntimeError, match="overflow"):
            _run_one_epoch(tmp_path, cfg, plan)


class TestDeviceTester:
    def test_tester_runs_and_dumps(self, tmp_path):
        cfg = small_caps_cfg()
        plan = DevicePreprocessPlan(cfg)
        dataset = SyntheticPairDataset(2)
        loader = PairLoader(
            dataset, pipeline_cfg(cfg), batch_size=1, device_plan=plan)
        model = create_model(cfg)
        example = plan.host_batch(prepare_raw_pair(
            dataset[0], plan.buckets[-1][0], cfg.backbone.input_dim))
        example.pop("meta", None)
        example = jax.tree.map(jax.numpy.asarray, example)
        variables = jax.jit(
            lambda r, b: model.init(r, b, training=False, with_gt=True)
        )(jax.random.PRNGKey(0), example)

        feature_dir = str(tmp_path / "features")
        tester = PairTester(
            cfg, model, loader, output_dir=str(tmp_path / "out"),
            feature_dir=feature_dir, device_plan=plan)
        summary, results = tester.run(variables)
        assert len(results) == 2
        assert np.isfinite(summary["RRE"])
        import glob

        assert len(glob.glob(feature_dir + "/*/*.npz")) == 2
