"""ModelNet iteration-based training smoke at the warmup-cosine schedule.

The reference trains ModelNet with an IterBasedTrainer and the
WarmUpCosineAnnealingFunction LR (reference
`experiments/...modelnet.../trainval.py:20-47`, `config.py:74-79`); this
exercises our equivalent end-to-end — ModelNetPairDataset pair synthesis ->
PairLoader -> Trainer.run_iterations — at a CPU-sized model, and pins the
schedule's warmup/cosine shape.
"""

import dataclasses
import pickle

import numpy as np
import jax
import pytest

from geotransformer_tpu.configs import (
    BackboneConfig,
    CapsConfig,
    CoarseMatchingConfig,
    GeoTransformerModuleConfig,
    ModelConfig,
    OptimConfig,
    make_modelnet_config,
)


@pytest.fixture()
def modelnet_root(tmp_path):
    rng = np.random.default_rng(3)
    root = tmp_path / "ModelNet"
    root.mkdir()
    data = []
    for label in (0, 2):  # asymmetric ("seen") classes
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


def tiny_modelnet_config():
    """make_modelnet_config shrunk for CPU: keeps the structural choices
    that distinguish ModelNet (3 stages, fine_level=0, warmup-cosine
    iteration schedule) at test-sized dims/caps."""
    cfg = make_modelnet_config()
    return dataclasses.replace(
        cfg,
        backbone=BackboneConfig(
            num_stages=3, init_voxel_size=0.05, init_dim=16, group_norm=8
        ),
        model=ModelConfig(
            ground_truth_matching_radius=0.05, num_points_in_patch=16,
            fine_level=0, num_sinkhorn_iterations=10,
        ),
        coarse_matching=CoarseMatchingConfig(num_targets=16, num_correspondences=32),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=128, hidden_dim=32, output_dim=32,
            blocks=("self", "cross"), num_heads=2,
        ),
        optim=OptimConfig(
            lr=1e-4, warmup_steps=2, max_iteration=6, snapshot_steps=100
        ),
        caps=CapsConfig(
            stage_caps=(768, 384, 192),
            neighbor_limits=(34, 34, 34),
            gt_candidates=16,
            gt_chunk_size=16,
            correspondence_capacity=256,
        ),
    )


def test_warmup_cosine_schedule_shape():
    from geotransformer_tpu.parallel.train import make_lr_schedule

    cfg = tiny_modelnet_config()
    cfg = dataclasses.replace(
        cfg,
        optim=dataclasses.replace(
            cfg.optim, warmup_steps=100, max_iteration=1000, eta_init=0.1,
            eta_min=0.1,
        ),
    )
    sched = make_lr_schedule(cfg, steps_per_epoch=1)
    lr = np.asarray([float(sched(s)) for s in (0, 50, 100, 550, 1000)])
    base = cfg.optim.lr
    # warmup: eta_init * base at step 0, linear ramp to base at warmup_steps
    assert np.isclose(lr[0], 0.1 * base)
    assert lr[0] < lr[1] < lr[2]
    assert np.isclose(lr[2], base)
    # cosine: halfway point is the mean of base and eta_min * base
    assert np.isclose(lr[3], 0.5 * (base + 0.1 * base), rtol=1e-3)
    assert np.isclose(lr[4], 0.1 * base)


@pytest.mark.slow
def test_modelnet_iteration_training_smoke(tmp_path, modelnet_root):
    from geotransformer_tpu.datasets import ModelNetPairDataset
    from geotransformer_tpu.engine import Trainer
    from geotransformer_tpu.models import create_model
    from geotransformer_tpu.preprocess.loader import PairLoader

    from geotransformer_tpu.preprocess import calibrate_stage_caps

    cfg = tiny_modelnet_config()
    dataset = ModelNetPairDataset(
        modelnet_root, "train", num_points=717, noise_magnitude=0.05,
        keep_ratio=0.7, twice_sample=True, deterministic=True,
    )
    # config-default caps target real CAD meshes; the procedural uniform
    # clouds subsample differently, so calibrate over the dataset
    caps = tuple(calibrate_stage_caps(
        (dataset[i] for i in range(len(dataset))),
        cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
        num_samples=len(dataset), multiple=64))
    cfg = cfg.with_caps(stage_caps=caps)
    pipeline_cfg = dict(
        num_stages=cfg.backbone.num_stages,
        voxel_size=cfg.backbone.init_voxel_size,
        search_radius=cfg.backbone.init_radius,
        neighbor_limits=cfg.caps.neighbor_limits,
        stage_caps=cfg.caps.stage_caps,
        input_dim=cfg.backbone.input_dim,
    )
    model = create_model(cfg)
    loader = PairLoader(dataset, pipeline_cfg, batch_size=1, shuffle=True)
    trainer = Trainer(
        cfg, model, loader, val_loader=None, output_dir=str(tmp_path),
        use_mesh=False, log_steps=2, tensorboard=False,
    )
    example = dict(next(iter(loader))[0])
    example.pop("meta", None)
    trainer.initialize(example)
    state = trainer.run_iterations()
    # max_iteration=6 over a 4-pair dataset: stops mid-second-epoch
    assert int(state.step) == cfg.optim.max_iteration
    leaf = np.asarray(jax.tree.leaves(state.params)[0])
    assert np.isfinite(leaf).all()
