#!/usr/bin/env python
r"""Training CLI (reference: experiments/.../trainval.py).

Examples:
  python scripts/trainval.py --dataset 3dmatch --data_root data/3DMatch
  python scripts/trainval.py --dataset modelnet --data_root data/ModelNet --iters
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from geotransformer_tpu.configs import make_config
from geotransformer_tpu.models import create_model
from geotransformer_tpu.engine import Trainer
from geotransformer_tpu.preprocess.loader import PairLoader, prepare_pair


def build_dataset(cfg, args, subset, training):
    if cfg.dataset == "3dmatch":
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        return ThreeDMatchPairDataset(
            args.data_root, subset,
            point_limit=30000 if training else None,
            use_augmentation=training,
        )
    if cfg.dataset == "kitti":
        from geotransformer_tpu.datasets import OdometryKittiPairDataset

        return OdometryKittiPairDataset(
            args.data_root, subset,
            point_limit=30000 if training else None,
            use_augmentation=training,
            augmentation_noise=0.01,
        )
    if cfg.dataset == "modelnet":
        from geotransformer_tpu.datasets import ModelNetPairDataset

        return ModelNetPairDataset(
            args.data_root, subset,
            num_points=717, noise_magnitude=0.05, keep_ratio=0.7,
            twice_sample=True, deterministic=not training,
        )
    raise ValueError(cfg.dataset)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("3dmatch", "kitti", "modelnet"), required=True)
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--batch_size", type=int, default=None,
                        help="pairs per step; defaults to the device count")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--iters", action="store_true", help="iteration-based training")
    parser.add_argument(
        "--no_precompute_targets", action="store_true",
        help="compute partition/GT-overlap targets inside the train step "
             "instead of in the loader workers (slower steps; debug only)")
    parser.add_argument(
        "--device_preprocess", action="store_true",
        help="build the point pyramid ON DEVICE inside the train/eval step "
             "(zero host pyramid work; loaders only memcpy raw points)")
    parser.add_argument(
        "--overflow_policy", choices=("escalate", "host", "raise"),
        default="escalate",
        help="device-preprocess stage-capacity overflow policy")
    args = parser.parse_args()

    cfg = make_config(args.dataset)
    output_dir = args.output_dir or f"output/{args.dataset}"
    batch_size = args.batch_size or jax.local_device_count()

    pipeline_cfg = dict(
        num_stages=cfg.backbone.num_stages,
        voxel_size=cfg.backbone.init_voxel_size,
        search_radius=cfg.backbone.init_radius,
        neighbor_limits=cfg.caps.neighbor_limits,
        stage_caps=cfg.caps.stage_caps,
        input_dim=cfg.backbone.input_dim,
        neighbor_splits=cfg.caps.neighbor_splits,
        subsampling_splits=cfg.caps.subsampling_splits,
    )
    # training batches carry inverse neighbor tables (scatter-free backward)
    # and host-precomputed partition/GT-overlap targets (the reference's
    # no_grad geometry, hoisted out of the differentiated step)
    train_pipeline_cfg = dict(
        pipeline_cfg,
        inverse_limits=cfg.caps.inverse_limits,
        inverse_splits=cfg.caps.inverse_splits,
        sub_inverse_splits=cfg.caps.sub_inverse_splits,
        precompute_targets=not args.no_precompute_targets,
        model_cfg=cfg,
    )
    train_subset = "train"
    val_subset = "val"
    device_plan = None
    if args.device_preprocess:
        from geotransformer_tpu.preprocess import DevicePreprocessPlan, prepare_raw_pair

        device_plan = DevicePreprocessPlan(
            cfg, with_inverse=True, overflow_policy=args.overflow_policy)
    train_loader = PairLoader(
        build_dataset(cfg, args, train_subset, True), train_pipeline_cfg,
        batch_size=batch_size, shuffle=True, num_workers=args.num_workers,
        seed=cfg.seed, num_shards=jax.process_count(), shard_index=jax.process_index(),
        device_plan=device_plan,
    )
    val_loader = PairLoader(
        build_dataset(cfg, args, val_subset, False), pipeline_cfg,
        batch_size=batch_size, shuffle=False, num_workers=args.num_workers,
        device_plan=device_plan,
    )

    model = create_model(cfg)
    trainer = Trainer(cfg, model, train_loader, val_loader, output_dir=output_dir,
                      device_plan=device_plan)
    if device_plan is not None:
        example = prepare_raw_pair(
            build_dataset(cfg, args, train_subset, True)[0],
            device_plan.buckets[-1][0], cfg.backbone.input_dim)
    else:
        example = prepare_pair(
            build_dataset(cfg, args, train_subset, True)[0], **train_pipeline_cfg)
    example.pop("meta", None)
    trainer.initialize(example)
    if args.iters:
        trainer.run_iterations()
    else:
        trainer.run()


if __name__ == "__main__":
    main()
