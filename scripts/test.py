#!/usr/bin/env python
r"""Benchmark inference CLI (reference: experiments/.../test.py).

Runs the model on a test split, evaluates device-side metrics, and dumps
per-pair feature archives for scripts/eval.py.
"""

import argparse
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")

from geotransformer_tpu.configs import make_config
from geotransformer_tpu.models import create_model
from geotransformer_tpu.engine import Tester, CheckpointManager
from geotransformer_tpu.preprocess.loader import PairLoader
from geotransformer_tpu.parallel import TrainState, make_optimizer, init_train_state


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("3dmatch", "kitti", "modelnet"), required=True)
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--benchmark", default=None,
                        help="3DMatch subset name: 3DMatch | 3DLoMatch | val")
    parser.add_argument("--checkpoint_dir", default=None)
    parser.add_argument("--test_epoch", type=int, default=None,
                        help="restore this checkpoint step/epoch instead of "
                             "the latest (reference --test_epoch)")
    parser.add_argument("--torch_snapshot", default=None,
                        help="convert a reference .pth.tar instead of a checkpoint")
    parser.add_argument("--output_dir", default=None)
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--cap_buckets", type=int, default=0,
                        help="calibrate N capacity buckets over the dataset "
                             "(pairs pad to the smallest fitting bucket; at "
                             "most N compiled executables). 0 = config caps.")
    parser.add_argument("--device_preprocess", action="store_true",
                        help="build the point pyramid ON DEVICE inside the "
                             "jitted forward (zero host pyramid work)")
    parser.add_argument("--overflow_policy", choices=("escalate", "host", "raise"),
                        default="escalate",
                        help="device-preprocess stage-capacity overflow policy")
    args = parser.parse_args()

    cfg = make_config(args.dataset)
    output_dir = args.output_dir or f"output/{args.dataset}"
    benchmark = args.benchmark or "test"

    if cfg.dataset == "3dmatch":
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        dataset = ThreeDMatchPairDataset(args.data_root, benchmark, point_limit=None)
    elif cfg.dataset == "kitti":
        from geotransformer_tpu.datasets import OdometryKittiPairDataset

        dataset = OdometryKittiPairDataset(args.data_root, "test", point_limit=None)
    else:
        from geotransformer_tpu.datasets import ModelNetPairDataset

        dataset = ModelNetPairDataset(
            args.data_root, "test", num_points=717, noise_magnitude=0.05,
            keep_ratio=0.7, twice_sample=True, deterministic=True,
        )

    stage_caps = cfg.caps.stage_caps
    if args.cap_buckets > 0:
        from geotransformer_tpu.preprocess import calibrate_stage_cap_buckets

        stage_caps = calibrate_stage_cap_buckets(
            (dataset[i] for i in range(len(dataset))),
            cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
            cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
            num_buckets=args.cap_buckets,
        )
        print(f"capacity buckets: {stage_caps}")

    pipeline_cfg = dict(
        num_stages=cfg.backbone.num_stages,
        voxel_size=cfg.backbone.init_voxel_size,
        search_radius=cfg.backbone.init_radius,
        neighbor_limits=cfg.caps.neighbor_limits,
        stage_caps=stage_caps,
        input_dim=cfg.backbone.input_dim,
        neighbor_splits=cfg.caps.neighbor_splits,
        subsampling_splits=cfg.caps.subsampling_splits,
    )
    device_plan = None
    if args.device_preprocess:
        from geotransformer_tpu.preprocess import DevicePreprocessPlan

        buckets = stage_caps if args.cap_buckets > 0 else None
        device_plan = DevicePreprocessPlan(
            cfg, buckets=buckets, overflow_policy=args.overflow_policy)
    loader = PairLoader(dataset, pipeline_cfg, batch_size=1,
                        num_workers=args.num_workers, device_plan=device_plan)

    model = create_model(cfg)
    from geotransformer_tpu.preprocess.loader import prepare_pair

    if device_plan is not None:
        from geotransformer_tpu.preprocess import prepare_raw_pair

        example = device_plan.host_batch(prepare_raw_pair(
            dataset[0], device_plan.buckets[-1][0], cfg.backbone.input_dim))
    else:
        example = prepare_pair(dataset[0], **pipeline_cfg)
    example.pop("meta", None)
    import jax.numpy as jnp

    example = jax.tree.map(jnp.asarray, example)
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=True))(
        jax.random.PRNGKey(cfg.seed), example
    )

    if args.torch_snapshot:
        import torch

        from geotransformer_tpu.utils.convert import torch_state_dict_to_variables

        state = torch.load(args.torch_snapshot, map_location="cpu", weights_only=False)
        state_dict = state.get("model", state)
        variables, unused = torch_state_dict_to_variables(state_dict, variables)
        unused = [k for k in unused if not k.endswith("div_term")]
        print(f"converted {args.torch_snapshot}; unused: {unused}")
    elif args.checkpoint_dir:
        tx = make_optimizer(cfg, steps_per_epoch=1)
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), example, tx)
        manager = CheckpointManager(args.checkpoint_dir)
        state, step = manager.restore(state, step=args.test_epoch)
        print(f"restored checkpoint step {step}")
        variables = {"params": state.params, "constants": state.constants}

    feature_dir = osp.join(output_dir, "features", benchmark)
    tester = Tester(cfg, model, loader, output_dir=output_dir,
                    feature_dir=feature_dir, device_plan=device_plan)
    summary, _ = tester.run(variables)
    print({k: round(v, 4) for k, v in summary.items()})


if __name__ == "__main__":
    main()
