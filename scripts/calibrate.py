#!/usr/bin/env python
r"""Static-shape calibration CLI.

Measures neighbor-count histograms and per-stage cloud sizes over a dataset
(reference `utils/data.py:192-217` generalized to capacities) and prints the
`CapsConfig` values to put in the experiment config.
"""

import argparse
import json
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

from geotransformer_tpu.configs import make_config
from geotransformer_tpu.preprocess import (
    calibrate_inverse_limits, calibrate_neighbor_limits, calibrate_split_specs,
    calibrate_stage_caps,
)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("3dmatch", "kitti", "modelnet"), required=True)
    parser.add_argument("--data_root", required=True)
    parser.add_argument("--subset", default="train")
    parser.add_argument("--num_samples", type=int, default=64)
    parser.add_argument("--quantile", type=float, default=1.0)
    args = parser.parse_args()

    cfg = make_config(args.dataset)
    if cfg.dataset == "3dmatch":
        from geotransformer_tpu.datasets import ThreeDMatchPairDataset

        dataset = ThreeDMatchPairDataset(args.data_root, args.subset, point_limit=30000)
    elif cfg.dataset == "kitti":
        from geotransformer_tpu.datasets import OdometryKittiPairDataset

        dataset = OdometryKittiPairDataset(args.data_root, args.subset, point_limit=30000)
    else:
        from geotransformer_tpu.datasets import ModelNetPairDataset

        dataset = ModelNetPairDataset(
            args.data_root, args.subset, num_points=717, twice_sample=True
        )

    def sample_iter():
        for i in range(len(dataset)):
            yield dataset[i]

    limits = calibrate_neighbor_limits(
        sample_iter(), cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius,
    )
    caps = calibrate_stage_caps(
        sample_iter(), cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, limits,
        num_samples=args.num_samples, quantile=args.quantile,
    )
    inverse_limits, sub_inverse_limits = calibrate_inverse_limits(
        sample_iter(), cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, limits, num_samples=args.num_samples,
    )
    neighbor_splits, subsampling_splits = calibrate_split_specs(
        sample_iter(), cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, limits, num_samples=args.num_samples,
    )
    print(json.dumps({
        "neighbor_limits": limits, "stage_caps": caps,
        "inverse_limits": inverse_limits,
        "sub_inverse_limits": sub_inverse_limits,
        "neighbor_splits": neighbor_splits,
        "subsampling_splits": subsampling_splits,
    }))


if __name__ == "__main__":
    main()
