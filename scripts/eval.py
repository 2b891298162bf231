#!/usr/bin/env python
r"""Offline benchmark evaluation from feature dumps (reference: experiments/.../eval.py).

Consumes the npz archives written by scripts/test.py and reports:
  * coarse matching: PIR (node precision), PMR (pairs with PIR > 0)
  * fine matching: IR (inlier ratio), FMR (pairs with IR >= threshold)
  * registration: RRE / RTE; RR via the 3DMatch covariance-weighted
    gt.log/gt.info protocol (scene-wise) or RRE/RTE thresholds (KITTI /
    ModelNet).
"""

import argparse
import glob
import os.path as osp
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np

from geotransformer_tpu.engine.meters import SummaryBoard
from geotransformer_tpu.utils.registration import (
    evaluate_sparse_correspondences,
    evaluate_correspondences,
    compute_registration_error,
)
from geotransformer_tpu.eval import (
    get_gt_logs_and_infos,
    get_num_fragments,
    compute_transform_error,
    write_log_file,
)


def eval_one_pair(npz_file, args):
    data = np.load(npz_file)
    result = {}

    coarse = evaluate_sparse_correspondences(
        data["ref_points_c"], data["src_points_c"],
        data["ref_node_corr_indices"], data["src_node_corr_indices"],
        data["gt_node_corr_indices"],
    )
    result["PIR"] = coarse["precision"]

    fine = evaluate_correspondences(
        data["ref_corr_points"], data["src_corr_points"], data["transform"],
        positive_radius=args.acceptance_radius,
    )
    result["IR"] = fine["inlier_ratio"]
    result["OV"] = fine["overlap"]
    result["num_corr"] = fine["num_corr"]

    rre, rte = compute_registration_error(data["transform"], data["estimated_transform"])
    result["RRE"] = rre
    result["RTE"] = rte
    result["estimated_transform"] = data["estimated_transform"]
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", choices=("3dmatch", "kitti", "modelnet"), required=True)
    parser.add_argument("--feature_dir", required=True)
    parser.add_argument("--benchmark", default="3DMatch", help="3DMatch | 3DLoMatch")
    parser.add_argument("--benchmark_root", default=None,
                        help="dir with <scene>/gt.log+gt.info (3DMatch protocol)")
    parser.add_argument("--registration_dir", default=None, help="where to write est.log files")
    parser.add_argument("--acceptance_radius", type=float, default=0.1)
    parser.add_argument("--inlier_ratio_threshold", type=float, default=0.05)
    parser.add_argument("--rmse_threshold", type=float, default=0.2)
    parser.add_argument("--rre_threshold", type=float, default=5.0)
    parser.add_argument("--rte_threshold", type=float, default=2.0)
    args = parser.parse_args()

    summary = SummaryBoard()
    scene_results = {}
    for npz_file in sorted(glob.glob(osp.join(args.feature_dir, "*", "*.npz"))):
        scene = osp.basename(osp.dirname(npz_file))
        stem = osp.splitext(osp.basename(npz_file))[0]
        ref_frame, src_frame = (int(x) for x in stem.split("_"))
        result = eval_one_pair(npz_file, args)
        summary.update("PIR", result["PIR"])
        summary.update("PMR", float(result["PIR"] > 0))
        summary.update("IR", result["IR"])
        summary.update("FMR", float(result["IR"] >= args.inlier_ratio_threshold))
        summary.update("RRE", result["RRE"])
        summary.update("RTE", result["RTE"])
        scene_results.setdefault(scene, []).append(
            dict(test_pair=[ref_frame, src_frame], result=result)
        )

    if args.dataset == "3dmatch" and args.benchmark_root is not None:
        # scene-wise covariance-weighted registration recall
        recalls = []
        for scene, pairs in scene_results.items():
            num_fragments = get_num_fragments(scene)
            gt_indices, gt_logs, gt_infos = get_gt_logs_and_infos(
                osp.join(args.benchmark_root, scene), num_fragments
            )
            if args.registration_dir is not None:
                est_logs = [
                    dict(
                        test_pair=p["test_pair"], num_fragments=num_fragments,
                        transform=p["result"]["estimated_transform"],
                    )
                    for p in pairs
                ]
                write_log_file(osp.join(args.registration_dir, scene, "est.log"), est_logs)
            num_pos, num_gt = 0, 0
            for p in pairs:
                frag_id0, frag_id1 = p["test_pair"]
                gt_index = gt_indices[frag_id0, frag_id1]
                if gt_index < 0:
                    continue
                num_gt += 1
                error = compute_transform_error(
                    gt_logs[gt_index]["transform"],
                    gt_infos[gt_index]["covariance"],
                    p["result"]["estimated_transform"],
                )
                if error <= args.rmse_threshold**2:
                    num_pos += 1
            recall = num_pos / max(num_gt, 1)
            recalls.append(recall)
            print(f"  {scene}: RR={recall:.4f} ({num_pos}/{num_gt})")
        summary.update("RR", float(np.mean(recalls)))
    else:
        # threshold-based recall (KITTI: RRE<5 & RTE<2; ModelNet: RRE<1 & RTE<0.1)
        rr = [
            float(
                p["result"]["RRE"] < args.rre_threshold
                and p["result"]["RTE"] < args.rte_threshold
            )
            for pairs in scene_results.values()
            for p in pairs
        ]
        summary.update("RR", float(np.mean(rr)))

    print(summary.tostring())


if __name__ == "__main__":
    main()
