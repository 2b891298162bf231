#!/usr/bin/env python
r"""DGR-protocol evaluation of 3DMatch/3DLoMatch feature dumps.

TPU-framework equivalent of the reference `experiments/...3dmatch.../eval_dgr.py`
(:1-319): the same npz dumps as scripts/eval.py, but registration recall is
defined by Deep-Global-Registration-style thresholds (RRE < 15 deg and
RTE < 0.3 m) instead of the covariance-weighted gt.log RMSE protocol, with
coarse PMR reported at the 0 / 0.1 / 0.3 / 0.5 precision thresholds and an
optional score-ranked correspondence budget (``--num_corr``). Registration
methods: ``lgr`` (the stored estimate), ``ransac`` (on correspondences), or
``svd`` (weighted Procrustes over all correspondences).
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


def _estimate(method, data, ref_corr, src_corr, scores, args):
    if method == "lgr":
        return data["estimated_transform"]
    if method == "ransac":
        from geotransformer_tpu.utils.ransac import (
            registration_with_ransac_from_correspondences,
        )

        return registration_with_ransac_from_correspondences(
            src_corr, ref_corr,
            distance_threshold=args.distance_threshold,
            ransac_n=3,
            num_iterations=args.ransac_iterations,
        )
    if method == "svd":
        import jax.numpy as jnp
        from geotransformer_tpu.models.procrustes import weighted_procrustes

        return np.asarray(
            weighted_procrustes(
                jnp.asarray(src_corr), jnp.asarray(ref_corr), jnp.asarray(scores),
                return_transform=True,
            )
        )
    raise ValueError(f"Unsupported registration method: {method}")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--feature_dir", required=True)
    parser.add_argument("--method", choices=("lgr", "ransac", "svd"), default="lgr")
    parser.add_argument("--num_corr", type=int, default=None,
                        help="keep only the top-k correspondences by score")
    parser.add_argument("--acceptance_radius", type=float, default=0.1)
    parser.add_argument("--inlier_ratio_threshold", type=float, default=0.05)
    parser.add_argument("--rre_threshold", type=float, default=15.0)
    parser.add_argument("--rte_threshold", type=float, default=0.3)
    parser.add_argument("--distance_threshold", type=float, default=0.05)
    parser.add_argument("--ransac_iterations", type=int, default=1000)
    parser.add_argument("--verbose", action="store_true")
    args = parser.parse_args()

    keys = ("PIR", "PMR>0", "PMR>=0.1", "PMR>=0.3", "PMR>=0.5",
            "IR", "OV", "FMR", "RR", "RRE", "RTE")
    overall = SummaryBoard(names=keys)
    scene_rows = []
    for scene_root in sorted(glob.glob(osp.join(args.feature_dir, "*"))):
        scene = SummaryBoard(names=keys)
        npz_files = sorted(glob.glob(osp.join(scene_root, "*.npz")))
        if not npz_files:
            continue
        for npz_file in npz_files:
            data = np.load(npz_file)
            ref_corr = data["ref_corr_points"]
            src_corr = data["src_corr_points"]
            scores = data["corr_scores"]
            if args.num_corr is not None and scores.shape[0] > args.num_corr:
                sel = np.argsort(-scores)[: args.num_corr]
                ref_corr, src_corr, scores = ref_corr[sel], src_corr[sel], scores[sel]

            coarse = evaluate_sparse_correspondences(
                data["ref_points_c"], data["src_points_c"],
                data["ref_node_corr_indices"], data["src_node_corr_indices"],
                data["gt_node_corr_indices"],
            )
            pir = coarse["precision"]
            fine = evaluate_correspondences(
                ref_corr, src_corr, data["transform"],
                positive_radius=args.acceptance_radius,
            )
            est = _estimate(args.method, data, ref_corr, src_corr, scores, args)
            rre, rte = compute_registration_error(data["transform"], est)
            accepted = rre < args.rre_threshold and rte < args.rte_threshold

            for board in (scene, overall):
                board.update("PIR", pir)
                board.update("PMR>0", float(pir > 0))
                board.update("PMR>=0.1", float(pir >= 0.1))
                board.update("PMR>=0.3", float(pir >= 0.3))
                board.update("PMR>=0.5", float(pir >= 0.5))
                board.update("IR", fine["inlier_ratio"])
                board.update("OV", fine["overlap"])
                board.update("FMR", float(fine["inlier_ratio"] >= args.inlier_ratio_threshold))
                board.update("RR", float(accepted))
                if accepted:
                    board.update("RRE", rre)
                    board.update("RTE", rte)
            if args.verbose:
                print(
                    f"{osp.basename(npz_file)}: PIR {pir:.3f} "
                    f"IR {fine['inlier_ratio']:.3f} RRE {rre:.3f} RTE {rte:.3f}"
                )
        scene_rows.append((osp.basename(scene_root), scene))

    print(f"\n== per scene ({args.method}) ==")
    for name, board in scene_rows:
        print(
            f"{name}: PIR {board.mean('PIR'):.3f} | IR {board.mean('IR'):.3f} "
            f"| FMR {board.mean('FMR'):.3f} | RR {board.mean('RR'):.3f} "
            f"| RRE {board.mean('RRE'):.3f} | RTE {board.mean('RTE'):.3f}"
        )
    print("\n== overall (DGR protocol) ==")
    for key in keys:
        print(f"{key:9s}: {overall.mean(key):.4f}")


if __name__ == "__main__":
    main()
