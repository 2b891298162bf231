r"""Benchmark inference engine (reference: engine/single_tester.py:14-74).

Runs the model pair-by-pair over a test loader, evaluates device-side
metrics, and dumps per-pair feature/correspondence archives for offline
evaluation (the reference's `test.py` -> `features/<benchmark>/...npz` flow).
"""

import os
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np

from geotransformer_tpu.engine.logger import create_logger
from geotransformer_tpu.engine.meters import SummaryBoard
from geotransformer_tpu.engine.timer import Timer
from geotransformer_tpu.losses.overall import evaluate


class Tester:
    def __init__(self, cfg, model, loader, output_dir="output", feature_dir=None,
                 device_plan=None):
        self.cfg = cfg
        self.model = model
        self.loader = loader
        self.output_dir = output_dir
        self.feature_dir = feature_dir
        os.makedirs(output_dir, exist_ok=True)
        if feature_dir is not None:
            os.makedirs(feature_dir, exist_ok=True)
        self.logger = create_logger(
            log_file=osp.join(output_dir, "test.log"),
            process_index=jax.process_index(),
        )
        # Device preprocessing (loader raw mode): the jitted forward builds
        # the pyramid on chip first; one executable per capacity bucket,
        # host-path fallback on overflow.
        self.device_plan = device_plan
        self._bucket_forwards = {}

        @jax.jit
        def forward(variables, batch):
            output = model.apply(variables, batch, training=False, with_gt=True)
            metrics = evaluate(cfg, output, batch["transform"])
            return output, metrics

        self._forward = forward

    def _forward_for(self, bucket):
        fwd = self._bucket_forwards.get(bucket)
        if fwd is None:
            from geotransformer_tpu.preprocess.device import build_pyramid_device

            spec = self.device_plan.spec(bucket)
            model, cfg = self.model, self.cfg

            @jax.jit
            def fwd(variables, raw):
                built, overflow = build_pyramid_device(
                    raw["raw_points"], raw["raw_lengths"], raw["raw_feats"],
                    raw["transform"], **spec)
                output = model.apply(variables, built, training=False, with_gt=True)
                metrics = evaluate(cfg, output, built["transform"])
                metrics["pyramid_overflow"] = jnp.any(overflow).astype(jnp.float32)
                return output, metrics

            self._bucket_forwards[bucket] = fwd
        return fwd

    def _run_pair(self, variables, batch):
        """One pair through the right executable, applying the overflow
        policy in raw mode. Returns (output, metrics, transform)."""
        if self.device_plan is None or "raw_points" not in batch:
            batch_dev = jax.tree.map(jnp.asarray, batch)
            output, metrics = self._forward(variables, batch_dev)
            return output, metrics, batch["transform"]
        plan = self.device_plan
        bucket = plan.bucket_for_cap0(batch["raw_points"].shape[0] // 2)
        while True:
            raw_dev = jax.tree.map(jnp.asarray, batch)
            output, metrics = self._forward_for(bucket)(variables, raw_dev)
            if float(metrics["pyramid_overflow"]) == 0.0:
                metrics = dict(metrics)
                metrics.pop("pyramid_overflow")
                return output, metrics, batch["transform"]
            if plan.overflow_policy == "raise":
                raise RuntimeError(
                    "device pyramid stage-capacity overflow "
                    "(overflow_policy='raise'); recalibrate caps/buckets")
            nxt = (plan.next_bucket(bucket)
                   if plan.overflow_policy == "escalate" else None)
            if nxt is not None:
                batch = plan.repad_raw(batch, nxt)
                bucket = nxt
                continue
            self.logger.warning(
                "device pyramid overflow: host-path fallback for this pair")
            host = plan.host_batch(batch)
            host.pop("meta", None)
            batch_dev = jax.tree.map(jnp.asarray, host)
            output, metrics = self._forward(variables, batch_dev)
            return output, metrics, host["transform"]

    def run(self, variables, save_features=True):
        summary = SummaryBoard()
        timer = Timer()
        results = []
        timer.tic_prepare()
        for group in self.loader:
            for batch in group:
                meta = batch.pop("meta", {})
                timer.toc_prepare()
                timer.tic_process()
                output, metrics, transform = self._run_pair(variables, batch)
                metrics = {k: float(v) for k, v in metrics.items()}
                timer.toc_process()
                summary.update_from_dict(metrics)
                results.append({**meta, **metrics})
                if save_features and self.feature_dir is not None:
                    self._dump_features(meta, transform, output)
                timer.tic_prepare()
        self.logger.info(
            f"test done: {summary.tostring()} | prep {timer.get_prepare_time():.3f}s "
            f"proc {timer.get_process_time():.3f}s"
        )
        return summary.summary(), results

    def _dump_features(self, meta, transform, output):
        """Per-pair npz archive (reference test.py:65-92 contract)."""
        scene = meta.get("scene_name", meta.get("seq_id", "default"))
        ref_frame = meta.get("ref_frame", 0)
        src_frame = meta.get("src_frame", 0)
        scene_dir = osp.join(self.feature_dir, str(scene))
        os.makedirs(scene_dir, exist_ok=True)
        file_name = osp.join(scene_dir, f"{ref_frame}_{src_frame}.npz")

        corr_masks = np.asarray(output["corr_masks"])
        np.savez_compressed(
            file_name,
            ref_points=np.asarray(output["ref_points_f"])[np.asarray(output["ref_masks_f"])],
            src_points=np.asarray(output["src_points_f"])[np.asarray(output["src_masks_f"])],
            ref_points_c=np.asarray(output["ref_points_c"])[np.asarray(output["ref_masks_c"])],
            src_points_c=np.asarray(output["src_points_c"])[np.asarray(output["src_masks_c"])],
            ref_feats_c=np.asarray(output["ref_feats_c"])[np.asarray(output["ref_masks_c"])],
            src_feats_c=np.asarray(output["src_feats_c"])[np.asarray(output["src_masks_c"])],
            ref_node_corr_indices=np.asarray(output["ref_node_corr_indices"])[
                np.asarray(output["node_corr_masks"])
            ],
            src_node_corr_indices=np.asarray(output["src_node_corr_indices"])[
                np.asarray(output["node_corr_masks"])
            ],
            ref_corr_points=np.asarray(output["ref_corr_points"])[corr_masks],
            src_corr_points=np.asarray(output["src_corr_points"])[corr_masks],
            corr_scores=np.asarray(output["corr_scores"])[corr_masks],
            gt_node_corr_indices=_gt_corr_indices(output),
            gt_node_corr_overlaps=_gt_corr_overlaps(output),
            estimated_transform=np.asarray(output["estimated_transform"]),
            transform=np.asarray(transform),
        )


def _gt_corr_indices(output):
    cand_idx = np.asarray(output["gt_cand_indices"])
    masks = np.asarray(output["gt_cand_masks"])
    rows, cols = np.nonzero(masks)
    return np.stack([rows, cand_idx[rows, cols]], axis=1)


def _gt_corr_overlaps(output):
    overlaps = np.asarray(output["gt_cand_overlaps"])
    masks = np.asarray(output["gt_cand_masks"])
    return overlaps[masks]
