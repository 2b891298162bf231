#!/usr/bin/env python
r"""Full-workflow synthetic benchmark: train -> test.py-style feature dump ->
eval.py full 3DMatch protocol, producing an actual RR/IR/FMR table.

The real 3DMatch gate (RR within 0.5% of the reference tables) is
environment-blocked — `/root/reference/data/` ships only metadata and the
demo pair, and no released checkpoints exist here — so this script runs the
ENTIRE reference workflow (`trainval.py` -> `test.py` -> `eval.py`,
reference `experiments/...3dmatch.../`) as one composed loop on a
procedural multi-scene benchmark with genuine gt.log/gt.info protocol files
(datasets/synthetic.py builds the same covariance-weighted RMSE acceptance
metric the 3DMatch benchmark uses).

  python scripts/synthetic_benchmark.py --out output/synth --steps 2000
  python scripts/synthetic_benchmark.py --scale small --steps 60   # CI-size

Train scenes and test scenes are disjoint.
"""

import argparse
import dataclasses
import os
import os.path as osp
import subprocess
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def small_config():
    """Reduced model for the CI-sized run (CPU-friendly)."""
    from geotransformer_tpu.configs import (
        make_3dmatch_config, BackboneConfig, ModelConfig, CoarseMatchingConfig,
        GeoTransformerModuleConfig, CapsConfig,
    )

    cfg = make_3dmatch_config()
    return dataclasses.replace(
        cfg,
        backbone=BackboneConfig(num_stages=4, init_voxel_size=0.06,
                               init_dim=32, group_norm=8),
        model=ModelConfig(num_points_in_patch=32, num_sinkhorn_iterations=40),
        coarse_matching=CoarseMatchingConfig(num_targets=64, num_correspondences=96),
        geotransformer=GeoTransformerModuleConfig(
            input_dim=512, hidden_dim=96, output_dim=96,
            blocks=("self", "cross", "self", "cross"), num_heads=4,
        ),
        caps=CapsConfig(
            stage_caps=(2816, 1024, 384, 128),
            neighbor_limits=(40, 34, 34, 38),
            inverse_limits=(88, 80, 80, 80),
            gt_candidates=32, gt_chunk_size=32,
            correspondence_capacity=1024,
        ),
    )


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="output/synthetic_benchmark")
    parser.add_argument("--steps", type=int, default=2000)
    parser.add_argument("--scale", choices=("full", "small"), default="full")
    parser.add_argument("--num_workers", type=int, default=8)
    parser.add_argument("--seed", type=int, default=0,
                        help="DATA seed (scene generation); keep fixed when "
                             "comparing kernel paths so RR is measured on "
                             "identical train/test pairs")
    parser.add_argument("--model_seed", type=int, default=None,
                        help="model-init + shuffle seed (cfg.seed); vary this "
                             "for seed-controlled repeats on fixed data")
    parser.add_argument("--test_fragments", type=int, default=6,
                        help="fragments per test scene (full scale); 10 gives "
                             "~90 pairs -> ~1%% RR resolution vs 5%% at 6")
    parser.add_argument("--lr", type=float, default=None,
                        help="override the schedule-selected base lr")
    parser.add_argument("--lr_decay", type=float, default=None,
                        help="per-epoch lr decay override; a shorter run with "
                             "a faster decay reaches the same terminal lr "
                             "(schedule-compressed plateau)")
    parser.add_argument("--skip_eval_script", action="store_true",
                        help="stop after the feature dump (for tests)")
    parser.add_argument("--force_pallas", choices=("auto", "true", "false"),
                        default="auto",
                        help="override the TPU-autodetected Pallas kernel path "
                             "(false = pure-XLA modules, for pricing the "
                             "kernel-precision drift in RR/IR/FMR)")
    args = parser.parse_args()

    from geotransformer_tpu.datasets.synthetic import SyntheticSceneBenchmark
    from geotransformer_tpu.configs import make_3dmatch_config
    from geotransformer_tpu.preprocess import calibrate_stage_caps
    from geotransformer_tpu.preprocess.loader import PairLoader, prepare_pair
    from geotransformer_tpu.models import create_model
    from geotransformer_tpu.engine import Trainer, Tester

    t0 = time.time()
    if args.scale == "full":
        cfg = make_3dmatch_config()
        train_set = SyntheticSceneBenchmark(
            num_scenes=4, fragments_per_scene=8, num_points=60000,
            point_limit=12000, seed=args.seed, scene_prefix="synth-train-")
        test_set = SyntheticSceneBenchmark(
            num_scenes=2, fragments_per_scene=args.test_fragments,
            num_points=60000, point_limit=12000, seed=args.seed + 777,
            scene_prefix="synth-test-")
    else:
        cfg = small_config()
        train_set = SyntheticSceneBenchmark(
            num_scenes=2, fragments_per_scene=5, num_points=16000,
            point_limit=2500, seed=args.seed, scene_prefix="synth-train-")
        test_set = SyntheticSceneBenchmark(
            num_scenes=1, fragments_per_scene=5, num_points=16000,
            point_limit=2500, seed=args.seed + 777, scene_prefix="synth-test-")
    if args.force_pallas != "auto":
        cfg = dataclasses.replace(
            cfg, model=dataclasses.replace(
                cfg.model, force_pallas=args.force_pallas == "true"))
    print(f"train pairs: {len(train_set)}  test pairs: {len(test_set)} "
          f"({time.time() - t0:.1f}s)", flush=True)
    assert len(train_set) >= 4 and len(test_set) >= 3

    benchmark_root = osp.join(args.out, "benchmark")
    test_set.write_benchmark(benchmark_root)

    # capacity calibration over the synthetic distribution (the reference's
    # calibrate_neighbors_stack_mode idea, utils/data.py:192-217). The test
    # set is deterministic (fragments precomputed at construction), so
    # including EVERY test pair makes test-time capacity overflow impossible
    # by construction rather than probabilistically.
    import itertools
    n_cal = 32 + len(test_set)
    caps = calibrate_stage_caps(
        itertools.chain((train_set[i % len(train_set)] for i in range(32)),
                        (test_set[i] for i in range(len(test_set)))),
        cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
        num_samples=n_cal,
    )
    caps = tuple(caps)
    cfg = cfg.with_caps(stage_caps=caps)
    print(f"calibrated caps: {caps}", flush=True)

    pipeline_cfg = dict(
        num_stages=cfg.backbone.num_stages,
        voxel_size=cfg.backbone.init_voxel_size,
        search_radius=cfg.backbone.init_radius,
        neighbor_limits=cfg.caps.neighbor_limits,
        stage_caps=caps,
        input_dim=cfg.backbone.input_dim,
    )
    # This environment has ONE host core behind a ~35 MB/s device relay, so
    # the production hoists are inverted here: GT targets compute in-graph
    # (the host-jax precompute measured ~4.5 s/pair serial vs ~4 ms on
    # chip) and the input edge stream is skipped (its 19 MB/pair transfer
    # costs more than the 2 ms on-device gather it saves). bench.py
    # publishes the production configuration's numbers.
    train_pipeline_cfg = dict(
        pipeline_cfg,
        inverse_limits=cfg.caps.inverse_limits,
        input_stream=False,
    )
    pipeline_cfg = dict(pipeline_cfg, input_stream=False)

    # ---- train (iteration-based so --steps maps directly) ----
    steps_per_epoch = max(len(train_set), 1)
    max_epoch = -(-args.steps // steps_per_epoch)
    lr = args.lr if args.lr is not None else (
        # the bf16_drift convergence recipe: slightly higher lr for the
        # short synthetic schedule
        3e-4 if args.steps <= 4000 else cfg.optim.lr)
    lr_decay = args.lr_decay if args.lr_decay is not None else cfg.optim.lr_decay
    cfg = dataclasses.replace(
        cfg, optim=dataclasses.replace(cfg.optim, max_epoch=max_epoch, lr=lr,
                                       lr_decay=lr_decay))
    if args.model_seed is not None:
        cfg = dataclasses.replace(cfg, seed=args.model_seed)
    model = create_model(cfg)
    train_loader = PairLoader(
        train_set, train_pipeline_cfg, batch_size=1, shuffle=True,
        num_workers=args.num_workers, seed=cfg.seed)
    trainer = Trainer(
        cfg, model, train_loader, val_loader=None,
        output_dir=osp.join(args.out, "train"), use_mesh=False,
        log_steps=50, tensorboard=False)
    example = prepare_pair(train_set[0], **train_pipeline_cfg)
    example.pop("meta", None)
    trainer.initialize(example)
    t0 = time.time()
    state = trainer.run()
    print(f"trained {int(state.step)} steps in {time.time() - t0:.1f}s", flush=True)
    variables = {"params": state.params, "constants": state.constants}

    # ---- test.py-equivalent: inference + npz feature dump ----
    feature_dir = osp.join(args.out, "features")
    test_loader = PairLoader(test_set, pipeline_cfg, batch_size=1,
                             num_workers=args.num_workers)
    tester = Tester(cfg, model, test_loader, output_dir=osp.join(args.out, "test"),
                    feature_dir=feature_dir)
    summary, _ = tester.run(variables)
    print("tester metrics:", {k: round(v, 4) for k, v in summary.items()}, flush=True)

    if args.skip_eval_script:
        return

    # ---- eval.py full protocol (separate process, like the reference) ----
    eval_script = osp.join(osp.dirname(osp.abspath(__file__)), "eval.py")
    cmd = [
        sys.executable, eval_script,
        "--dataset", "3dmatch",
        "--feature_dir", feature_dir,
        "--benchmark_root", benchmark_root,
        "--registration_dir", osp.join(args.out, "registration"),
        "--method", "lgr",
    ]
    print("running:", " ".join(cmd), flush=True)
    res = subprocess.run(cmd, capture_output=True, text=True)
    print(res.stdout)
    if res.returncode != 0:
        print(res.stderr[-4000:])
        raise SystemExit(res.returncode)


if __name__ == "__main__":
    main()
