#!/usr/bin/env python
r"""Single-pair registration demo (reference: experiments/.../demo.py:44-87).

Runs the full TPU pipeline on the bundled demo pair: host pyramid precompute
-> jitted model forward -> estimated transform, and reports RRE/RTE against
the ground truth. Weights come from a converted PyTorch snapshot if provided
(--snapshot, a torch .pth.tar state dict), otherwise random initialization
(pipeline smoke mode — the transform is then meaningless but every stage
executes).
"""

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

# Persistent compilation cache: first compile of the full model is expensive
# (remote-compile TPU path); subsequent runs hit the cache.
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.preprocess.device import build_pyramid_device, pad_stage0
from geotransformer_tpu.models import create_model
from geotransformer_tpu.losses.metrics import isotropic_transform_error


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_file", default="/root/reference/data/demo/ref.npy")
    parser.add_argument("--src_file", default="/root/reference/data/demo/src.npy")
    parser.add_argument("--gt_file", default="/root/reference/data/demo/gt.npy")
    parser.add_argument("--snapshot", default=None, help="torch .pth.tar to convert")
    parser.add_argument("--repeat", type=int, default=3, help="timing repeats")
    parser.add_argument(
        "--device_preprocess", action="store_true",
        help="build the pyramid on the TPU (zero host preprocessing)")
    return parser.parse_args()


def load_batch_device(cfg, ref_file, src_file, gt_file):
    """Zero-host-preprocessing path: pad raw points (a memcpy), then run the
    whole pyramid build (voxel subsample + radius KNN tables) on device."""
    ref_points = np.load(ref_file).astype(np.float32)
    src_points = np.load(src_file).astype(np.float32)
    transform = np.load(gt_file).astype(np.float32) if gt_file else np.eye(4, dtype=np.float32)

    points = np.concatenate([ref_points, src_points], axis=0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    caps = tuple(cfg.caps.stage_caps)
    pts0, lens0, feats0 = pad_stage0(points, lengths, caps[0], cfg.backbone.input_dim)

    def build(p, l, f, t):
        return build_pyramid_device(
            p, l, f, t, num_stages=cfg.backbone.num_stages,
            voxel_size=cfg.backbone.init_voxel_size,
            radius=cfg.backbone.init_radius,
            neighbor_limits=tuple(cfg.caps.neighbor_limits), stage_caps=caps)

    args = (jnp.asarray(pts0), jnp.asarray(lens0), jnp.asarray(feats0),
            jnp.asarray(transform))
    t0 = time.time()
    batch, overflow = build(*args)
    overflow = np.asarray(overflow)
    print(f"  device pyramid compile + first run: {time.time() - t0:.2f}s")
    if overflow.any():
        raise ValueError(f"stage capacity overflow: {overflow}")

    from geotransformer_tpu.utils.timing import trace_ms
    # Reduce over EVERY output: fetching only one leaf lets XLA dead-code-
    # eliminate all the KNN searches (this exact bug once reported the
    # ~445 ms build as "1.3 ms").
    ms = trace_ms(
        lambda *a: build(*a)[0], args,
        reduce_out=lambda b: sum(
            jnp.sum(leaf.astype(jnp.float32)) for leaf in jax.tree.leaves(b)))
    print(f"  device pyramid build: {ms:.2f} ms "
          f"(host path: ~135 ms/core)")
    return batch, caps, transform


def load_batch(cfg, ref_file, src_file, gt_file):
    ref_points = np.load(ref_file).astype(np.float32)
    src_points = np.load(src_file).astype(np.float32)
    transform = np.load(gt_file).astype(np.float32) if gt_file else np.eye(4, dtype=np.float32)

    points = np.concatenate([ref_points, src_points], axis=0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    pyramid = build_pyramid(
        points, lengths, cfg.backbone.num_stages, cfg.backbone.init_voxel_size,
        cfg.backbone.init_radius, list(cfg.caps.neighbor_limits),
    )
    caps = tuple(caps_for_pyramid(pyramid, multiple=256, per_cloud=True))
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    batch = pad_registration_batch(pyramid, feats, transform, caps)
    return batch, tuple(caps), transform


def main():
    args = parse_args()
    cfg = make_3dmatch_config()

    t0 = time.time()
    if args.device_preprocess:
        print("building pyramid on device...")
        batch, caps, gt_transform = load_batch_device(
            cfg, args.ref_file, args.src_file, args.gt_file)
    else:
        print("building pyramid on host...")
        batch, caps, gt_transform = load_batch(cfg, args.ref_file, args.src_file, args.gt_file)
    cfg = cfg.with_caps(stage_caps=caps)
    print(f"  caps={caps}  ({time.time() - t0:.2f}s)")

    model = create_model(cfg)
    batch_dev = jax.tree.map(jnp.asarray, batch)
    rng = jax.random.PRNGKey(cfg.seed)
    t0 = time.time()
    init_fn = jax.jit(
        lambda r, b: model.init(r, b, training=False, with_gt=False)
    )
    variables = jax.block_until_ready(init_fn(rng, batch_dev))
    print(f"init (jitted): {time.time() - t0:.2f}s", flush=True)

    if args.snapshot:
        import torch

        from geotransformer_tpu.utils.convert import torch_state_dict_to_variables

        state = torch.load(args.snapshot, map_location="cpu")
        state_dict = state.get("model", state)
        variables, unused = torch_state_dict_to_variables(state_dict, variables)
        unused = [k for k in unused if not k.endswith("div_term")]
        print(f"converted snapshot {args.snapshot}; unused keys: {unused}")

    @jax.jit
    def forward(variables, batch):
        return model.apply(variables, batch, training=False, with_gt=False)

    t0 = time.time()
    out = jax.block_until_ready(forward(variables, batch_dev))
    print(f"compile + first run: {time.time() - t0:.2f}s")

    times = []
    for _ in range(args.repeat):
        t0 = time.time()
        out = jax.block_until_ready(forward(variables, batch_dev))
        times.append(time.time() - t0)
    print(f"steady-state model time: {min(times) * 1e3:.1f} ms  ({1.0 / min(times):.2f} pairs/s)")

    est = np.asarray(out["estimated_transform"])
    rre, rte = isotropic_transform_error(jnp.asarray(gt_transform), jnp.asarray(est))
    print("estimated transform:\n", est)
    print(f"RRE={float(rre):.3f} deg  RTE={float(rte):.3f} m")
    print(f"correspondences: {int(np.asarray(out['corr_masks']).sum())}")


if __name__ == "__main__":
    main()
