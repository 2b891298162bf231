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
from geotransformer_tpu.models import create_model
from geotransformer_tpu.losses.metrics import isotropic_transform_error


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--ref_file", default="/root/reference/data/demo/ref.npy")
    parser.add_argument("--src_file", default="/root/reference/data/demo/src.npy")
    parser.add_argument("--gt_file", default="/root/reference/data/demo/gt.npy")
    parser.add_argument("--snapshot", default=None, help="torch .pth.tar to convert")
    parser.add_argument("--repeat", type=int, default=3, help="timing repeats")
    return parser.parse_args()


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
    caps = caps_for_pyramid(pyramid, multiple=256)
    feats = np.ones((points.shape[0], cfg.backbone.input_dim), np.float32)
    batch = pad_registration_batch(pyramid, feats, transform, caps)
    return batch, tuple(caps), transform


def main():
    args = parse_args()
    cfg = make_3dmatch_config()

    print("building pyramid on host...")
    t0 = time.time()
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
