#!/usr/bin/env python
"""Per-stage timing of the registration pipeline on the demo pair."""

import os.path as osp
import sys
import time

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.preprocess import build_pyramid, pad_registration_batch, caps_for_pyramid
from geotransformer_tpu.models import create_model
from geotransformer_tpu.models.backbone import KPConvFPN
from geotransformer_tpu.models.transformer import GeometricTransformer
from geotransformer_tpu.models.sinkhorn import LearnableLogOptimalTransport
from geotransformer_tpu.models.lgr import local_to_global_registration
from geotransformer_tpu.ops.partition import point_to_node_partition


def timed(fn, *args, iters=20, label=""):
    out = jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{label:35s}: {dt:8.2f} ms")
    return out


def main():
    ref_points = np.load("/root/reference/data/demo/ref.npy").astype(np.float32)
    src_points = np.load("/root/reference/data/demo/src.npy").astype(np.float32)
    points = np.concatenate([ref_points, src_points], 0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    cfg = make_3dmatch_config()
    pyramid = build_pyramid(points, lengths, 4, cfg.backbone.init_voxel_size,
                            cfg.backbone.init_radius, list(cfg.caps.neighbor_limits))
    caps = tuple(caps_for_pyramid(pyramid, multiple=256))
    cfg = cfg.with_caps(stage_caps=caps)
    feats = np.ones((points.shape[0], 1), np.float32)
    batch = jax.tree.map(jnp.asarray, pad_registration_batch(pyramid, feats, np.eye(4, dtype=np.float32), caps))

    model = create_model(cfg)
    variables = jax.jit(lambda r, b: model.init(r, b, training=False, with_gt=False))(
        jax.random.PRNGKey(0), batch)

    full = jax.jit(lambda v, b: model.apply(v, b, training=False, with_gt=False))
    out = timed(full, variables, batch, label="FULL forward")

    # backbone only
    bb = KPConvFPN(cfg.backbone.input_dim, cfg.backbone.output_dim, cfg.backbone.init_dim,
                   cfg.backbone.kernel_size, cfg.backbone.init_radius, cfg.backbone.init_sigma,
                   cfg.backbone.group_norm, num_stages=4, first_fine_stage=1)
    bb_vars = jax.jit(lambda r, f, b: bb.init(r, f, b))(jax.random.PRNGKey(0), batch["features"], batch)
    bb_fn = jax.jit(lambda v, f, b: bb.apply(v, f, b))
    feats_list = timed(bb_fn, bb_vars, batch["features"], batch, label="backbone (KPConv FPN)")

    # partition
    cap_c = batch["points"][3].shape[0] // 2
    cap_f = batch["points"][1].shape[0] // 2
    part_fn = jax.jit(lambda pf, pc, mf, mc: point_to_node_partition(pf, pc, 64, mf, mc))
    timed(part_fn, batch["points"][1][:cap_f], batch["points"][3][:cap_c],
          batch["masks"][1][:cap_f], batch["masks"][3][:cap_c], label="partition (ref)")

    # transformer only
    tr = GeometricTransformer(cfg.geotransformer.input_dim, cfg.geotransformer.output_dim,
                              cfg.geotransformer.hidden_dim, cfg.geotransformer.num_heads,
                              cfg.geotransformer.blocks, cfg.geotransformer.sigma_d,
                              cfg.geotransformer.sigma_a, cfg.geotransformer.angle_k)
    rp = batch["points"][3][None, :cap_c]
    sp = batch["points"][3][None, cap_c:]
    rm = batch["masks"][3][None, :cap_c]
    sm = batch["masks"][3][None, cap_c:]
    rf = jnp.zeros((1, cap_c, 1024))
    sf = jnp.zeros((1, cap_c, 1024))
    tr_vars = jax.jit(lambda r: tr.init(r, rp, sp, rf, sf, rm, sm))(jax.random.PRNGKey(0))
    tr_fn = jax.jit(lambda v: tr.apply(v, rp, sp, rf, sf, rm, sm))
    timed(tr_fn, tr_vars, label="geometric transformer")

    # sinkhorn only
    ot = LearnableLogOptimalTransport(100)
    p, k = 256, 64
    scores = jnp.zeros((p, k, k))
    masks = jnp.ones((p, k), dtype=bool)
    ot_vars = jax.jit(lambda r: ot.init(r, scores, masks, masks))(jax.random.PRNGKey(0))
    ot_fn = jax.jit(lambda v: ot.apply(v, scores, masks, masks))
    timed(ot_fn, ot_vars, label="sinkhorn (100 it)")

    # LGR only
    rkp = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (p, k, 3)), jnp.float32)
    skp = rkp + 0.01
    log_scores = jnp.zeros((p, k, k))
    lgr_fn = jax.jit(lambda a, b, s: local_to_global_registration(
        a, b, masks, masks, s, k=3, acceptance_radius=0.1,
        correspondence_limit=cfg.caps.correspondence_capacity))
    timed(lgr_fn, rkp, skp, log_scores, label="LGR")


if __name__ == "__main__":
    main()
