#!/usr/bin/env python
"""Per-stage honest timing of the registration pipeline on the demo pair.

Uses the fetch-difference method (utils/timing.py) because plain
block_until_ready does not synchronize on this runtime.
"""

import os.path as osp
import sys

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
from geotransformer_tpu.utils.timing import fetch_diff_ms


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

    ms = fetch_diff_ms(
        lambda v, b: model.apply(v, b, training=False, with_gt=False),
        (variables, batch), lambda o: o["estimated_transform"][0, 0],
    )
    print(f"{'FULL forward':35s}: {ms:8.2f} ms", flush=True)

    bb = KPConvFPN(cfg.backbone.input_dim, cfg.backbone.output_dim, cfg.backbone.init_dim,
                   cfg.backbone.kernel_size, cfg.backbone.init_radius, cfg.backbone.init_sigma,
                   cfg.backbone.group_norm, num_stages=4, first_fine_stage=1, use_pallas=True)
    bb_vars = jax.jit(lambda r, f, b: bb.init(r, f, b))(jax.random.PRNGKey(0), batch["features"], batch)
    ms = fetch_diff_ms(
        lambda v, f, b: bb.apply(v, f, b),
        (bb_vars, batch["features"], batch),
        lambda o: jnp.sum(o[-1][0]),
    )
    print(f"{'backbone (KPConv FPN)':35s}: {ms:8.2f} ms", flush=True)

    cap_c = batch["points"][3].shape[0] // 2
    tr = GeometricTransformer(cfg.geotransformer.input_dim, cfg.geotransformer.output_dim,
                              cfg.geotransformer.hidden_dim, cfg.geotransformer.num_heads,
                              cfg.geotransformer.blocks, cfg.geotransformer.sigma_d,
                              cfg.geotransformer.sigma_a, cfg.geotransformer.angle_k,
                              use_pallas=True)
    rp, sp = batch["points"][3][None, :cap_c], batch["points"][3][None, cap_c:]
    rm, sm = batch["masks"][3][None, :cap_c], batch["masks"][3][None, cap_c:]
    rf = jnp.ones((1, cap_c, 1024)) * 0.01
    sf = jnp.ones((1, cap_c, 1024)) * 0.01
    tr_vars = jax.jit(lambda r: tr.init(r, rp, sp, rf, sf, rm, sm))(jax.random.PRNGKey(0))
    ms = fetch_diff_ms(
        lambda v, a, b: tr.apply(v, rp, sp, a, b, rm, sm),
        (tr_vars, rf, sf),
        lambda o: jnp.sum(o[0]),
    )
    print(f"{'geometric transformer':35s}: {ms:8.2f} ms", flush=True)

    ot = LearnableLogOptimalTransport(100)
    p, k = 256, 64
    scores = jnp.ones((p, k, k)) * 0.1
    masks = jnp.ones((p, k), dtype=bool)
    ot_vars = jax.jit(lambda r: ot.init(r, scores, masks, masks))(jax.random.PRNGKey(0))
    ms = fetch_diff_ms(
        lambda v, s: ot.apply(v, s, masks, masks),
        (ot_vars, scores),
        lambda o: jnp.sum(o),
    )
    print(f"{'sinkhorn (100 it)':35s}: {ms:8.2f} ms", flush=True)

    rng = np.random.default_rng(0)
    rkp = jnp.asarray(rng.uniform(0, 1, (p, k, 3)), jnp.float32)
    skp = rkp + 0.01
    log_scores = jnp.zeros((p, k, k))
    ms = fetch_diff_ms(
        lambda a, b, s: local_to_global_registration(
            a, b, masks, masks, s, k=3, acceptance_radius=0.1,
            correspondence_limit=cfg.caps.correspondence_capacity)["estimated_transform"],
        (rkp, skp, log_scores),
        lambda o: o[0, 0],
    )
    print(f"{'LGR':35s}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
