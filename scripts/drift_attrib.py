#!/usr/bin/env python
r"""Attribute Pallas-path drift to individual kernel precision choices.

Reuses the trained parameters cached by scripts/bf16_drift.py
(/tmp/bf16_drift_params.pkl) and re-evaluates the Pallas inference path
under each combination of the kernel precision knobs:

  * kernels/kpconv.TABLE_DTYPE — gathered neighbor-table storage
  * kernels/kpconv.MXU_DTYPE   — KPConv influence/feature contraction inputs
  * kernels/gse.BASIS_DTYPE    — GSE sin/cos bases + projection weights
  * kernels/gse.EMBED_DTYPE    — GSE embedding output (read by every RPE layer)

(The production entry point for these knobs is configs.PrecisionConfig /
apply_precision; this script flips the module globals directly because it
sweeps combinations — batches are built ONCE under the default 16-column
table alignment, which is valid for both table dtypes.)

reporting coarse/fine feature drift and matching overlap vs the f32 XLA
reference for each, so the dominant drift source is identified by
measurement rather than guesswork. Run AFTER bf16_drift.py has cached
params: `python scripts/drift_attrib.py`.
"""

import os.path as osp
import pickle
import sys

sys.path.insert(0, osp.dirname(osp.dirname(osp.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.models import create_model
from geotransformer_tpu.kernels import gse as gse_kernels
from geotransformer_tpu.kernels import kpconv as kpconv_kernels

from train_smoke import make_pair  # noqa: E402
from bf16_drift import rel_drift, row_cosine_stats, node_corr_overlap  # noqa: E402


def main():
    with open("/tmp/bf16_drift_params.pkl", "rb") as f:
        variables = jax.tree.map(jnp.asarray, pickle.load(f))

    cfg = make_3dmatch_config().with_caps(
        stage_caps=(4096, 1280, 384, 128), correspondence_capacity=2048,
        gt_candidates=64,
    )
    pairs = [make_pair(cfg, s) for s in range(4)]

    model_xla = create_model(cfg.with_model(force_pallas=False))
    model_pal = create_model(cfg.with_model(force_pallas=True))

    refs = []
    for pair in pairs:
        with jax.default_matmul_precision("float32"):
            refs.append(jax.tree.map(np.asarray, jax.jit(
                lambda v, b: model_xla.apply(v, b, training=False, with_gt=False)
            )(variables, pair)))

    bf, f32 = jnp.bfloat16, jnp.float32
    combos = [
        ("all-bf16 (current)", bf, bf, bf, bf),
        ("table-f32", f32, bf, bf, bf),
        ("kpconv-mxu-f32", bf, f32, bf, bf),
        ("gse-basis-f32", bf, bf, f32, bf),
        ("gse-out-f32", bf, bf, bf, f32),
        ("gse-all-f32", bf, bf, f32, f32),
        ("all-f32", f32, f32, f32, f32),
    ]
    for name, table, mxu, basis, embed in combos:
        kpconv_kernels.TABLE_DTYPE = table
        kpconv_kernels.MXU_DTYPE = mxu
        gse_kernels.BASIS_DTYPE = basis
        gse_kernels.EMBED_DTYPE = embed
        fwd = jax.jit(
            lambda v, b: model_pal.apply(v, b, training=False, with_gt=False))
        worst = dict(fc=0.0, ff=0.0, jac=1.0, med=1.0)
        for pair, ref in zip(pairs, refs):
            out = jax.tree.map(np.asarray, fwd(variables, pair))
            worst["fc"] = max(worst["fc"], rel_drift(
                out["ref_feats_c"], ref["ref_feats_c"]))
            worst["ff"] = max(worst["ff"], rel_drift(
                out["ref_feats_f"], ref["ref_feats_f"]))
            med, _, _ = row_cosine_stats(out["ref_feats_c"], ref["ref_feats_c"])
            worst["med"] = min(worst["med"], med)
            worst["jac"] = min(worst["jac"], node_corr_overlap(out, ref))
        out0 = jax.tree.map(np.asarray, fwd(variables, pairs[0]))
        digest = hash(out0["ref_feats_f"].tobytes()) & 0xFFFFFFFF
        print(f"{name:22s} coarse {worst['fc']:8.4%}  fine {worst['ff']:8.4%}"
              f"  cos_med {worst['med']:.5f}  jaccard {worst['jac']:.3f}"
              f"  bits {digest:08x}",
              flush=True)
    kpconv_kernels.TABLE_DTYPE = bf
    kpconv_kernels.MXU_DTYPE = bf
    gse_kernels.BASIS_DTYPE = bf
    gse_kernels.EMBED_DTYPE = bf


if __name__ == "__main__":
    main()
