"""Precomputed GT targets (the no_grad-geometry hoist, reference
`model.py:76-108`): feeding partition tables + GT overlap candidates through
the batch must reproduce the in-model computation bit-for-bit, for both the
raw forward and the full train step."""

import pytest
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from geotransformer_tpu.models import create_model, precompute_gt_targets
from geotransformer_tpu.parallel import (
    make_optimizer,
    init_train_state,
    make_train_step,
    stack_batches,
)

from test_parallel import tiny_config, make_tiny_batch


def _tree_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestPrecomputedTargets:
    def test_forward_identical(self):
        cfg = tiny_config()
        model = create_model(cfg)
        batch = jax.tree.map(jnp.asarray, make_tiny_batch(cfg, seed=0))

        targets = jax.jit(lambda b: precompute_gt_targets(cfg, b))(batch)
        batch_pre = dict(batch, **targets)

        rng = jax.random.PRNGKey(0)
        variables = model.init(
            {"params": rng, "target": jax.random.fold_in(rng, 1)},
            batch, training=True, with_gt=True,
        )
        apply = jax.jit(
            lambda v, b, r: model.apply(
                v, b, training=True, with_gt=True, rngs={"target": r})
        )
        t_rng = jax.random.PRNGKey(3)
        out_in_model = apply(variables, batch, t_rng)
        out_precomp = apply(variables, batch_pre, t_rng)
        _tree_equal(out_in_model, out_precomp)

    @pytest.mark.slow

    def test_train_step_identical(self):
        cfg = tiny_config()
        cfg = dataclasses.replace(
            cfg, caps=dataclasses.replace(cfg.caps, inverse_limits=(40, 40, 40))
        )
        model = create_model(cfg)
        batch = jax.tree.map(jnp.asarray, make_tiny_batch(cfg, seed=1))
        targets = jax.jit(lambda b: precompute_gt_targets(cfg, b))(batch)
        batch_pre = dict(batch, **targets)

        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = init_train_state(model, cfg, jax.random.PRNGKey(0), batch, tx)
        step = make_train_step(model, cfg, tx, mesh=None)
        rng = jax.random.PRNGKey(7)

        s1, aux1 = step(state, stack_batches([batch]), rng)
        s2, aux2 = step(state, stack_batches([batch_pre]), rng)
        _tree_equal(aux1, aux2)
        _tree_equal(s1.params, s2.params)

    def test_loader_precompute(self):
        """prepare_pair(precompute_targets=True) attaches the same arrays the
        traced function produces."""
        from geotransformer_tpu.preprocess.loader import prepare_pair

        cfg = tiny_config()
        rng = np.random.default_rng(11)
        n = 300
        xy = rng.uniform(0, 1, (n, 2)).astype(np.float32)
        z = 0.2 * np.sin(4 * xy[:, 0]) + 0.01 * rng.normal(size=n)
        ref = np.column_stack([xy, z]).astype(np.float32)
        src = (ref[:250] + 0.01 * rng.normal(size=(250, 3))).astype(np.float32)
        sample = {
            "ref_points": ref,
            "src_points": src,
            "transform": np.eye(4, dtype=np.float32),
        }
        kwargs = dict(
            num_stages=cfg.backbone.num_stages,
            voxel_size=cfg.backbone.init_voxel_size,
            search_radius=cfg.backbone.init_radius,
            neighbor_limits=cfg.caps.neighbor_limits,
            stage_caps=cfg.caps.stage_caps,
        )
        plain = prepare_pair(sample, **kwargs)
        pre = prepare_pair(
            sample, precompute_targets=True, model_cfg=cfg, **kwargs)
        assert "gt_cand_indices" in pre and "gt_cand_indices" not in plain
        assert "ref_node_knn_indices" in pre

        batch = jax.tree.map(
            jnp.asarray, {k: v for k, v in plain.items() if k != "meta"})
        targets = jax.jit(lambda b: precompute_gt_targets(cfg, b))(batch)
        for k, v in targets.items():
            np.testing.assert_array_equal(np.asarray(v), pre[k])
