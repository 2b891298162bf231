r"""Data-parallel training step (shard_map over the device mesh).

Replaces the reference's DDP machinery
(`/root/reference/geotransformer/engine/base_trainer.py:179-234`): one
jit-compiled SPMD program computes per-pair losses on each device, reduces
gradients and metrics with ``pmean`` over the ``data`` axis of the ICI mesh,
and applies a replicated optimizer update. The reference's lr x world_size
scaling (`base_trainer.py:189-194`) is mirrored in :func:`make_optimizer`.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct
from jax.sharding import PartitionSpec as P

from geotransformer_tpu.losses.overall import overall_loss
from geotransformer_tpu.parallel.mesh import DATA_AXIS


def _shard_map(f, mesh, in_specs, out_specs):
    return jax.shard_map(
        f, mesh=mesh, in_specs=in_specs, out_specs=out_specs, check_vma=False
    )


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    constants: Any
    opt_state: Any


def make_lr_schedule(cfg, steps_per_epoch, world_size=1):
    """StepLR(lr_decay per lr_decay_steps epochs) or warmup-cosine.

    Mirrors `utils/torch.py:143-178` + `base_trainer.py:189-194` (lr scaled
    by world size).
    """
    base_lr = cfg.optim.lr * world_size
    if cfg.optim.warmup_steps > 0:
        # ModelNet-style warmup + cosine (reference WarmUpCosineAnnealingFunction).
        eta_init, eta_min = cfg.optim.eta_init, cfg.optim.eta_min
        total = max(cfg.optim.max_iteration, 1)

        def schedule(step):
            warm = cfg.optim.warmup_steps
            warm_lr = base_lr * (eta_init + (1.0 - eta_init) * step / warm)
            progress = jnp.clip((step - warm) / jnp.maximum(total - warm, 1), 0.0, 1.0)
            cos = 0.5 * (1.0 + jnp.cos(jnp.pi * progress))
            cos_lr = base_lr * (eta_min + (1.0 - eta_min) * cos)
            return jnp.where(step < warm, warm_lr, cos_lr)

        return schedule
    return optax.exponential_decay(
        init_value=base_lr,
        transition_steps=steps_per_epoch * cfg.optim.lr_decay_steps,
        decay_rate=cfg.optim.lr_decay,
        staircase=True,
    )


def make_optimizer(cfg, steps_per_epoch, world_size=1):
    """Adam with torch-style (coupled) weight decay, reference trainval.py:31-34."""
    schedule = make_lr_schedule(cfg, steps_per_epoch, world_size)
    tx = optax.chain(
        optax.add_decayed_weights(cfg.optim.weight_decay),
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    if cfg.optim.grad_acc_steps > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=cfg.optim.grad_acc_steps)
    return tx


def init_train_state(model, cfg, rng, example_batch, tx):
    variables = jax.jit(
        lambda r, b: model.init(
            {"params": r, "target": jax.random.fold_in(r, 1)},
            b, training=True, with_gt=True,
        )
    )(rng, example_batch)
    params = variables["params"]
    constants = variables.get("constants", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        constants=constants,
        opt_state=tx.init(params),
    )


def _squeeze_leading(tree):
    return jax.tree.map(lambda x: x[0], tree)


def _maybe_build_pyramid(batch, pyramid_spec):
    """If the per-device batch is raw (loader device-preprocess mode), build
    the full pyramid on chip (preprocess/device.build_pyramid_device — the
    in-step replacement for the reference's CPU collate workers,
    `/root/reference/geotransformer/utils/data.py:13-77`).

    Returns (batch, overflow bool or None)."""
    if pyramid_spec is None or "raw_points" not in batch:
        return batch, None
    from geotransformer_tpu.preprocess.device import build_pyramid_device

    transform = batch["transform"]
    built, overflow = build_pyramid_device(
        batch["raw_points"], batch["raw_lengths"], batch["raw_feats"],
        transform, **pyramid_spec
    )
    return built, jnp.any(overflow)


def make_train_step(model, cfg, tx, mesh=None, check_finite=True,
                    pyramid_spec=None):
    """Build the jitted (state, stacked_batch, rng) -> (state, metrics) step.

    With a mesh, `stacked_batch` has a leading device axis of size
    mesh.shape['data'] (one registration pair per device), sharded over the
    `data` axis; gradients/metrics are `pmean`-reduced. Without a mesh, the
    leading axis must be 1.

    With ``pyramid_spec`` (static kwargs for build_pyramid_device), raw
    batches from the device-preprocess loader are turned into full pyramids
    on chip inside the step; a stage-capacity overflow anywhere on the mesh
    skips the whole optimizer update (params/opt_state/step untouched) and
    is reported as ``aux['pyramid_overflow']`` so the trainer can apply its
    policy (escalate bucket / host fallback / raise).
    """

    def loss_fn(params, constants, batch, rng):
        variables = {"params": params, "constants": constants}
        output = model.apply(
            variables, batch, training=True, with_gt=True, rngs={"target": rng}
        )
        loss, aux = overall_loss(cfg, output, batch["transform"])
        return loss, aux

    def device_step(state, batch_stacked, rng):
        batch = _squeeze_leading(batch_stacked)
        batch, overflow = _maybe_build_pyramid(batch, pyramid_spec)
        if mesh is not None:
            rng = jax.random.fold_in(rng, jax.lax.axis_index(DATA_AXIS))
        grads, aux = jax.grad(loss_fn, has_aux=True)(
            state.params, state.constants, batch, rng
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, DATA_AXIS)
            aux = jax.lax.pmean(aux, DATA_AXIS)
        ok = jnp.bool_(True)
        if overflow is not None:
            over_any = overflow
            if mesh is not None:
                over_any = jax.lax.pmax(
                    overflow.astype(jnp.float32), DATA_AXIS) > 0
            ok = jnp.logical_and(ok, jnp.logical_not(over_any))
            aux = dict(aux, pyramid_overflow=over_any.astype(jnp.float32))
        if check_finite:
            # NaN/Inf gradient guard (reference base_trainer.py:219-227):
            # a skipped step must leave params AND optimizer state untouched
            # (the reference skips optimizer.step() entirely), so select the
            # previous values rather than zeroing gradients — zeroed grads
            # would still apply weight decay and advance Adam moments.
            finite = jnp.all(
                jnp.asarray(
                    [jnp.all(jnp.isfinite(g)) for g in jax.tree.leaves(grads)]
                )
            )
            ok = jnp.logical_and(ok, finite)
            aux = dict(aux, grad_finite=finite.astype(jnp.float32))
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda new, old: jnp.where(ok, new, old)
        new_params = jax.tree.map(keep, new_params, state.params)
        new_opt_state = jax.tree.map(keep, new_opt_state, state.opt_state)
        new_state = state.replace(
            step=state.step + 1, params=new_params, opt_state=new_opt_state
        )
        return new_state, aux

    if mesh is None:
        return jax.jit(device_step)

    state_spec = P()
    sharded = _shard_map(
        device_step,
        mesh=mesh,
        in_specs=(state_spec, P(DATA_AXIS), state_spec),
        out_specs=(state_spec, state_spec),
    )
    return jax.jit(sharded)


def make_eval_step(model, cfg, mesh=None, pyramid_spec=None):
    """Jitted inference + metrics step (no grad)."""
    from geotransformer_tpu.losses.overall import evaluate

    def device_step(state, batch_stacked):
        batch = _squeeze_leading(batch_stacked)
        batch, overflow = _maybe_build_pyramid(batch, pyramid_spec)
        variables = {"params": state.params, "constants": state.constants}
        output = model.apply(variables, batch, training=False, with_gt=True)
        loss, aux = overall_loss(cfg, output, batch["transform"])
        metrics = evaluate(cfg, output, batch["transform"])
        metrics.update(aux)
        if overflow is not None:
            metrics["pyramid_overflow"] = overflow.astype(jnp.float32)
        if mesh is not None:
            metrics = jax.lax.pmean(metrics, DATA_AXIS)
        return metrics

    if mesh is None:
        return jax.jit(device_step)
    sharded = _shard_map(
        device_step,
        mesh=mesh,
        in_specs=(P(), P(DATA_AXIS)),
        out_specs=P(),
    )
    return jax.jit(sharded)


def stack_batches(batches):
    """Stack per-pair batches along a new leading device axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=0), *batches)
