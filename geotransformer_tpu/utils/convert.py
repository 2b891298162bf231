r"""PyTorch checkpoint -> flax parameter conversion.

The reference ships flat ``state_dict`` checkpoints (keys like
``backbone.encoder1_1.KPConv.weights``; see
`/root/reference/geotransformer/engine/base_trainer.py:112-177` for the
snapshot format). This module maps them onto the flax parameter tree of
:class:`geotransformer_tpu.models.GeoTransformer`, handling:

  * ``nn.Linear.weight`` (out, in) -> ``Dense.kernel`` (in, out) transpose,
  * LayerNorm/GroupNorm ``weight``/``bias`` -> ``scale``/``bias`` (the
    reference GroupNorm wrapper nests a second ``.norm``),
  * ``layers_<i>`` flax naming -> ``layers.<i>`` torch ModuleList naming,
  * KPConv ``kernel_points`` buffers -> the ``constants`` collection.
"""

import numpy as np
import jax.numpy as jnp
from flax.core import freeze, unfreeze
from flax.traverse_util import flatten_dict, unflatten_dict


def _to_numpy(value):
    if hasattr(value, "detach"):
        return value.detach().cpu().numpy()
    return np.asarray(value)


def _torch_key_candidates(path):
    """Torch state_dict key candidates + transform for one flax leaf path."""
    *prefix, leaf = path
    prefix = [p.replace("layers_", "layers.") for p in prefix]
    base = ".".join(prefix)

    def key(suffix):
        return f"{base}.{suffix}" if base else suffix

    if leaf == "kernel":
        return [key("weight")], lambda w: w.T
    if leaf == "scale":
        # LayerNorm 'norm.weight' vs GroupNorm wrapper 'norm.norm.weight'.
        return [key("weight"), key("norm.weight")], lambda w: w
    if leaf == "bias":
        return [key("bias"), key("norm.bias")], lambda w: w
    if leaf in ("weights", "alpha", "kernel_points"):
        return [key(leaf)], lambda w: w
    return [key(leaf)], lambda w: w


def torch_state_dict_to_variables(state_dict, variables_template):
    """Fill a flax variables pytree from a torch flat state_dict.

    Args:
        state_dict: mapping of torch key -> tensor/ndarray. DDP ``module.``
            prefixes are stripped automatically.
        variables_template: variables dict (e.g. from ``model.init``) whose
            structure and shapes define the target.

    Returns:
        (variables, unused_torch_keys): converted FrozenDict + keys of
        `state_dict` that matched nothing (useful for strictness checks).
    """
    state_dict = {
        (k[len("module."):] if k.startswith("module.") else k): _to_numpy(v)
        for k, v in state_dict.items()
    }
    used = set()
    template = unfreeze(variables_template)
    flat = flatten_dict(template)
    out = {}
    for full_path, value in flat.items():
        collection, *path = full_path
        candidates, transform = _torch_key_candidates(path)
        converted = None
        for cand in candidates:
            if cand in state_dict:
                converted = transform(state_dict[cand])
                used.add(cand)
                break
        if converted is None:
            raise KeyError(
                f"no torch key for flax leaf {'/'.join(full_path)}; "
                f"tried {candidates}"
            )
        converted = np.asarray(converted)
        if converted.shape != tuple(np.shape(value)):
            raise ValueError(
                f"shape mismatch for {'/'.join(full_path)}: torch {converted.shape} "
                f"vs flax {np.shape(value)}"
            )
        out[full_path] = jnp.asarray(converted, dtype=jnp.asarray(value).dtype)
    unused = sorted(set(state_dict) - used)
    return freeze(unflatten_dict(out)), unused
