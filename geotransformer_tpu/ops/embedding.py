r"""Continuous-index sinusoidal embedding.

Functional equivalent of the reference SinusoidalPositionalEmbedding
(`/root/reference/geotransformer/modules/transformer/positional_embedding.py:8-34`):
for any real-valued index tensor, emits interleaved [sin, cos] features.
"""

import numpy as np
import jax.numpy as jnp


def sinusoidal_embedding(emb_indices, d_model):
    """Embed real-valued indices into d_model dims (interleaved sin/cos).

    Args:
        emb_indices: (*) float array.
        d_model: static even int.

    Returns:
        (*, d_model) float array; layout [sin0, cos0, sin1, cos1, ...].
    """
    if d_model % 2 != 0:
        raise ValueError(f"sinusoidal embedding needs even d_model, got {d_model}")
    div_indices = np.arange(0, d_model, 2, dtype=np.float32)
    div_term = np.exp(div_indices * (-np.log(10000.0) / d_model))  # (d/2,)
    omegas = emb_indices[..., None] * jnp.asarray(div_term)  # (*, d/2)
    emb = jnp.stack([jnp.sin(omegas), jnp.cos(omegas)], axis=-1)  # (*, d/2, 2)
    return emb.reshape(emb_indices.shape + (d_model,))
