r"""Ablation transformer variants: vanilla / absolute-PE / learnable-RPE.

Equivalents of the reference variants not used by the shipped configs but
part of the public API:
  * `VanillaConditionalTransformer`
    (`/root/reference/geotransformer/modules/transformer/conditional_transformer.py:14-40`)
  * `PEConditionalTransformer` + `PEMultiHeadAttention` (absolute positional
    embedding added to q/k; `.../pe_transformer.py:15-132`,
    `conditional_transformer.py:42-71`)
  * `LRPEConditionalTransformer` + `LRPEMultiHeadAttention` (learnable
    embedding bank gathered by discrete relative index;
    `.../lrpe_transformer.py:19-148`, `conditional_transformer.py:120-161`)
"""

from typing import Sequence

import jax.numpy as jnp
import flax.linen as nn

from geotransformer_tpu.models.norms import LayerNorm
from geotransformer_tpu.models.transformer import (
    AttentionOutput,
    TransformerLayer,
    _split_heads,
    _merge_heads,
    _masked_softmax,
)


class PEMultiHeadAttention(nn.Module):
    """Absolute positional embedding added to projected q and k."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_q, embed_k, key_masks=None):
        d_head = self.d_model // self.num_heads
        proj_p = nn.Dense(self.d_model, name="proj_p")
        q = _split_heads(
            nn.Dense(self.d_model, name="proj_q")(input_q) + proj_p(embed_q), self.num_heads
        )
        k = _split_heads(
            nn.Dense(self.d_model, name="proj_k")(input_k) + proj_p(embed_k), self.num_heads
        )
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), self.num_heads)
        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k) / jnp.sqrt(jnp.asarray(d_head, q.dtype))
        scores = _masked_softmax(scores, key_masks)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v)
        return _merge_heads(hidden), scores


class PETransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, embed_q, embed_k, memory_masks=None):
        hidden, scores = PEMultiHeadAttention(
            self.d_model, self.num_heads, name="attention"
        )(input_states, memory_states, memory_states, embed_q, embed_k, key_masks=memory_masks)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        hidden = LayerNorm(self.d_model, name="norm")(hidden + input_states)
        out = AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden)
        return out, scores


class LearnablePositionalEmbedding(nn.Module):
    """Embedding bank + LayerNorm (reference positional_embedding.py:37-65)."""

    num_embeddings: int
    embedding_dim: int

    @nn.compact
    def __call__(self, emb_indices):
        table = self.param(
            "embeddings",
            nn.initializers.normal(1.0),
            (self.num_embeddings, self.embedding_dim),
        )
        emb_indices = jnp.minimum(emb_indices, self.num_embeddings - 1)
        embeddings = table[emb_indices]
        return LayerNorm(self.embedding_dim, name="norm")(embeddings)


class LRPEMultiHeadAttention(nn.Module):
    """Learnable relative positional scores gathered by discrete index."""

    d_model: int
    num_heads: int
    num_embeddings: int

    @nn.compact
    def __call__(self, input_q, input_k, input_v, emb_indices_qk, key_masks=None):
        d_head = self.d_model // self.num_heads
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), self.num_heads)

        all_indices = jnp.arange(self.num_embeddings)
        emb_bank = LearnablePositionalEmbedding(
            self.num_embeddings, self.d_model, name="embedding"
        )(all_indices)  # (P, C)
        emb_bank = emb_bank.reshape(self.num_embeddings, self.num_heads, d_head)
        scores_bank = jnp.einsum("bhnc,phc->bhnp", q, emb_bank)  # (B, H, N, P)
        idx = jnp.clip(emb_indices_qk, 0, self.num_embeddings - 1)  # (B, N, M)
        scores_p = jnp.take_along_axis(
            scores_bank, idx[:, None, :, :], axis=-1
        )  # gather (B, H, N, M)

        scores_e = jnp.einsum("bhnc,bhmc->bhnm", q, k)
        scores = (scores_e + scores_p) / jnp.sqrt(jnp.asarray(d_head, q.dtype))
        scores = _masked_softmax(scores, key_masks)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v)
        return _merge_heads(hidden), scores


class LRPETransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    num_embeddings: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, emb_indices, memory_masks=None):
        hidden, scores = LRPEMultiHeadAttention(
            self.d_model, self.num_heads, self.num_embeddings, name="attention"
        )(input_states, memory_states, memory_states, emb_indices, key_masks=memory_masks)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        hidden = LayerNorm(self.d_model, name="norm")(hidden + input_states)
        out = AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden)
        return out, scores


class VanillaConditionalTransformer(nn.Module):
    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            layer = TransformerLayer(
                self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
            )
            if block == "self":
                feats0, _ = layer(feats0, feats0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, memory_masks=masks1)
            elif block == "cross":
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
            else:
                raise ValueError(f"Unsupported block type: {block}")
        return feats0, feats1


class PEConditionalTransformer(nn.Module):
    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = PETransformerLayer(
                    self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
                )
                feats0, _ = layer(feats0, feats0, embeddings0, embeddings0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, embeddings1, embeddings1, memory_masks=masks1)
            elif block == "cross":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
                )
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
            else:
                raise ValueError(f"Unsupported block type: {block}")
        return feats0, feats1


class LRPEConditionalTransformer(nn.Module):
    blocks: Sequence[str]
    d_model: int
    num_heads: int
    num_embeddings: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats0, feats1, emb_indices0, emb_indices1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = LRPETransformerLayer(
                    self.d_model, self.num_heads, self.num_embeddings,
                    self.activation_fn, name=f"layers_{i}",
                )
                feats0, _ = layer(feats0, feats0, emb_indices0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, emb_indices1, memory_masks=masks1)
            elif block == "cross":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
                )
                feats0, _ = layer(feats0, feats1, memory_masks=masks1)
                feats1, _ = layer(feats1, feats0, memory_masks=masks0)
            else:
                raise ValueError(f"Unsupported block type: {block}")
        return feats0, feats1
