r"""Geometric self/cross attention transformer.

TPU rebuild of the reference transformer stack:
  * GeometricStructureEmbedding
    (`/root/reference/geotransformer/modules/geotransformer/geotransformer.py:9-72`)
  * RPE multi-head attention with pair embedding bias
    (`/root/reference/geotransformer/modules/transformer/rpe_transformer.py:18-72`)
  * vanilla cross attention (`.../vanilla_transformer.py:15-70`)
  * interleaved self/cross conditional stack
    (`.../conditional_transformer.py:73-117`)

All attention runs masked: padded tokens are excluded from keys via additive
-inf and their query outputs are zeroed at the stack output. Softmax is fp32.
"""

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from geotransformer_tpu.models.norms import LayerNorm
from geotransformer_tpu.ops.pairwise_distance import pairwise_distance
from geotransformer_tpu.ops.embedding import sinusoidal_embedding


def prefix_valid_count(masks, num_point):
    """Per-batch count of valid rows for the valid-prefix kernels.

    Padded rows are a per-cloud suffix under pad_registration_batch, so the
    count doubles as the prefix length; a non-prefix mask (allowed by the
    module APIs, never produced by the loader) falls back to ``num_point``
    (compute every tile — always correct, never fast).
    """
    if masks is None:
        return None
    is_prefix = jnp.all(
        masks[:, :-1].astype(jnp.int32) >= masks[:, 1:].astype(jnp.int32),
        axis=1)
    return jnp.where(
        is_prefix, jnp.sum(masks.astype(jnp.int32), axis=1), num_point
    ).astype(jnp.int32)


class GeometricStructureEmbedding(nn.Module):
    """Pairwise distance + k-NN triplet angle embedding for superpoints."""

    hidden_dim: int
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    use_pallas: bool = False  # fused embed+proj+max kernel (forward-only)

    def get_embedding_indices(self, points, masks=None):
        """Distance indices (B, N, N) and angle indices (B, N, N, k).

        Padded nodes (masks False) are excluded from the k-NN reference
        vectors; their own rows/columns carry junk that downstream attention
        masks out.
        """
        batch_size, num_point, _ = points.shape
        dist_map = jnp.sqrt(pairwise_distance(points, points))  # (B, N, N)
        d_indices = dist_map / self.sigma_d

        k = self.angle_k
        knn_dists = dist_map
        if masks is not None:
            knn_dists = jnp.where(masks[:, None, :], knn_dists, 1e12)
        # k+1 smallest then drop self (column 0).
        neg_top, knn_indices = jax.lax.top_k(-knn_dists, k + 1)
        knn_indices = knn_indices[:, :, 1:]  # (B, N, k)
        knn_points = jax.vmap(lambda pts, idx: pts[idx])(points, knn_indices)  # (B, N, k, 3)
        ref_vectors = knn_points - points[:, :, None, :]  # (B, N, k, 3)
        anc_vectors = points[:, None, :, :] - points[:, :, None, :]  # (B, N, N, 3)
        ref_b = ref_vectors[:, :, None, :, :]  # (B, N, 1, k, 3)
        anc_b = anc_vectors[:, :, :, None, :]  # (B, N, N, 1, 3)
        sin_values = jnp.linalg.norm(jnp.cross(ref_b, anc_b), axis=-1)  # (B, N, N, k)
        cos_values = jnp.sum(ref_b * anc_b, axis=-1)  # (B, N, N, k)
        angles = jnp.arctan2(sin_values, cos_values)
        factor_a = 180.0 / (self.sigma_a * jnp.pi)
        a_indices = angles * factor_a
        return d_indices, a_indices

    @nn.compact
    def __call__(self, points, masks=None):
        if self.use_pallas and self.reduction_a == "max":
            from geotransformer_tpu.kernels.gse import gse_embedding_full_diff

            # The fused kernel needs the raw projection matrices; recover
            # them from the Dense submodules (same names as the XLA path, so
            # checkpoints are interchangeable) by probing with I and 0 —
            # exact in float arithmetic and constant-foldable under jit.
            proj_d = nn.Dense(self.hidden_dim, name="proj_d")
            proj_a = nn.Dense(self.hidden_dim, name="proj_a")
            eye = jnp.eye(self.hidden_dim, dtype=jnp.float32)
            zero = jnp.zeros((1, self.hidden_dim), dtype=jnp.float32)
            b_d = proj_d(zero)[0]
            w_d = proj_d(eye) - b_d[None, :]
            b_a = proj_a(zero)[0]
            w_a = proj_a(eye) - b_a[None, :]

            # Only the k-NN reference vectors are computed in XLA (small);
            # distances and triplet angles live inside the kernel.
            k = self.angle_k
            knn_dists = jnp.sqrt(pairwise_distance(points, points))
            if masks is not None:
                knn_dists = jnp.where(masks[:, None, :], knn_dists, 1e12)
            # exact (recall 1.0) top-k via PartialReduce; lax.top_k lowers
            # to a full 512-wide sort per row (~0.35 ms on the demo pair)
            _, knn_indices = jax.lax.approx_max_k(
                -knn_dists, k + 1, recall_target=1.0
            )
            knn_indices = knn_indices[:, :, 1:]  # drop self
            knn_points = jax.vmap(lambda pts, idx: pts[idx])(points, knn_indices)
            ref_vectors = knn_points - points[:, :, None, :]  # (B, N, k, 3)
            ref_vectors = jax.lax.stop_gradient(ref_vectors)
            pts = jax.lax.stop_gradient(points)
            # Valid-rectangle skip: padded nodes are a suffix in the pair
            # frame, so the kernel can skip (and zero) tiles entirely inside
            # the padding band — at the 3DMatch calibrated cap that is ~half
            # the quadratic MXU work. Guarded: a non-prefix mask (never
            # produced by pad_registration_batch, but allowed by this module
            # API) falls back to computing every tile.
            from geotransformer_tpu.kernels.flags import kernel_enabled

            num_point = points.shape[1]
            n_valid = prefix_valid_count(masks, num_point)
            if n_valid is None or not kernel_enabled("gse_skip"):
                # full-valid n disables the clamped index maps (identity
                # mapping — the pre-skip kernel behavior)
                n_valid = jnp.full((points.shape[0],), num_point, jnp.int32)
            return jax.vmap(
                lambda p, u, nv: gse_embedding_full_diff(
                    p, u, w_d, b_d, w_a, b_a, nv,
                    self.hidden_dim, self.sigma_d, self.sigma_a,
                ),
                in_axes=(0, 0, 0),
            )(pts, ref_vectors, n_valid)

        d_indices, a_indices = self.get_embedding_indices(points, masks)
        d_indices = jax.lax.stop_gradient(d_indices)
        a_indices = jax.lax.stop_gradient(a_indices)

        d_embeddings = sinusoidal_embedding(d_indices, self.hidden_dim)
        d_embeddings = nn.Dense(self.hidden_dim, name="proj_d")(d_embeddings)

        a_embeddings = sinusoidal_embedding(a_indices, self.hidden_dim)
        a_embeddings = nn.Dense(self.hidden_dim, name="proj_a")(a_embeddings)
        if self.reduction_a == "max":
            a_embeddings = jnp.max(a_embeddings, axis=3)
        elif self.reduction_a == "mean":
            a_embeddings = jnp.mean(a_embeddings, axis=3)
        else:
            raise ValueError(f"Unsupported reduction mode: {self.reduction_a}")

        return d_embeddings + a_embeddings


def _split_heads(x, num_heads):
    b, n, c = x.shape
    return x.reshape(b, n, num_heads, c // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, h, n, c = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, n, h * c)


def _masked_softmax(scores, key_masks):
    """Softmax over the last axis with key masking; fully-masked rows -> 0."""
    if key_masks is not None:
        neg = jnp.asarray(jnp.finfo(scores.dtype).min, scores.dtype)
        while key_masks.ndim < scores.ndim:
            key_masks = key_masks[:, None]
        scores = jnp.where(key_masks, scores, neg)
    return jax.nn.softmax(scores, axis=-1)


class MultiHeadAttention(nn.Module):
    """Vanilla scaled dot-product attention (keys maskable).

    With ``use_pallas`` (B == 1) the whole QK^T -> masked softmax -> AV
    chain runs in the fused valid-rectangle kernel
    (kernels/attention.fused_masked_attention): scores never touch HBM and
    query tiles beyond the valid prefix are skipped. The score matrix is
    then not materialized — the fused path returns ``scores=None`` (every
    caller in the stack discards it). ``input_masks`` feeds only the row
    skip; key masking semantics are unchanged."""

    d_model: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_q, input_k, input_v, key_masks=None,
                 input_masks=None):
        d_head = self.d_model // self.num_heads
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), self.num_heads)

        from geotransformer_tpu.kernels.flags import kernel_enabled

        if self.use_pallas and q.shape[0] == 1 and kernel_enabled("fused_attention"):
            from geotransformer_tpu.kernels.attention import (
                fused_masked_attention_diff,
            )

            nv_q = prefix_valid_count(input_masks, input_q.shape[1])
            nv_k = prefix_valid_count(key_masks, input_k.shape[1])
            hidden = fused_masked_attention_diff(
                q[0], k[0], v[0], None,
                None if nv_q is None else nv_q[0],
                None if nv_k is None else nv_k[0],
                float(d_head) ** -0.5,
            )
            return hidden[None], None

        scores = jnp.einsum("bhnc,bhmc->bhnm", q, k) / jnp.sqrt(jnp.asarray(d_head, q.dtype))
        scores = _masked_softmax(scores, key_masks)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v)
        return _merge_heads(hidden), scores


class _PairBiasProjection(nn.Module):
    """Holds the proj_p Linear parameters but applies them on the *query* side.

    The reference computes ``scores_p = q . (e @ W_p + b_p)`` with the
    projection materialized over the full (B, N, M, C) pair-embedding tensor
    (`rpe_transformer.py:54-56`) — an O(N^2 C^2) matmul per layer. Since the
    projection is linear, the contraction reassociates exactly:

        scores_p[b,h,n,m] = e[b,n,m,:] . (W_p^T q)[b,h,n,:] + q[b,h,n,:] . b_p[h,:]

    which is O(N C^2) + O(N^2 C) — the same asymptotic cost as the plain QK
    term (~128x fewer FLOPs for C=256). Parameter names/shapes stay those of
    a Dense layer so torch checkpoints convert unchanged.
    """

    d_model: int
    num_heads: int
    use_pallas: bool = False
    skip_qb: bool = False  # drop the softmax-shift-invariant q . b_p term
    #                        and return the raw (N, H, M) kernel layout
    #                        (the fused-attention feed; B == 1, pallas only)

    @nn.compact
    def __call__(self, q, embed_qk, n_valid=None):
        d_head = self.d_model // self.num_heads
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (self.d_model, self.d_model)
        )
        bias = self.param("bias", nn.initializers.zeros, (self.d_model,))
        # (B, H, N, dh) x (D, H, dh) -> (B, H, N, D)
        w = kernel.reshape(self.d_model, self.num_heads, d_head)
        from geotransformer_tpu.kernels.flags import kernel_enabled

        if self.use_pallas and q.shape[0] == 1 and kernel_enabled("pair_scores"):
            # Pallas pair-score kernel: reads the (N, M, C) embedding once
            # with the valid-rectangle tile skip (kernels/attention.py).
            from geotransformer_tpu.kernels.attention import rpe_pair_scores_diff

            qw_nh = jnp.einsum("bhnc,dhc->bnhd", q, w)[0]  # (N, H, D)
            nv = None if n_valid is None else n_valid[0]
            scores_p = rpe_pair_scores_diff(embed_qk[0], qw_nh, nv, nv)
            if self.skip_qb:
                return scores_p  # (N, H, M)
            scores_p = scores_p.transpose(1, 0, 2)[None]  # (1, H, N, M)
        else:
            assert not self.skip_qb
            qw = jnp.einsum("bhnc,dhc->bhnd", q, w)
            scores_p = jnp.einsum("bnmd,bhnd->bhnm", embed_qk, qw)
        qb = jnp.einsum("bhnc,hc->bhn", q, bias.reshape(self.num_heads, d_head))
        return scores_p + qb[..., None]


class RPEMultiHeadAttention(nn.Module):
    """Attention with pairwise geometric embedding bias: score += q . proj_p(e)."""

    d_model: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_q, input_k, input_v, embed_qk, key_masks=None):
        d_head = self.d_model // self.num_heads
        q = _split_heads(nn.Dense(self.d_model, name="proj_q")(input_q), self.num_heads)
        k = _split_heads(nn.Dense(self.d_model, name="proj_k")(input_k), self.num_heads)
        v = _split_heads(nn.Dense(self.d_model, name="proj_v")(input_v), self.num_heads)

        from geotransformer_tpu.kernels.flags import kernel_enabled

        n_valid = prefix_valid_count(key_masks, input_q.shape[1])
        if (self.use_pallas and q.shape[0] == 1
                and kernel_enabled("fused_attention")
                and kernel_enabled("pair_scores")):
            # Fully fused: pair-bias scores from the valid-rectangle kernel
            # feed the fused attention kernel directly; the qb = q . b_p
            # shift is dropped (softmax shift-invariance — exact, see
            # kernels/attention.py) and the (B, H, N, M) score tensor is
            # never materialized. RPE attention is self-attention, so the
            # query and key valid prefixes coincide.
            from geotransformer_tpu.kernels.attention import (
                fused_masked_attention_diff,
            )

            scores_p = _PairBiasProjection(
                self.d_model, self.num_heads, use_pallas=True,
                skip_qb=True, name="proj_p",
            )(q, embed_qk, n_valid=n_valid)  # (1, H, N, M)
            nv = None if n_valid is None else n_valid[0]
            hidden = fused_masked_attention_diff(
                q[0], k[0], v[0], scores_p, nv, nv,
                float(d_head) ** -0.5,
            )
            return hidden[None], None

        scores_e = jnp.einsum("bhnc,bhmc->bhnm", q, k)
        scores_p = _PairBiasProjection(
            self.d_model, self.num_heads, use_pallas=self.use_pallas,
            name="proj_p",
        )(q, embed_qk, n_valid=n_valid)
        scores = (scores_e + scores_p) / jnp.sqrt(jnp.asarray(d_head, q.dtype))
        scores = _masked_softmax(scores, key_masks)
        hidden = jnp.einsum("bhnm,bhmc->bhnc", scores, v)
        return _merge_heads(hidden), scores


class AttentionOutput(nn.Module):
    """Post-LN feed-forward: expand x2 -> act -> squeeze -> residual LN."""

    d_model: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states):
        act = {"ReLU": nn.relu, "LeakyReLU": lambda x: nn.leaky_relu(x, 0.01),
               "GELU": nn.gelu, "SiLU": nn.silu}[self.activation_fn]
        hidden = nn.Dense(self.d_model * 2, name="expand")(input_states)
        hidden = act(hidden)
        hidden = nn.Dense(self.d_model, name="squeeze")(hidden)
        return LayerNorm(self.d_model, name="norm")(input_states + hidden)


class AttentionLayer(nn.Module):
    d_model: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, memory_masks=None,
                 input_masks=None):
        hidden, scores = MultiHeadAttention(
            self.d_model, self.num_heads, use_pallas=self.use_pallas,
            name="attention"
        )(input_states, memory_states, memory_states, key_masks=memory_masks,
          input_masks=input_masks)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        out = LayerNorm(self.d_model, name="norm")(hidden + input_states)
        return out, scores


class RPEAttentionLayer(nn.Module):
    d_model: int
    num_heads: int
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_masks=None):
        hidden, scores = RPEMultiHeadAttention(
            self.d_model, self.num_heads, use_pallas=self.use_pallas,
            name="attention"
        )(input_states, memory_states, memory_states, position_states, key_masks=memory_masks)
        hidden = nn.Dense(self.d_model, name="linear")(hidden)
        out = LayerNorm(self.d_model, name="norm")(hidden + input_states)
        return out, scores


class TransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, memory_masks=None,
                 input_masks=None):
        hidden, scores = AttentionLayer(
            self.d_model, self.num_heads, use_pallas=self.use_pallas,
            name="attention")(
            input_states, memory_states, memory_masks=memory_masks,
            input_masks=input_masks
        )
        out = AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden)
        return out, scores


class RPETransformerLayer(nn.Module):
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, input_states, memory_states, position_states, memory_masks=None):
        hidden, scores = RPEAttentionLayer(
            self.d_model, self.num_heads, use_pallas=self.use_pallas,
            name="attention")(
            input_states, memory_states, position_states, memory_masks=memory_masks
        )
        out = AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden)
        return out, scores


class TransformerDecoderLayer(nn.Module):
    """Self-attention + cross-attention + FFN (reference vanilla_transformer.py:132-143)."""

    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, input_states, memory_states, input_masks=None, memory_masks=None):
        hidden, _ = AttentionLayer(self.d_model, self.num_heads, name="self_attention")(
            input_states, input_states, memory_masks=input_masks
        )
        hidden, scores = AttentionLayer(self.d_model, self.num_heads, name="cross_attention")(
            hidden, memory_states, memory_masks=memory_masks
        )
        out = AttentionOutput(self.d_model, self.activation_fn, name="output")(hidden)
        return out, scores


class TransformerEncoder(nn.Module):
    """Stack of self-attention layers (reference vanilla_transformer.py:146-177)."""

    d_model: int
    num_heads: int
    num_layers: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, feats, masks=None):
        for i in range(self.num_layers):
            feats, _ = TransformerLayer(
                self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
            )(feats, feats, memory_masks=masks)
        return feats


class TransformerDecoder(nn.Module):
    """Stack of decoder layers (reference vanilla_transformer.py:180-201)."""

    d_model: int
    num_heads: int
    num_layers: int
    activation_fn: str = "ReLU"

    @nn.compact
    def __call__(self, q_feats, s_feats, q_masks=None, s_masks=None):
        for i in range(self.num_layers):
            q_feats, _ = TransformerDecoderLayer(
                self.d_model, self.num_heads, self.activation_fn, name=f"layers_{i}"
            )(q_feats, s_feats, input_masks=q_masks, memory_masks=s_masks)
        return q_feats


class RPEConditionalTransformer(nn.Module):
    """Interleaved geometric self-attention / vanilla cross-attention stack."""

    blocks: Sequence[str]
    d_model: int
    num_heads: int
    activation_fn: str = "ReLU"
    parallel: bool = False
    use_pallas: bool = False

    @nn.compact
    def __call__(self, feats0, feats1, embeddings0, embeddings1, masks0=None, masks1=None):
        for i, block in enumerate(self.blocks):
            if block == "self":
                layer = RPETransformerLayer(
                    self.d_model, self.num_heads, self.activation_fn,
                    use_pallas=self.use_pallas, name=f"layers_{i}"
                )
                feats0, _ = layer(feats0, feats0, embeddings0, memory_masks=masks0)
                feats1, _ = layer(feats1, feats1, embeddings1, memory_masks=masks1)
            elif block == "cross":
                layer = TransformerLayer(
                    self.d_model, self.num_heads, self.activation_fn,
                    use_pallas=self.use_pallas, name=f"layers_{i}"
                )
                if self.parallel:
                    new0, _ = layer(feats0, feats1, memory_masks=masks1,
                                    input_masks=masks0)
                    new1, _ = layer(feats1, feats0, memory_masks=masks0,
                                    input_masks=masks1)
                    feats0, feats1 = new0, new1
                else:
                    feats0, _ = layer(feats0, feats1, memory_masks=masks1,
                                      input_masks=masks0)
                    feats1, _ = layer(feats1, feats0, memory_masks=masks0,
                                      input_masks=masks1)
            else:
                raise ValueError(f"Unsupported block type: {block}")
        return feats0, feats1


class GeometricTransformer(nn.Module):
    """GSE + conditional transformer with in/out projections
    (reference geotransformer.py:75-155)."""

    input_dim: int
    output_dim: int
    hidden_dim: int
    num_heads: int
    blocks: Sequence[str]
    sigma_d: float
    sigma_a: float
    angle_k: int
    reduction_a: str = "max"
    activation_fn: str = "ReLU"
    use_pallas: bool = False

    @nn.compact
    def __call__(self, ref_points, src_points, ref_feats, src_feats,
                 ref_masks: Optional[jnp.ndarray] = None,
                 src_masks: Optional[jnp.ndarray] = None):
        embedding = GeometricStructureEmbedding(
            self.hidden_dim, self.sigma_d, self.sigma_a, self.angle_k,
            self.reduction_a, use_pallas=self.use_pallas, name="embedding",
        )
        ref_embeddings = embedding(ref_points, ref_masks)
        src_embeddings = embedding(src_points, src_masks)

        in_proj = nn.Dense(self.hidden_dim, name="in_proj")
        ref_feats = in_proj(ref_feats)
        src_feats = in_proj(src_feats)

        ref_feats, src_feats = RPEConditionalTransformer(
            tuple(self.blocks), self.hidden_dim, self.num_heads,
            self.activation_fn, use_pallas=self.use_pallas, name="transformer",
        )(ref_feats, src_feats, ref_embeddings, src_embeddings,
          masks0=ref_masks, masks1=src_masks)

        out_proj = nn.Dense(self.output_dim, name="out_proj")
        ref_feats = out_proj(ref_feats)
        src_feats = out_proj(src_feats)

        if ref_masks is not None:
            ref_feats = ref_feats * ref_masks[..., None].astype(ref_feats.dtype)
        if src_masks is not None:
            src_feats = src_feats * src_masks[..., None].astype(src_feats.dtype)
        return ref_feats, src_feats
