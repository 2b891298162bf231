"""Parity tests for the Pallas RPE pair-bias score kernel
(kernels/attention.py) vs the XLA einsum module path.

CPU runs exercise interpret mode (the kernel defaults to interpret off-TPU),
mirroring the other kernel parity suites.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from geotransformer_tpu.kernels.attention import (
    rpe_pair_scores, rpe_pair_scores_diff,
)


def _ref_scores(embed, qw):
    # scores[i, h, j] = sum_c qw[i, h, c] * e[i, j, c], bf16 operands with
    # f32 accumulation (the kernel's — and the XLA fusion's — dtype class).
    return jnp.einsum(
        "nmc,nhc->nhm",
        embed.astype(jnp.bfloat16).astype(jnp.float32),
        qw.astype(jnp.bfloat16).astype(jnp.float32),
    )


@pytest.mark.parametrize("n,m,c,h", [(128, 128, 64, 4), (192, 128, 128, 4)])
def test_pair_scores_parity(n, m, c, h):
    rng = np.random.default_rng(0)
    embed = jnp.asarray(rng.normal(size=(n, m, c)).astype(np.float32))
    qw = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    out = rpe_pair_scores(embed.astype(jnp.bfloat16), qw)
    ref = _ref_scores(embed, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("m", [48, 64, 80, 192, 448])
def test_default_tile_choice_is_mosaic_legal_and_correct(m):
    """Regression: m=192 (ModelNet's calibrated superpoint cap) used to pick
    tile_j=64, an invalid (tile_i*h, 64) output block on a (n*h, 192) array —
    Mosaic requires the minor block dim to be 128-divisible or the whole
    padded minor dim. The wrapper now asserts legality at trace time, so this
    runs the default tile selection across the small-m regimes."""
    n, c, h = 64, 32, 2
    rng = np.random.default_rng(5)
    embed = jnp.asarray(rng.normal(size=(n, m, c)).astype(np.float32))
    qw = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    out = rpe_pair_scores(embed, qw)
    ref = _ref_scores(embed, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pair_scores_valid_rectangle_skip():
    n, c, h = 256, 64, 4
    rng = np.random.default_rng(1)
    embed = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    qw = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    nv = 100
    out = rpe_pair_scores(embed, qw, n_valid_q=jnp.int32(nv),
                          n_valid_k=jnp.int32(nv), tile_i=64, tile_j=128)
    full = rpe_pair_scores(embed, qw, tile_i=64, tile_j=128)
    # tiles intersecting the valid rectangle match the full computation
    # (the skip is tile-granular: valid region rounds up to 128 = 2 tiles)
    np.testing.assert_array_equal(np.asarray(out[:128, :, :128]),
                                  np.asarray(full[:128, :, :128]))
    # tiles entirely inside the padding band are exactly zero
    assert np.all(np.asarray(out[128:]) == 0.0)
    assert np.all(np.asarray(out[:, :, 128:]) == 0.0)


def test_pair_scores_nonaligned_pad():
    # N, M not multiples of the tiles: wrapper pads and crops.
    n, m, c, h = 96, 80, 64, 4
    rng = np.random.default_rng(2)
    embed = jnp.asarray(rng.normal(size=(n, m, c)).astype(np.float32))
    qw = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    out = rpe_pair_scores(embed, qw, tile_i=64)
    ref = _ref_scores(embed, qw)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_pair_scores_grad_matches_einsum():
    """The custom_vjp backward IS the einsum path's backward: pulling back
    the same cotangent must match to f32 precision (the bf16 class applies
    to the forward only)."""
    n, c, h = 128, 64, 4
    rng = np.random.default_rng(3)
    embed = jnp.asarray(rng.normal(size=(n, n, c)).astype(np.float32))
    qw = jnp.asarray(rng.normal(size=(n, h, c)).astype(np.float32))
    ds = jnp.asarray(rng.normal(size=(n, h, n)).astype(np.float32))
    nv = jnp.int32(n)

    _, vjp_k = jax.vjp(lambda e, q: rpe_pair_scores_diff(e, q, nv, nv),
                       embed, qw)
    _, vjp_r = jax.vjp(lambda e, q: jnp.einsum("nmc,nhc->nhm", e, q),
                       embed, qw)
    for a, b in zip(vjp_k(ds), vjp_r(ds)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_module_path_matches_einsum_path():
    """RPEConditionalTransformer with use_pallas=True vs False: identical
    params, masked outputs match to kernel-precision tolerance."""
    from geotransformer_tpu.models.transformer import RPEConditionalTransformer

    b, n, m, d, h = 1, 128, 96, 64, 4
    rng = np.random.default_rng(4)
    f0 = jnp.asarray(rng.normal(size=(b, n, d)).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(b, m, d)).astype(np.float32))
    e0 = jnp.asarray(rng.normal(size=(b, n, n, d)).astype(np.float32))
    e1 = jnp.asarray(rng.normal(size=(b, m, m, d)).astype(np.float32))
    masks0 = jnp.arange(n)[None, :] < 100
    masks1 = jnp.arange(m)[None, :] < 80

    mod_x = RPEConditionalTransformer(("self", "cross"), d, h)
    mod_p = RPEConditionalTransformer(("self", "cross"), d, h, use_pallas=True)
    variables = mod_x.init(jax.random.PRNGKey(0), f0, f1, e0, e1,
                           masks0=masks0, masks1=masks1)
    out_x = mod_x.apply(variables, f0, f1, e0, e1, masks0=masks0, masks1=masks1)
    out_p = mod_p.apply(variables, f0, f1, e0, e1, masks0=masks0, masks1=masks1)
    for a, b_, mask in zip(out_p, out_x, (masks0, masks1)):
        a = np.asarray(a) * np.asarray(mask)[..., None]
        b_ = np.asarray(b_) * np.asarray(mask)[..., None]
        np.testing.assert_allclose(a, b_, rtol=2e-2, atol=2e-2)


class TestFusedMaskedAttention:
    def _xla(self, q, k, v, bias, nv_k, scale):
        m = k.shape[1]
        s = jnp.einsum("hnc,hmc->hnm", q, k)
        if bias is not None:
            s = s + jnp.transpose(bias, (1, 0, 2))
        s = s * scale
        ok = jnp.arange(m)[None, None, :] < nv_k
        s = jnp.where(ok, s, jnp.finfo(jnp.float32).min)
        p = jax.nn.softmax(s, axis=-1)
        o = jnp.einsum("hnm,hmc->hnc", p, v)
        h, n, dh = q.shape
        return jnp.transpose(o, (1, 0, 2)).reshape(n, h * dh)

    def test_parity_no_bias(self):
        from geotransformer_tpu.kernels.attention import fused_masked_attention

        rng = np.random.default_rng(0)
        h, n, m, dh = 4, 256, 256, 64
        q = jnp.asarray(rng.normal(size=(h, n, dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(h, m, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(h, m, dh)).astype(np.float32))
        nv_k = 200
        got = fused_masked_attention(
            q, k, v, n_valid_q=jnp.int32(180), n_valid_k=jnp.int32(nv_k),
            scale=0.125, tile_i=64)
        want = self._xla(q, k, v, None, nv_k, 0.125)
        # valid rows match; rows in fully-skipped tiles are zero
        np.testing.assert_allclose(np.asarray(got)[:180],
                                   np.asarray(want)[:180],
                                   rtol=2e-2, atol=2e-2)
        np.testing.assert_array_equal(np.asarray(got)[192:], 0.0)

    def test_parity_with_bias_and_grads(self):
        from geotransformer_tpu.kernels.attention import (
            fused_masked_attention_diff,
        )

        rng = np.random.default_rng(1)
        h, n, dh = 2, 128, 32
        m = n
        q = jnp.asarray(rng.normal(size=(h, n, dh)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(h, m, dh)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(h, m, dh)).astype(np.float32))
        bias = jnp.asarray(rng.normal(size=(n, h, m)).astype(np.float32))
        nv = jnp.int32(100)

        def f_fused(q, k, v, b):
            out = fused_masked_attention_diff(q, k, v, b, nv, nv, 0.2)
            return jnp.sum(out[:100] ** 2), out

        def f_xla(q, k, v, b):
            out = self._xla(q, k, v, b, nv, 0.2)
            return jnp.sum(out[:100] ** 2), out

        (l1, o1), g1 = jax.value_and_grad(f_fused, argnums=(0, 1, 2, 3),
                                          has_aux=True)(q, k, v, bias)
        (l2, o2), g2 = jax.value_and_grad(f_xla, argnums=(0, 1, 2, 3),
                                          has_aux=True)(q, k, v, bias)
        np.testing.assert_allclose(np.asarray(o1)[:100], np.asarray(o2)[:100],
                                   rtol=2e-2, atol=2e-2)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-2, atol=2e-2)

    def test_rpe_module_fused_matches_xla(self):
        """RPEMultiHeadAttention use_pallas (fused kernel, qb dropped) vs
        the XLA module on a prefix-masked input — same params."""
        from geotransformer_tpu.models.transformer import RPEMultiHeadAttention

        rng = np.random.default_rng(2)
        n, c, h = 128, 64, 4
        feats = jnp.asarray(rng.normal(size=(1, n, c)).astype(np.float32))
        embed = jnp.asarray(rng.normal(size=(1, n, n, c)).astype(np.float32))
        masks = jnp.asarray(np.arange(n) < 90)[None]
        mod_x = RPEMultiHeadAttention(c, h, use_pallas=False)
        mod_p = RPEMultiHeadAttention(c, h, use_pallas=True)
        variables = mod_x.init(jax.random.PRNGKey(0), feats, feats, feats,
                               embed, key_masks=masks)
        want, _ = mod_x.apply(variables, feats, feats, feats, embed,
                              key_masks=masks)
        got, scores = mod_p.apply(variables, feats, feats, feats, embed,
                                  key_masks=masks)
        assert scores is None
        np.testing.assert_allclose(np.asarray(got)[0, :90],
                                   np.asarray(want)[0, :90],
                                   rtol=3e-2, atol=3e-2)
