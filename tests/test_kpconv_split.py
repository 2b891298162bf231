"""Split-table (deep-column compaction) KPConv vs the full-table paths.

The split must be EXACT: head + compacted tail covers the same neighbor
set, so outputs, counts, pooled features, and parameter/feature gradients
must match the unsplit fused kernel (which itself is parity-tested against
the XLA module).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.kernels.kpconv import (
    kpconv_fused,
    kpconv_split_fused,
    kpconv_split_diff,
    kpconv_split_input_diff,
    kpconv_split_pool_diff,
    kpconv_fused_diff,
    kpconv_inv_fused_diff,
    kpconv_pool_inv_fused_diff,
)
from geotransformer_tpu.preprocess.pyramid import (
    build_split_tables,
    fit_split_for_table,
    build_inverse_table,
)


def _make_problem(rng, m=96, n=120, h=24, c_in=8, c_out=16, k=5,
                  skew=True):
    """Random conv problem with a skewed valid-count distribution (some
    queries nearly empty, some full), sentinel n."""
    q_points = rng.uniform(0, 1, (m, 3)).astype(np.float32)
    s_points = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    s_feats = rng.normal(size=(n, c_in)).astype(np.float32)
    table = np.full((m, h), n, np.int32)
    for i in range(m):
        vc = rng.integers(0, h + 1) if skew else h
        table[i, :vc] = rng.choice(n, size=vc, replace=False)
    kernel_points = rng.normal(size=(k, 3)).astype(np.float32) * 0.3
    weights = rng.normal(size=(k, c_in, c_out)).astype(np.float32) * 0.2
    bias = rng.normal(size=(c_out,)).astype(np.float32)
    return (jnp.asarray(s_feats), jnp.asarray(q_points),
            jnp.asarray(s_points), jnp.asarray(table),
            jnp.asarray(kernel_points), jnp.asarray(weights),
            jnp.asarray(bias))


def _split(table, n, h1, m2_cap=None):
    t = np.asarray(table)
    if m2_cap is None:
        m2_cap = int((t[:, h1:] < n).any(1).sum()) + 8
    tail, tail_q, rank = build_split_tables(t, n, h1, m2_cap)
    return jnp.asarray(tail), jnp.asarray(tail_q), jnp.asarray(rank)


class TestSplitForward:
    def test_matches_full(self, rng):
        args = _make_problem(rng)
        s_feats, q, s, table, kp, w, bias = args
        full = kpconv_fused(s_feats, q, s, table, kp, w, 0.3, bias=bias)
        tail, tq, rank = _split(table, s.shape[0], 8)
        head = table[:, :8]
        out, count = kpconv_split_fused(
            s_feats, q, s, head, tail, tq, rank, kp, w, 0.3, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)

    def test_all_shallow_and_all_deep(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng, skew=False)
        n = s.shape[0]
        full = kpconv_fused(s_feats, q, s, table, kp, w, 0.3, bias=bias)
        # every query deep
        tail, tq, rank = _split(table, n, 16)
        out, _ = kpconv_split_fused(
            s_feats, q, s, table[:, :16], tail, tq, rank, kp, w, 0.3,
            bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)
        # no query deep: truncate the table to the head width
        shallow = np.asarray(table).copy()
        shallow[:, 8:] = n
        full_s = kpconv_fused(s_feats, q, s, jnp.asarray(shallow), kp, w,
                              0.3, bias=bias)
        tail, tq, rank = _split(shallow, n, 8)
        out, _ = kpconv_split_fused(
            s_feats, q, s, jnp.asarray(shallow[:, :8]), tail, tq, rank,
            kp, w, 0.3, bias=bias)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full_s),
                                   rtol=1e-4, atol=1e-5)

    def test_pool_matches_full(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        pool_feats = jnp.asarray(
            rng.normal(size=(s.shape[0], 6)).astype(np.float32))
        full, full_pool = kpconv_fused(
            s_feats, q, s, table, kp, w, 0.3, bias=bias,
            pool_feats=pool_feats, pool_cols=20)
        tail, tq, rank = _split(table, s.shape[0], 8)
        out, pooled, _ = kpconv_split_fused(
            s_feats, q, s, table[:, :8], tail, tq, rank, kp, w, 0.3,
            bias=bias, pool_feats=pool_feats, pool_cols=20)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(pooled), np.asarray(full_pool),
                                   rtol=1e-5, atol=0)

    def test_input_layer_t1(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng, c_in=1)
        full = kpconv_fused(s_feats, q, s, table, kp, w, 0.3, bias=bias)
        tail, tq, rank = _split(table, s.shape[0], 8)
        out = kpconv_split_input_diff(
            s_feats, q, s, table[:, :8], tail, tq, rank, kp, w, 0.3, bias,
            64)
        np.testing.assert_allclose(np.asarray(out), np.asarray(full),
                                   rtol=1e-4, atol=1e-5)


class TestSplitGradients:
    def _grads(self, fn, s_feats, w, bias):
        def loss(sf, ww, bb):
            return jnp.sum(fn(sf, ww, bb) ** 2)
        return jax.grad(loss, argnums=(0, 1, 2))(s_feats, w, bias)

    def test_inverse_backward_matches_unsplit(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        n = s.shape[0]
        inv = jnp.asarray(build_inverse_table(np.asarray(table), n, 32))
        tail, tq, rank = _split(table, n, 8)
        head = table[:, :8]

        ref = self._grads(
            lambda sf, ww, bb: kpconv_inv_fused_diff(
                sf, q, s, table, inv, kp, ww, 0.3, bb, 64),
            s_feats, w, bias)
        got = self._grads(
            lambda sf, ww, bb: kpconv_split_diff(
                sf, q, s, head, tail, tq, rank, inv, kp, ww, 0.3, bb, 64),
            s_feats, w, bias)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_residual_backward_matches_unsplit(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        tail, tq, rank = _split(table, s.shape[0], 8)
        head = table[:, :8]
        ref = self._grads(
            lambda sf, ww, bb: kpconv_fused_diff(
                sf, q, s, table, kp, ww, 0.3, bb, 64),
            s_feats, w, bias)
        got = self._grads(
            lambda sf, ww, bb: kpconv_split_diff(
                sf, q, s, head, tail, tq, rank, None, kp, ww, 0.3, bb, 64),
            s_feats, w, bias)
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)

    def test_pool_backward_matches_unsplit(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        n = s.shape[0]
        pool_feats = jnp.asarray(
            rng.normal(size=(n, 6)).astype(np.float32))
        inv = jnp.asarray(build_inverse_table(np.asarray(table), n, 32))
        tail, tq, rank = _split(table, n, 8)
        head = table[:, :8]

        def g(fn):
            def loss(sf, pf, ww, bb):
                out, pooled = fn(sf, pf, ww, bb)
                return jnp.sum(out ** 2) + jnp.sum(pooled ** 2)
            return jax.grad(loss, argnums=(0, 1, 2, 3))(
                s_feats, pool_feats, w, bias)

        ref = g(lambda sf, pf, ww, bb: kpconv_pool_inv_fused_diff(
            sf, pf, q, s, table, inv, kp, ww, 0.3, bb, 64, 20))
        got = g(lambda sf, pf, ww, bb: kpconv_split_pool_diff(
            sf, pf, q, s, head, tail, tq, rank, inv, kp, ww, 0.3, bb, 64,
            20))
        for a, b in zip(ref, got):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                       rtol=1e-4, atol=1e-5)


class TestInverseSplit:
    """Split inverse tables: the backward's two-pass combine must match the
    single-pass inverse backward exactly (same kernel, disjoint edge sets,
    f32 accumulation)."""

    def _split_inv(self, inv, sentinel, j1):
        inv = np.asarray(inv)
        m2 = int((inv[:, j1:] < sentinel).any(1).sum()) + 8
        tail, tail_s, rank = build_split_tables(inv, sentinel, j1, m2)
        return (jnp.asarray(inv[:, :j1]), jnp.asarray(tail),
                jnp.asarray(tail_s), jnp.asarray(rank))

    def test_inv_split_gradients_match(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        n = s.shape[0]
        inv = build_inverse_table(np.asarray(table), n, 32)
        split = self._split_inv(inv, table.shape[0], 8)

        def grads(inv_arg):
            def loss(sf, ww, bb):
                return jnp.sum(kpconv_inv_fused_diff(
                    sf, q, s, table, inv_arg, kp, ww, 0.3, bb, 64) ** 2)
            return jax.grad(loss, argnums=(0, 1, 2))(s_feats, w, bias)

        ref = grads(jnp.asarray(inv))
        got = grads(split)
        for a, b in zip(ref, got):
            # the kernel rounds its u contraction to bf16 before the weight
            # matmuls; the split rounds per-pass partials separately —
            # bf16-class deviation, same accuracy class as the kernel
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-9
            assert np.abs(a - b).max() / scale < 2e-2

    def test_inv_split_pool_gradients_match(self, rng):
        s_feats, q, s, table, kp, w, bias = _make_problem(rng)
        n = s.shape[0]
        pool_feats = jnp.asarray(
            rng.normal(size=(n, 6)).astype(np.float32))
        inv = build_inverse_table(np.asarray(table), n, 32)
        split = self._split_inv(inv, table.shape[0], 16)

        def grads(inv_arg):
            def loss(sf, pf, ww, bb):
                out, pooled = kpconv_pool_inv_fused_diff(
                    sf, pf, q, s, table, inv_arg, kp, ww, 0.3, bb, 64, 20)
                return jnp.sum(out ** 2) + jnp.sum(pooled ** 2)
            return jax.grad(loss, argnums=(0, 1, 2, 3))(
                s_feats, pool_feats, w, bias)

        ref = grads(jnp.asarray(inv))
        got = grads(split)
        for a, b in zip(ref, got):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-9
            assert np.abs(a - b).max() / scale < 2e-2

    def test_batch_builder_emits_split_inverse(self, rng):
        from geotransformer_tpu.preprocess import (
            build_pyramid, pad_registration_batch,
        )
        ref = rng.uniform(0, 1, (600, 3)).astype(np.float32)
        src = rng.uniform(0, 1, (500, 3)).astype(np.float32)
        points = np.concatenate([ref, src], 0)
        lengths = np.asarray([len(ref), len(src)])
        pyr = build_pyramid(points, lengths, 3, 0.05, 0.125, [16, 16, 16])
        caps = (1024, 512, 256)
        b = pad_registration_batch(
            pyr, np.ones((len(points), 1), np.float32),
            np.eye(4, dtype=np.float32), caps,
            inverse_limits=(48, 48, 48),
            inverse_splits=((8, 2048), None, (8, 512)),
            sub_inverse_splits=((8, 2048), None))
        assert isinstance(b["neighbors_inv"][0], tuple)
        assert not isinstance(b["neighbors_inv"][1], tuple)
        assert isinstance(b["subsampling_inv"][0], tuple)
        # head width + tail width == full padded width
        head, tail, tail_s, rank = b["neighbors_inv"][0]
        full = pad_registration_batch(
            pyr, np.ones((len(points), 1), np.float32),
            np.eye(4, dtype=np.float32), caps,
            inverse_limits=(48, 48, 48))["neighbors_inv"][0]
        assert head.shape[1] + tail.shape[1] == full.shape[1]
        np.testing.assert_array_equal(head, full[:, :head.shape[1]])


class TestProductionWiring:
    def test_calibrate_split_specs(self, rng):
        from geotransformer_tpu.preprocess import calibrate_split_specs

        def samples():
            for _ in range(4):
                ref = rng.uniform(0, 1, (900, 3)).astype(np.float32)
                src = rng.uniform(0, 1, (800, 3)).astype(np.float32)
                yield {"ref_points": ref, "src_points": src}

        nb, sub = calibrate_split_specs(
            samples(), 3, 0.05, 0.125, [16, 16, 16], multiple=8)
        assert len(nb) == 3 and len(sub) == 2
        for spec in nb + sub:
            if spec is not None:
                h1, m2 = spec
                assert h1 % 8 == 0 and 0 < h1 < 16 and m2 % 8 == 0

    @pytest.mark.slow

    def test_prepare_pair_split_model_parity(self, rng):
        """Full model (interpret-mode Pallas kernels) on a prepare_pair
        batch with config-driven splits vs the same batch without."""
        from geotransformer_tpu.configs import make_3dmatch_config
        from geotransformer_tpu.preprocess.loader import prepare_pair
        from geotransformer_tpu.models import create_model

        xy = rng.uniform(0, 1, (1000, 2)).astype(np.float32)
        z = 0.15 * np.sin(6 * xy[:, 0]) * np.cos(5 * xy[:, 1])
        ref = np.column_stack([xy, z]).astype(np.float32)
        keep = ref[:, 0] < 0.75
        src = ref[keep] + 0.003 * rng.normal(size=(int(keep.sum()), 3)).astype(np.float32)
        sample = {"ref_points": ref, "src_points": src.astype(np.float32),
                  "transform": np.eye(4, dtype=np.float32)}

        cfg = make_3dmatch_config().with_caps(
            stage_caps=(2048, 640, 192, 64), correspondence_capacity=1024,
            gt_candidates=32,
            neighbor_splits=((8, 4096), None, (8, 384), None),
            subsampling_splits=(None, (8, 384), (8, 128)),
        )
        pipe = dict(num_stages=4, voxel_size=cfg.backbone.init_voxel_size,
                    search_radius=cfg.backbone.init_radius,
                    neighbor_limits=cfg.caps.neighbor_limits,
                    stage_caps=cfg.caps.stage_caps)
        b0 = prepare_pair(sample, **pipe)
        b1 = prepare_pair(sample, **pipe,
                          neighbor_splits=cfg.caps.neighbor_splits,
                          subsampling_splits=cfg.caps.subsampling_splits)
        assert "neighbors_split" in b1 and b1["neighbors_split"][0] is not None
        b0.pop("meta"); b1.pop("meta")
        b0 = jax.tree.map(jnp.asarray, b0)
        b1 = jax.tree.map(jnp.asarray, b1)

        model = create_model(cfg.with_model(force_pallas=True))
        variables = model.init(jax.random.PRNGKey(0), b0, training=False,
                               with_gt=False)
        out0 = model.apply(variables, b0, training=False, with_gt=False)
        out1 = model.apply(variables, b1, training=False, with_gt=False)
        f0 = np.asarray(out0["ref_feats_c"])
        f1 = np.asarray(out1["ref_feats_c"])
        # split changes f32 accumulation order (head+tail vs full-table sum)
        # under the kernels' bf16 inputs; drift amplifies through 4 stages +
        # transformer — 2e-3 relative bounds it with margin
        scale = np.abs(f0).max() + 1e-9
        assert np.abs(f0 - f1).max() / scale < 2e-3


class TestBuildSplitTables:
    def test_roundtrip_covers_all_edges(self, rng):
        n = 50
        table = np.full((40, 16), n, np.int32)
        for i in range(40):
            vc = rng.integers(0, 17)
            table[i, :vc] = rng.choice(n, size=vc, replace=False)
        tail, tail_q, rank = build_split_tables(table, n, 8, 48)
        rebuilt = set()
        for q_row, row in enumerate(table):
            for v in row:
                if v < n:
                    rebuilt.add((q_row, int(v)))
        got = set()
        for q_row, row in enumerate(table[:, :8]):
            for v in row:
                if v < n:
                    got.add((q_row, int(v)))
        for r in range(48):
            for v in tail[r]:
                if v < n:
                    got.add((int(tail_q[r]), int(v)))
        assert got == rebuilt
        # rank consistency
        for q_row in range(40):
            if rank[q_row] < 48:
                assert tail_q[rank[q_row]] == q_row

    def test_overflow_raises(self):
        table = np.zeros((16, 16), np.int32)  # every query fully deep
        with pytest.raises(ValueError):
            build_split_tables(table, 50, 8, 8)

    def test_fit_split(self, rng):
        n = 200
        table = np.full((256, 40), n, np.int32)
        for i in range(256):
            vc = rng.integers(0, 10)  # sparse: big saving available
            table[i, :vc] = rng.choice(n, size=vc, replace=False)
        spec = fit_split_for_table(table, n, multiple=8)
        assert spec is not None
        h1, m2_cap = spec
        assert h1 % 8 == 0 and 0 < h1 < 40
        # dense table: no worthwhile split
        dense = rng.integers(0, n, (256, 40)).astype(np.int32)
        assert fit_split_for_table(dense, n, multiple=8) is None
