"""Asymmetric per-cloud capacities: layout + full-model parity vs symmetric.

Padding is masked out everywhere, so the same pair padded with
(cap_ref, cap_src) pairs must produce exactly the same valid outputs as the
symmetric layout — only cheaper (the smaller cloud is not padded to the
larger one's capacity).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from geotransformer_tpu.configs import make_3dmatch_config
from geotransformer_tpu.models import create_model
from geotransformer_tpu.preprocess import (
    build_pyramid, caps_for_pyramid, pad_registration_batch,
)


@pytest.fixture(scope="module")
def pair():
    rng = np.random.default_rng(11)
    xy = rng.uniform(0, 1, (2600, 2)).astype(np.float32)
    z = 0.2 * np.sin(5 * xy[:, 0]) * np.cos(4 * xy[:, 1])
    ref = np.column_stack([xy, z]).astype(np.float32)
    src = ref[ref[:, 0] < 0.55]  # markedly smaller src cloud
    pts = np.concatenate([ref, src], 0)
    lengths = np.asarray([len(ref), len(src)])
    cfg = make_3dmatch_config()
    pyr = build_pyramid(
        pts, lengths, 4, cfg.backbone.init_voxel_size, cfg.backbone.init_radius,
        list(cfg.caps.neighbor_limits))
    feats = np.ones((pts.shape[0], 1), np.float32)
    return cfg, pyr, feats


class TestAsymPadding:
    def test_layout_matches_symmetric(self, pair):
        cfg, pyr, feats = pair
        sym = caps_for_pyramid(pyr, multiple=64)
        asym = caps_for_pyramid(pyr, multiple=64, per_cloud=True)
        assert all(a[1] <= s for a, s in zip(asym, sym))
        assert any(a[1] < s for a, s in zip(asym, sym))  # src really smaller
        eye = np.eye(4, dtype=np.float32)
        b_sym = pad_registration_batch(pyr, feats, eye, sym)
        b_asym = pad_registration_batch(pyr, feats, eye, asym)
        for i, ((cr, cs), s_cap) in enumerate(zip(asym, sym)):
            r_len, s_len = b_sym["lengths"][i]
            assert b_asym["points"][i].shape[0] == cr + cs
            # valid rows identical
            np.testing.assert_array_equal(
                b_asym["points"][i][:r_len], b_sym["points"][i][:r_len])
            np.testing.assert_array_equal(
                b_asym["points"][i][cr:cr + s_len],
                b_sym["points"][i][s_cap:s_cap + s_len])
            assert b_asym["masks"][i].sum() == b_sym["masks"][i].sum()
            # neighbor tables remap to the asym frame consistently: gather
            # the coords through each table — identical where valid
            def resolve(batch, table, stage):
                pts_pad = np.concatenate(
                    [batch["points"][stage], np.zeros((1, 3), np.float32)], 0)
                return pts_pad[np.minimum(table, pts_pad.shape[0] - 1)]
            ra = resolve(b_asym, b_asym["neighbors"][i][:r_len], i)
            rs = resolve(b_sym, b_sym["neighbors"][i][:r_len], i)
            np.testing.assert_array_equal(ra, rs)

    def test_overflow_check(self, pair):
        cfg, pyr, feats = pair
        asym = caps_for_pyramid(pyr, multiple=64, per_cloud=True)
        bad = [(64, c[1]) for c in asym]
        with pytest.raises(ValueError):
            pad_registration_batch(pyr, feats, np.eye(4, dtype=np.float32), bad)


class TestAsymModelParity:
    @pytest.mark.slow
    def test_forward_matches_symmetric(self, pair):
        cfg, pyr, feats = pair
        sym = tuple(caps_for_pyramid(pyr, multiple=64))
        asym = tuple(caps_for_pyramid(pyr, multiple=64, per_cloud=True))
        eye = np.eye(4, dtype=np.float32)
        outs = {}
        for name, caps in (("sym", sym), ("asym", asym)):
            c = cfg.with_caps(stage_caps=caps)
            batch = jax.tree.map(
                jnp.asarray,
                pad_registration_batch(pyr, feats, eye, caps))
            model = create_model(c)
            variables = model.init(
                jax.random.PRNGKey(0), batch, training=False, with_gt=True)
            outs[name] = jax.tree.map(
                np.asarray,
                model.apply(variables, batch, training=False, with_gt=True))
        a, s = outs["asym"], outs["sym"]
        np.testing.assert_allclose(
            a["estimated_transform"], s["estimated_transform"],
            rtol=1e-4, atol=1e-5)
        # per-cloud features: identical on valid rows
        for side in ("ref", "src"):
            m = a[f"{side}_masks_c"]
            ms = s[f"{side}_masks_c"]
            np.testing.assert_array_equal(m.sum(), ms.sum())
            np.testing.assert_allclose(
                a[f"{side}_feats_c"][m], s[f"{side}_feats_c"][ms],
                rtol=1e-4, atol=1e-5)
            mf = a[f"{side}_masks_f"]
            msf = s[f"{side}_masks_f"]
            np.testing.assert_allclose(
                a[f"{side}_feats_f"][mf], s[f"{side}_feats_f"][msf],
                rtol=1e-4, atol=1e-5)
