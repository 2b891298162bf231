r"""Multi-stage pyramid precompute and fixed-capacity padding.

Host-side equivalent of the reference collate precompute
(`/root/reference/geotransformer/utils/data.py:13-77`), then a TPU-specific
step the reference does not need: re-laying the stacked variable-length
arrays into **fixed-capacity padded buffers** so the jitted model sees static
shapes.

Padded layout convention (per stage, per-cloud capacity ``C``):
  * rows [0, C)      : ref cloud (first ``ref_len`` real, rest padding)
  * rows [C, 2C)     : src cloud (first ``src_len`` real, rest padding)
  * sentinel index   : ``2C`` (gathers append a shadow row there)
  * padded point coordinates are set to a large constant so they can never
    contaminate distance computations that forget a mask.

All index tables are remapped from the reference's dense stacked frame
([0, ref_len) ++ [ref_len, ref_len+src_len), sentinel = total) into this
padded frame.
"""

import os

import numpy as np

from geotransformer_tpu.preprocess.voxel import grid_subsample as _np_grid_subsample
from geotransformer_tpu.preprocess.neighbors import radius_search as _np_radius_search

PAD_COORD = 1.0e6


def _use_native():
    if os.environ.get("GEOTRANSFORMER_TPU_NATIVE", "1") == "0":
        return False
    from geotransformer_tpu import native

    return native.native_available()


def grid_subsample(points, lengths, voxel_size):
    """Dispatch to the C++ host library when built, else numpy."""
    if _use_native():
        from geotransformer_tpu import native

        return native.grid_subsample(points, lengths, voxel_size)
    return _np_grid_subsample(points, lengths, voxel_size)


def radius_search(q_points, s_points, q_lengths, s_lengths, radius, neighbor_limit):
    """Dispatch to the C++ host library when built, else scipy cKDTree."""
    if _use_native():
        from geotransformer_tpu import native

        return native.radius_search(
            q_points, s_points, q_lengths, s_lengths, radius, neighbor_limit
        )
    return _np_radius_search(q_points, s_points, q_lengths, s_lengths, radius, neighbor_limit)


def build_pyramid(points, lengths, num_stages, voxel_size, radius, neighbor_limits):
    """Stack-mode multi-stage precompute (unpadded, mirrors the reference).

    Args:
        points: (N, 3) stacked ref+src points (stage-0 resolution).
        lengths: (B,) stacked cloud sizes (for registration, B=2: [ref, src]).
        num_stages: number of pyramid stages.
        voxel_size: stage-0 voxel size; doubles per stage.
        radius: stage-0 search radius; doubles per stage.
        neighbor_limits: per-stage neighbor capacity K_i.

    Returns:
        dict with per-stage lists: points, lengths, neighbors, subsampling,
        upsampling (same structure as the reference data_dict).
    """
    assert num_stages == len(neighbor_limits)
    points = np.asarray(points, dtype=np.float32)
    lengths = np.asarray(lengths, dtype=np.int64)

    points_list, lengths_list = [], []
    for i in range(num_stages):
        if i > 0:
            points, lengths = grid_subsample(points, lengths, voxel_size=voxel_size)
        points_list.append(points)
        lengths_list.append(lengths)
        voxel_size *= 2

    neighbors_list, subsampling_list, upsampling_list = [], [], []
    for i in range(num_stages):
        cur_points, cur_lengths = points_list[i], lengths_list[i]
        neighbors_list.append(
            radius_search(cur_points, cur_points, cur_lengths, cur_lengths, radius, neighbor_limits[i])
        )
        if i < num_stages - 1:
            sub_points, sub_lengths = points_list[i + 1], lengths_list[i + 1]
            subsampling_list.append(
                radius_search(sub_points, cur_points, sub_lengths, cur_lengths, radius, neighbor_limits[i])
            )
            upsampling_list.append(
                radius_search(cur_points, sub_points, cur_lengths, sub_lengths, radius * 2, neighbor_limits[i + 1])
            )
        radius *= 2

    return {
        "points": points_list,
        "lengths": lengths_list,
        "neighbors": neighbors_list,
        "subsampling": subsampling_list,
        "upsampling": upsampling_list,
    }


def _cloud_caps(cap):
    """A stage cap is an int (symmetric per-cloud capacity) or a
    (cap_ref, cap_src) pair (asymmetric — saves padding the smaller cloud
    up to the larger one's capacity)."""
    if isinstance(cap, (tuple, list)):
        cap_r, cap_s = int(cap[0]), int(cap[1])
    else:
        cap_r = cap_s = int(cap)
    return cap_r, cap_s


def _remap_indices(indices, ref_len, src_len, cap):
    """Remap stacked-frame indices to the padded frame (sentinel -> total
    capacity: ref rows [0, cap_r), src rows [cap_r, cap_r + cap_s))."""
    cap_r, cap_s = _cloud_caps(cap)
    total = ref_len + src_len
    out = np.where(
        indices >= total,
        cap_r + cap_s,
        np.where(indices >= ref_len, indices + (cap_r - ref_len), indices),
    )
    return out.astype(np.int32)


def _pad_rows(array, ref_len, src_len, cap, fill):
    """Re-lay stacked rows [ref ++ src] into [ref pad to cap_r ++ src pad to cap_s]."""
    cap_r, cap_s = _cloud_caps(cap)
    out_shape = (cap_r + cap_s,) + array.shape[1:]
    out = np.full(out_shape, fill, dtype=array.dtype)
    out[:ref_len] = array[:ref_len]
    out[cap_r : cap_r + src_len] = array[ref_len : ref_len + src_len]
    return out


def build_inverse_table(table, num_support, j_cap):
    """Fixed-capacity inverse of a neighbor table, for the scatter-free
    KPConv backward (kernels/kpconv.kpconv_bwd_fused).

    ``table`` is a padded (M, H) neighbor table (values in [0, num_support),
    sentinel >= num_support). Returns (num_support, j_cap) int32 where row n
    lists the query rows m with n in table[m], padded with sentinel M.
    Raises if any support point's in-degree exceeds ``j_cap``.
    """
    table = np.asarray(table)
    m_rows, h = table.shape
    q_idx = np.repeat(np.arange(m_rows, dtype=np.int64), h)
    v = table.reshape(-1).astype(np.int64)
    keep = v < num_support
    v, q_idx = v[keep], q_idx[keep]
    order = np.argsort(v, kind="stable")
    v, q_idx = v[order], q_idx[order]
    counts = np.bincount(v, minlength=num_support)
    if counts.max(initial=0) > j_cap:
        raise ValueError(
            f"max in-degree {int(counts.max())} exceeds inverse capacity "
            f"{j_cap}; raise caps.inverse_limits for this stage"
        )
    seg_starts = np.cumsum(counts) - counts
    rank = np.arange(len(v)) - np.repeat(seg_starts, counts)
    inv = np.full((num_support, j_cap), m_rows, dtype=np.int32)
    inv[v, rank] = q_idx
    return inv


def build_split_tables(table, num_support, h1, m2_cap):
    """Split a padded neighbor table into head columns + a compacted tail
    (deep-column compaction, kernels/kpconv.py split section).

    The gather engine and the kernel's block reads both cost ~rows x one
    padded tile-row, and calibrated neighbor limits leave large shadow
    fractions; gathering the first ``h1`` (distance-sorted) columns for all
    queries plus the remaining columns for only the queries that HAVE more
    than ``h1`` valid neighbors cuts rows to M*h1 + M2*(H-h1) exactly.

    Args:
        table: (M, H) padded neighbor table, values < num_support are valid.
        num_support: sentinel base (total support capacity).
        h1: static head width; multiple of 8, 0 < h1 < H.
        m2_cap: static tail-row capacity (calibrated; ValueError contract
            like every other cap).

    Returns:
        (tail (m2_cap, H - h1) int32 sentinel-padded,
         tail_q (m2_cap,) int32 query row per tail row (0 on padding rows),
         tail_rank (M,) int32 query -> tail row, sentinel m2_cap).
    """
    table = np.asarray(table)
    m, h = table.shape
    if not (0 < h1 < h and h1 % 8 == 0):
        raise ValueError(f"split head width {h1} invalid for table width {h}")
    deep = (table[:, h1:] < num_support).any(axis=1)
    rows = np.nonzero(deep)[0]
    m2 = len(rows)
    if m2 > m2_cap:
        raise ValueError(
            f"{m2} deep queries exceed split capacity {m2_cap}; raise this "
            f"stage's split capacity (caps.neighbor_splits)")
    tail = np.full((m2_cap, h - h1), num_support, dtype=table.dtype)
    tail[:m2] = table[rows, h1:]
    tail_q = np.zeros(m2_cap, dtype=np.int32)
    tail_q[:m2] = rows
    rank = np.full(m, m2_cap, dtype=np.int32)
    rank[rows] = np.arange(m2, dtype=np.int32)
    return tail, tail_q, rank


def fit_split_for_table(table, num_support, multiple=128, min_saving=0.08,
                        align=None):
    """Pick a (h1, m2_cap) split for this table, or None when splitting
    saves less than ``min_saving`` of the gathered rows (the second kernel
    launch and combine-gather have fixed costs; measured on the demo pair,
    13% mean row saving across all stages nets a 6% end-to-end forward
    win, so the break-even sits below 8%).

    Cost model: rows(h1) = M*h1 + M2(h1)*(H-h1); h1 sweeps multiples of
    ``align`` (default the forward-table alignment — head and tail widths
    must both stay sublane-tile aligned; pass align=8 when fitting INVERSE
    tables, which the backward gathers at f32).
    """
    if align is None:
        align = table_align()
    table = np.asarray(table)
    m, h = table.shape
    valid = table < num_support
    best = (m * h, None)
    for h1 in range(align, h, align):
        m2 = int(valid[:, h1:].any(axis=1).sum())
        m2_cap = max(round_up(m2, multiple), multiple)
        rows = m * h1 + m2_cap * (h - h1)
        if rows < best[0]:
            best = (rows, (h1, m2_cap))
    if best[1] is None or best[0] > (1.0 - min_saving) * m * h:
        return None
    return best[1]


def pad_registration_batch(pyramid, feats, transform, stage_caps,
                           inverse_limits=None, sub_inverse_limits=None,
                           union_cap=None, union_tile=128,
                           neighbor_splits=None, subsampling_splits=None,
                           inverse_splits=None, sub_inverse_splits=None,
                           input_stream=True):
    """Convert an unpadded pyramid into a fixed-capacity PairBatch pytree.

    Args:
        pyramid: dict from :func:`build_pyramid` with B=2 clouds [ref, src].
        feats: (N0, C_in) stacked stage-0 features.
        transform: (4, 4) ground-truth transform (identity if unknown).
        stage_caps: per-stage capacity — an int C_i (symmetric: each cloud
            gets C_i rows) or a (C_i^ref, C_i^src) pair (asymmetric; saves
            padding the smaller cloud to the larger one's capacity).

    Returns:
        dict of numpy arrays (static shapes; T_i = C_i^ref + C_i^src):
          points[i]      (T_i, 3) float32
          masks[i]       (T_i,)  bool
          lengths[i]     (2,)    int32  [ref_len, src_len]
          neighbors[i]   (T_i, K_i) int32, sentinel T_i
          subsampling[i] (T_{i+1}, K_i) int32, sentinel T_i
          upsampling[i]  (T_i, K_{i+1}) int32, sentinel T_{i+1}
          features       (T_0, C_in) float32
          transform      (4, 4) float32
        With ``inverse_limits`` (a per-stage tuple of in-degree capacities
        J_i, training batches only), additionally:
          neighbors_inv[i]   (T_i, J_i) int32, sentinel T_i — inverse of
              neighbors[i] (query rows per support row)
          subsampling_inv[i] (T_i, J_{i+1}) int32, sentinel T_{i+1} —
              inverse of subsampling[i]
        consumed by the scatter-free Pallas KPConv backward.
        With ``input_stream`` (default) and 1-channel features,
        additionally ``input_stream`` (5, T_0, K_0) float32 — the
        precomputed edge stream for the gather-free input conv
        (:func:`build_input_stream`).
    """
    num_stages = len(pyramid["points"])
    assert len(stage_caps) == num_stages

    out = {"points": [], "masks": [], "lengths": [], "neighbors": [], "subsampling": [], "upsampling": []}
    ref_lens = [int(l[0]) for l in pyramid["lengths"]]
    src_lens = [int(l[1]) for l in pyramid["lengths"]]

    for i in range(num_stages):
        cap_r, cap_s = _cloud_caps(stage_caps[i])
        ref_len, src_len = ref_lens[i], src_lens[i]
        if ref_len > cap_r or src_len > cap_s:
            raise ValueError(
                f"stage {i}: cloud sizes ({ref_len}, {src_len}) exceed "
                f"capacity ({cap_r}, {cap_s})"
            )
        cap = (cap_r, cap_s)
        pts = _pad_rows(pyramid["points"][i].astype(np.float32), ref_len, src_len, cap, PAD_COORD)
        mask = np.zeros(cap_r + cap_s, dtype=bool)
        mask[:ref_len] = True
        mask[cap_r : cap_r + src_len] = True
        nbrs = _remap_indices(pyramid["neighbors"][i], ref_len, src_len, cap)
        nbrs = _pad_rows(nbrs, ref_len, src_len, cap, np.int32(cap_r + cap_s))
        nbrs = _pad_cols_to_sublane(nbrs, np.int32(cap_r + cap_s))
        out["points"].append(pts)
        out["masks"].append(mask)
        out["lengths"].append(np.asarray([ref_len, src_len], dtype=np.int32))
        out["neighbors"].append(nbrs)

    for i in range(num_stages - 1):
        cap_cur, cap_sub = _cloud_caps(stage_caps[i]), _cloud_caps(stage_caps[i + 1])
        sent_cur = np.int32(sum(cap_cur))
        sent_sub = np.int32(sum(cap_sub))
        sub = _remap_indices(pyramid["subsampling"][i], ref_lens[i], src_lens[i], cap_cur)
        sub = _pad_rows(sub, ref_lens[i + 1], src_lens[i + 1], cap_sub, sent_cur)
        # Column padding is safe for the strided KPConv (shadow columns are
        # exactly neutral) but maxpool must be told the true width: its zero
        # shadow row may only enter rows underfull within the reference's
        # neighbor limit (functional.py:54-67) — see KPConvFPN.neighbor_limits.
        out["subsampling"].append(_pad_cols_to_sublane(sub, sent_cur))
        up = _remap_indices(pyramid["upsampling"][i], ref_lens[i + 1], src_lens[i + 1], cap_sub)
        up = _pad_rows(up, ref_lens[i], src_lens[i], cap_cur, sent_sub)
        # upsampling tables are gathered at f32 (nearest/knn interpolate)
        out["upsampling"].append(_pad_cols_to_sublane(up, sent_sub, multiple=8))

    if inverse_limits is not None:
        if sub_inverse_limits is None:
            # subsampling in-degree is ~K/4 (each coarse point pools ~4 fine
            # voxels); a quarter of the neighbor inverse limit covers it
            sub_inverse_limits = tuple(
                max(16, int(l) // 4 + 8) for l in inverse_limits[:-1])
        out["neighbors_inv"] = []
        out["subsampling_inv"] = []

        def _maybe_split(inv, query_rows, spec):
            # deep-column compaction of the inverse table: the backward
            # kernel (kernels/kpconv.kpconv_bwd_fused) accepts the split
            # 4-tuple directly and runs head + compacted-tail passes
            if spec is None:
                return inv
            tail, tail_s, rank = build_split_tables(
                inv, query_rows, spec[0], spec[1])
            return (inv[:, :spec[0]], tail, tail_s, rank)

        for i in range(num_stages):
            rows = out["neighbors"][i].shape[0]
            # inverse tables drive f32 qg gathers in the backward kernel
            inv = _pad_cols_to_sublane(
                build_inverse_table(
                    out["neighbors"][i], rows, int(inverse_limits[i])),
                np.int32(rows), multiple=8)
            out["neighbors_inv"].append(_maybe_split(
                inv, rows,
                None if inverse_splits is None else inverse_splits[i]))
            if i < num_stages - 1:
                rows_sub = out["subsampling"][i].shape[0]
                sub_inv = _pad_cols_to_sublane(
                    build_inverse_table(
                        out["subsampling"][i], rows,
                        int(sub_inverse_limits[i])),
                    np.int32(rows_sub), multiple=8)
                out["subsampling_inv"].append(_maybe_split(
                    sub_inv, rows_sub,
                    None if sub_inverse_splits is None
                    else sub_inverse_splits[i]))

    if neighbor_splits is not None:
        out["neighbors_split"] = []
        for i in range(num_stages):
            spec = neighbor_splits[i]
            if spec is None:
                out["neighbors_split"].append(None)
            else:
                rows = out["neighbors"][i].shape[0]
                out["neighbors_split"].append(build_split_tables(
                    out["neighbors"][i], rows, spec[0], spec[1]))
    if subsampling_splits is not None:
        out["subsampling_split"] = []
        for i in range(num_stages - 1):
            spec = subsampling_splits[i]
            if spec is None:
                out["subsampling_split"].append(None)
            else:
                sent = out["neighbors"][i].shape[0]  # support = stage i
                out["subsampling_split"].append(build_split_tables(
                    out["subsampling"][i], sent, spec[0], spec[1]))

    if union_cap is not None:
        # stage-0 per-tile neighbor unions for the union-gather input conv
        rows0 = out["neighbors"][0].shape[0]
        out["union_rows0"], out["union_sel0"] = build_union_tables(
            out["neighbors"][0], rows0, tile=union_tile, union_cap=union_cap)

    out["features"] = _pad_rows(
        np.asarray(feats, dtype=np.float32), ref_lens[0], src_lens[0],
        _cloud_caps(stage_caps[0]), 0.0
    )
    if input_stream and out["features"].shape[1] == 1:
        out["input_stream"] = build_input_stream(
            out["points"][0], out["features"], out["neighbors"][0])
    out["transform"] = np.asarray(transform, dtype=np.float32)
    return out


def build_input_stream(points, feats, table):
    """Precomputed edge stream for the gather-free input conv
    (kernels.kpconv.kpconv_stream_fused).

    The input conv's gathered block is pure batch data — its features are
    the network input — so offsets, positive-feature flag, and feature
    value per (query, neighbor) slot are computed here (one vectorized
    fancy-index, the host analogue of the reference's collate-time
    nanoflann work, `utils/data.py:13-77`) instead of via XLA's
    row-rate-bound gather engine inside every forward.

    Args:
        points: (T0, 3) padded stage-0 points (pair frame).
        feats: (T0, 1) padded stage-0 features (c_in == 1 input layer).
        table: (T0, H) int32 stage-0 neighbor table, sentinel T0.

    Returns:
        (5, T0, H) float32 planes [off_x, off_y, off_z, posflag, feat]
        with zeros on invalid slots.
    """
    t0 = points.shape[0]
    valid = table < t0
    idx = np.where(valid, table, 0)
    s = points[idx]  # (T0, H, 3)
    off = np.where(valid[..., None], s - points[:, None, :], 0.0)
    feat_sum = np.sum(feats, axis=1)  # (T0,)
    flag = (valid & (feat_sum[idx] > 0.0)).astype(np.float32)
    featv = np.where(valid, feats[idx, 0], 0.0).astype(np.float32)
    return np.stack(
        [off[:, :, 0], off[:, :, 1], off[:, :, 2], flag, featv], axis=0
    ).astype(np.float32)


def round_up(value, multiple):
    return int(-(-value // multiple) * multiple)


def table_align():
    """Forward-table neighbor-axis alignment (kernels.kpconv.table_align):
    8 rows for f32 tables, 16 for bf16. Lazy import so pure-host pyramid
    builds in loader workers do not pay the pallas import unless needed."""
    from geotransformer_tpu.kernels.kpconv import table_align as _ta

    return _ta()


def _pad_cols_to_sublane(table, sentinel, multiple=None):
    """Pad a neighbor table's column count to a sublane-tile multiple with
    sentinels (``multiple``: default the forward-table alignment; pass 8 for
    tables only ever gathered at f32 — upsampling, inverse).

    Extra columns behave as shadow neighbors everywhere; aligning them to
    the TPU sublane tile here means no device-side jnp.pad + relayout per
    convolution (see kernels/kpconv.py).
    """
    if multiple is None:
        multiple = table_align()
    h = table.shape[1]
    h_pad = round_up(h, multiple)
    if h_pad == h:
        return table
    out = np.full((table.shape[0], h_pad), sentinel, dtype=table.dtype)
    out[:, :h] = table
    return out


def caps_for_pyramid(pyramid, multiple=128, margin=1.0, per_cloud=False):
    """Pick per-stage capacities covering this pyramid.

    Rounds cloud sizes * margin up to `multiple` (TPU lane-friendly).
    With ``per_cloud=False`` each stage gets one symmetric capacity
    (max over clouds); with ``per_cloud=True`` each stage gets a
    (cap_ref, cap_src) pair, so the smaller cloud is not padded to the
    larger one's capacity (~10% fewer backbone rows on typical pairs).
    """
    caps = []
    for lengths in pyramid["lengths"]:
        if per_cloud:
            caps.append(tuple(
                max(round_up(int(l) * margin, multiple), multiple)
                for l in lengths
            ))
        else:
            biggest = int(np.max(lengths)) * margin
            caps.append(max(round_up(biggest, multiple), multiple))
    return caps


def build_union_tables(table, num_support, tile=128, union_cap=1536):
    """Per-query-tile neighbor-union tables for the union-gather input-layer
    KPConv (kernels/kpconv.kpconv_union_input_fused).

    For each tile of `tile` query rows, collect the UNIQUE support indices
    its neighbor lists reference (the union is ~3x smaller than the edge
    count on scan-ordered clouds), so the device gathers one union block
    per tile instead of one row per edge.

    Args:
        table: (M, H) padded neighbor table, sentinel >= num_support.
        num_support: support row count (gather sentinel).
        tile: static query rows per tile (must match the kernel tile).
        union_cap: static per-tile union capacity U.

    Returns:
        union_rows: (ceil(M/tile), U) int32 support rows, sentinel
            num_support.
        sel: (M, H) int32 — position of each edge's support row within its
            tile's union, sentinel union_cap for sentinel edges.
    Raises if any tile's union exceeds `union_cap`.
    """
    table = np.asarray(table)
    m, h = table.shape
    num_tiles = -(-m // tile)
    union_rows = np.full((num_tiles, union_cap), num_support, np.int32)
    sel = np.full((m, h), union_cap, np.int32)
    for t in range(num_tiles):
        blk = table[t * tile : (t + 1) * tile]
        vals = blk[blk < num_support]
        uniq = np.unique(vals)
        if uniq.size > union_cap:
            raise ValueError(
                f"tile {t}: neighbor union {uniq.size} exceeds capacity "
                f"{union_cap}; raise the stage-0 union capacity"
            )
        union_rows[t, : uniq.size] = uniq
        pos = np.searchsorted(uniq, blk)
        pos = np.clip(pos, 0, max(uniq.size - 1, 0))
        hit = np.logical_and(blk < num_support,
                             uniq[pos] == blk if uniq.size else False)
        sel[t * tile : t * tile + blk.shape[0]] = np.where(
            hit, pos, union_cap)
    return union_rows, sel
