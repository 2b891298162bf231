r"""Data-driven static-shape calibration.

Generalizes the reference neighbor-limit calibration
(`/root/reference/geotransformer/utils/data.py:192-217`) — which picks the
neighbor capacity covering `keep_ratio` of the empirical neighbor-count
histogram — to also calibrate per-stage point capacities, which the TPU
pipeline needs for padding buckets.
"""

import numpy as np

from geotransformer_tpu.preprocess.pyramid import (
    build_pyramid, round_up, table_align,
)


def calibrate_neighbor_limits(
    sample_iter,
    num_stages,
    voxel_size,
    search_radius,
    keep_ratio=0.8,
    sample_threshold=2000,
):
    """Histogram neighbor counts over dataset samples; pick per-stage limits.

    Args:
        sample_iter: iterable yielding dicts with 'ref_points', 'src_points'
            (numpy (N,3)) — same fields the datasets emit.
        num_stages / voxel_size / search_radius: pyramid parameters.
        keep_ratio: quantile of neighborhoods fully covered by the limit.
        sample_threshold: stop once every stage has this many samples.

    Returns:
        list of per-stage neighbor limits (ints).
    """
    hist_n = int(np.ceil(4 / 3 * np.pi * (search_radius / voxel_size + 1) ** 3))
    neighbor_hists = np.zeros((num_stages, hist_n), dtype=np.int64)
    max_limits = [hist_n] * num_stages

    for sample in sample_iter:
        points = np.concatenate([sample["ref_points"], sample["src_points"]], axis=0)
        lengths = np.asarray([len(sample["ref_points"]), len(sample["src_points"])])
        pyramid = build_pyramid(points, lengths, num_stages, voxel_size, search_radius, max_limits)
        counts = [
            np.sum(neighbors < neighbors.shape[0], axis=1)
            for neighbors in pyramid["neighbors"]
        ]
        hists = [np.bincount(c, minlength=hist_n)[:hist_n] for c in counts]
        neighbor_hists += np.vstack(hists)
        if np.min(np.sum(neighbor_hists, axis=1)) > sample_threshold:
            break

    cum_sum = np.cumsum(neighbor_hists.T, axis=0)
    limits = np.sum(cum_sum < (keep_ratio * cum_sum[hist_n - 1, :]), axis=0)
    return [int(x) for x in limits]


def calibrate_stage_caps(
    sample_iter,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    num_samples=64,
    quantile=1.0,
    multiple=256,
):
    """Measure per-stage cloud sizes over samples; pick padded capacities.

    Returns a list of per-stage per-cloud capacities (ints, multiples of
    `multiple`) covering the `quantile` of observed sizes.
    """
    sizes = [[] for _ in range(num_stages)]
    for n, sample in enumerate(sample_iter):
        if n >= num_samples:
            break
        points = np.concatenate([sample["ref_points"], sample["src_points"]], axis=0)
        lengths = np.asarray([len(sample["ref_points"]), len(sample["src_points"])])
        pyramid = build_pyramid(points, lengths, num_stages, voxel_size, search_radius, neighbor_limits)
        for i, stage_lengths in enumerate(pyramid["lengths"]):
            sizes[i].append(int(np.max(stage_lengths)))
    caps = []
    for stage_sizes in sizes:
        target = float(np.quantile(np.asarray(stage_sizes), quantile))
        caps.append(max(round_up(target, multiple), multiple))
    return caps


def calibrate_stage_cap_buckets(
    sample_iter,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    num_buckets=3,
    num_samples=64,
    multiple=256,
):
    """Per-stage capacity *buckets* for bounded recompilation.

    Samples pyramid sizes, splits samples into `num_buckets` groups by
    stage-0 size, and returns an ascending list of per-stage cap tuples —
    each covering every sample in its group (the largest bucket covers the
    observed maximum). Feed the list to :class:`PairLoader` via
    ``pipeline_cfg['stage_caps']``; each pair is padded to the smallest
    bucket that fits, so XLA compiles at most `num_buckets` executables
    instead of one per distinct cloud size.
    """
    per_sample = []
    for n, sample in enumerate(sample_iter):
        if n >= num_samples:
            break
        points = np.concatenate([sample["ref_points"], sample["src_points"]], axis=0)
        lengths = np.asarray([len(sample["ref_points"]), len(sample["src_points"])])
        pyramid = build_pyramid(
            points, lengths, num_stages, voxel_size, search_radius, neighbor_limits
        )
        per_sample.append([int(np.max(l)) for l in pyramid["lengths"]])
    per_sample.sort(key=lambda s: s[0])
    per_sample = np.asarray(per_sample)  # (S, num_stages)
    groups = np.array_split(per_sample, num_buckets)
    buckets = []
    for g in groups:
        if len(g) == 0:
            continue
        caps = tuple(
            max(round_up(int(m), multiple), multiple) for m in g.max(axis=0)
        )
        if buckets and all(c <= p for c, p in zip(caps, buckets[-1])):
            continue  # degenerate group, already covered
        # keep buckets nested so "first fit" is also "smallest fit"
        if buckets:
            caps = tuple(max(c, p) for c, p in zip(caps, buckets[-1]))
        buckets.append(caps)
    return buckets


def calibrate_split_specs(
    sample_iter,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    num_samples=64,
    multiple=128,
    headroom=0.1,
    min_saving=0.08,
):
    """Dataset-level neighbor-table split specs (deep-column compaction).

    For each per-stage neighbor table and each inter-stage subsampling
    table, sweeps head widths ``h1`` (multiples of 8) and records the
    dataset maximum of M2(h1) — queries with more than ``h1`` valid
    (distance-sorted) neighbors. Picks the ``h1`` minimizing the
    worst-case gathered rows ``M*h1 + M2_cap*(W - h1)`` (the split
    kernel's cost, kernels/kpconv.py split section); a stage whose best
    split saves less than ``min_saving`` of the full-table rows gets
    ``None`` (the two kernel launches and the combine-gather have fixed
    costs — a measured 13% mean row saving nets 6% end-to-end on the TPU
    bench pair, so break-even sits below 8%).

    Returns:
        (neighbor_splits, subsampling_splits): per-stage lists of
        ``(h1, m2_cap)`` or ``None`` for ``CapsConfig`` /
        ``pad_registration_batch``. ``m2_cap`` carries ``headroom``
        relative margin (scene-density skew) and is rounded to
        ``multiple``; overflow at batch build raises ValueError like
        every other capacity.
    """
    align = table_align()
    nb_w = [round_up(int(l), align) for l in neighbor_limits]
    nb_m2 = [dict() for _ in range(num_stages)]
    sub_m2 = [dict() for _ in range(max(num_stages - 1, 0))]
    nb_rows = [0] * num_stages
    sub_rows = [0] * max(num_stages - 1, 0)
    for n, sample in enumerate(sample_iter):
        if n >= num_samples:
            break
        points = np.concatenate([sample["ref_points"], sample["src_points"]], axis=0)
        lengths = np.asarray([len(sample["ref_points"]), len(sample["src_points"])])
        pyramid = build_pyramid(
            points, lengths, num_stages, voxel_size, search_radius, neighbor_limits
        )
        totals = [int(np.sum(l)) for l in pyramid["lengths"]]
        for tables, m2s, rows, supports in (
            (pyramid["neighbors"], nb_m2, nb_rows, list(range(num_stages))),
            (pyramid["subsampling"], sub_m2, sub_rows, list(range(num_stages - 1))),
        ):
            for i, table in enumerate(tables):
                vc = np.sum(table < totals[supports[i]], axis=1)
                rows[i] = max(rows[i], len(vc))
                for h1 in range(align, nb_w[supports[i]], align):
                    m2 = int(np.sum(vc > h1))
                    m2s[i][h1] = max(m2s[i].get(h1, 0), m2)

    def pick(m2_by_h1, m_rows, width):
        best_rows, best = m_rows * width, None
        for h1, m2 in m2_by_h1.items():
            m2_cap = max(round_up(int(m2 * (1 + headroom)), multiple), multiple)
            m2_cap = min(m2_cap, m_rows)
            rows = m_rows * h1 + m2_cap * (width - h1)
            if rows < best_rows:
                best_rows, best = rows, (h1, m2_cap)
        if best is None or best_rows > (1.0 - min_saving) * m_rows * width:
            return None
        return best

    nb_specs = [pick(nb_m2[i], nb_rows[i], nb_w[i]) for i in range(num_stages)]
    sub_specs = [
        pick(sub_m2[i], sub_rows[i], nb_w[i]) for i in range(num_stages - 1)
    ]
    return nb_specs, sub_specs


def calibrate_inverse_limits(
    sample_iter,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    num_samples=64,
    margin=8,
    multiple=8,
):
    """Measure neighbor-table in-degrees; pick inverse-table capacities.

    The scatter-free KPConv backward (kernels/kpconv.kpconv_bwd_fused)
    needs a static per-stage bound J on how many queries can list one
    support point as a neighbor. Radius-graph in-degree is ~2x the
    (truncated) out-degree at the skew tail, so the config default is
    2 * neighbor_limit; this measures the actual dataset maximum + margin.

    Returns (inverse_limits, sub_inverse_limits): per-stage bounds for the
    same-stage neighbor tables and per-link bounds for the subsampling
    tables (``caps.inverse_limits`` / ``pad_registration_batch`` args).
    """
    nb_max = np.zeros(num_stages, dtype=np.int64)
    sub_max = np.zeros(max(num_stages - 1, 0), dtype=np.int64)
    for n, sample in enumerate(sample_iter):
        if n >= num_samples:
            break
        points = np.concatenate([sample["ref_points"], sample["src_points"]], axis=0)
        lengths = np.asarray([len(sample["ref_points"]), len(sample["src_points"])])
        pyramid = build_pyramid(
            points, lengths, num_stages, voxel_size, search_radius, neighbor_limits
        )
        totals = [int(np.sum(l)) for l in pyramid["lengths"]]
        for i, table in enumerate(pyramid["neighbors"]):
            v = table[table < totals[i]]
            deg = np.bincount(v, minlength=totals[i])
            nb_max[i] = max(nb_max[i], int(deg.max(initial=0)))
        for i, table in enumerate(pyramid["subsampling"]):
            v = table[table < totals[i]]
            deg = np.bincount(v, minlength=totals[i])
            sub_max[i] = max(sub_max[i], int(deg.max(initial=0)))
    inv = [round_up(int(m) + margin, multiple) for m in nb_max]
    sub = [round_up(int(m) + margin, multiple) for m in sub_max]
    return inv, sub
