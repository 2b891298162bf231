r"""Parallel input pipeline: dataset -> pyramid precompute -> padded batches.

Replaces the reference's torch DataLoader + collate workers
(`/root/reference/geotransformer/utils/data.py:220-250`,
`utils/torch.py:48-77`): a process pool runs the host-side pyramid
precompute (voxel subsample + radius search, the CPU-expensive part) while
the accelerator consumes previous batches. Sharding across hosts follows
`jax.process_index()` like the reference's DistributedSampler.
"""

import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from geotransformer_tpu.preprocess.pyramid import build_pyramid, pad_registration_batch

_WORKER_STATE = {}


def _init_worker(dataset, pipeline_cfg):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["cfg"] = pipeline_cfg


def _process_index(index):
    dataset = _WORKER_STATE["dataset"]
    cfg = _WORKER_STATE["cfg"]
    return prepare_pair(dataset[index], **cfg)


def _is_bucketed(stage_caps, num_stages):
    """Distinguish capacity *buckets* (a list of whole-pyramid cap tuples)
    from a single pyramid spec whose per-stage entries are asymmetric
    (cap_ref, cap_src) pairs."""
    if not isinstance(stage_caps[0], (list, tuple)):
        return False
    asym = (
        len(stage_caps) == num_stages
        and all(isinstance(c, (list, tuple)) and len(c) == 2 for c in stage_caps)
        and num_stages != 2
    )
    return not asym


def _fits(size, cap):
    """(ref_len, src_len) fits cap, where cap is an int or a per-cloud pair."""
    if isinstance(cap, (list, tuple)):
        return size[0] <= cap[0] and size[1] <= cap[1]
    return max(size) <= cap


def prepare_pair(
    sample,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    stage_caps,
    input_dim=1,
    inverse_limits=None,
):
    """Build + pad one registration pair from a dataset sample dict.

    Expects `sample` with 'ref_points', 'src_points' (N, 3) float arrays,
    'transform' (4, 4), and optionally 'ref_feats'/'src_feats'.
    """
    ref_points = np.asarray(sample["ref_points"], np.float32)
    src_points = np.asarray(sample["src_points"], np.float32)
    points = np.concatenate([ref_points, src_points], axis=0)
    lengths = np.asarray([len(ref_points), len(src_points)])
    pyramid = build_pyramid(
        points, lengths, num_stages, voxel_size, search_radius, list(neighbor_limits)
    )
    if _is_bucketed(stage_caps, num_stages):
        # Capacity buckets (ascending): pick the smallest bucket that fits —
        # XLA compiles one executable per bucket, so a handful of buckets
        # bounds both recompilation and padding waste (the reference's
        # calibration idea extended to whole-pyramid shapes, SURVEY §7).
        sizes = [tuple(int(x) for x in l) for l in pyramid["lengths"]]
        for bucket in stage_caps:
            if all(_fits(s, c) for s, c in zip(sizes, bucket)):
                stage_caps = tuple(bucket)
                break
        else:
            raise ValueError(
                f"pair with stage sizes {sizes} exceeds every capacity bucket "
                f"{stage_caps}"
            )
    if "ref_feats" in sample:
        feats = np.concatenate(
            [np.asarray(sample["ref_feats"], np.float32), np.asarray(sample["src_feats"], np.float32)],
            axis=0,
        )
    else:
        feats = np.ones((points.shape[0], input_dim), np.float32)
    transform = np.asarray(sample.get("transform", np.eye(4)), np.float32)
    batch = pad_registration_batch(
        pyramid, feats, transform, stage_caps, inverse_limits=inverse_limits)
    batch["meta"] = {k: v for k, v in sample.items() if isinstance(v, (str, int, float))}
    return batch


class PairLoader:
    """Iterate padded pair batches with a precompute process pool.

    Args:
        dataset: indexable returning sample dicts (must be picklable).
        pipeline_cfg: kwargs for :func:`prepare_pair`.
        batch_size: pairs per step (== number of data-parallel devices).
        shuffle: reshuffle indices per epoch (seeded, epoch-aware like the
            reference's DistributedSampler.set_epoch).
        num_workers: pool size (0 = synchronous).
        seed: base shuffle seed.
        num_shards / shard_index: host-level sharding.
        drop_last: drop the trailing incomplete batch group.
    """

    def __init__(
        self,
        dataset,
        pipeline_cfg,
        batch_size=1,
        shuffle=False,
        num_workers=0,
        seed=0,
        num_shards=1,
        shard_index=0,
        drop_last=True,
    ):
        self.dataset = dataset
        self.pipeline_cfg = dict(pipeline_cfg)
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = num_workers
        self.seed = seed
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.drop_last = drop_last
        self.epoch = 0
        self._pool = None

    def set_epoch(self, epoch):
        self.epoch = epoch

    def _indices(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
        return order[self.shard_index :: self.num_shards]

    def __len__(self):
        n = len(self._indices())
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def _ensure_pool(self):
        if self.num_workers > 0 and self._pool is None:
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_init_worker,
                initargs=(self.dataset, self.pipeline_cfg),
            )
        return self._pool

    def __iter__(self):
        indices = self._indices()
        usable = (
            len(indices) - len(indices) % self.batch_size
            if self.drop_last
            else len(indices)
        )
        indices = indices[:usable]
        if self.num_workers > 0:
            pool = self._ensure_pool()
            results = pool.map(_process_index, indices, chunksize=1)
            group = []
            for batch in results:
                group.append(batch)
                if len(group) == self.batch_size:
                    yield group
                    group = []
            if group and not self.drop_last:
                yield group
        else:
            group = []
            for i in indices:
                group.append(prepare_pair(self.dataset[int(i)], **self.pipeline_cfg))
                if len(group) == self.batch_size:
                    yield group
                    group = []
            if group and not self.drop_last:
                yield group

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None
