r"""Parallel input pipeline: dataset -> pyramid precompute -> padded batches.

Replaces the reference's torch DataLoader + collate workers
(`/root/reference/geotransformer/utils/data.py:220-250`,
`utils/torch.py:48-77`): a process pool runs the host-side pyramid
precompute (voxel subsample + radius search, the CPU-expensive part) while
the accelerator consumes previous batches. Sharding across hosts follows
`jax.process_index()` like the reference's DistributedSampler.
"""

import multiprocessing
import os
from concurrent.futures import ProcessPoolExecutor

import numpy as np

from geotransformer_tpu.preprocess.pyramid import build_pyramid, pad_registration_batch

_WORKER_STATE = {}


def _init_worker(dataset, pipeline_cfg):
    _WORKER_STATE["dataset"] = dataset
    _WORKER_STATE["cfg"] = pipeline_cfg
    if pipeline_cfg.get("precompute_targets"):
        # Target precompute runs jax-on-CPU inside this worker; pin the
        # platform before any backend init so pool workers never contend
        # for the parent's TPU (same pattern as tests/multihost_worker.py).
        import jax

        jax.config.update("jax_platforms", "cpu")


def _process_index(index):
    dataset = _WORKER_STATE["dataset"]
    cfg = _WORKER_STATE["cfg"]
    return prepare_pair(dataset[index], **cfg)


def _fetch_index(index):
    """Raw (device-preprocess) mode: the worker only reads + augments the
    sample; all pyramid work happens on device inside the step."""
    return _WORKER_STATE["dataset"][index]


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


_TARGET_FNS = {}


def _hashable_caps(stage_caps):
    return tuple(tuple(c) if isinstance(c, (list, tuple)) else int(c)
                 for c in stage_caps)


def _host_targets(model_cfg, stage_caps, batch):
    """Run :func:`..models.geotransformer.precompute_gt_targets` on the host
    CPU (jit-compiled once per capacity signature) and return numpy arrays.

    This stages the reference's no_grad geometry (`model.py:76-108`) into
    the loader next to the pyramid build, so the differentiated train step
    never recomputes partition tables / GT overlaps (~6 ms/step on chip).
    """
    import jax

    from geotransformer_tpu.models.geotransformer import precompute_gt_targets

    key = (model_cfg, _hashable_caps(stage_caps))
    fn = _TARGET_FNS.get(key)
    if fn is None:
        import dataclasses

        cfg = dataclasses.replace(
            model_cfg,
            caps=dataclasses.replace(model_cfg.caps, stage_caps=key[1]),
            # the host always computes targets with the XLA module (the
            # Pallas overlap kernel is TPU-only)
            model=dataclasses.replace(model_cfg.model, force_pallas=False),
        )
        fn = jax.jit(lambda b: precompute_gt_targets(cfg, b, with_gt=True))
        _TARGET_FNS[key] = fn
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        targets = fn({k: v for k, v in batch.items() if k != "meta"})
    return {k: np.asarray(v) for k, v in targets.items()}


def prepare_pair(
    sample,
    num_stages,
    voxel_size,
    search_radius,
    neighbor_limits,
    stage_caps,
    input_dim=1,
    inverse_limits=None,
    precompute_targets=False,
    model_cfg=None,
    neighbor_splits=None,
    subsampling_splits=None,
    inverse_splits=None,
    sub_inverse_splits=None,
    input_stream=True,
):
    """Build + pad one registration pair from a dataset sample dict.

    Expects `sample` with 'ref_points', 'src_points' (N, 3) float arrays,
    'transform' (4, 4), and optionally 'ref_feats'/'src_feats'.
    """
    if model_cfg is not None:
        # worker processes must pad tables to the config's precision point
        # (bf16 gathered tables need 16-aligned columns — configs.py)
        from geotransformer_tpu.configs import apply_precision

        apply_precision(model_cfg.precision)
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
        pyramid, feats, transform, stage_caps, inverse_limits=inverse_limits,
        neighbor_splits=neighbor_splits, subsampling_splits=subsampling_splits,
        inverse_splits=inverse_splits, sub_inverse_splits=sub_inverse_splits,
        input_stream=input_stream)
    if precompute_targets:
        if model_cfg is None:
            raise ValueError("precompute_targets=True requires model_cfg")
        batch.update(_host_targets(model_cfg, stage_caps, batch))
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
        device_plan: a ``preprocess.device.DevicePreprocessPlan`` switching
            the loader to RAW mode: workers only read/augment samples, the
            main process pads stage 0 (a memcpy) to the group's capacity
            bucket, and the consumer's jitted step builds the pyramid on
            device (zero host pyramid work — replaces the reference's
            in-worker CPU collate, `utils/data.py:13-77`).
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
        device_plan=None,
    ):
        self.dataset = dataset
        self.pipeline_cfg = dict(pipeline_cfg)
        self.device_plan = device_plan
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
            # Workers that run jax-on-CPU (precompute_targets) must be
            # spawned: forking a parent whose TPU/XLA runtime is already
            # initialized leaves dead runtime threads in the child.
            ctx = (
                multiprocessing.get_context("spawn")
                if self.pipeline_cfg.get("precompute_targets")
                else None
            )
            self._pool = ProcessPoolExecutor(
                max_workers=self.num_workers,
                initializer=_init_worker,
                initargs=(self.dataset, self.pipeline_cfg),
                mp_context=ctx,
            )
        return self._pool

    def _pad_raw_group(self, samples):
        """Pick the smallest bucket whose stage-0 capacity fits every member
        (group members must share shapes to stack on the device axis), then
        pad each sample into that bucket's stage-0 frame."""
        from geotransformer_tpu.preprocess.device import prepare_raw_pair

        plan = self.device_plan
        bucket = max(
            plan.bucket_for_lengths(len(s["ref_points"]), len(s["src_points"]))
            for s in samples
        )
        cap0 = plan.buckets[bucket][0]
        input_dim = self.pipeline_cfg.get("input_dim", 1)
        return [prepare_raw_pair(s, cap0, input_dim) for s in samples]

    def __iter__(self):
        indices = self._indices()
        usable = (
            len(indices) - len(indices) % self.batch_size
            if self.drop_last
            else len(indices)
        )
        indices = indices[:usable]
        raw = self.device_plan is not None
        if self.num_workers > 0:
            pool = self._ensure_pool()
            worker = _fetch_index if raw else _process_index
            results = pool.map(worker, indices, chunksize=1)
        else:
            results = (
                self.dataset[int(i)] if raw
                else prepare_pair(self.dataset[int(i)], **self.pipeline_cfg)
                for i in indices
            )
        group = []
        for item in results:
            group.append(item)
            if len(group) == self.batch_size:
                yield self._pad_raw_group(group) if raw else group
                group = []
        if group and not self.drop_last:
            yield self._pad_raw_group(group) if raw else group

    def close(self):
        if self._pool is not None:
            self._pool.shutdown()
            self._pool = None
