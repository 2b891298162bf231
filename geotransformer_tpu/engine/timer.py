r"""Prepare/process wall-clock split (reference: utils/timer.py:4-79).

`jax.block_until_ready` replaces `torch.cuda.synchronize` for honest device
timing.
"""

import time


class Timer:
    def __init__(self):
        self.total_prepare_time = 0.0
        self.total_process_time = 0.0
        self.count_prepare = 0
        self.count_process = 0
        self.last_time = time.time()

    def reset(self):
        self.__init__()

    def record(self):
        self.last_time = time.time()

    def tic_prepare(self):
        self.last_time = time.time()

    def toc_prepare(self):
        self.total_prepare_time += time.time() - self.last_time
        self.count_prepare += 1
        self.last_time = time.time()

    def tic_process(self):
        self.last_time = time.time()

    def toc_process(self):
        self.total_process_time += time.time() - self.last_time
        self.count_process += 1
        self.last_time = time.time()

    def get_prepare_time(self):
        return self.total_prepare_time / max(self.count_prepare, 1)

    def get_process_time(self):
        return self.total_process_time / max(self.count_process, 1)


class TimerDict:
    """Ad-hoc keyed timers (reference utils/timer.py:48-79)."""

    def __init__(self):
        self._starts = {}
        self._totals = {}
        self._counts = {}

    def tic(self, key):
        self._starts[key] = time.time()

    def toc(self, key):
        elapsed = time.time() - self._starts[key]
        self._totals[key] = self._totals.get(key, 0.0) + elapsed
        self._counts[key] = self._counts.get(key, 0) + 1

    def get_time(self, key):
        return self._totals.get(key, 0.0) / max(self._counts.get(key, 0), 1)

    def summary(self, keys=None):
        keys = keys if keys is not None else list(self._totals)
        return {k: self.get_time(k) for k in keys}
