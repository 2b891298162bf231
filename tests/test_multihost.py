"""Multi-host data parallelism: 2 simulated hosts x 2 CPU devices each.

Launches tests/multihost_worker.py twice (jax.distributed over localhost),
each process owning a dataset shard and 2 local devices of the global
4-device mesh, and checks both hosts complete one training epoch and agree
on the psum-reduced loss. Mirrors the reference's DistributedSampler + DDP
process group (`/root/reference/geotransformer/engine/base_trainer.py:66-72`).
"""

import os
import os.path as osp
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute compiles/subprocesses


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_trainer(tmp_path):
    # NOTE: no @pytest.mark.timeout — pytest-timeout isn't installed in this
    # image (the mark would be silently inert); the communicate(timeout=)
    # below is the real hang guard.
    port = _free_port()
    worker = osp.join(osp.dirname(osp.abspath(__file__)), "multihost_worker.py")
    env = dict(os.environ)
    # the workers pick their own platform/device config before backend init
    env.pop("XLA_FLAGS", None)
    cache_dir = str(tmp_path / "jax_cache")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(tmp_path),
             cache_dir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            # contention-proof margin: ~730 s on an idle machine; CPU-loaded
            # runs measured ~3x slower, so budget well past that
            out, _ = p.communicate(timeout=2800)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {pid} failed:\n{out[-4000:]}"
    losses = []
    for out in outs:
        m = re.search(r"MULTIHOST_OK pid=\d+ step=2 loss=([0-9.]+)", out)
        assert m, f"marker missing:\n{out[-2000:]}"
        losses.append(float(m.group(1)))
    # the loss is psum-averaged over the global mesh -> identical on hosts
    assert abs(losses[0] - losses[1]) < 1e-5, losses
