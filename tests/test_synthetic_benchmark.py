"""CI-size smoke of the composed full-workflow synthetic benchmark.

`scripts/synthetic_benchmark.py` is the one script that composes
Trainer + Tester + the eval.py protocol end-to-end (the reference's
trainval.py -> test.py -> eval.py loop, `experiments/...3dmatch.../`);
this exercises that composition at --scale small so the convergence runs
documented in README never break silently.
"""

import os
import os.path as osp
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute CPU compiles

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_synthetic_benchmark_small_smoke(tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("XLA_FLAGS", None)  # single CPU device is enough (and faster)
    res = subprocess.run(
        [
            sys.executable,
            osp.join(REPO, "scripts", "synthetic_benchmark.py"),
            "--scale", "small",
            "--steps", "2",
            "--num_workers", "2",
            "--skip_eval_script",
            "--out", str(tmp_path / "synth"),
        ],
        capture_output=True,
        text=True,
        timeout=2400,
        env=env,
        cwd=REPO,
    )
    assert res.returncode == 0, res.stdout[-3000:] + res.stderr[-3000:]
    assert "tester metrics:" in res.stdout
    # the gt.log/gt.info protocol files must have been written
    bench_root = tmp_path / "synth" / "benchmark"
    scenes = list(bench_root.iterdir())
    assert scenes, "benchmark dir empty"
    assert (scenes[0] / "gt.log").exists() and (scenes[0] / "gt.info").exists()
