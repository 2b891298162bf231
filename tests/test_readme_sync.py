"""The README perf table must match the newest committed bench capture.

Round-4 verdict: the "single source of truth" table went stale in the same
round that built its generator. This pins the contract: whenever a capture
exists under output/bench_captures/, the block between the BENCH_TABLE
markers must be exactly what scripts/update_readme_perf.py generates from
ALL committed captures (band over all, numbers from the newest).
"""
import glob
import importlib.util
import json
import os.path as osp
import re

import pytest

ROOT = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _load_updater():
    spec = importlib.util.spec_from_file_location(
        "update_readme_perf", osp.join(ROOT, "scripts", "update_readme_perf.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_readme_perf_table_matches_newest_capture():
    captures = sorted(glob.glob(osp.join(ROOT, "output", "bench_captures", "*.json")))
    if not captures:
        pytest.skip("no bench captures committed")
    mod = _load_updater()
    runs = []
    for p in captures:
        with open(p) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    runs.append(json.loads(line))
                    break
    if not runs:
        # e.g. only an in-progress capture (bench.py writes its one JSON
        # line at exit) — nothing to sync against yet
        pytest.skip("no parseable bench captures")
    expected = mod.build_table(runs)
    with open(osp.join(ROOT, "README.md")) as f:
        text = f.read()
    m = re.search(re.escape(mod.START) + r"\n(.*?)\n" + re.escape(mod.END),
                  text, flags=re.S)
    assert m, "README is missing the BENCH_TABLE markers"
    assert m.group(1) == expected, (
        "README perf table is stale — regenerate with:\n  python "
        "scripts/update_readme_perf.py output/bench_captures/*.json")
