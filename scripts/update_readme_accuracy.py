#!/usr/bin/env python
"""Regenerate the README synthetic-accuracy table from convergence-run logs.

Single source of truth for accuracy claims (same policy as
update_readme_perf.py for wall-clock): the README's RR/IR/FMR table is
rewritten from the `scripts/synthetic_benchmark.py` run logs, so the
published numbers are always the ones an actual run printed.

  python scripts/synthetic_benchmark.py --out output/synth_pallas --steps 2500
  python scripts/synthetic_benchmark.py --out output/synth_xla --steps 2500 \
      --force_pallas false
  python scripts/update_readme_accuracy.py \
      pallas=output/synth_pallas.log f32-XLA=output/synth_xla.log

Each argument is `label=path-to-log`; the script parses the final
`Overall (lgr):` protocol line (the gt.log/gt.info covariance evaluation,
reference experiments/...3dmatch.../eval.py:196-210) plus the trained-step
count, and rewrites the block between the ACC_TABLE markers in README.md.
"""

import os.path as osp
import re
import sys

README = osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "README.md")
START = "<!-- ACC_TABLE_START (scripts/update_readme_accuracy.py) -->"
END = "<!-- ACC_TABLE_END -->"

COLS = ["RR", "FMR", "IR", "PIR", "mean_RRE", "mean_RTE", "median_RRE",
        "median_RTE"]


def parse_log(path):
    text = open(path).read()
    steps = re.findall(r"trained (\d+) steps in ([0-9.]+)s", text)
    overall = re.findall(r"Overall \(lgr\):\s*\n\s*(.*)", text)
    if not overall:
        raise SystemExit(f"{path}: no 'Overall (lgr):' protocol line found")
    metrics = dict(
        (k, float(v))
        for k, v in re.findall(r"([A-Za-z_>=0-9.]+): ([0-9.]+)", overall[-1])
    )
    return {
        "steps": int(steps[-1][0]) if steps else None,
        "train_s": float(steps[-1][1]) if steps else None,
        "metrics": metrics,
    }


def build_table(runs):
    rows = [
        "| Path | steps | " + " | ".join(c.replace("_", " ") for c in COLS) + " |",
        "|---|---|" + "---|" * len(COLS),
    ]
    for label, parsed in runs:
        m = parsed["metrics"]
        cells = [label, str(parsed["steps"] or "—")]
        for c in COLS:
            v = m.get(c)
            if v is None:
                cells.append("—")
            elif c.endswith("RRE"):
                cells.append(f"{v:.2f}°")
            elif c.endswith("RTE"):
                cells.append(f"{v * 100:.1f} cm")
            else:
                cells.append(f"{v * 100:.1f}%")
        rows.append("| " + " | ".join(cells) + " |")
    return "\n".join(rows)


def main():
    runs = []
    for arg in sys.argv[1:]:
        label, _, path = arg.partition("=")
        runs.append((label, parse_log(path)))
    if not runs:
        raise SystemExit(__doc__)
    table = build_table(runs)
    text = open(README).read()
    if START not in text:
        raise SystemExit(f"README is missing the {START} marker")
    new = re.sub(
        re.escape(START) + r".*?" + re.escape(END),
        # lambda repl: the table is inserted literally (a backslash in a
        # command-line label would otherwise be parsed as a regex escape)
        lambda m: START + "\n" + table + "\n" + END,
        text,
        flags=re.S,
    )
    open(README, "w").write(new)
    print(table)


if __name__ == "__main__":
    main()
