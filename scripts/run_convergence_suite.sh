#!/bin/bash
# Round-5 convergence suite: {pallas, f32-XLA} x {2 model seeds} on FIXED
# synthetic data (data seed 0), to a schedule-compressed plateau:
# 45 epochs = 3510 steps, lr 3e-4 * 0.90^epoch (~3e-6 terminal — the same
# terminal lr a 90-epoch 0.95-decay schedule reaches, compressed to fit the
# single-host-core budget: ~60 min/run x 4 runs), and 10-fragment test
# scenes (~90 pairs -> ~1% RR resolution vs 5% at round 4's 20 pairs).
# Runs from a git-archive snapshot so concurrent edits to the repo cannot
# change loader-worker code mid-run (CLAUDE.md hard rule).
#
# Usage: bash scripts/run_convergence_suite.sh [steps] [lr_decay]
set -u
STEPS="${1:-3510}"
DECAY="${2:-0.90}"
SNAP=/tmp/synth_repo_r5
rm -rf "$SNAP" && mkdir -p "$SNAP"
git -C /root/repo archive HEAD | tar -x -C "$SNAP"
mkdir -p /root/repo/output/conv_r5
cd "$SNAP"
for run in pallas_s0:true:7351 xla_s0:false:7351 pallas_s1:true:4242 xla_s1:false:4242; do
  IFS=: read -r name fp seed <<< "$run"
  out="/root/repo/output/conv_r5/$name"
  echo "=== $name start $(date -u +%H:%M:%S) ===" >> /root/repo/output/conv_r5/suite.log
  python scripts/synthetic_benchmark.py --out "$out" --steps "$STEPS" \
    --test_fragments 10 --lr 3e-4 --lr_decay "$DECAY" --model_seed "$seed" \
    --force_pallas "$fp" \
    > "$out.log" 2>&1
  echo "=== $name exit $? $(date -u +%H:%M:%S) ===" >> /root/repo/output/conv_r5/suite.log
done
echo "SUITE_DONE $(date -u +%H:%M:%S)" >> /root/repo/output/conv_r5/suite.log
