#!/usr/bin/env bash
# Benchmark inference + offline evaluation, mirroring the reference's
# experiments/.../eval.sh orchestration (reference eval.sh:1-7).
#
# Usage: scripts/eval.sh <dataset> <data_root> [benchmark] [snapshot]
set -euo pipefail
DATASET=${1:?dataset (3dmatch|kitti|modelnet)}
DATA_ROOT=${2:?data root}
BENCHMARK=${3:-3DMatch}
SNAPSHOT=${4:-}

EXTRA=()
if [[ -n "$SNAPSHOT" ]]; then EXTRA+=(--torch_snapshot "$SNAPSHOT"); fi

python scripts/test.py --dataset "$DATASET" --data_root "$DATA_ROOT" \
    --benchmark "$BENCHMARK" "${EXTRA[@]}"
python scripts/eval.py --dataset "$DATASET" \
    --feature_dir "output/$DATASET/features/$BENCHMARK" \
    --benchmark "$BENCHMARK" \
    --benchmark_root "$DATA_ROOT/metadata/benchmarks/$BENCHMARK"
