#!/usr/bin/env bash
# Epoch-sweep evaluation: test + eval for a range of training checkpoints,
# mirroring the reference's experiments/.../eval_all.sh:1-4.
#
# Usage: scripts/eval_all.sh <dataset> <data_root> <checkpoint_root> \
#            [benchmark] [first_epoch] [last_epoch]
#   checkpoint_root: directory holding per-epoch orbax checkpoints
#   (the trainer's <output_dir>/checkpoints).
set -euo pipefail
DATASET=${1:?dataset (3dmatch|kitti|modelnet)}
DATA_ROOT=${2:?data root}
CKPT_ROOT=${3:?checkpoint root}
BENCHMARK=${4:-3DMatch}
FIRST=${5:-20}
LAST=${6:-40}

for n in $(seq "$FIRST" "$LAST"); do
    if [[ ! -d "$CKPT_ROOT/$n" ]]; then
        echo "skip epoch $n (no checkpoint)"
        continue
    fi
    echo "=== epoch $n ==="
    python scripts/test.py --dataset "$DATASET" --data_root "$DATA_ROOT" \
        --benchmark "$BENCHMARK" --checkpoint_dir "$CKPT_ROOT" --test_epoch "$n" \
        --output_dir "output/$DATASET/epoch-$n"
    python scripts/eval.py --dataset "$DATASET" \
        --feature_dir "output/$DATASET/epoch-$n/features/$BENCHMARK" \
        --benchmark "$BENCHMARK" \
        --benchmark_root "$DATA_ROOT/metadata/benchmarks/$BENCHMARK" \
        --method lgr
done
