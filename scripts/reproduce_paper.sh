#!/bin/bash
# Reproduce the paper's Ego4D table end-to-end (requires the real Ego4D
# features linked via data/ego4d/build_annotations.sh).
#
# Phase 1: the four leave-one-out MTL pretrainings (artifacts MTL_<triple>).
# Phase 2: per-task EgoPack sweeps (graphone depth 1-5 × seeds 65/72/97).
# Aggregation: 3-seed averages, the reference's evaluation protocol.

set -e
cd "$(dirname "$0")/.."

echo "== Phase 1: MTL leave-one-out pretraining (4 runs) =="
python -m egopack_tpu.sweep experiments/mtl.yaml "$@"

echo "== Phase 2: EgoPack novel-task sweeps (4 x 15 runs) =="
for task in ar oscc lta pnr; do
    python -m egopack_tpu.sweep "experiments/egopack/${task}.yaml" "$@"
done

echo "== 3-seed aggregated results =="
python -m egopack_tpu.aggregate outputs/
