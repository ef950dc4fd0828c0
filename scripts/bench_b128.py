#!/usr/bin/env python3
"""Batch-128 A/Bs: fused-layout crossover + full bf16 activation propagation.

Two VERDICT-r4 follow-ups that only batch 128 can answer, interleaved
same-process at the production-batch config (BENCH_BATCH=128, spc=4 — the
39.9k clips/s BASELINE.md row):

1. fused_layout: 'concat' won 1.065× at batch 16 (M=752 concatenated nodes)
   where the step is optimizer-HBM-bound and the block-diagonal (M, M)
   aggregation matmul is ~free on the idle MXU. At batch 128 M=6016 and the
   matmul FLOPs grow quadratically (~64×) while the step is compute-bound —
   this measures where the crossover lands so the default policy is
   evidence, not extrapolation.
2. bf16 propagation: the "full bf16 is slower" verdict (models/layers.py)
   was measured at small per-task shapes; the b128 trace shows ~7.5% of
   device time in bf16 activation fusions, so the production-batch answer
   may invert.

Usage (real chip):
    python scripts/bench_b128.py            # both A/Bs
    ARMS=layout python scripts/bench_b128.py
    ARMS=bf16 python scripts/bench_b128.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("BENCH_BATCH", "128")

import bench  # noqa: E402


def run(arm_specs, spc):
    bench.run_interleaved_arms(bench.build_arms(arm_specs, spc))


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "4"))
    which = os.environ.get("ARMS", "both")
    if which in ("both", "layout"):
        run([("b128_slice", {"fused_layout": "slice"}),
             ("b128_concat", {"fused_layout": "concat"})], spc)
    if which in ("both", "bf16"):
        run([("b128_f32act", {"bf16_prop": False}),
             ("b128_bf16prop", {"bf16_prop": True})], spc)


if __name__ == "__main__":
    main()
