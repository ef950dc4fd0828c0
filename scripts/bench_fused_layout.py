#!/usr/bin/env python3
"""A/B the fused cross-task reasoning layouts on the MTL headline config.

Round-4 trace ledger (docs/ARCHITECTURE.md): 5.5% of MTL batch-16 device
time sits in `slice-done f32[256,1024]` — async copy completions re-slicing
the fused cross-task pooling/GNN outputs back to per-task branches at every
layer boundary of `reason_multi`. "No standalone lever found" was asserted,
not measured (VERDICT r4 weak #2). The lever: `fused_layout='concat'` keeps
the concatenated 752-node set through the WHOLE reason stack — aggregation
as one block-diagonal (M, M) masked matmul (MXU-shaped, vs 48 tiny
per-sample einsums), LayerNorm statistics per task via a static task-onehot
matmul — slicing per task exactly once at the heads.

Trade: the dense block-diag matmul adds ~1.16 GFLOP/layer the einsums
didn't spend, but the batch-16 step is optimizer-HBM-bound (41.6% Adam
family) with the MXU at ~20%, so extra MXU FLOPs may be ~free while the
copy boundaries disappear. This script measures which effect wins,
interleaved same-process at the headline config.

Usage (real chip; probes the tunnel first):
    BENCH_STEPS_PER_CALL=32 python scripts/bench_fused_layout.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "32"))
    bench.run_interleaved_arms(bench.build_arms(
        [("layout_slice", {"fused_layout": "slice"}),
         ("layout_concat", {"fused_layout": "concat"})], spc))


if __name__ == "__main__":
    main()
