#!/usr/bin/env python3
"""A/B the MTL headline step's dispatch depth in ONE process.

BASELINE.md's "spc=8-16: 23.7-24.8k clips/s/chip" band came from DIFFERENT
sessions — and tunnel latency varies hour-to-hour, so only interleaved
same-process windows are a valid comparison (CLAUDE.md). This probe settles
where the line-1 default should sit. Arms (select with BENCH_ARMS=a,b):

- spc8     the original bench line-1 default (BENCH_STEPS_PER_CALL=8)
- spc16    deeper multi-step dispatch (measured 1.117x over spc8)
- spc32    deeper still (measured 1.085x over spc16, round 4)
- spc64    deeper still (measured 1.058x over spc32, round 5)
- spc128   deeper still (measured 1.028x over spc64, round 5 — now the
           bench line-1 default; fresh compile ~27 min, cached after)

steps_per_call is trajectory-invariant by construction (per-step rng keys
derive from (run key, epoch, step index); bitwise-tested), so any depth is
numerics-free. Timing methodology (interleaved windows, true fetch-sync)
lives in bench.run_interleaved_arms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — the shared harness)

ARM_SPCS = {"spc8": 8, "spc16": 16, "spc32": 32, "spc64": 64, "spc128": 128}


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    arms = {}
    for name in os.environ.get("BENCH_ARMS", "spc8,spc16").split(","):
        spc = ARM_SPCS[name]
        step, params, opt_state, batch_list, _mesh = bench.build_mtl_step(spc)
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": (), "batch_list": batch_list, "spc": spc,
                      "lr": 1e-5}
    bench.run_interleaved_arms(arms)


if __name__ == "__main__":
    main()
