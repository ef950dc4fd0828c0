#!/usr/bin/env python3
"""A/B the EgoPack phase-2 step's dispatch/optimizer levers in ONE process.

The phase-2 line (bench.py line 2: novel OSCC, 3 banks P=2048, depth 3,
backprop backbone) moves only 16 clips per optimizer step — a third of the
MTL line's 48 — so the fixed per-step costs (Adam HBM traffic over the same
~30M params, dispatch latency) weigh 3x heavier per clip. Arms:

- spc4            the original bench default (BENCH_STEPS_PER_CALL=4)
- spc8            deeper multi-step dispatch (measured 1.25x over spc4)
- spc8_bf16       + optimizer.moments_dtype=bfloat16 (halved moment traffic;
                  opt-in, off the torch-parity table — see BASELINE.md)
- spc16           deeper still (measured 1.083x over spc8)
- spc32           deeper still (measured 1.068x over spc16, round 4;
                  cleared the 8x bar)
- spc64           deeper still (measured 1.026x over spc32, round 5 — now
                  the bench line-2 default)

Timing methodology (interleaved windows, true fetch-sync — the ROUND-2
CORRECTION) lives in bench.run_interleaved_arms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — the shared harness)

ARMS = {
    "spc4": {"spc": 4, "moments_dtype": "float32"},
    "spc8": {"spc": 8, "moments_dtype": "float32"},
    "spc8_bf16": {"spc": 8, "moments_dtype": "bfloat16"},
    "spc16": {"spc": 16, "moments_dtype": "float32"},
    "spc32": {"spc": 32, "moments_dtype": "float32"},
    "spc64": {"spc": 64, "moments_dtype": "float32"},
}


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    # default to a 2-arm subset: each fresh full-size compile costs minutes
    # through this image's tunnel, and >2 of them exceed a command window
    # (same reason as bench_mtl_spc / bench_moments_dtype)
    sel = os.environ.get("BENCH_ARMS", "spc8,spc16")
    arms = {}
    for name in sel.split(","):
        kw = ARMS[name]
        step, params, opt_state, banks, batch_list, _mesh = \
            bench.build_egopack_step(kw["spc"], kw["moments_dtype"])
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": (banks,), "batch_list": batch_list,
                      "spc": kw["spc"], "lr": 1e-6}
    bench.run_interleaved_arms(arms)


if __name__ == "__main__":
    main()
