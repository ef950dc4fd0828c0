#!/usr/bin/env python3
"""A/B the per-step grad/param norm passes in ONE process (round-4 lever).

The production steps compute two GLOBAL norms (one full pass over all grads,
one over all params) on EVERY inner step — observability beyond the
reference (wandb.watch logs at intervals, never per step). On the
optimizer-HBM-bound steps those passes are ~2 extra f32 streams over the
trainable set per step. Arms:

- norms_on     production default (log_grad_norms=True)
- norms_last   log_grad_norms="last": norms only on each spc-group's last
               inner step (1/spc the passes, scalars still logged per group)
- norms_off    log_grad_norms=False (upper bound for the lever)

BENCH_ARM selects the phase (mtl|ego, default ego — the line closest to its
8x bar). Timing methodology (interleaved windows, true fetch-sync) lives in
bench.run_interleaved_arms.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402

ARMS = {"norms_on": True, "norms_last": "last", "norms_off": False}


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    phase = os.environ.get("BENCH_ARM", "ego")
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "16"))
    sel = os.environ.get("BENCH_ARMS", "norms_on,norms_last")
    arms = {}
    for name in sel.split(","):
        ln = ARMS[name]
        if phase == "ego":
            step, params, opt_state, banks, batch_list, _m = \
                bench.build_egopack_step(spc, log_norms=ln)
            extra = (banks,)
        else:
            step, params, opt_state, batch_list, _m = \
                bench.build_mtl_step(spc, log_norms=ln)
            extra = ()
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": extra, "batch_list": batch_list,
                      "spc": spc, "lr": 1e-6}
    bench.run_interleaved_arms(arms)


if __name__ == "__main__":
    main()
