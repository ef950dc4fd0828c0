#!/usr/bin/env python3
"""A/B the GraphONE identity-rows static slice vs the task-row gather.

Round-4 xplane ledger finding (docs/ARCHITECTURE.md): the phase-2 step spent
~10% of device time in copy/slice/broadcast families traced to the per-depth
``w[d][rows]`` task gather inside GraphONE.interact — a gather that is the
IDENTITY in the production step (features dict keys == task_labels in
order). models/graphone.py now skips it statically when rows == identity;
this script measures both variants interleaved in ONE process (the gather
arm is forced via EGOPACK_FORCE_ROWS_GATHER, read at trace time).

Numerics are bitwise identical either way (test_models.py interact tests +
the explicit equality check run before this landed).

Usage (real chip; probe the tunnel first):
    BENCH_STEPS_PER_CALL=32 python scripts/bench_graphone_rows.py
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

    arms = {}
    for name, force in (("rows_gather", "1"), ("rows_identity", "")):
        if force:
            os.environ["EGOPACK_FORCE_ROWS_GATHER"] = force
        else:
            os.environ.pop("EGOPACK_FORCE_ROWS_GATHER", None)
        step, params, opt_state, banks, batch_list, _mesh = \
            bench.build_egopack_step(spc)
        # trace/compile NOW, while this arm's env is in effect (the flag is
        # read at trace time inside GraphONE.interact)
        # step donates (params, opt_state) — keep the returned state
        import jax
        params, opt_state, logs = step(params, opt_state, banks, batch_list,
                                       jax.random.PRNGKey(0), 0, 1e-6)
        bench._sync(logs)
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": (banks,), "batch_list": batch_list,
                      "spc": spc, "lr": 1e-6}
    os.environ.pop("EGOPACK_FORCE_ROWS_GATHER", None)
    bench.run_interleaved_arms(arms)


if __name__ == "__main__":
    main()
