#!/usr/bin/env python3
"""A/B the MTL headline step's dispatch depth in ONE process.

BASELINE.md's "spc=8-16: 23.7-24.8k clips/s/chip" band came from DIFFERENT
sessions — and tunnel latency varies hour-to-hour, so only interleaved
same-process windows are a valid comparison (CLAUDE.md). This probe settles
whether the line-1 default should move past spc=8. Arms:

- spc8     the current bench line-1 default (BENCH_STEPS_PER_CALL=8)
- spc16    deeper multi-step dispatch
- spc32    deeper still (optional: BENCH_ARMS=spc8,spc16,spc32)

steps_per_call is trajectory-invariant by construction (per-step rng keys
derive from (run key, epoch, step index); bitwise-tested), so any depth is
numerics-free. Interleaved timed windows, true fetch-sync
(jax.block_until_ready returns at ENQUEUE on this image's remote platform —
BASELINE.md "ROUND-2 CORRECTION").
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — the shared harness)

STEPS = 8  # outer dispatches per timed window (x spc inner steps)
WINDOWS = 5

ARMS = {
    "spc8": {"spc": 8},
    "spc16": {"spc": 16},
    "spc32": {"spc": 32},
}


def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    sel = os.environ.get("BENCH_ARMS", "spc8,spc16")
    arms = {}
    for name in sel.split(","):
        kw = ARMS[name]
        t0 = time.time()
        step, params, opt_state, batch_list, _mesh = \
            bench.build_mtl_step(kw["spc"])
        spc = kw["spc"]
        rng = jax.random.PRNGKey(1)
        for i in range(3):  # warmup/compile
            params, opt_state, logs = step(params, opt_state, batch_list,
                                           jax.random.fold_in(rng, i),
                                           i * spc, 1e-5)
        sync(logs)
        print(f"[{name}] built+warm in {time.time() - t0:.1f}s", flush=True)
        arms[name] = [step, params, opt_state, batch_list, spc, rng]

    times = {name: [] for name in arms}
    for w in range(WINDOWS):
        for name, arm in arms.items():  # interleave arms per window
            step, params, opt_state, batch_list, spc, rng = arm
            t0 = time.perf_counter()
            for i in range(STEPS):
                params, opt_state, logs = step(
                    params, opt_state, batch_list,
                    jax.random.fold_in(rng, w * 1000 + i), i * spc, 1e-5)
            sync(logs)
            times[name].append((time.perf_counter() - t0) / (STEPS * spc))
            arm[1], arm[2] = params, opt_state
    out = {name: sorted(ts)[len(ts) // 2] * 1e3 for name, ts in times.items()}
    base = next(iter(out))
    print({"ms_per_step": {k: round(v, 4) for k, v in out.items()},
           f"speedup_vs_{base}": {k: round(out[base] / out[k], 4)
                                  for k in out}})


if __name__ == "__main__":
    main()
