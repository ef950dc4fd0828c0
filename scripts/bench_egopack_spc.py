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
- spc16           deeper still (measured 1.083x over spc8 — now the bench
                  line-2 default)

Interleaved timed windows, true fetch-sync (jax.block_until_ready returns at
ENQUEUE on this image's remote platform — BASELINE.md "ROUND-2 CORRECTION").
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
    "spc4": {"spc": 4, "moments_dtype": "float32"},
    "spc8": {"spc": 8, "moments_dtype": "float32"},
    "spc8_bf16": {"spc": 8, "moments_dtype": "bfloat16"},
    "spc16": {"spc": 16, "moments_dtype": "float32"},
}


def build(spc: int, moments_dtype: str):
    step, params, opt_state, banks, batch_list, _mesh = \
        bench.build_egopack_step(spc, moments_dtype)
    return step, params, opt_state, banks, batch_list, spc


def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    sel = os.environ.get("BENCH_ARMS")
    arm_defs = ({k: ARMS[k] for k in sel.split(",")} if sel else ARMS)
    arms = {}
    for name, kw in arm_defs.items():
        t0 = time.time()
        step, params, opt_state, banks, batch_list, spc = build(**kw)
        rng = jax.random.PRNGKey(1)
        for i in range(3):  # warmup/compile
            params, opt_state, logs = step(params, opt_state, banks,
                                           batch_list,
                                           jax.random.fold_in(rng, i),
                                           i * spc, 1e-6)
        sync(logs)
        print(f"[{name}] built+warm in {time.time() - t0:.1f}s", flush=True)
        arms[name] = [step, params, opt_state, banks, batch_list, spc, rng]

    times = {name: [] for name in arms}
    for w in range(WINDOWS):
        for name, arm in arms.items():  # interleave arms per window
            step, params, opt_state, banks, batch_list, spc, rng = arm
            t0 = time.perf_counter()
            for i in range(STEPS):
                params, opt_state, logs = step(
                    params, opt_state, banks, batch_list,
                    jax.random.fold_in(rng, w * 1000 + i), i * spc, 1e-6)
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
