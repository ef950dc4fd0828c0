#!/usr/bin/env python3
"""A/B opt-in step levers in ONE process (fair tunnel share).

Interleaves timed windows of the production fused MTL step across arms:
- baseline: production defaults (f32 Adam moments, per-step grad/param norms)
- bf16_moments: optimizer.moments_dtype=bfloat16 (halved moment HBM traffic)
- no_norms: log_grad_norms=False (drops two global-norm reduce passes)
- both: both levers

Same batches, true fetch-sync. Prints per-arm median ms/step and speedups vs
baseline. See BASELINE.md's step-time decomposition for why these matter: at
batch 16 the step is bound by Adam HBM traffic plus full-tensor reductions.
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402
from egopack_tpu.parallel import mesh as pmesh  # noqa: E402
from egopack_tpu.train import optim as topt  # noqa: E402

BATCH = 16
ACTIVE = ("ar", "lta", "pnr")
SPC = 8
STEPS = 10
WINDOWS = 5

ARMS = {
    "baseline": {"moments_dtype": "float32", "log_norms": True},
    "bf16_moments": {"moments_dtype": "bfloat16", "log_norms": True},
    "no_norms": {"moments_dtype": "float32", "log_norms": False},
    "both": {"moments_dtype": "bfloat16", "log_norms": False},
    # single-pass Pallas Adam (optim.FusedAdam) vs the optax chain
    "fused": {"moments_dtype": "float32", "log_norms": True,
              "impl": "fused"},
    "fused_bf16": {"moments_dtype": "bfloat16", "log_norms": True,
                   "impl": "fused"},
}


def build(moments_dtype: str, log_norms: bool, impl: str = "optax"):
    import jax.numpy as jnp
    feat_dim, hidden = 1536, 1024
    system = ge._build_system(hidden, 1024, feat_dim)
    system.compute_dtype = jnp.bfloat16
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)
    mesh = pmesh.make_mesh(len(jax.devices()), 1)
    params = pmesh.place_params(params, mesh)
    from egopack_tpu.train.driver import CKPT_KEYS, trainable_mask_fn
    mask = trainable_mask_fn(["temporal_graph"]
                             + [CKPT_KEYS[t] for t in ACTIVE])
    optimizer = topt.adam(1e-5, 1e-5, trainable_mask=mask,
                          moments_dtype=moments_dtype, impl=impl)
    opt_state = topt.init_opt_state(optimizer, params, mesh)
    step = system.make_train_step_multi(optimizer, ACTIVE, SPC,
                                        log_norms=log_norms)
    b = ge._synthetic_batches(system, BATCH * mesh.shape["data"], 1536, seed=0)
    batches = {n: pmesh.shard_batch(v, mesh) for n, v in b.items()
               if n in ACTIVE}
    batch_list = tuple(batches for _ in range(SPC))
    return step, params, opt_state, batch_list


def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def main():
    # BENCH_ARMS=baseline,no_norms selects a subset (4 compiles through the
    # dev tunnel exceed practical command timeouts)
    sel = os.environ.get("BENCH_ARMS")
    arm_defs = ({k: ARMS[k] for k in sel.split(",")} if sel else ARMS)
    arms = {}
    for name, kw in arm_defs.items():
        t0 = time.time()
        step, params, opt_state, batch_list = build(**kw)
        print(f"[{name}] built in {time.time() - t0:.1f}s", flush=True)
        rng = jax.random.PRNGKey(1)
        t0 = time.time()
        for i in range(3):  # warmup/compile
            params, opt_state, logs = step(params, opt_state, batch_list,
                                           jax.random.fold_in(rng, i),
                                           i * SPC, 1e-5)
        sync(logs)
        print(f"[{name}] warm in {time.time() - t0:.1f}s", flush=True)
        arms[name] = [step, params, opt_state, batch_list, rng]

    times = {name: [] for name in arms}
    for w in range(WINDOWS):
        for name, arm in arms.items():  # interleave arms per window
            step, params, opt_state, batch_list, rng = arm
            t0 = time.perf_counter()
            for i in range(STEPS):
                params, opt_state, logs = step(
                    params, opt_state, batch_list,
                    jax.random.fold_in(rng, w * 1000 + i), i * SPC, 1e-5)
            sync(logs)
            times[name].append(time.perf_counter() - t0)
            arm[1], arm[2] = params, opt_state

    out = {name: sorted(ts)[len(ts) // 2] / (STEPS * SPC) * 1e3
           for name, ts in times.items()}  # ms/step
    print({"ms_per_step": {k: round(v, 4) for k, v in out.items()},
           "speedup_vs_baseline": {k: round(out["baseline"] / out[k], 4)
                                   for k in out}})


if __name__ == "__main__":
    main()
