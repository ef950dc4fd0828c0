#!/usr/bin/env python3
"""A/B the opt-in bf16 Adam-moments lever in ONE process (fair tunnel share).

Interleaves timed windows of the production fused MTL step with f32 vs bf16
optimizer moments (optimizer.moments_dtype), same batches, true fetch-sync.
Prints per-arm median ms/step and the speedup. See BASELINE.md "optimizer-
bandwidth" decomposition for why moments are the target: at batch 16 the
step is bound by Adam's HBM traffic, and bf16 moments cut the moment
read+write bytes in half (28 -> 20 bytes/param/step ideal = ~1.13x).
"""

import os
import sys
import time

import jax
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __graft_entry__ as ge  # noqa: E402
from egopack_tpu.parallel import mesh as pmesh
from egopack_tpu.train import optim as topt

BATCH = 16
ACTIVE = ("ar", "lta", "pnr")
SPC = 8
STEPS = 10
WINDOWS = 7


def build(moments_dtype: str):
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
                          moments_dtype=moments_dtype)
    opt_state = topt.init_opt_state(optimizer, params, mesh)
    step = system.make_train_step_multi(optimizer, ACTIVE, SPC)
    b = ge._synthetic_batches(system, BATCH * mesh.shape["data"], 1536, seed=0)
    batches = {n: pmesh.shard_batch(v, mesh) for n, v in b.items()
               if n in ACTIVE}
    batch_list = tuple(batches for _ in range(SPC))
    return step, params, opt_state, batch_list


def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def main():
    arms = {}
    for name in ("float32", "bfloat16"):
        step, params, opt_state, batch_list = build(name)
        rng = jax.random.PRNGKey(1)
        for i in range(3):  # warmup/compile
            params, opt_state, logs = step(params, opt_state, batch_list,
                                           jax.random.fold_in(rng, i),
                                           i * SPC, 1e-5)
        sync(logs)
        arms[name] = (step, params, opt_state, batch_list, rng)

    times = {"float32": [], "bfloat16": []}
    for w in range(WINDOWS):
        for name in ("float32", "bfloat16"):  # interleave arms per window
            step, params, opt_state, batch_list, rng = arms[name]
            t0 = time.perf_counter()
            for i in range(STEPS):
                params, opt_state, logs = step(
                    params, opt_state, batch_list,
                    jax.random.fold_in(rng, w * 1000 + i), i * SPC, 1e-5)
            sync(logs)
            times[name].append(time.perf_counter() - t0)
            arms[name] = (step, params, opt_state, batch_list, rng)

    out = {}
    for name, ts in times.items():
        med = sorted(ts)[len(ts) // 2]
        out[name] = med / (STEPS * SPC) * 1e3  # ms/step
    print({"ms_per_step": out,
           "speedup_bf16_moments": out["float32"] / out["bfloat16"]})


if __name__ == "__main__":
    main()
