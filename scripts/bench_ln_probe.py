#!/usr/bin/env python3
"""Bound the cost of the graph-mode LayerNorm full reductions.

The reference's LayerNorm normalizes over the ENTIRE node tensor (whole-
tensor scalar mean/std — load-bearing parity quirk, PARITY.md), which is a
full-reduction sync point per layer per task branch. This probe interleaves
the production step against a WRONG-NUMERICS variant that replaces the
statistics with an affine-only pass (EGOPACK_PROBE_LN_IDENTITY=1), bounding
the maximum win any LN-statistics optimization (e.g. fusing the per-task
reductions into one segmented pass) could deliver.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

import __graft_entry__ as ge  # noqa: E402
from egopack_tpu.parallel import mesh as pmesh  # noqa: E402
from egopack_tpu.train import optim as topt  # noqa: E402

BATCH = 16
ACTIVE = ("ar", "lta", "pnr")
SPC = 8
STEPS = 10
WINDOWS = 5


def build():
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
    optimizer = topt.adam(1e-5, 1e-5, trainable_mask=mask)
    opt_state = topt.init_opt_state(optimizer, params, mesh)
    step = system.make_train_step_multi(optimizer, ACTIVE, SPC)
    b = ge._synthetic_batches(system, BATCH * mesh.shape["data"], 1536, seed=0)
    batches = {n: pmesh.shard_batch(v, mesh) for n, v in b.items()
               if n in ACTIVE}
    return step, params, opt_state, tuple(batches for _ in range(SPC))


def sync(logs):
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    arms = {}
    for name, env in (("baseline", "0"), ("ln_identity", "1")):
        os.environ["EGOPACK_PROBE_LN_IDENTITY"] = env  # read at trace time
        t0 = time.time()
        step, params, opt_state, batch_list = build()
        rng = jax.random.PRNGKey(1)
        for i in range(3):
            params, opt_state, logs = step(params, opt_state, batch_list,
                                           jax.random.fold_in(rng, i),
                                           i * SPC, 1e-5)
        sync(logs)
        print(f"[{name}] ready in {time.time() - t0:.1f}s", flush=True)
        arms[name] = [step, params, opt_state, batch_list, rng]

    times = {name: [] for name in arms}
    for w in range(WINDOWS):
        for name, arm in arms.items():
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
           for name, ts in times.items()}
    print({"ms_per_step": {k: round(v, 4) for k, v in out.items()},
           "ln_stats_cost_bound": round(
               out["baseline"] / out["ln_identity"], 4)}, flush=True)


if __name__ == "__main__":
    main()
