#!/usr/bin/env python3
"""A/B opt-in step levers in ONE process (fair tunnel share).

Interleaves timed windows of the production fused MTL step across arms:
- baseline: production defaults (f32 Adam moments, per-step grad/param norms)
- bf16_moments: optimizer.moments_dtype=bfloat16 (halved moment HBM traffic)
- no_norms: log_grad_norms=False (drops two global-norm reduce passes)
- both: both levers
- fused / fused_bf16: single-pass Pallas Adam (optimizer.impl=fused) vs the
  optax chain

Same batches; timing methodology (interleaved windows, true fetch-sync)
lives in bench.run_interleaved_arms. See BASELINE.md's step-time
decomposition for why these matter: at batch 16 the step is bound by Adam
HBM traffic plus full-tensor reductions.
"""

import os
import sys
import time

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench.py — the shared harness)
import __graft_entry__ as ge  # noqa: E402
from egopack_tpu.parallel import mesh as pmesh  # noqa: E402
from egopack_tpu.train import optim as topt  # noqa: E402

BATCH = 16
ACTIVE = ("ar", "lta", "pnr")
SPC = 8

ARMS = {
    "baseline": {"moments_dtype": "float32", "log_norms": True},
    "bf16_moments": {"moments_dtype": "bfloat16", "log_norms": True},
    "no_norms": {"moments_dtype": "float32", "log_norms": False},
    "both": {"moments_dtype": "bfloat16", "log_norms": False},
    "fused": {"moments_dtype": "float32", "log_norms": True,
              "impl": "fused"},
    "fused_bf16": {"moments_dtype": "bfloat16", "log_norms": True,
                   "impl": "fused"},
}


def build(moments_dtype: str, log_norms: bool, impl: str = "optax"):
    import jax.numpy as jnp
    # full size by default; BENCH_FEAT_DIM/BENCH_HIDDEN smoke knobs honored
    feat_dim, hidden = bench.FEAT_DIM, bench.HIDDEN
    system = ge._build_system(hidden, hidden, feat_dim)
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
    b = ge._synthetic_batches(system, BATCH * mesh.shape["data"], feat_dim,
                              seed=0)
    batches = {n: pmesh.shard_batch(v, mesh) for n, v in b.items()
               if n in ACTIVE}
    batch_list = tuple(batches for _ in range(SPC))
    return step, params, opt_state, batch_list


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    # BENCH_ARMS=baseline,no_norms selects a subset (4 compiles through the
    # dev tunnel exceed practical command timeouts)
    sel = os.environ.get("BENCH_ARMS")
    arms = {}
    for name in (sel.split(",") if sel else ARMS):
        kw = ARMS[name]
        t0 = time.time()
        step, params, opt_state, batch_list = build(**kw)
        print(f"[{name}] built in {time.time() - t0:.1f}s", flush=True)
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": (), "batch_list": batch_list, "spc": SPC,
                      "lr": 1e-5}
    bench.run_interleaved_arms(arms, steps=10)


if __name__ == "__main__":
    main()
