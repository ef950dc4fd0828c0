#!/usr/bin/env python3
"""Per-tensor A/B for the fused Adam kernel (VERDICT r2 #1 evidence).

Times three implementations of the SAME Adam update (coupled weight decay,
f32) on one representative large leaf, interleaved in one process:

  - pallas: ops/pallas/fused_adam.fused_adam_leaf (single-pass kernel)
  - xla:    the identical jnp expression under jit (XLA loop fusion)
  - optax:  the production chain (add_decayed_weights -> scale_by_adam ->
            scale_by_lr) + apply, under one jit

All three move the same 7 memory streams (read p/g/m/v, write p/m/v); the
printed GB/s shows how close each sits to the HBM roofline — if xla ==
pallas == roofline, the optimizer is bandwidth-bound and no kernel can beat
the chain in f32 (BASELINE.md decomposition).

NOTE on this dev platform: Mosaic compilation through the remote tunnel
takes ~5 min per kernel; set JAX_COMPILATION_CACHE_DIR to amortize.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from egopack_tpu.ops.pallas.fused_adam import _adam_math, fused_adam_leaf  # noqa: E402

ROWS = int(os.environ.get("BENCH_LEAF_ROWS", "8192"))   # 8192x1024 = 8.4M params
COLS = 1024
STEPS = 30
WINDOWS = 7
WD, B1, B2, EPS = 0.01, 0.9, 0.999, 1e-8


def main():
    rng = np.random.default_rng(0)
    p = jnp.asarray(rng.normal(size=(ROWS, COLS)), jnp.float32)
    g = jnp.asarray(rng.normal(size=(ROWS, COLS)) * 1e-2, jnp.float32)
    m = jnp.zeros_like(p)
    v = jnp.zeros_like(p)
    lr = jnp.float32(1e-3)
    bc1 = jnp.float32(0.1)
    bc2 = jnp.float32(1e-3)

    @jax.jit
    def pallas_step(p, g, m, v):
        return fused_adam_leaf(p, g, m, v, lr, bc1, bc2, wd=WD, b1=B1, b2=B2,
                               eps=EPS, m_dtype=jnp.float32)

    @jax.jit
    def xla_step(p, g, m, v):
        return _adam_math(p, g, m, v, lr, bc1, bc2, wd=WD, b1=B1, b2=B2,
                          eps=EPS, m_dtype=jnp.float32)

    chain = optax.chain(optax.add_decayed_weights(WD),
                        optax.scale_by_adam(b1=B1, b2=B2, eps=EPS),
                        optax.scale_by_learning_rate(1e-3))
    chain_state = chain.init({"w": p})

    @jax.jit
    def optax_step(p, g, state):
        updates, state = chain.update({"w": g}, state, {"w": p})
        return {"w": p}["w"] + updates["w"], state

    def sync(x):
        return float(np.asarray(x).ravel()[-1])

    arms = {}
    t0 = time.time()
    out = pallas_step(p, g, m, v)
    sync(out[0])
    print(f"pallas compile {time.time() - t0:.1f}s", flush=True)
    arms["pallas"] = lambda: pallas_step(p, g, m, v)[0]
    t0 = time.time()
    sync(xla_step(p, g, m, v)[0])
    print(f"xla compile {time.time() - t0:.1f}s", flush=True)
    arms["xla"] = lambda: xla_step(p, g, m, v)[0]
    t0 = time.time()
    sync(optax_step(p, g, chain_state)[0])
    print(f"optax compile {time.time() - t0:.1f}s", flush=True)
    arms["optax"] = lambda: optax_step(p, g, chain_state)[0]

    # parity before timing
    np.testing.assert_allclose(np.asarray(pallas_step(p, g, m, v)[0]),
                               np.asarray(xla_step(p, g, m, v)[0]),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(pallas_step(p, g, m, v)[0]),
                               np.asarray(optax_step(p, g, chain_state)[0]),
                               rtol=1e-6, atol=1e-7)

    times = {k: [] for k in arms}
    for w in range(WINDOWS):
        for name, fn in arms.items():
            t0 = time.perf_counter()
            for _ in range(STEPS):
                y = fn()
            sync(y)
            times[name].append(time.perf_counter() - t0)

    bytes_moved = 7 * ROWS * COLS * 4  # 4 reads + 3 writes, f32
    med = {k: sorted(ts)[len(ts) // 2] / STEPS for k, ts in times.items()}
    print({
        "leaf": f"{ROWS}x{COLS} f32",
        "us_per_update": {k: round(v * 1e6, 1) for k, v in med.items()},
        "achieved_GBps": {k: round(bytes_moved / v / 1e9, 1)
                          for k, v in med.items()},
        "pallas_vs_optax": round(med["optax"] / med["pallas"], 4),
        "xla_vs_optax": round(med["optax"] / med["xla"], 4),
    }, flush=True)


if __name__ == "__main__":
    main()
