#!/usr/bin/env python3
"""Pay-or-cut measurement for the fused Pallas SAGE layer (VERDICT r2 #7).

Interleaves timed windows of ONE SAGE layer forward (the ops/pallas/sage.py
scope: static adjacency, project=True, mean aggregation) across two arms in
the same process:
  - xla: DenseSAGEConv's default masked-matmul path
  - pallas: fused_sage (all three matmuls + block-diagonal aggregation in
    one Mosaic kernel)

Run at the batch sizes where BASELINE.md shows MXU headroom (64-128):
  BENCH_SAGE_BATCH=128 python scripts/bench_sage.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egopack_tpu.data import graphs as G  # noqa: E402
from egopack_tpu.models.layers import DenseSAGEConv  # noqa: E402
from egopack_tpu.ops.pallas.sage import can_fuse, fused_sage  # noqa: E402

BATCH = int(os.environ.get("BENCH_SAGE_BATCH", "128"))
HIDDEN = int(os.environ.get("BENCH_SAGE_HIDDEN", "1024"))
N_NODES = 9  # AR task graph
STEPS = 20
WINDOWS = 7


def main():
    adj = jnp.asarray(G.ar_spec(N_NODES, 1.0).adjacency)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(BATCH, N_NODES, HIDDEN)), jnp.float32)

    layer = DenseSAGEConv(features=HIDDEN, aggr="mean", project=True)
    params = layer.init(jax.random.PRNGKey(0), x, adj)["params"]
    p, l, r = (params["lin_project"], params["lin_l"], params["lin_r"])

    # CHAIN layer applications inside ONE jit: the tunneled dev platform
    # serializes dispatches (~13 ms each), so a single-call loop only
    # measures network latency; K chained layers make compute dominate.
    K = int(os.environ.get("BENCH_SAGE_CHAIN", "32"))

    def chain(f, x):
        for _ in range(K):
            x = f(x) * (HIDDEN ** -0.5)  # keep magnitudes roughly unit
        return x

    xla_fwd = jax.jit(lambda x: chain(
        lambda z: layer.apply({"params": params}, z, adj), x))
    pallas_fwd = jax.jit(lambda x: chain(
        lambda z: fused_sage(z, adj, p["kernel"], p["bias"], l["kernel"],
                             l["bias"], r["kernel"]), x))

    assert can_fuse(BATCH, N_NODES), (BATCH, N_NODES)

    def sync(y):
        return float(np.asarray(y).ravel()[-1])

    arms = {"xla": xla_fwd, "pallas": pallas_fwd}
    outs = {}
    for name, fn in arms.items():
        y = fn(x)
        outs[name] = sync(y)
    np.testing.assert_allclose(
        np.asarray(xla_fwd(x)), np.asarray(pallas_fwd(x)),
        rtol=3e-3, atol=1e-3)  # parity before timing (error compounds over K)

    times = {name: [] for name in arms}
    for w in range(WINDOWS):
        for name, fn in arms.items():  # interleaved per window
            t0 = time.perf_counter()
            for _ in range(STEPS):
                y = fn(x)
            sync(y)
            times[name].append(time.perf_counter() - t0)

    med = {name: sorted(ts)[len(ts) // 2] / STEPS / K * 1e3
           for name, ts in times.items()}
    print({"batch": BATCH, "hidden": HIDDEN, "chain": K,
           "ms_per_layer_fwd": {k: round(v, 4) for k, v in med.items()},
           "pallas_speedup": round(med["xla"] / med["pallas"], 4)})


if __name__ == "__main__":
    main()
