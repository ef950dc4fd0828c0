#!/usr/bin/env python3
"""Measure-or-cut A/B for the Pallas streaming kNN kernel (ops/pallas/knn_topk).

Two regimes, both interleaved same-process (tunnel latency varies
hour-to-hour — CLAUDE.md):

1. PRODUCTION: the full phase-2 EgoPack step (novel OSCC, 3 banks P=2048,
   spc from BENCH_STEPS_PER_CALL) with GraphONE.knn_impl='xla' vs 'pallas'.
   The xplane ledger attributes 6.0% of post-fix phase-2 device time to the
   XLA path's `sort f32[3,64,2048]` — this measures whether the streaming
   kernel beats it end-to-end where it matters.
2. STANDALONE SCALING: vmapped prototype_topk (T=3, M=64, F=1024, k=8) at
   P = 2048 (production), 8192, and 55040 (the full-taxonomy bound:
   115 verbs × 478 nouns = 54,970 padded to 128) — the kernel's documented
   raison d'être is large P where the (M, P) distance matrix + full sort
   stop being VMEM-friendly.

Match: /root/reference/models/graphONE/graphONE.py:119-141 (the reference's
cdist+argsort); ops/knn.py dispatch; VERDICT r4 "next round" item 1.

Usage (real chip; probes the tunnel first):
    BENCH_STEPS_PER_CALL=32 python scripts/bench_knn_pallas.py
    SKIP_PRODUCTION=1 python scripts/bench_knn_pallas.py   # standalone only
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def production_ab(spc: int):
    bench.run_interleaved_arms(bench.build_arms(
        [("knn_xla", {"knn_impl": "xla"}),
         ("knn_pallas", {"knn_impl": "pallas"})], spc, builder="egopack"))


def standalone_scaling(windows: int = 5, iters: int = 20):
    import jax
    import jax.numpy as jnp
    from egopack_tpu.ops.knn import prototype_topk

    t, m, f, k = 3, 64, 1024, 8
    for p in (2048, 8192, 55040):
        key = jax.random.PRNGKey(p)
        feats = jax.random.normal(key, (t, m, f), jnp.float32)
        bank = jax.random.normal(jax.random.fold_in(key, 1), (t, p, f),
                                 jnp.float32)
        mask = jnp.tile(jnp.arange(p) < int(p * 0.93), (t, 1))

        fns = {}
        for name, impl in (("xla", "xla"), ("pallas", "pallas")):
            fn = jax.jit(jax.vmap(
                functools.partial(prototype_topk, k=k, distance="cosine",
                                  impl=impl)))
            fns[name] = functools.partial(fn, feats, bank, mask)

        import numpy as np
        ref = None
        for name, fn in fns.items():  # warm + cross-check
            idx, d = fn()
            bench._sync(d)
            if ref is None:
                ref = np.asarray(idx)
            else:
                agree = (np.asarray(idx) == ref).mean()
                if agree < 1.0:
                    print(f"  [P={p}] WARNING idx agreement {agree:.4f} "
                          "(ties may reorder)", flush=True)
        times = {name: [] for name in fns}
        for w in range(windows):
            for name, fn in fns.items():
                t0 = time.perf_counter()
                for _ in range(iters):
                    out = fn()
                bench._sync(out[1])
                times[name].append((time.perf_counter() - t0) / iters)
        med = {name: sorted(ts)[len(ts) // 2] * 1e3 for name, ts in times.items()}
        print({"P": p,
               "ms_per_call": {n: round(v, 4) for n, v in med.items()},
               "pallas_speedup": round(med["xla"] / med["pallas"], 4)},
              flush=True)


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "32"))
    if os.environ.get("SKIP_PRODUCTION") != "1":
        production_ab(spc)
    standalone_scaling()


if __name__ == "__main__":
    main()
