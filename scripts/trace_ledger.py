#!/usr/bin/env python3
"""xplane-traced op ledger for the bench steps (VERDICT r3 weak #4/#2).

Captures a jax.profiler trace of the production multi-step program (MTL or
EgoPack arm, any batch size via BENCH_BATCH) and prints the top device-time
sinks with percentages, parsed from the .xplane.pb with
jax.profiler.ProfileData — turning the "optimizer-HBM-bound" timing
inference into a named, traced budget (docs/ARCHITECTURE.md ledger section).

Usage (real chip; probe the tunnel first — CLAUDE.md):
    python scripts/trace_ledger.py mtl          # batch from BENCH_BATCH (16)
    BENCH_BATCH=128 python scripts/trace_ledger.py mtl
    python scripts/trace_ledger.py ego

Smoke (CPU): JAX_PLATFORMS=cpu BENCH_FEAT_DIM=32 BENCH_HIDDEN=32 \
    BENCH_STEPS_PER_CALL=4 python scripts/trace_ledger.py mtl
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def aggregate_device_ops(xplane_path, top: int = 25):
    """Sum event durations per op name over every device plane line.

    Device planes are the non-host planes (``/device:TPU:N`` on real chips;
    the ``tf_XLAPjRt*Client`` executor line on CPU smoke runs). Events named
    ``end: <op>`` (CPU async markers) are folded out; per-name totals and the
    share of the summed device time are reported."""
    from jax.profiler import ProfileData

    # executor bookkeeping that wraps (and would double-count) the real ops
    wrappers = ("ThunkExecutor::", "ThreadpoolListener::", "EndOfStep")

    pd = ProfileData.from_file(xplane_path)
    totals = {}
    plane_names = []
    for plane in pd.planes:
        is_device = plane.name.startswith("/device:")
        lines = list(plane.lines)
        # TPU device planes carry both "XLA Modules" (whole-program spans)
        # and "XLA Ops" (per-op spans) — keep only the op-level line there
        op_lines = [l for l in lines if l.name == "XLA Ops"]
        if is_device and op_lines:
            lines = op_lines
        for line in lines:
            if not (is_device or line.name.startswith("tf_XLAPjRt")):
                continue
            if line.name == "XLA Modules":
                continue
            plane_names.append(f"{plane.name}::{line.name}")
            for ev in line.events:
                name = ev.name
                if name.startswith("end: ") or name.startswith(wrappers):
                    continue
                totals[name] = totals.get(name, 0.0) + ev.duration_ns
    grand = sum(totals.values()) or 1.0
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])
    return {
        "planes": sorted(set(plane_names)),
        "device_time_ms": round(grand / 1e6, 3),
        "top": [{"op": k, "ms": round(v / 1e6, 3),
                 "pct": round(100.0 * v / grand, 2)}
                for k, v in ranked[:top]],
        "families": _families(totals, grand),
    }


_SHAPE = __import__("re").compile(r"= \(?([a-z0-9]+\[[0-9,]*\])")
_BASE = __import__("re").compile(r"^%?([a-zA-Z_\-]+)")


def _families(totals, grand, top: int = 20):
    """Group per-op totals into readable families: base op name (index and
    operand list stripped) + the op's FIRST output shape. A multi-step
    program stamps one op per inner step per parameter group
    (multiply_reduce_fusion.8/.32/.56... all the same Adam+norm update over
    a f32[3,3,1024,1024] leaf) — per-name rows hide that the family is the
    top sink; this view sums them."""
    fams = {}
    for name, ns in totals.items():
        m = _SHAPE.search(name)
        shape = m.group(1) if m else "?"
        b = _BASE.match(name)
        base = b.group(1) if b else name[:24]
        key = f"{base} {shape}"
        cur = fams.get(key, [0.0, 0])
        cur[0] += ns
        cur[1] += 1
        fams[key] = cur
    ranked = sorted(fams.items(), key=lambda kv: -kv[1][0])
    return [{"family": k, "ms": round(v[0] / 1e6, 3), "ops": v[1],
             "pct": round(100.0 * v[0] / grand, 2)}
            for k, v in ranked[:top]]


def main():
    arm = sys.argv[1] if len(sys.argv) > 1 else "mtl"
    out_dir = (sys.argv[2] if len(sys.argv) > 2
               else os.path.join("/tmp", f"trace_{arm}"))

    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()

    import jax

    import bench

    bench.setup_compilation_cache()
    bench.require_device()

    # default matches bench.py's per-line headline config (round 5:
    # mtl spc=128, ego spc=64) so a default capture lines up with the
    # ARCHITECTURE.md ledger tables (the round-4/5 tables themselves were
    # captured at the then-default spc=32)
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL",
                             "128" if arm == "mtl" else "64"))
    moments = os.environ.get("BENCH_MOMENTS_DTYPE", "float32")
    if arm == "mtl":
        step, params, opt_state, batch_list, mesh = bench.build_mtl_step(
            spc, moments)
        extra = ()
    elif arm == "ego":
        step, params, opt_state, banks, batch_list, mesh = \
            bench.build_egopack_step(spc, moments)
        extra = (banks,)
    else:
        raise SystemExit(f"unknown arm {arm!r} (mtl|ego)")

    rng = jax.random.PRNGKey(1)
    state = [params, opt_state]

    def dispatch(i):
        state[0], state[1], logs = step(state[0], state[1], *extra,
                                        batch_list,
                                        jax.random.fold_in(rng, i),
                                        i * spc, 1e-5)
        return logs

    for i in range(3):  # compile + warm
        logs = dispatch(i)
    bench._sync(logs)
    print(f"[{arm}] warm (batch={bench.BATCH}, spc={spc})", flush=True)

    with jax.profiler.trace(out_dir):
        for i in range(3, 6):
            logs = dispatch(i)
        bench._sync(logs)

    import glob
    paths = sorted(glob.glob(out_dir + "/**/*.xplane.pb", recursive=True))
    assert paths, f"no xplane written under {out_dir}"
    ledger = aggregate_device_ops(paths[-1])
    ledger["arm"] = arm
    ledger["batch"] = bench.BATCH
    ledger["spc"] = spc
    ledger["xplane"] = paths[-1]
    print(json.dumps(ledger, indent=1))


if __name__ == "__main__":
    main()
