#!/usr/bin/env python3
"""Benchmark: Ego4D clips/sec/chip, fwd+bwd, both training phases.

Line 1 (the driver's headline — keep first): the fused multi-task train step
(AR+LTA+PNR, batch 16 per task — the experiments/mtl.yaml configuration the
reference trains with) at full model size (Omnivore 1536-d features, hidden
1024). One step processes 3 × 16 = 48 clips.

Line 2: the EgoPack phase-2 step (novel OSCC, 3 prototype banks P=2048,
graphone depth 3, backprop backbone — the BASELINE.md phase-2 row), 16
clips/step — so interact-path perf regressions are driver-visible.

The reference publishes no throughput anywhere (BASELINE.md); the
``vs_baseline`` denominators are the A100-class estimates recorded in
BASELINE.md (reference PyG pipeline ~40 it/s ⇒ 2000 clips/s at 48 clips/it
for MTL, 640 clips/s at 16 clips/it for phase 2), to be replaced by measured
numbers when a reference-capable environment exists.

Output: one JSON line per phase {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import time

import jax
import jax.numpy as jnp

import __graft_entry__ as ge
from egopack_tpu.parallel import mesh as pmesh
from egopack_tpu.train import optim as topt

# A100-class estimate for the reference recipe, now ANCHORED by a real
# measurement: scripts/bench_reference.py executes the actual reference model
# code on this host's CPU (45.6 clips/s) next to this framework at identical
# config (42.8 clips/s — both single-core-GEMM-bound, i.e. honest parity on
# the same silicon). 2000 clips/s remains the documented GPU-dispatch-bound
# estimate for the reference on an A100; see BASELINE.md "Measured baseline".
REFERENCE_BASELINE_CLIPS_PER_SEC = 2000.0
# phase-2 denominator: same ~40 it/s dispatch-bound envelope, 16 clips/it
# (one primary task per step in the reference's phase-2 loop)
REFERENCE_EGOPACK_BASELINE_CLIPS_PER_SEC = 640.0

BATCH = int(os.environ.get("BENCH_BATCH", "16"))  # clips per task per step
ACTIVE = ("ar", "lta", "pnr")
WARMUP = 5
STEPS = 10  # x steps_per_call inner steps
# smoke-test knobs (default = full size / full windows): BENCH_FEAT_DIM,
# BENCH_HIDDEN and BENCH_WINDOWS let the harness be validated on CPU in
# seconds (JAX_PLATFORMS=cpu BENCH_FEAT_DIM=32 BENCH_HIDDEN=32
# BENCH_WINDOWS=2) without the tunneled chip
FEAT_DIM = int(os.environ.get("BENCH_FEAT_DIM", "1536"))
HIDDEN = int(os.environ.get("BENCH_HIDDEN", "1024"))
WINDOWS = int(os.environ.get("BENCH_WINDOWS", "7"))


def _sync(logs):
    """Force TRUE device completion by fetching a value to host.

    CRITICAL (round-2 finding): on this image's remote 'axon' TPU platform,
    ``jax.block_until_ready`` returns once the call is ENQUEUED server-side,
    not when it has executed — timing with it overstates throughput by up to
    ~35x. Fetching a scalar from the last step's outputs is the only sync
    that reflects execution. Round-1 numbers in BASELINE.md measured with
    block_until_ready are superseded by the corrected table there."""
    import numpy as np
    return float(np.asarray(jax.tree_util.tree_leaves(logs)[0]).ravel()[-1])


def _timed_windows(run_steps, n_windows: int = None):
    """Median of several timed windows — the dev chip sits behind a shared
    network tunnel whose latency varies run to run."""
    n_windows = WINDOWS if n_windows is None else n_windows
    windows = []
    for w in range(n_windows):
        t0 = time.perf_counter()
        logs = run_steps(w)
        _sync(logs)
        windows.append(time.perf_counter() - t0)
    return sorted(windows)[len(windows) // 2]


def _time_step(step, extra, params, opt_state, batch_list, spc, lr):
    """Shared warmup + timing harness for both phases' multi-steps.
    ``extra`` holds the step's leading extra args (phase-2 banks)."""
    rng = jax.random.PRNGKey(1)
    state = [params, opt_state]
    for i in range(WARMUP):
        state[0], state[1], logs = step(state[0], state[1], *extra,
                                        batch_list,
                                        jax.random.fold_in(rng, i),
                                        i * spc, lr)
    _sync(logs)

    def run_steps(w):
        for i in range(STEPS):
            state[0], state[1], logs = step(state[0], state[1], *extra,
                                            batch_list,
                                            jax.random.fold_in(rng,
                                                               w * 1000 + i),
                                            i * spc, lr)
        return logs

    return _timed_windows(run_steps)


def run_interleaved_arms(arms, steps: int = 8, windows: int = None):
    """Shared interleaved same-process A/B harness (scripts/bench_*_spc.py,
    scripts/bench_moments_dtype.py). Tunnel latency varies hour-to-hour, so
    arms are interleaved per timed window and synced by a host fetch (_sync —
    the load-bearing ROUND-2 CORRECTION lives in ONE place).
    ``windows`` defaults to 5, or BENCH_WINDOWS when set (the CPU smoke knob).

    ``arms``: {name: {step, params, opt_state, extra, batch_list, spc, lr}}
    where ``extra`` is the tuple of leading extra step args (phase-2 banks).
    Warmup/compiles each arm (3 calls), runs ``windows`` interleaved windows
    of ``steps`` dispatches, prints and returns {name: median ms/step}."""
    if windows is None:
        windows = (int(os.environ["BENCH_WINDOWS"])
                   if "BENCH_WINDOWS" in os.environ else 5)
    rng = jax.random.PRNGKey(1)

    def advance(a, key, i):
        a["params"], a["opt_state"], logs = a["step"](
            a["params"], a["opt_state"], *a["extra"], a["batch_list"],
            key, i * a["spc"], a["lr"])
        return logs

    for name, a in arms.items():
        t0 = time.time()
        for i in range(3):  # warmup/compile
            logs = advance(a, jax.random.fold_in(rng, i), i)
        _sync(logs)
        print(f"[{name}] built+warm in {time.time() - t0:.1f}s", flush=True)

    times = {name: [] for name in arms}
    for w in range(windows):
        for name, a in arms.items():  # interleave arms per window
            t0 = time.perf_counter()
            for i in range(steps):
                logs = advance(a, jax.random.fold_in(rng, w * 1000 + i), i)
            _sync(logs)
            times[name].append((time.perf_counter() - t0) / (steps * a["spc"]))

    out = {name: sorted(ts)[len(ts) // 2] * 1e3 for name, ts in times.items()}
    base = next(iter(out))
    print({"ms_per_step": {k: round(v, 4) for k, v in out.items()},
           f"speedup_vs_{base}": {k: round(out[base] / out[k], 4)
                                  for k in out}})
    return out


# bf16 peak matmul throughput per chip, for the MFU field. v5e: 197 TF/s
# (public spec). Extend per device kind; BENCH_PEAK_TFLOPS overrides.
PEAK_TFLOPS_BY_KIND = {"TPU v5 lite": 197.0, "TPU v5e": 197.0,
                       "TPU v4": 275.0, "TPU v6 lite": 918.0}


def _peak_tflops():
    env = os.environ.get("BENCH_PEAK_TFLOPS")
    if env:
        return float(env)
    return PEAK_TFLOPS_BY_KIND.get(jax.devices()[0].device_kind)


def _program_flops(step, *args):
    """Compiled-program FLOPs from XLA's cost analysis (the same counter
    BASELINE.md's roofline sections use). Runs at build time, BEFORE the
    timed windows (the timing loop donates params; lowering needs live
    arrays). Returns None when the backend can't answer."""
    try:
        ca = step.lower(*args).compile().cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)) or None
    except Exception as e:  # pragma: no cover - backend-dependent
        print(f"# cost_analysis unavailable: {type(e).__name__}", flush=True)
        return None


def _report(metric: str, clips: int, elapsed: float, mesh, denominator: float,
            flops: float = None):
    """One JSON scoreboard line. ``flops`` is the compiled cost of ONE
    multi-step program dispatch; a timed window runs STEPS of them, so
    achieved TF/s = flops·STEPS/elapsed, and MFU = that over the chip's
    bf16 peak — making the perf claim self-contained in BENCH_r*.json
    (VERDICT r4 weak #5). ``cost_analysis()`` reports the PER-DEVICE
    (post-GSPMD-partitioning) module's flops — verified: an 8-way
    data-sharded matmul reports 1/8 the single-device count — so the
    per-chip TF/s needs no further division by chip count (clips/s does:
    ``clips`` counts the global batch)."""
    n_chips = mesh.shape["data"] * mesh.shape["model"]
    clips_per_sec_per_chip = clips / elapsed / n_chips
    out = {
        "metric": metric,
        "value": round(clips_per_sec_per_chip, 1),
        "unit": "clips/s/chip",
        "vs_baseline": round(clips_per_sec_per_chip / denominator, 3),
    }
    if flops:
        tflops = flops * STEPS / elapsed / 1e12
        out["tflops"] = round(tflops, 2)
        peak = _peak_tflops()
        if peak:
            out["mfu"] = round(tflops / peak, 4)
    print(json.dumps(out), flush=True)


def build_mtl_step(spc: int, moments_dtype: str = "float32",
                   log_norms="default", fused_layout: str = None,
                   bf16_prop: bool = None):
    """Line-1 harness (fused AR+LTA+PNR step at the experiments/mtl.yaml
    configuration; sized by the BENCH_FEAT_DIM/BENCH_HIDDEN smoke knobs).
    Shared by the bench line below and scripts/bench_mtl_spc.py.
    ``log_norms``: True | False | "last" (BENCH_LOG_NORMS when "default") —
    the per-step grad/param norm passes are an observability extra; "last"
    prices them at 1/spc (system.make_train_step_multi).
    ``fused_layout``: "slice" | "concat" (None → system default / env
    EGOPACK_FUSED_LAYOUT) — the cross-task reasoning layout A/B lever.
    BENCH_BF16_PROP=1 enables full bf16 activation propagation through the
    backbone (the opt-in bandwidth lever; scripts/bench_bf16_prop.py)."""
    if log_norms == "default":
        log_norms = _env_log_norms()
    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" \
        else jnp.float32
    feat_dim, hidden = FEAT_DIM, HIDDEN
    if bf16_prop is None:
        bf16_prop = os.environ.get("BENCH_BF16_PROP") == "1"
    system = ge._build_system(hidden, hidden, feat_dim,
                              propagate_dtype=jnp.bfloat16 if bf16_prop
                              else None)
    system.compute_dtype = dtype
    if fused_layout is not None:
        system.fused_layout = fused_layout
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)

    mesh = pmesh.make_mesh(len(jax.devices()), 1)
    params = pmesh.place_params(params, mesh)
    # production optimizer config: the driver's trainable mask (backbone +
    # the three active heads; the left-out OSCC head is outside the loss
    # graph, torch grad=None semantics)
    from egopack_tpu.train.driver import CKPT_KEYS, trainable_mask_fn
    mask = trainable_mask_fn(["temporal_graph"]
                             + [CKPT_KEYS[t] for t in ACTIVE])
    optimizer = topt.adam(1e-5, 1e-5, trainable_mask=mask,
                          moments_dtype=moments_dtype)
    opt_state = topt.init_opt_state(optimizer, params, mesh)
    step = system.make_train_step_multi(optimizer, ACTIVE, spc,
                                        log_norms=log_norms)

    # batches are generated ON DEVICE (one jit, reused per group): shipping
    # spc host-built groups (~5 MB each) through the tunneled chip's host
    # link costs minutes in degraded windows
    gen = ge.make_device_batch_gen(system, BATCH * mesh.shape["data"],
                                   feat_dim)

    def make_group(seed):
        return {n: pmesh.shard_batch(v, mesh) for n, v in gen(seed).items()
                if n in ACTIVE}

    batch_list = tuple(make_group(s) for s in range(spc))
    return step, params, opt_state, batch_list, mesh


def bench_mtl():
    # production dispatch config: steps_per_call optimizer steps fused into
    # one device call (per-step rng keys identical to separate dispatches).
    # spc=128 default (round 5): ladder 1.085x (32/16) -> 1.058x (64/32) ->
    # 1.028x (128/64), all interleaved same-process (scripts/bench_mtl_spc.py).
    # The ~27 min fresh-compile cost through this image's tunnel is paid once
    # into the repo-local .jax_cache (the ladder A/B itself warmed it)
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "128"))
    # BENCH_MOMENTS_DTYPE=bfloat16 measures the opt-in Adam HBM lever
    # (optimizer.moments_dtype config); float32 = reference-parity numerics
    step, params, opt_state, batch_list, mesh = build_mtl_step(
        spc, os.environ.get("BENCH_MOMENTS_DTYPE", "float32"))

    flops = _program_flops(step, params, opt_state, batch_list,
                           jax.random.PRNGKey(1), 0, 1e-5)
    elapsed = _time_step(step, (), params, opt_state, batch_list, spc, 1e-5)
    _report("ego4d_mtl_clips_per_sec_per_chip_fwd_bwd",
            STEPS * spc * len(ACTIVE) * BATCH * mesh.shape["data"],
            elapsed, mesh, REFERENCE_BASELINE_CLIPS_PER_SEC, flops)


def _env_log_norms():
    """BENCH_LOG_NORMS: true|false|last (default true = production default)."""
    v = os.environ.get("BENCH_LOG_NORMS", "true").lower()
    return {"true": True, "false": False, "last": "last"}[v]


def build_egopack_step(spc: int, moments_dtype: str = "float32",
                       log_norms="default", **graphone_kw):
    """Phase-2 hot-loop harness (novel-OSCC EgoPack step, 3 model-axis-
    shardable prototype banks P=2048, graphone depth 3 / k=8 —
    configs/defaults.yaml graphone block, backprop backbone, SURVEY §3.3;
    sized by the BENCH_FEAT_DIM/BENCH_HIDDEN smoke knobs).
    Shared by the bench line below and scripts/bench_egopack_spc.py.
    ``graphone_kw`` overrides GraphONE fields (knn_impl, force_rows_gather —
    the A/B levers, which are part of the traced configuration)."""
    from egopack_tpu.models.graphone import GraphONE, PrototypeBank
    from egopack_tpu.train.driver import CKPT_KEYS, trainable_mask_fn

    dtype = jnp.bfloat16 if os.environ.get("BENCH_DTYPE", "bfloat16") == "bfloat16" \
        else jnp.float32
    feat_dim, hidden = FEAT_DIM, HIDDEN
    p_pad = 2048 if hidden >= 1024 else 128
    system = ge._build_system(hidden, hidden, feat_dim, phase2=True)
    system.compute_dtype = dtype
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)

    aux_tasks = ("ar", "lta", "pnr")
    bkey = jax.random.PRNGKey(3)
    fill = min(1900, p_pad - 16)  # realistic valid-prototype fill
    banks = {}
    for i, t in enumerate(aux_tasks):
        # device-generated (eager jnp runs on-device): 3 full-size banks are
        # ~24 MB the host link doesn't need to carry
        vals = jax.random.normal(jax.random.fold_in(bkey, i),
                                 (p_pad, hidden), jnp.float32)
        banks[t] = PrototypeBank(vals, jnp.arange(p_pad) < fill)
    graphone = GraphONE(task_labels=aux_tasks, features_size=hidden,
                        hidden_size=hidden, k=8, depth=3, residual=False,
                        **graphone_kw)
    feats0 = {t: jnp.zeros((4, hidden)) for t in aux_tasks}
    params["graphone"] = graphone.init(jax.random.PRNGKey(2), feats0, banks,
                                       method="interact")["params"]

    mesh = pmesh.make_mesh(len(jax.devices()), 1)
    params = pmesh.place_params(params, mesh)
    banks = pmesh.place_banks(banks, mesh)
    mask = trainable_mask_fn(["temporal_graph", CKPT_KEYS["oscc"],
                              "graphone"])
    optimizer = topt.adam(1e-6, 1e-5, trainable_mask=mask,
                          moments_dtype=moments_dtype)
    opt_state = topt.init_opt_state(optimizer, params, mesh)
    if log_norms == "default":
        log_norms = _env_log_norms()
    step = system.make_egopack_train_step_multi(
        optimizer, ("oscc",), graphone, spc, backprop_temporal_graph=True,
        temporal_graph_train_mode=False, late_fusion=True,
        log_norms=log_norms)

    # on-device batch generation, as in build_mtl_step
    gen = ge.make_device_batch_gen(system, BATCH * mesh.shape["data"],
                                   feat_dim)

    def make_group(seed):
        return {"oscc": pmesh.shard_batch(gen(seed)["oscc"], mesh)}

    batch_list = tuple(make_group(s) for s in range(spc))
    return step, params, opt_state, banks, batch_list, mesh


def build_arms(specs, spc: int, builder: str = "mtl"):
    """Build + warm the arm dicts ``run_interleaved_arms`` consumes — the
    shared front half of every per-lever A/B script (bench_knn_pallas,
    bench_fused_layout, bench_b128). ``specs`` is ``[(name, kwargs), ...]``
    where kwargs feed ``build_mtl_step`` / ``build_egopack_step``
    (``builder``). One dispatch per arm pays its compile up front (time
    printed) so the timed windows start warm; timing methodology stays in
    ``run_interleaved_arms``."""
    arms = {}
    for name, kw in specs:
        if builder == "egopack":
            step, params, opt_state, banks, batch_list, _mesh = \
                build_egopack_step(spc, **kw)
            extra, lr = (banks,), 1e-6
        else:
            step, params, opt_state, batch_list, _mesh = \
                build_mtl_step(spc, **kw)
            extra, lr = (), 1e-5
        t0 = time.time()
        params, opt_state, logs = step(params, opt_state, *extra, batch_list,
                                       jax.random.PRNGKey(0), 0, lr)
        _sync(logs)
        print(f"[{name}] compiled in {time.time() - t0:.1f}s", flush=True)
        arms[name] = {"step": step, "params": params, "opt_state": opt_state,
                      "extra": extra, "batch_list": batch_list,
                      "spc": spc, "lr": lr}
    return arms


def bench_egopack():
    # spc=64 default (round 5): measured 1.25x (spc8/spc4), 1.083x
    # (spc16/spc8), 1.068x (spc32/spc16), then 1.026x (spc64/spc32) in
    # scripts/bench_egopack_spc.py interleaved same-process A/Bs; numerics
    # identical for any spc, tested. This line stays at 64 (the MTL line's
    # 128/64 rung bought only 1.028x and phase-2's ladder decays faster —
    # a ~15 min fresh compile is not worth the projected ~1%)
    spc = int(os.environ.get("BENCH_STEPS_PER_CALL", "64"))
    step, params, opt_state, banks, batch_list, mesh = build_egopack_step(
        spc, os.environ.get("BENCH_MOMENTS_DTYPE", "float32"))
    flops = _program_flops(step, params, opt_state, banks, batch_list,
                           jax.random.PRNGKey(1), 0, 1e-6)
    elapsed = _time_step(step, (banks,), params, opt_state, batch_list, spc,
                         1e-6)
    _report("ego4d_egopack_oscc_clips_per_sec_per_chip_fwd_bwd",
            STEPS * spc * BATCH * mesh.shape["data"],
            elapsed, mesh, REFERENCE_EGOPACK_BASELINE_CLIPS_PER_SEC, flops)


def require_device(timeout_s: float = None):
    """Fail fast and legibly when the accelerator is unreachable. The
    tunneled dev chip goes hard-down for multi-hour windows (even an 8x8
    matmul hangs); without this guard bench.py burns its whole command
    window hanging in the first dispatch. jax ops can't be interrupted, so
    the probe runs in a daemon thread and the process aborts (exit 3, no
    JSON line — the driver's parser records rc/tail) on deadline."""
    if timeout_s is None:
        timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "300"))
    import threading
    ok = threading.Event()

    def probe():
        jax.jit(lambda x: x + 1)(jnp.zeros(())).block_until_ready()
        ok.set()

    threading.Thread(target=probe, daemon=True).start()
    if not ok.wait(timeout_s):
        print(f"bench: device unreachable after {timeout_s:.0f}s "
              "(tunnel outage?) — aborting without numbers", flush=True)
        os._exit(3)


def setup_compilation_cache():
    """Persistent XLA compile cache (repo-local, gitignored): first-compile
    of the deep multi-step programs costs minutes through this image's
    tunnel; a warm cache cuts it to seconds. Env var wins if set. Shared by
    main() and the scripts/bench_*.py probes."""
    if "JAX_COMPILATION_CACHE_DIR" not in os.environ:
        cache = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    setup_compilation_cache()
    require_device()
    bench_mtl()
    if os.environ.get("BENCH_SKIP_EGOPACK") != "1":
        bench_egopack()


if __name__ == "__main__":
    main()
