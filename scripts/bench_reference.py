"""Measured baseline: the ACTUAL reference train step vs this framework.

Round-1's BASELINE.md used a provisional 2,000 clips/s denominator (an
estimate of the reference on an A100). This script replaces guesswork with a
measurement the image can actually make: it executes the REAL reference model
code (/root/reference models + criterion, via the pure-torch PyG shims in
tests/refshim/) through the exact main_temporal.py:87-130 step composition —
4 sequential task forwards, criterion, summed backward, Adam — at the
experiments/mtl.yaml configuration (batch 16, hidden 1024, 1536-d features,
AR+LTA+PNR), on this host's CPU; then runs this framework's fused step at the
identical configuration on the same CPU (XLA CPU backend, 1 device).

Both numbers are device-resident compute-path throughput (no data loading),
the same definition bench.py uses on TPU, so the three-way comparison
(reference-CPU, egopack_tpu-CPU, egopack_tpu-TPU) is like-for-like.

Usage: python scripts/bench_reference.py [--steps 10] [--skip-jax|--skip-torch]
Appends one JSON line per stack to stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys
import time

import numpy as np

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))
SHIM = osp.join(REPO, "tests", "refshim")
REF = "/root/reference"

BATCH = 16
FEAT_DIM, HIDDEN = 1536, 1024
N_VERBS, N_NOUNS = 115, 478
TASKS = ("ar", "lta", "pnr")  # the mtl.yaml leave-OSCC-out triple
NODES = {"ar": 9, "lta": 22, "pnr": 16}
SEGMENTS = 3
CLIPS_PER_STEP = BATCH * len(TASKS)


def bench_reference(steps: int) -> dict:
    import torch
    for p in (REF, SHIM):
        if p not in sys.path:
            sys.path.insert(0, p)
    import torch_geometric  # noqa: F401  (must resolve to the shim)
    assert "refshim" in torch_geometric.__file__
    from models.graph import Graph
    from models.tasks import LTATask, PNRTask, RecognitionTask
    from criterion.wrapper import MetricSelectorWrapper
    from torch_geometric.data import Data

    torch.manual_seed(0)
    tp_cfg = {"_target_": "models.temporal_pooling.trn_pooling.TRNPooling",
              "hidden_size": HIDDEN, "dropout": 0.5}
    model = Graph(input_size=FEAT_DIM, hidden_size=HIDDEN, depth=3,
                  pre_dropout=0.0, temporal_pooling=tp_cfg,
                  num_segments=SEGMENTS)
    heads = {
        "ar": RecognitionTask(HIDDEN, HIDDEN, heads=(N_VERBS, N_NOUNS),
                              head_dropout=0.5),
        "lta": LTATask(HIDDEN, HIDDEN, heads=(N_VERBS, N_NOUNS),
                       head_dropout=0.5),
        "pnr": PNRTask(HIDDEN, HIDDEN, head_dropout=0.5),
    }
    model.train()
    for h in heads.values():
        h.train()
    params = list(model.parameters())
    for h in heads.values():
        params += list(h.parameters())
    opt = torch.optim.Adam(params, lr=1e-5)

    class _Duck:
        has_joint_label = False
        num_labels = 2

    ce = torch.nn.CrossEntropyLoss(reduction="none", ignore_index=-1)
    crits = {"ar": MetricSelectorWrapper(ce, dataset=_Duck()),
             "lta": MetricSelectorWrapper(ce, dataset=_Duck()),
             "pnr": torch.nn.BCEWithLogitsLoss(reduction="none")}

    rng = np.random.default_rng(0)

    def make_data(task: str) -> Data:
        n = NODES[task]
        x = torch.tensor(rng.standard_normal(
            (BATCH * n, SEGMENTS, FEAT_DIM)).astype(np.float32))
        if task == "ar":
            y = np.full((BATCH * n, 2), -1, np.int64)
            y[n // 2::n, 0] = rng.integers(0, N_VERBS, BATCH)
            y[n // 2::n, 1] = rng.integers(0, N_NOUNS, BATCH)
        elif task == "lta":
            y = np.zeros((BATCH * n, 2), np.int64)
            y = y.reshape(BATCH, n, 2)
            y[:, :2] = -1
            y[:, 2:, 0] = rng.integers(1, N_VERBS, (BATCH, n - 2))
            y[:, 2:, 1] = rng.integers(0, N_NOUNS, (BATCH, n - 2))
            y = y.reshape(BATCH * n, 2)
        else:
            y = np.zeros((BATCH, n), np.int64)
            y[np.arange(BATCH), rng.integers(0, n, BATCH)] = 1
            y = y.reshape(-1)
        # chain graph (RadiusGraph r=1.5 over integer pos) + LTA forecast edges
        pos = np.arange(n, dtype=np.float32)
        adj = (np.abs(pos[:, None] - pos[None, :]) <= 1.5) & ~np.eye(n, dtype=bool)
        if task == "lta":
            adj[2:, 1] = True  # last input clip -> every forecast node
        t_i, s_i = np.nonzero(adj)
        srcs = np.concatenate([s_i + i * n for i in range(BATCH)])
        dsts = np.concatenate([t_i + i * n for i in range(BATCH)])
        return Data(x=x, y=torch.tensor(y),
                    pos=torch.tensor(np.tile(pos, BATCH)),
                    edge_index=torch.tensor(np.stack([srcs, dsts])),
                    batch=torch.arange(BATCH).repeat_interleave(n))

    datas = {t: make_data(t) for t in TASKS}

    def step():
        # main_temporal.py:87-130: 4 forwards, criterion, summed backward
        opt.zero_grad()
        losses = []
        for t in TASKS:
            feat = model(datas[t])
            tfeat = heads[t].forward_features(feat)
            logits = heads[t].forward_logits(tfeat)
            y = datas[t].y.float() if t == "pnr" else datas[t].y
            losses.append(crits[t](logits, y).mean())
        torch.stack(losses).sum().backward()
        opt.step()

    step()  # warmup
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = (time.perf_counter() - t0) / steps
    return {"metric": "reference_cpu_clips_per_sec",
            "value": round(CLIPS_PER_STEP / dt, 2), "unit": "clips/s",
            "ms_per_step": round(dt * 1000, 1), "steps": steps,
            "stack": "reference torch (real model code, refshim PyG)"}


def bench_egopack(steps: int) -> dict:
    import jax
    jax.config.update("jax_platforms", "cpu")
    sys.path.insert(0, REPO)
    import __graft_entry__ as ge
    from egopack_tpu.train import optim as topt

    system = ge._build_system(HIDDEN, HIDDEN, FEAT_DIM)
    params = system.init_params(jax.random.PRNGKey(0), FEAT_DIM)
    optimizer = topt.adam(1e-5, 0.0)
    opt_state = optimizer.init(params)
    step = system.make_train_step(optimizer, TASKS)
    batches = {t: b for t, b in
               ge._synthetic_batches(system, BATCH, FEAT_DIM).items()
               if t in TASKS}
    rng = jax.random.PRNGKey(1)
    params, opt_state, _ = step(params, opt_state, batches, rng, 1e-5)
    jax.block_until_ready(params)  # compile + warmup
    t0 = time.perf_counter()
    for i in range(steps):
        params, opt_state, _ = step(params, opt_state, batches,
                                    jax.random.fold_in(rng, i), 1e-5)
    jax.block_until_ready(params)
    dt = (time.perf_counter() - t0) / steps
    return {"metric": "egopack_tpu_cpu_clips_per_sec",
            "value": round(CLIPS_PER_STEP / dt, 2), "unit": "clips/s",
            "ms_per_step": round(dt * 1000, 1), "steps": steps,
            "stack": "egopack_tpu fused step (XLA CPU, 1 device)"}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--skip-torch", action="store_true")
    ap.add_argument("--skip-jax", action="store_true")
    args = ap.parse_args()
    torch_threads = os.environ.get("BENCH_TORCH_THREADS")
    if torch_threads:
        import torch
        torch.set_num_threads(int(torch_threads))
    if not args.skip_jax:
        print(json.dumps(bench_egopack(args.steps)), flush=True)
    if not args.skip_torch:
        print(json.dumps(bench_reference(args.steps)), flush=True)


if __name__ == "__main__":
    main()
