#!/usr/bin/env python3
"""3-seed fixture-quality protocol: the hermetic stand-in for the paper table.

Runs the FULL leave-one-out matrix (the reference's experiment suite,
/root/reference/experiments/egopack/{ar,oscc,lta,pnr}.yaml) on the
planted-signal synthetic fixture at the reference's 3-seed protocol
(README.md:36-39 of the reference repo averages every metric over three
runs): for each novel task, MTL pretraining on the complementary triple, then
EgoPack phase 2 with the reference's per-task hyperparameter SHAPE —
backprop'd train-mode backbone for AR/OSCC/PNR, FROZEN eval-mode backbone for
LTA (lta.yaml: backprop_temporal_graph=False) — and prints mean/min/max for
every headline metric:

    AR verbs/nouns top-1, PNR AUROC + localization error, LTA verb/noun edit
    distance (from the MTL phase), and each novel task's own headline metric
    from its EgoPack phase.

Chance levels on this fixture (6 verbs / 5 nouns): AR 0.17/0.20, OSCC 0.50,
PNR AUROC 0.50, LTA ED ~0.83. Not paper numbers (no real Ego4D in-image) —
this pins end-to-end learning across every task head + the prototype
interaction, seed-robustly. BASELINE.md records the pinned output.

Runs on CPU by default (~1h for the full matrix on one host core; set
EGOPACK_QUALITY_TASKS=oscc for the old single-column run). Set JAX_PLATFORMS
to override the platform — per-batch eval through this image's tunneled TPU
would round-trip the network for every batch (CLAUDE.md environment rules).
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SEEDS = (65, 72, 97)  # the reference's sweep seeds (experiments/egopack/*)

ALL_TASKS = ("ar", "oscc", "lta", "pnr")

# per-task phase-2 shapes (experiments/egopack/*.yaml); lr/epochs are
# fixture-scaled, the backprop/train-mode flags are the reference's
NOVEL_FLAGS = {
    "ar": ["backprop_temporal_graph=True", "temporal_graph_train_mode=True"],
    "oscc": ["backprop_temporal_graph=True",
             "temporal_graph_train_mode=True"],
    "lta": ["backprop_temporal_graph=False",
            "temporal_graph_train_mode=False"],
    "pnr": ["backprop_temporal_graph=True", "temporal_graph_train_mode=True"],
}

# novel-task headline metrics to lift from the driver's final validation
NOVEL_METRICS = {
    "ar": ("verbs_top1", "nouns_top1"),
    "oscc": ("accuracy",),
    "lta": ("verbs_ed", "nouns_ed"),
    "pnr": ("auroc", "localization_error"),
}


def overrides(root, tmp, seed, extra=()):
    return [
        f"seed={seed}", "k=1", "batch_size=4", "num_workers=0",
        "model.hidden_size=32", "model.temporal_pooling.hidden_size=32",
        "oscc_feat_size=32", "model.depth=2", "steps_per_call=4",
        f"dataset_recognition.root={root}", f"dataset_oscc.root={root}",
        f"dataset_lta.root={root}", f"dataset_pnr.root={root}",
        "validation_split=val",
        f"artifact_dir={tmp}/artifacts", f"output_dir={tmp}/outputs",
        "parallel.data=1", "parallel.model=1",
        *extra,
    ]


def run_seed(root, tmp, seed):
    import main_egopack
    import main_temporal
    from egopack_tpu.data.loader import build_dataloader
    from egopack_tpu.eval.meters import build_meter_for_dataset
    from egopack_tpu.eval.validate import validate, validate_lta, validate_pnr

    mtl = main_temporal.main(overrides(root, tmp, seed, [
        "enabled_tasks=[ar,lta,pnr]", "num_epochs=25", "optimizer.lr=1e-3",
        "model.temporal_pooling.dropout=0.0", "save_model=True",
    ]))
    system, params, dsets = mtl["system"], mtl["params"], mtl["dsets"]
    out = {}

    meter = build_meter_for_dataset(dsets["ar"]["val"])
    validate(system.make_eval_step("ar"), params, {},
             build_dataloader(dsets["ar"]["val"], 12, False, 0, False),
             meter, "ar")
    logs = meter.get_logs()
    out["ar_verbs_top1"], out["ar_nouns_top1"] = (logs["verbs_top1"],
                                                  logs["nouns_top1"])

    meter = build_meter_for_dataset(dsets["pnr"]["val"])
    validate_pnr(system.make_eval_step("pnr"), params, {},
                 build_dataloader(dsets["pnr"]["val"], 8, False, 0, False),
                 meter)
    logs = meter.get_logs()
    out["pnr_auroc"] = logs["auroc"]
    out["pnr_loc_err_s"] = logs["localization_error"]

    import jax
    lta_head = system.tasks["lta"].head
    meter = build_meter_for_dataset(dsets["lta"]["val"])
    sample_fn = jax.jit(  # as in the driver (train/driver.py validate wiring)
        lambda logits, key: lta_head.generate_from_logits(logits, key))
    validate_lta(system.make_eval_step("lta"), params, {},
                 build_dataloader(dsets["lta"]["val"], 8, False, 0, False),
                 meter, sample_fn, jax.random.PRNGKey(seed))
    logs = meter.get_logs()
    out["lta_verbs_ed"], out["lta_nouns_ed"] = (logs["verbs_ed"],
                                                logs["nouns_ed"])

    # leave-one-out phase 2 for every novel task; the ar-lta-pnr MTL above
    # already provides novel-OSCC's artifact, the other triples train here
    novel_tasks = [t for t in ALL_TASKS
                   if t in os.environ.get("EGOPACK_QUALITY_TASKS",
                                          ",".join(ALL_TASKS)).split(",")]
    for novel in novel_tasks:
        others = sorted(set(ALL_TASKS) - {novel})
        artifact = f"MTL_{'-'.join(others)}"
        if novel != "oscc":
            main_temporal.main(overrides(root, tmp, seed, [
                f"enabled_tasks=[{','.join(others)}]", "num_epochs=25",
                "optimizer.lr=1e-3", "model.temporal_pooling.dropout=0.0",
                "save_model=True",
            ]))
        ego = main_egopack.main(overrides(root, tmp, seed, [
            f"enabled_tasks=[{novel}]", "enable_graphone=True",
            f"resume_from={artifact}", "graphone.k=2", "graphone.depth=1",
            "graphone.hidden_size=32", "graphone.residual=True",
            "num_epochs=10", "optimizer.lr=1e-3", "task_head_dropout=0.0",
            "model.temporal_pooling.dropout=0.0", "save_model=False",
            *NOVEL_FLAGS[novel],
        ]))
        # headline metrics straight from the driver's final validation — the
        # graphone-interacting eval steps it builds for the active task
        logs = ego["val_metrics"][novel]
        for m in NOVEL_METRICS[novel]:
            out[f"egopack_{novel}_{m}"] = float(logs[m])
    return out


def main():
    # CPU by default (docstring promise). setdefault is NOT enough: this
    # image EXPORTS JAX_PLATFORMS=axon ambiently, so an un-prefixed launch
    # would silently run every per-batch eval through the tunnel (and hang
    # for the protocol's duration during outages). Opt out via
    # EGOPACK_QUALITY_PLATFORM.
    os.environ["JAX_PLATFORMS"] = os.environ.get("EGOPACK_QUALITY_PLATFORM",
                                                 "cpu")
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    import tempfile

    from egopack_tpu.data.synthetic import generate_ego4d_fixture

    base = tempfile.mkdtemp(prefix="egopack_quality_")
    root = generate_ego4d_fixture(os.path.join(base, "ego4d"), feature_dim=32,
                                  n_videos=2, actions_per_clip=30, n_oscc=40,
                                  n_verbs=6, n_nouns=5, learnable=True)
    per_seed = {}
    for seed in SEEDS:
        tmp = os.path.join(base, f"seed{seed}")
        per_seed[seed] = run_seed(root, tmp, seed)
        print(f"[seed {seed}] " + json.dumps(
            {k: round(v, 4) for k, v in per_seed[seed].items()}), flush=True)

    metrics = list(next(iter(per_seed.values())).keys())
    summary = {m: {"mean": round(float(np.mean([per_seed[s][m]
                                                for s in SEEDS])), 4),
                   "min": round(min(per_seed[s][m] for s in SEEDS), 4),
                   "max": round(max(per_seed[s][m] for s in SEEDS), 4)}
               for m in metrics}
    print(json.dumps({"seeds": list(SEEDS), "summary": summary}, indent=1))


if __name__ == "__main__":
    main()
