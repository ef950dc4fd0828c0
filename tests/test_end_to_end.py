"""End-to-end: both training phases on the synthetic fixture, tiny config.

This is the hermetic equivalent of running the reference's two mains — the
test the reference never had (SURVEY.md §4)."""

import os
import os.path as osp

import numpy as np
import pytest

import main_egopack
import main_temporal

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def _mtl_overrides(root, tmp, extra=()):
    return [
        "seed=1", "k=1", "num_epochs=2", "batch_size=4", "num_workers=0",
        "model.hidden_size=32", "model.temporal_pooling.hidden_size=32",
        "oscc_feat_size=32",
        "model.temporal_pooling.dropout=0.5", "model.depth=2",
        "save_model=True",
        f"dataset_recognition.root={root}", f"dataset_oscc.root={root}",
        f"dataset_lta.root={root}", f"dataset_pnr.root={root}",
        "validation_split=val",
        f"artifact_dir={tmp}/artifacts", f"output_dir={tmp}/outputs",
        "parallel.data=1", "parallel.model=1",
        *extra,
    ]


@pytest.fixture(scope="module")
def mtl_run(ego4d_root, tmp_path_factory):
    tmp = str(tmp_path_factory.mktemp("run"))
    result = main_temporal.main(
        _mtl_overrides(ego4d_root, tmp, ["enabled_tasks=[ar,lta,pnr]"]))
    return result, tmp, ego4d_root


def test_mtl_trains_and_saves_artifact(mtl_run):
    result, tmp, _ = mtl_run
    assert result["artifact"] == "MTL_ar-lta-pnr"
    assert osp.exists(osp.join(tmp, "artifacts", "MTL_ar-lta-pnr",
                               "checkpoint.msgpack"))
    # params updated and finite
    leaves = [np.asarray(x) for x in
              __import__("jax").tree_util.tree_leaves(result["params"])]
    assert all(np.isfinite(l).all() for l in leaves)


def test_mtl_checkpoint_keys_match_reference_contract(mtl_run):
    result, tmp, _ = mtl_run
    from egopack_tpu.train.checkpoint import load_artifact
    payload, meta = load_artifact(osp.join(tmp, "artifacts"), "MTL_ar-lta-pnr")
    # same keys as the reference state dict (main_temporal.py:410-416)
    for key in ("temporal_graph", "task/recognition", "task/oscc", "task/lta",
                "task/pnr", "epoch"):
        assert key in payload, key
    assert sorted(meta["tasks"]) == ["ar", "lta", "pnr"]


def test_egopack_phase_on_novel_oscc(mtl_run):
    import glob
    _, tmp, root = mtl_run
    profile = osp.join(tmp, "egopack_trace")
    result = main_egopack.main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc]", "enable_graphone=True",
        "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "graphone.residual=True",
        "task_head_dropout=0.5", "num_epochs=1", "optimizer.lr=1e-6",
        "backprop_temporal_graph=True", "temporal_graph_train_mode=True",
        "validate_all_tasks=False", "save_model=False",
        f"profile_dir={profile}", "log_histograms_every=1",
    ]))
    assert "banks" in result
    # phase-2 histogram snapshots: the graphone subtree must be covered too
    hists = glob.glob(osp.join(result["run_dir"], "histograms_ep*.npz"))
    assert hists, "phase-2 histogram snapshots not emitted"
    npz = np.load(hists[0])
    assert any(k.startswith("grad_hist/graphone/") for k in npz.files)
    assert set(result["banks"].keys()) == {"ar", "lta", "pnr"}
    for b in result["banks"].values():
        assert b.num_valid > 0
        assert np.isfinite(np.asarray(b.values)).all()
    # the phase-2 interact step is the novel hot path: the shared epoch
    # runner gives it the same jax.profiler trace as phase 1 (VERDICT r2)
    assert glob.glob(profile + "/**/*.xplane.pb", recursive=True), \
        "phase-2 profiler trace not written"


def test_predict_lta_submission(mtl_run):
    """LTA test-split prediction export (Ego4D challenge format)."""
    import json
    from egopack_tpu.predict import main as predict_main

    result, tmp, root = mtl_run
    out = osp.join(tmp, "lta_predictions.json")
    predict_main(_mtl_overrides(root, tmp, [
        "resume_from=MTL_ar-lta-pnr",
        "validation_split=test_unannotated",
        f"output={out}",
    ]))
    preds = json.load(open(out))
    assert len(preds) > 0
    first = next(iter(preds.values()))
    assert len(first["verb"]) == 5 and len(first["verb"][0]) == 20
    assert len(first["noun"]) == 5 and len(first["noun"][0]) == 20


def test_predict_oscc_and_pnr_submissions(mtl_run):
    """OSCC/PNR test-split prediction export: classifier decisions keyed by
    unique_id, PNR argmax mapped to an absolute parent-video frame with the
    meter's (end-start)/16 rule. Runs from the single-task predictor (no
    other annotation files required)."""
    import json
    from egopack_tpu.predict import main as predict_main

    _, tmp, root = mtl_run
    out = osp.join(tmp, "oscc_predictions.json")
    predict_main(_mtl_overrides(root, tmp, [
        "resume_from=MTL_ar-lta-pnr",
        "validation_split=test_unannotated",
        "task=oscc", f"output={out}",
    ]))
    preds = json.load(open(out))
    assert len(preds) > 0
    uid, first = next(iter(preds.items()))
    assert uid.startswith("oscc_test")
    assert isinstance(first["state_change"], bool)
    assert 0.0 <= first["prob_change"] <= 1.0

    out = osp.join(tmp, "pnr_predictions.json")
    predict_main(_mtl_overrides(root, tmp, [
        "resume_from=MTL_ar-lta-pnr",
        "validation_split=test_unannotated",
        "task=pnr", f"output={out}",
    ]))
    preds = json.load(open(out))
    assert len(preds) > 0
    uid, first = next(iter(preds.items()))
    assert first["pnr_frame"] >= 0.0


def test_sweep_runner_executes_subprocess(ego4d_root, tmp_path):
    """The sweep runner actually launches runs (1-config grid, tiny model)."""
    import subprocess
    import sys
    import yaml

    spec = {
        "name": "smoke",
        "method": "grid",
        "program": "main_temporal.py",
        "parameters": {"seed": {"values": [1]}},
        "command": ["${env}", "python3", "${program}", "num_epochs=1",
                    "${args_no_hyphens}"],
    }
    yml = tmp_path / "sweep.yaml"
    yml.write_text(yaml.safe_dump(spec))
    extra = _mtl_overrides(ego4d_root, str(tmp_path),
                           ["enabled_tasks=[oscc]", "save_model=False"])
    extra = [o for o in extra if not o.startswith("num_epochs")]
    ret = subprocess.run(
        [sys.executable, "-m", "egopack_tpu.sweep", str(yml), *extra],
        cwd=REPO, capture_output=True, text=True, timeout=400)
    assert ret.returncode == 0, ret.stderr[-2000:]


def test_egopack_multiple_active_tasks_and_validate_all(mtl_run):
    """Phase 2 with TWO active primary tasks + validate_all_tasks=True
    (the reference supports arbitrary enabled subsets and zero-weight
    validation, main_egopack.py:377)."""
    _, tmp, root = mtl_run
    result = main_egopack.main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc,ar]", "enable_graphone=True",
        "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "num_epochs=1", "optimizer.lr=1e-6",
        "validate_all_tasks=True", "save_model=False",
    ]))
    assert set(result["banks"].keys()) == {"ar", "lta", "pnr"}


def test_egopack_trainable_banks(mtl_run):
    """graphone.freeze=False: prototype banks join the param tree and move
    during training (reference nn.Embedding.from_pretrained(freeze=False));
    the artifact persists the TRAINED bank values and evaluates cold to the
    same metrics."""
    from egopack_tpu.evaluate import main as evaluate_main
    from egopack_tpu.train.checkpoint import load_artifact

    _, tmp, root = mtl_run
    result = main_egopack.main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc]", "enable_graphone=True",
        "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "graphone.freeze=False",
        "num_epochs=1", "optimizer.lr=1e-2", "save_model=True",
        "artifact_prefix=TB",
    ]))
    params, banks = result["params"], result["banks"]
    assert "graphone_banks" in params
    moved = any(
        not np.allclose(np.asarray(params["graphone_banks"][t]),
                        np.asarray(banks[t].values))
        for t in banks)
    assert moved

    # the artifact carries the TRAINED values, not the build-time ones
    payload, meta = load_artifact(osp.join(tmp, "artifacts"), "TB_oscc")
    assert meta["graphone"]["freeze"] is False
    np.testing.assert_array_equal(
        np.asarray(payload["graphone_banks"]["ar"]),
        np.asarray(params["graphone_banks"]["ar"]))

    cold = evaluate_main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc]", "resume_from=TB_oscc",
    ]))
    assert abs(cold["oscc"]["accuracy"]
               - result["val_metrics"]["oscc"]["accuracy"]) < 1e-4


def test_egopack_midrun_async_checkpoint_resume(mtl_run):
    """Phase-2 mid-run checkpointing with checkpoint.async_write=True: a
    1-epoch run + resume to epoch 2 reproduces an uninterrupted 2-epoch run
    (phase 1's determinism/resume contract, extended to the EgoPack driver's
    new save site and the async orbax write path)."""
    import jax
    _, tmp, root = mtl_run
    common = ["enabled_tasks=[oscc]", "enable_graphone=True",
              "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
              "graphone.hidden_size=32", "optimizer.lr=1e-4",
              "save_model=False"]
    straight = main_egopack.main(
        _mtl_overrides(root, tmp, common + ["num_epochs=2"]))
    ck = ["checkpoint.enable=True", f"checkpoint.dir={tmp}/ck_ego",
          "checkpoint.async_write=True"]
    main_egopack.main(_mtl_overrides(root, tmp, common + ck + ["num_epochs=1"]))
    # per-phase namespace: phase-2 checkpoints never collide with phase-1's
    assert osp.isdir(osp.join(tmp, "ck_ego", "egopack_MTL_oscc",
                              "step_000001"))
    resumed = main_egopack.main(
        _mtl_overrides(root, tmp, common + ck + ["num_epochs=2"]))
    for a, b in zip(jax.tree_util.tree_leaves(resumed["params"]),
                    jax.tree_util.tree_leaves(straight["params"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_egopack_artifact_cold_reload_matches_in_memory(mtl_run):
    """Phase-2 artifact completeness (VERDICT item 2): train with
    save_model=True, reload the artifact COLD via egopack_tpu.evaluate, and
    reproduce the final-epoch validation metrics from disk alone — the
    reference persists graphone.state_dict() incl. the frozen prototype
    embeddings (main_egopack.py:453-459)."""
    from egopack_tpu.evaluate import main as evaluate_main

    _, tmp, root = mtl_run
    overrides = _mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc]", "enable_graphone=True",
        "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "graphone.residual=True",
        "num_epochs=1", "optimizer.lr=1e-6", "save_model=True",
        "validate_all_tasks=False",
    ])
    result = main_egopack.main(overrides)
    assert result["artifact"] == "MTL_oscc"
    in_memory = result["val_metrics"]["oscc"]

    # artifact payload carries banks + masks + meta
    from egopack_tpu.train.checkpoint import load_artifact
    payload, meta = load_artifact(osp.join(tmp, "artifacts"), "MTL_oscc")
    assert set(payload["graphone_banks"]) == {"ar", "lta", "pnr"}
    assert set(payload["graphone_bank_masks"]) == {"ar", "lta", "pnr"}
    assert meta["phase"] == "egopack"
    assert sorted(meta["aux_tasks"]) == ["ar", "lta", "pnr"]

    cold = evaluate_main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[oscc]", "resume_from=MTL_oscc",
    ]))
    assert set(cold) == {"oscc"}
    for key in ("accuracy", "loss"):
        assert abs(cold["oscc"][key] - in_memory[key]) < 1e-4, key


def test_mtl_artifact_cold_reload_matches_in_memory(mtl_run):
    """Phase-1 artifacts also evaluate cold (same CLI)."""
    from egopack_tpu.evaluate import main as evaluate_main

    result, tmp, root = mtl_run
    cold = evaluate_main(_mtl_overrides(root, tmp, [
        "resume_from=MTL_ar-lta-pnr",
    ]))
    assert set(cold) == {"ar", "lta", "pnr"}
    in_memory = result["val_metrics"]
    for key in ("verbs_top1", "nouns_top1", "loss"):
        assert abs(cold["ar"][key] - in_memory["ar"][key]) < 1e-4, key
    assert abs(cold["pnr"]["localization_error"]
               - in_memory["pnr"]["localization_error"]) < 1e-4


def test_predict_lta_from_egopack_artifact(mtl_run):
    """Challenge predictions from a PHASE-2 artifact run the full EgoPack
    model: aux classifiers + prototype-bank interaction reconstructed from
    the artifact alone (the paper's headline LTA configuration)."""
    import json
    from egopack_tpu.predict import main as predict_main

    _, tmp, root = mtl_run
    result = main_egopack.main(_mtl_overrides(root, tmp, [
        "enabled_tasks=[lta]", "enable_graphone=True",
        "resume_from=MTL_ar-lta-pnr", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "num_epochs=1", "optimizer.lr=1e-4",
        "backprop_temporal_graph=False", "save_model=True",
    ]))
    assert result["artifact"] == "MTL_lta"

    out = osp.join(tmp, "lta_egopack_predictions.json")
    predict_main(_mtl_overrides(root, tmp, [
        "resume_from=MTL_lta",
        "validation_split=test_unannotated",
        f"output={out}",
    ]))
    preds = json.load(open(out))
    assert len(preds) > 0
    first = next(iter(preds.values()))
    assert len(first["verb"]) == 5 and len(first["verb"][0]) == 20


def test_bench_emits_two_parseable_json_lines():
    """bench.py is the driver's headline artifact (BENCH_r{N}.json parses
    line 1; line 2 is the EgoPack step) — guard both lines' schema with the
    CPU smoke knobs."""
    import json
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_FEAT_DIM="32",
               BENCH_HIDDEN="32", BENCH_WINDOWS="2",
               # pin the remaining knobs for hermeticity (an ambient
               # BENCH_SKIP_EGOPACK=1 would drop line 2; a deep ambient
               # BENCH_STEPS_PER_CALL would blow the compile budget)
               BENCH_STEPS_PER_CALL="4", BENCH_DTYPE="bfloat16",
               BENCH_MOMENTS_DTYPE="float32",
               # CPU has no peak-TF/s table entry; pin the override so the
               # mfu field emits deterministically in the smoke
               BENCH_PEAK_TFLOPS="197")
    env.pop("BENCH_SKIP_EGOPACK", None)
    # the conftest exports an 8-virtual-device XLA_FLAGS; bench on ONE
    # device keeps this smoke fast (mesh-size behavior is tested elsewhere)
    env["XLA_FLAGS"] = " ".join(
        f for f in env.get("XLA_FLAGS", "").split()
        if "host_platform_device_count" not in f)
    ret = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                         capture_output=True, text=True, timeout=500,
                         env=env)
    assert ret.returncode == 0, ret.stderr[-2000:]
    lines = [l for l in ret.stdout.splitlines() if l.startswith("{")]
    assert len(lines) == 2, ret.stdout
    mtl, ego = (json.loads(l) for l in lines)
    assert mtl["metric"] == "ego4d_mtl_clips_per_sec_per_chip_fwd_bwd"
    assert ego["metric"] == "ego4d_egopack_oscc_clips_per_sec_per_chip_fwd_bwd"
    for line in (mtl, ego):
        assert line["unit"] == "clips/s/chip"
        assert line["value"] > 0 and line["vs_baseline"] > 0
        # round-5 scoreboard fields: achieved TF/s from XLA cost analysis
        # and the fraction of the (BENCH_PEAK_TFLOPS-pinned) chip peak
        assert line["tflops"] > 0
        assert 0 < line["mfu"] < 1


def test_interleaved_harness_honors_windows_knob(monkeypatch):
    """run_interleaved_arms: BENCH_WINDOWS (the CPU smoke knob) must bound
    the timed windows, and every arm gets 3 warmup calls + windows*steps
    timed calls."""
    import bench

    calls = {"n": 0}

    def step(params, opt_state, batch_list, key, i, lr):
        calls["n"] += 1
        return params, opt_state, {"v": np.zeros(1)}

    arms = {"a": {"step": step, "params": 0, "opt_state": 0, "extra": (),
                  "batch_list": (), "spc": 2, "lr": 0.0}}
    monkeypatch.setenv("BENCH_WINDOWS", "2")
    out = bench.run_interleaved_arms(arms, steps=3)
    assert calls["n"] == 3 + 2 * 3  # warmup + windows x steps
    assert set(out) == {"a"} and out["a"] >= 0.0


def test_bench_aborts_legibly_when_device_unreachable():
    """require_device: an unreachable accelerator must abort fast with a
    NON-JSON message and exit 3 (so the driver records rc/tail instead of
    parsing an error as the headline metric, and a tunnel outage doesn't
    burn the whole command window hanging)."""
    import subprocess
    import sys

    env = dict(os.environ, JAX_PLATFORMS="cpu", BENCH_DEVICE_TIMEOUT="0")
    ret = subprocess.run([sys.executable, "bench.py"], cwd=REPO,
                         capture_output=True, text=True, timeout=120,
                         env=env)
    assert ret.returncode == 3, (ret.returncode, ret.stderr[-500:])
    assert "device unreachable" in ret.stdout
    assert not [l for l in ret.stdout.splitlines() if l.startswith("{")]


def test_device_batch_gen_matches_host_generator_contract():
    """bench.py's on-device batch generator must stay a drop-in twin of
    __graft_entry__._synthetic_batches: identical tree shapes/dtypes (the
    jitted step executables key on them — a drift silently invalidates the
    compile cache AND the measured config) and the same label semantics."""
    import jax
    import jax.tree_util as tu
    import numpy as np

    import __graft_entry__ as ge

    system = ge._build_system(32, 32, 32)
    host = ge._synthetic_batches(system, 8, 32, seed=0)
    dev = ge.make_device_batch_gen(system, 8, 32)(0)
    hs = tu.tree_map(lambda a: (a.shape, str(a.dtype)), host)
    ds = tu.tree_map(lambda a: (a.shape, str(a.dtype)), dev)
    assert hs == ds

    y = np.asarray(dev["lta"]["y"])
    assert (y[:, 2:, 0] > 0).all()          # strict y>0 LTA verb quirk
    assert (y[:, :2] == -1).all()           # input clips carry no labels
    assert (np.asarray(dev["pnr"]["y"]).sum(axis=1) == 1).all()  # one-hot
    ar = np.asarray(dev["ar"]["y"])
    center = ar[:, ar.shape[1] // 2]
    assert (center >= 0).all()              # center node labeled
    mask = np.ones(ar.shape[1], bool)
    mask[ar.shape[1] // 2] = False
    assert (ar[:, mask] == -1).all()        # all other nodes ignored
    assert set(np.unique(np.asarray(dev["oscc"]["y"]))) <= {0, 1}


@pytest.mark.parametrize("novel,flags", [
    # per-task phase-2 shapes from the reference experiment suite
    # (/root/reference/experiments/egopack/{ar,lta,pnr}.yaml): AR backprops a
    # train-mode backbone at lr 1e-4; LTA runs a FROZEN eval-mode backbone;
    # PNR backprops a train-mode backbone at lr 1e-6
    ("ar", ["optimizer.lr=1e-4", "backprop_temporal_graph=True",
            "temporal_graph_train_mode=True"]),
    ("lta", ["optimizer.lr=1e-4", "backprop_temporal_graph=False",
             "temporal_graph_train_mode=False"]),
    ("pnr", ["optimizer.lr=1e-6", "backprop_temporal_graph=True",
             "temporal_graph_train_mode=True"]),
])
def test_egopack_phase_on_novel_task(novel, flags, ego4d_root, tmp_path):
    """Leave-one-out matrix beyond novel-OSCC (VERDICT r3 missing #2): each
    remaining novel task driven through BOTH mains — MTL on the complementary
    triple, then EgoPack phase 2 with the reference's per-task hyperparameter
    shape (aux-logit fusion on the multi-head AR/LTA classifiers, frozen
    backbone for LTA, PNR squeeze fusion under graphone)."""
    import jax

    others = sorted(set(("ar", "oscc", "lta", "pnr")) - {novel})
    tmp = str(tmp_path)
    artifact = f"MTL_{'-'.join(others)}"
    mtl = main_temporal.main(_mtl_overrides(ego4d_root, tmp, [
        f"enabled_tasks=[{','.join(others)}]", "num_epochs=1"]))
    assert mtl["artifact"] == artifact

    result = main_egopack.main(_mtl_overrides(ego4d_root, tmp, [
        f"enabled_tasks=[{novel}]", "enable_graphone=True",
        f"resume_from={artifact}", "graphone.k=2", "graphone.depth=1",
        "graphone.hidden_size=32", "graphone.residual=True",
        "num_epochs=1", "save_model=False", *flags]))
    assert set(result["banks"]) == set(others)
    for b in result["banks"].values():
        assert b.num_valid > 0
        assert np.isfinite(np.asarray(b.values)).all()
    # the novel task trained and validated through the driver
    vm = result["val_metrics"][novel]
    for k, v in vm.items():
        if isinstance(v, (int, float)):
            assert np.isfinite(v), (k, v)
    leaves = [np.asarray(x) for x in
              jax.tree_util.tree_leaves(result["params"])]
    assert all(np.isfinite(l).all() for l in leaves)


def test_loader_processes_trajectory_bitwise(ego4d_root, tmp_path):
    """``loader_processes`` must be a pure throughput knob: the worker-pool
    batch stream is bitwise the single-process loader's (test_data.py), so
    the full training trajectory through the driver — MultiLoader
    wraparound, per-epoch set_epoch, spc grouping — must be too. This is
    the CLI-level wiring check for the reference's ``num_workers``
    process-worker capability (/root/reference/utils/dataloading.py:56-70)."""
    import jax

    params = {}
    for lp in (0, 1):
        tmp = str(tmp_path / f"lp{lp}")
        res = main_temporal.main(_mtl_overrides(ego4d_root, tmp, [
            "enabled_tasks=[ar,oscc]", f"loader_processes={lp}",
            "save_model=False"]))
        params[lp] = res["params"]
    a = jax.tree_util.tree_leaves(params[0])
    b = jax.tree_util.tree_leaves(params[1])
    assert len(a) == len(b) > 0
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_build_system_honors_env_layout_override(ego4d_root, tmp_path,
                                                 monkeypatch):
    """EGOPACK_FUSED_LAYOUT must override the CONFIG value on the CLI path:
    defaults.yaml always supplies fused_layout, so resolving the env only
    when the config omits the key would make the documented parity escape
    hatch (`EGOPACK_FUSED_LAYOUT=slice`, PARITY.md) silently dead."""
    from egopack_tpu.config import compose, default_config_dir
    from egopack_tpu.train import driver as drv

    cfg = compose(default_config_dir(), "defaults",
                  overrides=_mtl_overrides(ego4d_root, str(tmp_path)))
    assert cfg.get("fused_layout") == "auto"  # the always-present default
    dsets = drv.build_datasets(cfg)
    try:
        monkeypatch.setenv("EGOPACK_FUSED_LAYOUT", "slice")
        assert drv.build_system(cfg, dsets).fused_layout == "slice"
        monkeypatch.delenv("EGOPACK_FUSED_LAYOUT")
        assert drv.build_system(cfg, dsets).fused_layout == "auto"
    finally:
        drv.close_loaders(dsets)


def test_unpack_artifact_pins_xla_knn_for_model_sharding(ego4d_root,
                                                         tmp_path):
    """Cold eval/predict of an EgoPack artifact under parallel.model>1 must
    build GraphONE with knn_impl='xla' (same pin as train_egopack): the
    banks get row-sharded over the model axis and the Pallas kNN kernel is
    a Mosaic custom call GSPMD cannot partition."""
    import jax.numpy as jnp

    from egopack_tpu.config import compose, default_config_dir
    from egopack_tpu.train.checkpoint import unpack_artifact

    def payload():
        return {
            "graphone_banks": {"ar": np.zeros((4, 8), np.float32)},
            "graphone_bank_masks": {"ar": np.ones(4, bool)},
            "graphone": {},
        }

    meta = {"phase": "egopack", "aux_tasks": ["ar"]}
    base = _mtl_overrides(ego4d_root, str(tmp_path))
    cfg = compose(default_config_dir(), "defaults",
                  overrides=base + ["parallel.model=2"])
    _, _, graphone, _, _, _ = unpack_artifact(payload(), dict(meta), cfg)
    assert graphone.knn_impl == "xla"

    cfg1 = compose(default_config_dir(), "defaults", overrides=base)
    _, _, graphone1, _, _, _ = unpack_artifact(payload(), dict(meta), cfg1)
    assert graphone1.knn_impl == "auto"  # unsharded: platform default
