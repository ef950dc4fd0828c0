"""Config system: composition, overrides, interpolation, instantiation."""

import os.path as osp

import pytest

from egopack_tpu.config import compose, default_config_dir, instantiate


def test_compose_defaults():
    cfg = compose(default_config_dir())
    assert cfg.seed == 1
    assert cfg.batch_size == 4
    assert cfg.model.hidden_size == 1024
    assert cfg.model.temporal_pooling.hidden_size == 4096
    assert cfg.dataset_recognition.num_segments == 3
    # interpolation: T_max mirrors num_epochs (reference configs/defaults.yaml:24)
    assert cfg.lr_scheduler.T_max == cfg.num_epochs


def test_cli_overrides_mtl_sweep():
    # the exact override list emitted by experiments/mtl.yaml in the reference
    overrides = [
        "seed=1", "k=1", "model=graph", "num_epochs=40",
        "model/temporal_pooling=trn", "model.temporal_pooling.hidden_size=1024",
        "model.temporal_pooling.dropout=0.5", "model.hidden_size=1024",
        "model.depth=3", "num_workers=1", "batch_size=16", "save_model=True",
        "dataset_recognition.features=omnivore_video_swinl",
        "enabled_tasks=[ar,oscc,lta]",
    ]
    cfg = compose(default_config_dir(), overrides=overrides)
    assert cfg.k == 1
    assert cfg.num_epochs == 40
    assert cfg.lr_scheduler.T_max == 40  # interpolation resolves post-override
    assert cfg.batch_size == 16
    assert cfg.model.temporal_pooling.hidden_size == 1024
    assert cfg.save_model is True
    assert cfg.enabled_tasks == ["ar", "oscc", "lta"]


def test_instantiate_target():
    cfg = {"_target_": "collections.OrderedDict", "a": 1}
    obj = instantiate(cfg)
    assert obj["a"] == 1


def test_config_dir_exists():
    assert osp.isdir(default_config_dir())


def test_sweep_runner_expands_grid(tmp_path):
    import yaml
    from egopack_tpu.sweep import build_commands

    spec = yaml.safe_load(open("experiments/egopack/oscc.yaml"))
    cmds = build_commands(spec, extra=["num_epochs=1"])
    assert len(cmds) == 15  # 5 depths × 3 seeds
    assert all("main_egopack.py" in c[1] for c in cmds)
    assert any("graphone.depth=5" in " ".join(c) for c in cmds)
    assert all("num_epochs=1" == c[-1] for c in cmds)


def test_config_surface_covers_reference():
    """Every config key the reference exposes must exist in our tree with the
    same default (BASELINE.json mandates 'same Hydra configs'); our documented
    additions are allowed extras."""
    import yaml

    ref_path = "/root/reference/configs/defaults.yaml"
    if not osp.exists(ref_path):
        import pytest
        pytest.skip("reference not mounted")
    with open(ref_path) as f:
        ref = yaml.safe_load(f)
    ref.pop("defaults", None)
    cfg = compose(default_config_dir())

    def norm(v):
        try:
            return float(v)
        except (TypeError, ValueError):
            return v

    skip_values = {"device", "validation_split", "artifact_prefix"}
    for key, ref_val in ref.items():
        assert key in cfg, f"missing reference config key: {key}"
        if isinstance(ref_val, dict):
            for sub, sub_val in ref_val.items():
                assert sub in cfg[key], f"missing {key}.{sub}"
                if sub == "_target_":
                    continue  # _target_s intentionally point at our classes
                if isinstance(sub_val, str) and sub_val.startswith("${"):
                    continue  # raw interpolation; ours is resolved
                assert norm(cfg[key][sub]) == norm(sub_val), (key, sub)
        elif key not in skip_values and key != "name":
            assert norm(cfg[key]) == norm(ref_val), (key, cfg[key], ref_val)


def test_aggregate_three_seed_protocol(tmp_path):
    """Metric aggregation groups runs by config-minus-seed and averages the
    final value per metric (the reference's 3-run evaluation protocol)."""
    import json
    from egopack_tpu.aggregate import aggregate

    for seed, acc in [(65, 0.70), (72, 0.72), (97, 0.74)]:
        d = tmp_path / f"run_{seed}"
        d.mkdir()
        (d / "config.json").write_text(json.dumps(
            {"seed": seed, "enabled_tasks": ["oscc"], "lr": 1e-6}))
        with open(d / "metrics.jsonl", "w") as f:
            f.write(json.dumps({"step": 1, "val/oscc/accuracy": 0.5}) + "\n")
            f.write(json.dumps({"step": 2, "val/oscc/accuracy": acc}) + "\n")
    out = aggregate(str(tmp_path))
    (label, metrics), = out.items()
    assert "oscc" in label and "65" in label
    assert metrics["val/oscc/accuracy"]["n"] == 3
    assert metrics["val/oscc/accuracy"]["mean"] == pytest.approx(0.72)


def test_aggregate_distinguishes_swept_params(tmp_path):
    """Sweeps varying a non-seed param (e.g. graphone.depth) must produce
    DISTINCT labels per configuration — not collapse into one overwritten
    entry."""
    import json
    from egopack_tpu.aggregate import aggregate

    for depth in (1, 3):
        for seed, acc in [(65, 0.6 + depth / 10), (72, 0.62 + depth / 10)]:
            d = tmp_path / f"run_d{depth}_s{seed}"
            d.mkdir()
            (d / "config.json").write_text(json.dumps(
                {"seed": seed, "enabled_tasks": ["oscc"],
                 "graphone": {"depth": depth, "k": 4}}))
            (d / "metrics.jsonl").write_text(
                json.dumps({"step": 1, "val/oscc/accuracy": acc}) + "\n")
    out = aggregate(str(tmp_path))
    assert len(out) == 2, list(out)
    labels = sorted(out)
    assert any("graphone.depth=1" in l for l in labels), labels
    assert any("graphone.depth=3" in l for l in labels), labels
    for metrics in out.values():
        assert metrics["val/oscc/accuracy"]["n"] == 2


def test_run_logger_unique_dirs(tmp_path):
    """Two runs with the same name (seed-less sweep patterns) get separate
    directories — the 3-seed protocol must not append into one jsonl."""
    from egopack_tpu.utils.logging import RunLogger

    a = RunLogger(str(tmp_path), "OSCC_depth-1", {"seed": 65})
    a.log({"m": 1.0}, step=1)
    a.close()
    b = RunLogger(str(tmp_path), "OSCC_depth-1", {"seed": 72})
    b.log({"m": 2.0}, step=1)
    b.close()
    assert a.dir != b.dir
    assert len(open(f"{a.dir}/metrics.jsonl").readlines()) == 1
    assert len(open(f"{b.dir}/metrics.jsonl").readlines()) == 1


def test_sweep_drops_all_wandb_placeholders():
    """The default wandb command template uses ${interpreter}/${args} too —
    no placeholder may leak into the CLI as a literal argument."""
    from egopack_tpu.sweep import build_commands

    spec = {
        "program": "main_temporal.py",
        "command": ["${env}", "${interpreter}", "${program}", "${args}"],
        "parameters": {"seed": {"values": [1]}},
    }
    (cmd,) = build_commands(spec)
    assert not any(a.startswith("${") for a in cmd), cmd
    assert cmd[1] == "main_temporal.py" and "seed=1" in cmd


def test_artifact_overwrite_keeps_previous_version(tmp_path):
    """Both phases use the SAME artifact name (reference contract); a local
    re-save must version the previous contents like wandb, not destroy
    them."""
    import numpy as np
    from egopack_tpu.train.checkpoint import load_artifact, save_artifact

    save_artifact(str(tmp_path), "MTL_oscc", {"w": np.ones(3)},
                  meta={"phase": "mtl"})
    save_artifact(str(tmp_path), "MTL_oscc", {"w": np.zeros(3)},
                  meta={"phase": "egopack"})
    payload, meta = load_artifact(str(tmp_path), "MTL_oscc")
    assert meta["phase"] == "egopack" and (payload["w"] == 0).all()
    import os.path as osp
    assert osp.exists(tmp_path / "MTL_oscc" / "checkpoint_v1.msgpack")
    assert osp.exists(tmp_path / "MTL_oscc" / "meta_v1.json")
