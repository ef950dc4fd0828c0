"""Multi-host integration tests (VERDICT round-1 item 4).

Covers the three layers: per-process loader sharding (global schedule
preserved), global-batch assembly (single-process == shard_batch), and a REAL
2-process ``jax.distributed`` run over localhost whose result must match a
single-process control run of the identical global batch.
"""

import json
import os
import os.path as osp
import socket
import subprocess
import sys

import numpy as np
import pytest

import jax

from egopack_tpu.data.loader import build_dataloader
from egopack_tpu.parallel import mesh as pmesh
from egopack_tpu.parallel import multihost as mh

REPO = osp.dirname(osp.dirname(osp.abspath(__file__)))


def test_global_batch_single_process_matches_shard_batch():
    mesh = pmesh.make_mesh(4, 1)
    batch = {"x": np.random.default_rng(0).normal(size=(8, 3)).astype(np.float32),
             "y": np.arange(8, dtype=np.int32),
             "valid": np.ones(8, bool),
             "clip_uid": ["a"] * 8}  # non-device key must be dropped
    a = mh.put_batch(batch, mesh)
    b = pmesh.shard_batch({k: v for k, v in batch.items()
                           if k in ("x", "y", "valid")}, mesh)
    assert set(a) == set(b) == {"x", "y", "valid"}
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
        assert a[k].sharding == b[k].sharding


def test_loader_process_sharding_reassembles(ego4d_root):
    """Two process-sharded loaders concatenate to the unsharded loader's
    global batches — same epoch length, same samples, same order."""
    from egopack_tpu.config import compose, default_config_dir, instantiate
    cfg = compose(default_config_dir(), "defaults",
                  overrides=[f"dataset_recognition.root={ego4d_root}"])
    ds = instantiate(cfg.dataset_recognition, split="train")

    full = build_dataloader(ds, 8, True, 0, True, seed=3)
    shards = [build_dataloader(ds, 8, True, 0, True, seed=3,
                               process_shard=(p, 2)) for p in range(2)]
    full.set_epoch(1)
    for s in shards:
        s.set_epoch(1)
    full_batches = list(full)
    shard_batches = [list(s) for s in shards]
    assert len(full_batches) == len(shard_batches[0]) == len(shard_batches[1])
    for fb, s0, s1 in zip(full_batches, *shard_batches):
        np.testing.assert_array_equal(
            fb["x"], np.concatenate([s0["x"], s1["x"]], axis=0))
        np.testing.assert_array_equal(
            fb["y"], np.concatenate([s0["y"], s1["y"]], axis=0))
        np.testing.assert_array_equal(
            fb["valid"], np.concatenate([s0["valid"], s1["valid"]]))


class _RngSensitiveDS:
    """Stub dataset whose samples depend on the augmentation rng — the real
    AR windows in the synthetic fixture are too short for jitter to fire, so
    this pins the contract directly."""

    def __len__(self):
        return 37

    def get(self, idx, rng=None):
        jitter = (rng.standard_normal(4).astype(np.float32)
                  if rng is not None else np.zeros(4, np.float32))
        return {"x": np.full(4, idx, np.float32) + jitter, "y": np.int32(idx)}


def test_loader_sharding_reassembles_rng_dependent_augmentation():
    """Sample augmentation draws are keyed by GLOBAL dataset index, so
    process shards produce bit-identical jitter to the unsharded loader (and
    processes never share correlated streams)."""
    ds = _RngSensitiveDS()
    full = build_dataloader(ds, 8, True, 0, True, seed=5)
    shards = [build_dataloader(ds, 8, True, 0, True, seed=5,
                               process_shard=(p, 2)) for p in range(2)]
    full.set_epoch(2)
    for s in shards:
        s.set_epoch(2)
    full_batches = list(full)
    assert full_batches  # non-trivial epoch
    for fb, s0, s1 in zip(full_batches, *[list(s) for s in shards]):
        np.testing.assert_array_equal(
            fb["x"], np.concatenate([s0["x"], s1["x"]], axis=0))
    # different epochs redraw different jitter for the same sample
    full.set_epoch(3)
    again = list(full)
    assert not np.array_equal(full_batches[0]["x"], again[0]["x"])


def test_two_process_distributed_matches_single_process(ego4d_root, tmp_path):
    """REAL jax.distributed over localhost: 2 processes x 2 virtual CPU
    devices run one fused train step on their shards of the same global
    batch; both must agree with each other AND with a single-process control
    run of the identical global schedule."""
    port = _free_port()
    coord = f"localhost:{port}"
    workers = []
    env = dict(os.environ, PYTHONPATH=REPO)
    env.pop("XLA_FLAGS", None)
    art_dir = str(tmp_path / "artifacts")
    for pid in range(2):
        workers.append(subprocess.Popen(
            [sys.executable, osp.join(REPO, "tests", "multihost_worker.py"),
             coord, "2", str(pid), str(ego4d_root), art_dir],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=env, cwd=REPO))
    outs = []
    for w in workers:
        try:
            out, err = w.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            w.kill()
            pytest.fail("distributed worker timed out")
        assert w.returncode == 0, err[-3000:]
        outs.append(json.loads(out.strip().splitlines()[-1]))

    assert outs[0]["loss"] == pytest.approx(outs[1]["loss"], abs=1e-7)
    assert outs[0]["checksum"] == pytest.approx(outs[1]["checksum"], rel=1e-7)

    # sharded prototype build: replicated banks agree across processes
    assert outs[0]["proto"]["valid"] == outs[1]["proto"]["valid"] > 0
    assert outs[0]["proto"]["checksum"] == pytest.approx(
        outs[1]["proto"]["checksum"], rel=1e-7)

    # sharded validation: both processes' merged meter logs agree
    assert outs[0]["val"].keys() == outs[1]["val"].keys()
    for k in outs[0]["val"]:
        assert outs[0]["val"][k] == pytest.approx(outs[1]["val"][k],
                                                  rel=1e-6), k

    # both processes exited cleanly through the collective artifact save and
    # process 0 wrote the file (deadlock regression)
    assert osp.exists(osp.join(art_dir, "MTL_ar", "checkpoint.msgpack"))

    # single-process control run over the same 4-device mesh + global batch
    ctl_env = dict(env)
    ctl_env["EGOPACK_MH_SINGLE"] = "1"
    ctl = subprocess.run(
        [sys.executable, osp.join(REPO, "tests", "multihost_worker.py"),
         "single", "1", "0", str(ego4d_root)],
        capture_output=True, text=True, env=ctl_env, cwd=REPO, timeout=300)
    assert ctl.returncode == 0, ctl.stderr[-3000:]
    ctl_out = json.loads(ctl.stdout.strip().splitlines()[-1])
    assert ctl_out["loss"] == pytest.approx(outs[0]["loss"], abs=1e-6)
    assert ctl_out["checksum"] == pytest.approx(outs[0]["checksum"], rel=1e-6)
    # 2-process sharded prototype sweep == single-process full-set sweep
    assert ctl_out["proto"]["valid"] == outs[0]["proto"]["valid"]
    assert ctl_out["proto"]["checksum"] == pytest.approx(
        outs[0]["proto"]["checksum"], rel=1e-6)
    # 2-process SHARDED eval == single-process full-set eval (VERDICT r2 #2):
    # same global batches, same padded set, loss recorded once per batch
    assert ctl_out["val"].keys() == outs[0]["val"].keys()
    for k in ctl_out["val"]:
        assert ctl_out["val"][k] == pytest.approx(outs[0]["val"][k],
                                                  rel=1e-5, abs=1e-7), k


def _free_port() -> int:
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port
