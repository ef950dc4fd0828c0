"""Checkpointing + local artifact store.

Two layers, both absent-or-wandb-coupled in the reference (SURVEY.md §5):

1. **Artifacts** — the cross-phase handoff. The reference saves a state dict
   named ``MTL_<sorted-task-names>`` as a wandb artifact
   (/root/reference/main_temporal.py:407-420) and phase 2 discovers the
   auxiliary task set by substring-matching task names in the artifact name
   (/root/reference/main_egopack.py:300-301). Here artifacts are local
   directories with identical naming, msgpack-serialized, wandb-free (the
   reference README itself promises a wandb-free refactor).
2. **Mid-run resume** — new capability: full train state (params, optimizer
   moments, epoch, PRNG key) via orbax, per-epoch.
"""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

logger = logging.getLogger(__name__)


def _host_value(x):
    """Fetch one array to host, gathering shards that span processes first
    (multi-host TP: pooling fc0/fc1 and prototype banks shard on the model
    axis; plain np.asarray would raise on non-addressable arrays)."""
    if jax.process_count() > 1 and hasattr(x, "sharding") \
            and not getattr(x, "is_fully_addressable", True):
        from jax.experimental import multihost_utils
        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(x)


def _to_numpy(tree):
    return jax.tree_util.tree_map(_host_value, tree)


def save_artifact(artifact_dir: str, name: str, payload: Dict[str, Any],
                  meta: Optional[Dict[str, Any]] = None) -> str:
    """Save a named artifact (same naming contract as the reference).

    Multihost-safe: EVERY process must call this — ``_to_numpy`` gathers
    non-fully-addressable shards via a ``process_allgather`` collective that
    all processes participate in; only process 0 then touches the
    filesystem. (Gating the whole call on process 0 would deadlock it inside
    the collective while the other processes exit.)"""
    path = osp.join(artifact_dir, name)
    host_payload = _to_numpy(payload)  # collective — before the p0 gate
    if jax.process_index() != 0:
        return path
    os.makedirs(path, exist_ok=True)
    ckpt = osp.join(path, "checkpoint.msgpack")
    if osp.exists(ckpt):
        # version the previous contents like wandb does — both phases use
        # the SAME artifact name (reference main_temporal.py:159 /
        # main_egopack.py:461), so a phase-2 save with the same task set
        # would otherwise destroy the phase-1 pretrain artifact
        v = 1
        while osp.exists(osp.join(path, f"checkpoint_v{v}.msgpack")):
            v += 1
        os.replace(ckpt, osp.join(path, f"checkpoint_v{v}.msgpack"))
        old_meta = osp.join(path, "meta.json")
        if osp.exists(old_meta):
            os.replace(old_meta, osp.join(path, f"meta_v{v}.json"))
        logger.warning(
            "Artifact %s existed; previous version kept as checkpoint_v%d",
            name, v)
    blob = serialization.msgpack_serialize(host_payload)
    with open(ckpt, "wb") as f:
        f.write(blob)
    with open(osp.join(path, "meta.json"), "w") as f:
        json.dump(meta or {}, f)
    return path


def load_artifact(artifact_dir: str, ref: str) -> Tuple[Dict[str, Any], Dict[str, Any]]:
    """Load by reference string; accepts wandb-style
    ``entity/project/NAME:alias`` or a bare ``NAME`` (the task-discovery
    substring match in phase 2 operates on the full ref, like the reference)."""
    name = ref.split("/")[-1].split(":")[0]
    path = osp.join(artifact_dir, name)
    with open(osp.join(path, "checkpoint.msgpack"), "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    meta_path = osp.join(path, "meta.json")
    meta = {}
    if osp.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return payload, meta


def unpack_artifact(payload: Dict[str, Any], meta: Dict[str, Any], cfg):
    """Split a loaded artifact into its model overlay + phase-2 extras.

    Single reconstruction path shared by ``egopack_tpu.evaluate`` (cold
    validation) and ``egopack_tpu.predict`` (challenge export) so the two can
    never drift: pops the non-param entries from ``payload`` (leaving the
    state-dict overlay for ``merge_loaded_params``) and, for EgoPack
    artifacts, rebuilds the prototype banks + GraphONE module the reference
    persists via ``graphone.state_dict()``
    (/root/reference/main_egopack.py:453-459).

    Returns ``(phase2, banks, graphone, aux_tasks, late_fusion,
    extra_params)`` where ``banks`` is None for phase-1 artifacts and
    ``extra_params`` holds the subtrees to graft onto the initialized params
    ("graphone" convs; "graphone_banks" when trained with freeze=False)."""
    import jax.numpy as jnp

    from ..config import to_container
    from ..models.graphone import GraphONE, PrototypeBank

    payload.pop("epoch", None)
    bank_vals = payload.pop("graphone_banks", None)
    bank_masks = payload.pop("graphone_bank_masks", None)
    gparams = payload.pop("graphone", None)
    phase2 = (meta.get("phase") == "egopack") or (gparams is not None)
    if not phase2:
        return False, None, None, (), bool(meta.get("late_fusion",
                                                    cfg.late_fusion)), {}
    assert bank_vals is not None and bank_masks is not None, (
        "EgoPack artifact lacks prototype banks; it predates the complete "
        "phase-2 artifact format and cannot be reloaded cold")
    aux_tasks = tuple(meta.get("aux_tasks") or sorted(bank_vals))
    banks = {t: PrototypeBank(jnp.asarray(bank_vals[t]),
                              jnp.asarray(bank_masks[t]))
             for t in bank_vals}
    gcfg = dict(meta.get("graphone") or to_container(cfg.graphone))
    if int(cfg.parallel.get("model", 1)) > 1:
        # same pin as train_egopack (driver.py): model-axis-sharded banks
        # ride the GSPMD-partitioned XLA top-k; the Pallas kernel is a
        # Mosaic custom call GSPMD cannot partition, so the TPU auto→pallas
        # default must not reach evaluate/predict when banks are row-sharded
        gcfg.setdefault("knn_impl", "xla")
    graphone = GraphONE(task_labels=aux_tasks,
                        features_size=cfg.model.hidden_size, **gcfg)
    extra_params: Dict[str, Any] = {"graphone": gparams}
    if not gcfg.get("freeze", True):
        # trainable-bank artifacts: the trained values live in the params tree
        extra_params["graphone_banks"] = {t: jnp.asarray(v)
                                          for t, v in bank_vals.items()}
    return (phase2, banks, graphone, aux_tasks,
            bool(meta.get("late_fusion", cfg.late_fusion)), extra_params)


def merge_loaded_params(params: Dict[str, Any], loaded: Dict[str, Any]) -> Dict[str, Any]:
    """``load_state_dict(strict=False)`` semantics
    (/root/reference/main_egopack.py:290-295): copy every leaf present in the
    loaded tree; keep freshly-initialized values elsewhere (phase-2 heads have
    extra aux classifiers the MTL checkpoint lacks)."""

    def merge(dst, src):
        if isinstance(dst, dict) and isinstance(src, dict):
            return {k: merge(dst[k], src[k]) if k in src else dst[k]
                    for k in dst}
        return src

    return merge(params, loaded)


# ---------------- full-state mid-run resume (orbax) ----------------

_async_ckptr = None


def save_state(ckpt_dir: str, step: int, state: Dict[str, Any],
               async_write: bool = False) -> None:
    """Per-epoch full-state checkpoint. ``async_write=True`` fetches the
    state to host synchronously (cheap) and hands the file write to orbax's
    background thread so training never stalls on disk; call
    ``wait_for_saves()`` before reading the directory or exiting."""
    import orbax.checkpoint as ocp
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step:06d}"))
    host_state = _to_numpy(state)
    if async_write:
        global _async_ckptr
        if _async_ckptr is None:
            _async_ckptr = ocp.AsyncCheckpointer(
                ocp.StandardCheckpointHandler())
            # exceptions in the train loop bypass the drivers' explicit
            # wait_for_saves(); commit pending writes at interpreter exit so
            # the last checkpoint isn't lost to an uncaught error
            import atexit
            atexit.register(wait_for_saves)
        _async_ckptr.save(path, args=ocp.args.StandardSave(host_state),
                          force=True)
        return
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, host_state, force=True)


def wait_for_saves() -> None:
    """Block until every pending async checkpoint write has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def latest_state(ckpt_dir: str) -> Optional[int]:
    """Newest COMMITTED step. Only exact ``step_<n>`` directories count —
    a crash mid-async-save leaves orbax temp dirs
    (``step_<n>.orbax-checkpoint-tmp-<ts>``) behind, which must not break
    the next run's resume (they are uncommitted by definition)."""
    import re
    if not osp.isdir(ckpt_dir):
        return None
    steps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
             if (m := re.fullmatch(r"step_(\d+)", d))]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step:06d}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, _to_numpy(template))
