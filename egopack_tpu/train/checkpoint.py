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
import os
import os.path as osp
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization


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
    """Save a named artifact (same naming contract as the reference)."""
    path = osp.join(artifact_dir, name)
    os.makedirs(path, exist_ok=True)
    blob = serialization.msgpack_serialize(_to_numpy(payload))
    with open(osp.join(path, "checkpoint.msgpack"), "wb") as f:
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

def save_state(ckpt_dir: str, step: int, state: Dict[str, Any]) -> None:
    import orbax.checkpoint as ocp
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step:06d}"))
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _to_numpy(state), force=True)


def latest_state(ckpt_dir: str) -> Optional[int]:
    if not osp.isdir(ckpt_dir):
        return None
    steps = [int(d.split("_")[1]) for d in os.listdir(ckpt_dir)
             if d.startswith("step_")]
    return max(steps) if steps else None


def restore_state(ckpt_dir: str, step: int, template: Dict[str, Any]) -> Dict[str, Any]:
    import orbax.checkpoint as ocp
    path = osp.abspath(osp.join(ckpt_dir, f"step_{step:06d}"))
    with ocp.StandardCheckpointer() as ckptr:
        return ckptr.restore(path, _to_numpy(template))
