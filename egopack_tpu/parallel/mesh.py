"""Device mesh + sharding rules.

The reference has NO distributed layer at all (SURVEY.md §2.5: no DDP/FSDP/
NCCL anywhere). This module adds the TPU-native one:

- a ``(data, model)`` mesh over all local (or provided) devices
- batch leaves sharded on ``data`` (pure DP — the ICI-friendly axis)
- megatron-style tensor parallelism on the widest MLP (the TRN pooling's
  S·D→hidden→hidden stack): fc0 column-parallel, fc1 row-parallel — XLA/GSPMD
  inserts the single psum between them
- prototype banks row-sharded on ``model`` (the EgoPack long-context analog:
  P grows with the seen verb-noun vocabulary; top-k over a sharded bank rides
  an all-gather of (M, k) partial results, inserted by GSPMD)

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh`` and the
same code spans DCN; shardings are expressed per-axis so the data axis maps to
the inter-host dimension by construction.
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def make_mesh(data: int = -1, model: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if data == -1:
        data = n // model
    assert data * model <= n, f"mesh {data}x{model} exceeds {n} devices"
    if data * model < n:
        # never drop devices silently: an idle chip is a throughput bug and,
        # under multihost, a desync hazard for global-array assembly
        logger.warning("mesh %dx%d uses only %d of %d devices; the rest sit "
                       "idle", data, model, data * model, n)
    arr = np.asarray(devices[:data * model]).reshape(data, model)
    return Mesh(arr, ("data", "model"))


def check_batch_divisible(batch_size: int, mesh: Mesh) -> None:
    """Fail fast, legibly, when the global batch cannot shard on the data
    axis — otherwise the violation only surfaces steps later as a raw pjit
    ValueError deep inside device_put."""
    data = int(mesh.shape["data"])
    if batch_size % data:
        raise SystemExit(
            f"Invalid configuration: batch_size={batch_size} is not "
            f"divisible by parallel.data={data}. Aborting!")


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Shard every array leaf on its leading (batch) axis."""
    s = batch_sharding(mesh)
    return {k: jax.device_put(v, s) for k, v in batch.items()}


def _param_spec(path: str, leaf, mesh: Mesh) -> P:
    model_size = mesh.shape["model"]
    if model_size == 1:
        return P()
    # megatron TP on the TRN pooling MLP
    if "pooling" in path and "fc0" in path:
        if path.endswith("kernel") and leaf.shape[-1] % model_size == 0:
            return P(None, "model")
        if path.endswith("bias") and leaf.shape[-1] % model_size == 0:
            return P("model")
    if "pooling" in path and "fc1" in path and path.endswith("kernel"):
        if leaf.shape[0] % model_size == 0:
            return P("model", None)
    return P()


def param_shardings(params: Dict[str, Any], mesh: Mesh):
    """NamedSharding tree for the parameter pytree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def path_str(kp):
        return "/".join(getattr(k, "key", str(k)) for k in kp)

    specs = {path_str(kp): _param_spec(path_str(kp), leaf, mesh)
             for kp, leaf in flat}

    def assign(kp, leaf):
        return NamedSharding(mesh, specs[path_str(kp)])

    return jax.tree_util.tree_map_with_path(assign, params)


def bank_sharding(mesh: Mesh) -> NamedSharding:
    """Prototype bank rows on the model axis."""
    if mesh.shape["model"] > 1:
        return NamedSharding(mesh, P("model", None))
    return NamedSharding(mesh, P())


def place_banks(banks, mesh: Mesh):
    """Shard prototype banks over the model axis: values row-sharded, masks
    row-sharded alongside (the EgoPack long-context analog — P grows with the
    seen verb-noun vocabulary, SURVEY.md §5). Replicated when model=1.

    Banks are padded to a multiple of 128 rows (models/graphone.py), so any
    power-of-two model axis divides evenly. Downstream, the fused
    normalize→matmul→top-k sees a column-sharded distance matrix and GSPMD
    inserts the gather/all-reduce for the global top-k; the bank row gather
    after top-k rides the same collectives."""
    from ..models.graphone import PrototypeBank
    vs = bank_sharding(mesh)
    ms = (NamedSharding(mesh, P("model")) if mesh.shape["model"] > 1
          else NamedSharding(mesh, P()))
    return {t: PrototypeBank(jax.device_put(b.values, vs),
                             jax.device_put(b.mask, ms))
            for t, b in banks.items()}


def place_params(params: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    shardings = param_shardings(params, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)


def replicate(tree: Any, mesh: Mesh) -> Any:
    s = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)
