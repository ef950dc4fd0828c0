"""Multi-host (DCN) integration.

The reference is single-GPU only (SURVEY.md §2.5). Multi-host here follows the
standard JAX recipe: ``jax.distributed.initialize`` on every process, a global
mesh over all devices, per-process loader shards assembled into global arrays
with ``jax.make_array_from_process_local_data`` — the jitted steps are
unchanged (GSPMD routes DP gradients over ICI within a slice and DCN across
slices by mesh construction).

Wiring (round 2): the drivers call :func:`initialize` when
``cfg.parallel.multihost`` is set, the loaders take a
``process_shard=(index, count)`` so each host loads only its slice of every
global batch (the MultiLoader epoch schedule is derived from the same seed on
every process, so the global batch semantics of the reference's multiloader
are preserved), and :func:`put_batch` assembles the global arrays.

Validation (round 3) is sharded the same way: each process meters only its
addressable block of the eval outputs (:func:`local_block`), the per-batch
loss is a global on-device reduction, and meter accumulator states merge
across processes at epoch end (:func:`merge_meter` over
:func:`allgather_bytes`) — N processes divide eval compute N ways and still
produce metrics exactly equal to a single-process run. Verified in-image by
real 2-process ``jax.distributed`` CPU tests (tests/test_multihost.py).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)

_DEVICE_KEYS = ("x", "y", "valid")


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` (env-driven when args are
    None: JAX reads COORDINATOR_ADDRESS / TPU metadata).

    The idempotency check MUST NOT touch the XLA backend:
    ``jax.process_count()`` would initialize it and make the subsequent
    ``jax.distributed.initialize`` unconditionally raise — every process
    would then silently proceed as an independent single-host run.
    ``jax.distributed.is_initialized()`` is backend-free. Failures are NOT
    swallowed: a bad coordinator address on a run that asked for multihost
    must abort, not train N desynchronized copies."""
    if jax.distributed.is_initialized():
        return
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)
    logger.info("jax.distributed initialized: process %d/%d",
                jax.process_index(), jax.process_count())


def process_shard() -> Optional[Tuple[int, int]]:
    """(process_index, process_count) for loader sharding; None when single."""
    if jax.process_count() == 1:
        return None
    return (jax.process_index(), jax.process_count())


def global_batch(local_batch: Dict[str, Any], mesh: Mesh,
                 spec: P = P("data")) -> Dict[str, Any]:
    """Assemble per-process host shards into global arrays with the given
    partition spec (``P()`` = every process holds the full array, replicated).
    On a single process this is exactly ``shard_batch``."""
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in local_batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }


def local_block(arr) -> np.ndarray:
    """Host view of this process's addressable block of a (possibly global)
    array. Fully-addressable arrays fetch whole; under multi-host DP each
    process gets the contiguous batch-axis block it contributed via
    ``make_array_from_process_local_data`` — the rows matching its own host
    batch, in order. Batch-sharded-but-model-replicated outputs (meshes with
    ``parallel.model > 1``) present one addressable shard per model column
    with IDENTICAL batch slices; dedupe by batch-axis start so each row
    appears exactly once."""
    if getattr(arr, "is_fully_addressable", True):
        return np.asarray(arr)
    uniq = {}
    for s in arr.addressable_shards:
        key = tuple((sl.start or 0, sl.stop) for sl in s.index)
        uniq.setdefault(key, s)
    tails = {key[1:] for key in uniq}
    assert len(tails) <= 1, (
        f"local_block expects outputs sharded on the batch axis only; got "
        f"shard slices {sorted(uniq)}")
    order = sorted(uniq)
    return np.concatenate([np.asarray(uniq[key].data) for key in order],
                          axis=0)


def allgather_bytes(payload: bytes) -> list:
    """Allgather one variable-length bytes payload per process (meter-state
    exchange for sharded validation). Two fixed-shape collectives: lengths
    first, then the max-padded byte arrays. Returns payloads indexed by
    process (order irrelevant to callers — each payload self-identifies)."""
    if jax.process_count() == 1:
        return [payload]
    from jax.experimental import multihost_utils
    data = np.frombuffer(payload, np.uint8)
    lens = np.asarray(multihost_utils.process_allgather(
        np.array([len(data)], np.int32))).reshape(-1)
    padded = np.zeros(int(lens.max()), np.uint8)
    padded[:len(data)] = data
    gathered = np.asarray(multihost_utils.process_allgather(padded))
    return [gathered[i, :lens[i]].tobytes() for i in range(len(lens))]


def state_to_bytes(pid: int, st: Dict) -> bytes:
    """Serialize one meter ``state()`` snapshot as an npz blob (non-executable
    wire format: peer payloads are plain numeric arrays, never unpickled
    code). Meter states are scalars + lists of numeric arrays by contract
    (eval/meters.py ``state``); anything else fails loudly here rather than
    riding the wire."""
    import io
    arrays: Dict[str, np.ndarray] = {"__pid__": np.asarray(pid, np.int64)}
    for key, val in st.items():
        if isinstance(val, list):
            arrays[f"__len__/{key}"] = np.asarray(len(val), np.int64)
            for i, item in enumerate(val):
                arrays[f"L/{key}/{i}"] = np.asarray(item)
        else:
            arrays[f"S/{key}"] = np.asarray(val)
    for key, arr in arrays.items():
        if arr.dtype == object:
            raise TypeError(f"meter state entry {key!r} is not numeric")
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def state_from_bytes(blob: bytes) -> Tuple[int, Dict]:
    """Inverse of :func:`state_to_bytes`. ``allow_pickle`` stays at numpy's
    safe default, so a malicious payload cannot execute code here."""
    import io
    with np.load(io.BytesIO(blob)) as z:
        pid = int(z["__pid__"])
        st: Dict[str, Any] = {}
        for key in z.files:
            if key.startswith("S/"):
                arr = z[key]
                st[key[2:]] = arr.item() if arr.ndim == 0 else arr
        for key in z.files:
            if key.startswith("__len__/"):
                name = key.split("/", 1)[1]
                st[name] = [
                    (lambda a: a.item() if a.ndim == 0 else a)(
                        z[f"L/{name}/{i}"])
                    for i in range(int(z[key]))]
    return pid, st


def merge_meter(meter) -> None:
    """Fold every other process's meter accumulators into ``meter`` (sharded
    multi-host validation). Loss accumulators are NOT merged: the per-batch
    loss is a global on-device reduction recorded identically by every
    process, so each meter already holds the full loss series."""
    if jax.process_count() == 1:
        return
    own = jax.process_index()
    payload = state_to_bytes(own, meter.state())
    for blob in allgather_bytes(payload):
        pid, st = state_from_bytes(blob)
        if pid != own:
            meter.merge_state(st, include_loss=False)


def put_batch(batch: Dict[str, Any], mesh: Mesh,
              replicated: bool = False, x_dtype=None) -> Dict[str, Any]:
    """Device placement for one host batch: keep only the array fields the
    jitted steps consume, then assemble globally. Both train and eval
    batches are data-sharded (eval meters merge at epoch end, see
    merge_meter); ``replicated=True`` remains for callers that need every
    process to hold the full array.

    ``x_dtype`` (e.g. ``ml_dtypes.bfloat16``) casts the feature tensor on the
    HOST before transfer — under bf16 compute the device would cast anyway
    (same round-to-nearest-even values), so this halves H2D bytes for free;
    ``x`` dominates the batch (B·N·S·D floats)."""
    local = {k: np.asarray(v) for k, v in batch.items() if k in _DEVICE_KEYS}
    if x_dtype is not None and "x" in local:
        local["x"] = local["x"].astype(x_dtype)
    return global_batch(local, mesh, P() if replicated else P("data"))
