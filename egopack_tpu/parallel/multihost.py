"""Multi-host (DCN) bring-up helpers.

The reference is single-GPU only (SURVEY.md §2.5). Multi-host here follows the
standard JAX recipe: ``jax.distributed.initialize`` on every process, a global
mesh over all devices, and per-process batch shards assembled into global
arrays with ``jax.make_array_from_process_local_data`` — the jitted steps are
unchanged (GSPMD routes DP gradients over ICI within a slice and DCN across
slices by mesh construction).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

logger = logging.getLogger(__name__)


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Idempotent ``jax.distributed.initialize`` (env-driven when args are
    None: JAX reads COORDINATOR_ADDRESS / TPU metadata)."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        jax.distributed.initialize(coordinator_address, num_processes,
                                   process_id)
        logger.info("jax.distributed initialized: process %d/%d",
                    jax.process_index(), jax.process_count())
    except (RuntimeError, ValueError) as e:
        logger.info("single-process run (%s)", e)


def global_batch(local_batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Assemble per-process host shards into global arrays sharded on the
    ``data`` axis. On a single process this is exactly ``shard_batch``."""
    sharding = NamedSharding(mesh, P("data"))
    if jax.process_count() == 1:
        return {k: jax.device_put(v, sharding) for k, v in local_batch.items()}
    return {
        k: jax.make_array_from_process_local_data(sharding, np.asarray(v))
        for k, v in local_batch.items()
    }


def process_local_indices(n: int, batch_size: int) -> slice:
    """Which rows of a global batch this process loads (contiguous block
    partitioning over processes)."""
    per = batch_size // jax.process_count()
    lo = jax.process_index() * per
    return slice(lo, lo + per)
