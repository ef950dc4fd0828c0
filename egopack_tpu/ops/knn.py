"""Prototype k-NN: fused normalize → matmul → top-k.

This is the hottest EgoPack op (per-step, per-task, B·P·F distance matmul +
top-k; reference computes a full argsort on host-style tensors,
/root/reference/models/graphONE/graphONE.py:119-141). Here it is a single
XLA-fused pipeline (``lax.top_k`` over the masked similarity matrix); a Pallas
kernel for very large P lives in ops/pallas/. Distances are computed under
``stop_gradient`` exactly like the reference's ``@torch.no_grad`` edge
computation.
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_dissimilarity(features: jax.Array, bank: jax.Array) -> jax.Array:
    """``1 − f̂ @ b̂ᵀ`` (graphONE.py:152-155)."""
    f = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    b = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    return 1.0 - jnp.dot(f, b.T, preferred_element_type=jnp.float32)


def l2_distance(features: jax.Array, bank: jax.Array) -> jax.Array:
    """Euclidean distance / 4096 (graphONE.py:127,148-149).

    EXACT pairwise form — the reference explicitly opts out of the
    |a|²+|b|²−2ab matmul trick
    (``compute_mode="donot_use_mm_for_euclid_dist"``) because catastrophic
    cancellation near ties can reorder the k-NN ranking; this is a
    ranking-sensitive parity path, so we match. XLA fuses the broadcast
    subtract into the reduction (no (M, P, F) materialization); l2 is the
    non-default distance, so the off-MXU cost is acceptable."""
    diff = features[:, None, :].astype(jnp.float32) \
        - bank[None, :, :].astype(jnp.float32)
    return jnp.sqrt(jnp.sum(diff * diff, -1)) / 4096.0


def prototype_topk(features: jax.Array, bank: jax.Array, bank_mask: jax.Array,
                   k: int, distance: str = "cosine",
                   impl: str = "auto") -> Tuple[jax.Array, jax.Array]:
    """k nearest valid prototypes per feature row.

    Returns ``(indices (M, k), distances (M, k))``. ``bank_mask`` marks valid
    (non-padded) prototype rows; padded rows get +inf distance so they are
    never selected. The whole computation is non-differentiable (reference
    computes edges under no_grad).

    ``impl``: 'xla' (lax.top_k over the fused distance matrix), 'pallas'
    (streaming Mosaic kernel, ops/pallas/knn_topk.py — never materializes the
    (M, P) matrix in HBM), or 'auto' (env ``EGOPACK_KNN_IMPL``; unset →
    pallas on TPU, xla elsewhere). Measured on v5e (round 5,
    scripts/bench_knn_pallas.py + BASELINE.md Pallas ledger): pallas wins the
    FULL phase-2 production step 1.042× at the headline config (P=2048, the
    trace's 6.0% `sort f32[3,64,2048]` family) and standalone 1.11× @ P=2048
    / 1.36× @ 8192 / 2.57× @ 55040 (the full-taxonomy bound) — hence the TPU
    default. Model-axis-SHARDED banks must use 'xla' (GSPMD partitions the
    fused matmul+top_k but cannot partition a Mosaic custom call; the driver
    pins knn_impl='xla' when mesh model > 1).
    """
    if impl == "auto":
        impl = os.environ.get("EGOPACK_KNN_IMPL") or (
            "pallas" if jax.default_backend() == "tpu" else "xla")
    features = jax.lax.stop_gradient(features)
    bank = jax.lax.stop_gradient(bank)
    if impl == "pallas" and distance == "cosine":
        from .pallas.knn_topk import cosine_knn_pallas
        return cosine_knn_pallas(features, bank, bank_mask, k)
    if distance == "cosine":
        d = cosine_dissimilarity(features, bank)
    elif distance == "l2":
        d = l2_distance(features, bank)
    else:
        raise ValueError(f"Unknown distance function: {distance}")
    d = jnp.where(bank_mask[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d
