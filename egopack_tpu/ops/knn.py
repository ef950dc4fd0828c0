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

from typing import Tuple

import jax
import jax.numpy as jnp


def cosine_dissimilarity(features: jax.Array, bank: jax.Array) -> jax.Array:
    """``1 − f̂ @ b̂ᵀ`` (graphONE.py:152-155)."""
    f = features / jnp.linalg.norm(features, axis=-1, keepdims=True)
    b = bank / jnp.linalg.norm(bank, axis=-1, keepdims=True)
    return 1.0 - jnp.dot(f, b.T, preferred_element_type=jnp.float32)


def l2_distance(features: jax.Array, bank: jax.Array) -> jax.Array:
    """Euclidean distance / 4096 (graphONE.py:127,148-149)."""
    sq = (jnp.sum(features ** 2, -1)[:, None] + jnp.sum(bank ** 2, -1)[None, :]
          - 2.0 * jnp.dot(features, bank.T, preferred_element_type=jnp.float32))
    return jnp.sqrt(jnp.maximum(sq, 0.0)) / 4096.0


def prototype_topk(features: jax.Array, bank: jax.Array, bank_mask: jax.Array,
                   k: int, distance: str = "cosine") -> Tuple[jax.Array, jax.Array]:
    """k nearest valid prototypes per feature row.

    Returns ``(indices (M, k), distances (M, k))``. ``bank_mask`` marks valid
    (non-padded) prototype rows; padded rows get +inf distance so they are
    never selected. The whole computation is non-differentiable (reference
    computes edges under no_grad).
    """
    features = jax.lax.stop_gradient(features)
    bank = jax.lax.stop_gradient(bank)
    if distance == "cosine":
        d = cosine_dissimilarity(features, bank)
    elif distance == "l2":
        d = l2_distance(features, bank)
    else:
        raise ValueError(f"Unknown distance function: {distance}")
    d = jnp.where(bank_mask[None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)
    return idx, -neg_d
