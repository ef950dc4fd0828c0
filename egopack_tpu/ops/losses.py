"""Loss functions with the reference's exact reduction semantics.

All functions return *per-element* losses (reduction='none'); ignored entries
(label −1) contribute exactly 0, and the training mean divides by ALL elements
— including ignored ones — because the reference calls ``.mean()`` on the
masked-out loss vector (/root/reference/main_temporal.py:99,128). That 1/N
scale is load-bearing for optimization parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits: jax.Array, labels: jax.Array,
                  ignore_index: int = -1, label_smoothing: float = 0.0) -> jax.Array:
    """CE with ignore_index and optional label smoothing (torch semantics:
    ``(1-ε)·NLL + ε·mean_c(-log p_c)``). logits (..., C), labels (...)."""
    num_classes = logits.shape[-1]
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    safe = jnp.where(labels == ignore_index, 0, labels)
    nll = -jnp.take_along_axis(logp, safe[..., None], axis=-1)[..., 0]
    if label_smoothing > 0.0:
        smooth = -logp.mean(-1)
        nll = (1.0 - label_smoothing) * nll + label_smoothing * smooth
    return jnp.where(labels == ignore_index, 0.0, nll)


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable binary cross entropy on logits (torch
    BCEWithLogitsLoss, reduction='none')."""
    logits = logits.astype(jnp.float32)
    targets = targets.astype(jnp.float32)
    return jnp.maximum(logits, 0) - logits * targets + jnp.log1p(jnp.exp(-jnp.abs(logits)))


def sigmoid_focal_loss(logits: jax.Array, targets: jax.Array,
                       alpha: float = 0.5, gamma: float = 2.0) -> jax.Array:
    """torchvision.ops.sigmoid_focal_loss semantics (reduction='none'),
    used by the OSCC head (/root/reference/models/tasks/oscc.py:96)."""
    p = jax.nn.sigmoid(logits.astype(jnp.float32))
    ce = bce_with_logits(logits, targets)
    p_t = p * targets + (1 - p) * (1 - targets)
    loss = ce * (1 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
        loss = alpha_t * loss
    return loss


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean over elements where mask is True (used to exclude PADDED samples,
    never to exclude ignore-labeled nodes — those stay in the denominator)."""
    m = mask.astype(jnp.float32)
    return (values.astype(jnp.float32) * m).sum() / jnp.maximum(m.sum(), 1.0)
