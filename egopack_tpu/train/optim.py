"""Optimizer + LR schedule factories (torch-semantics, optax-implemented).

The reference instantiates ``torch.optim.Adam`` (L2-coupled weight decay —
decay added to the gradient BEFORE the moment updates, unlike AdamW) and steps
``CosineAnnealingLR`` once per epoch, optionally chained with
``LinearLR(0.001, 1, 5)`` warmup (/root/reference/main_temporal.py:265-279).
Here the schedule is a pure function of the completed-epoch count and the
learning rate is injected into the optax state per epoch, so the jitted train
step never recompiles.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import optax


def adam(lr: float = 1e-5, weight_decay: float = 0.0,
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         trainable_mask=None) -> optax.GradientTransformation:
    """torch.optim.Adam equivalent (coupled L2 weight decay).

    ``trainable_mask``: pytree (or prefix) of bools. torch skips params whose
    ``.grad is None`` — params outside every loss graph (inactive task heads in
    phase-1 leave-one-out, detached aux projections and the frozen backbone in
    phase 2) are never decayed nor moment-tracked. JAX grads are zeros instead
    of None, so coupled weight decay WOULD silently decay frozen params every
    step; the mask restores the exact torch semantics."""

    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        steps.append(optax.scale_by_learning_rate(learning_rate))
        opt = optax.chain(*steps)
        if trainable_mask is not None:
            opt = optax.masked(opt, trainable_mask)
        return opt

    return optax.inject_hyperparams(make)(learning_rate=lr)


def init_opt_state(optimizer: optax.GradientTransformation, params, mesh=None):
    """``jit(optimizer.init)`` under the mesh context: makes every state leaf
    (including scalar step counts and the injected learning rate) carry the
    SAME mesh-tagged sharding the jitted train step will return — otherwise
    the second step call retraces+recompiles the whole fused program
    (measured ~30s wasted per run at full size)."""
    import contextlib
    import jax
    ctx = jax.set_mesh(mesh) if mesh is not None \
        else contextlib.nullcontext()
    with ctx:
        return jax.jit(optimizer.init)(params)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate in-place-of (returns new state)."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def cosine_annealing(T_max: int, eta_min: float = 0.0) -> Callable[[int, float], float]:
    """torch CosineAnnealingLR: lr(e) after e scheduler steps."""

    def schedule(epochs_completed: int, base_lr: float) -> float:
        return eta_min + (base_lr - eta_min) * (
            1 + math.cos(math.pi * epochs_completed / T_max)) / 2

    return schedule


def linear_warmup(start_factor: float = 0.001, end_factor: float = 1.0,
                  total_iters: int = 5) -> Callable[[int], float]:
    """torch LinearLR factor after e scheduler steps."""

    def factor(epochs_completed: int) -> float:
        t = min(epochs_completed, total_iters)
        return start_factor + (end_factor - start_factor) * t / total_iters

    return factor


def build_lr_fn(base_lr: float, scheduler: Optional[Callable[[int, float], float]],
                use_warmup: bool = False) -> Callable[[int], float]:
    """Per-epoch LR: chained warmup × cosine, both stepped every epoch
    (torch ChainedScheduler semantics at main_temporal.py:275-279)."""
    warm = linear_warmup() if use_warmup else None

    def lr_fn(epochs_completed: int) -> float:
        lr = base_lr
        if scheduler is not None:
            lr = scheduler(epochs_completed, base_lr)
        if warm is not None:
            lr = lr * warm(epochs_completed)
        return lr

    return lr_fn
