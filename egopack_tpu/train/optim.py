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
from typing import Any, Callable, NamedTuple, Optional

import optax


def _scale_by_adam_lowp(b1: float, b2: float, eps: float,
                        dtype) -> optax.GradientTransformation:
    """scale_by_adam with BOTH moments stored in ``dtype`` (e.g. bfloat16).

    Moment updates and the final rescale compute in float32; only the stored
    state is low-precision. At the reference batch size the train step is
    bound by Adam's HBM traffic (BASELINE.md decomposition: ~1 ms of the
    2.2 ms step is 7 f32 passes over ~30M params); bf16 moments cut the
    moment read+write bytes in half (28 -> 20 bytes/param/step). This is an
    OPT-IN numerics change — off the torch-parity table, which is why
    float32 stays the default."""
    import jax
    import jax.numpy as jnp

    def init(params):
        zeros = lambda p: jnp.zeros_like(p, dtype=dtype)  # noqa: E731
        return optax.ScaleByAdamState(
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def update(updates, state, params=None):
        del params
        f32 = jnp.float32
        mu = jax.tree_util.tree_map(
            lambda g, m: (b1 * m.astype(f32) + (1 - b1) * g.astype(f32))
            .astype(dtype), updates, state.mu)
        nu = jax.tree_util.tree_map(
            lambda g, v: (b2 * v.astype(f32)
                          + (1 - b2) * jnp.square(g.astype(f32)))
            .astype(dtype), updates, state.nu)
        count = optax.safe_int32_increment(state.count)
        bc1 = 1 - b1 ** count.astype(f32)
        bc2 = 1 - b2 ** count.astype(f32)
        scaled = jax.tree_util.tree_map(
            lambda m, v, g: ((m.astype(f32) / bc1)
                             / (jnp.sqrt(v.astype(f32) / bc2) + eps))
            .astype(g.dtype), mu, nu, updates)
        return scaled, optax.ScaleByAdamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init, update)


class FusedAdamState(NamedTuple):
    """Pytree-compatible state mirroring inject_hyperparams' surface: the
    drivers mutate ``state.hyperparams['learning_rate']`` and orbax
    checkpoints the whole tuple (count + full-shape moment trees)."""
    hyperparams: dict
    count: Any
    mu: Any
    nu: Any


class FusedAdam:
    """Single-pass Adam: one Pallas kernel per leaf does coupled weight
    decay + moment updates + the parameter step (ops/pallas/fused_adam.py),
    reading p/g/m/v once and writing p/m/v once. Exact update math of the
    optax chain below (``impl='optax'``); opted in via ``optimizer.impl=
    fused``. Exposes ``fused_apply`` instead of the two-phase
    ``update``/apply — the train steps branch on it (train/system.py).

    Masked (non-trainable) leaves reproduce ``optax.masked`` exactly:
    ``p' = p + g`` with untouched moments (grads are zero for params outside
    the loss graph, so frozen params stay bit-identical). Moments for masked
    leaves are allocated zeros — HBM-resident but never read or written, so
    they cost capacity, not bandwidth, and keep the checkpoint tree shaped
    like the params tree."""

    def __init__(self, lr, weight_decay, b1, b2, eps, trainable_mask,
                 moments_dtype):
        import jax.numpy as jnp
        self.lr = lr
        self.weight_decay = float(weight_decay)
        self.b1, self.b2, self.eps = float(b1), float(b2), float(eps)
        self.trainable_mask = trainable_mask
        self.m_dtype = jnp.dtype(moments_dtype or "float32")
        # flipped off by init_opt_state on tensor-parallel meshes:
        # pl.pallas_call carries no GSPMD spec, so model-axis-sharded leaves
        # would force full gathers; the identical-math jnp path partitions
        # natively (ADVICE r3)
        self.use_pallas = True

    def init(self, params) -> FusedAdamState:
        import jax
        import jax.numpy as jnp
        zeros = lambda p: jnp.zeros(p.shape, self.m_dtype)  # noqa: E731
        return FusedAdamState(
            hyperparams={"learning_rate": jnp.asarray(self.lr, jnp.float32)},
            count=jnp.zeros([], jnp.int32),
            mu=jax.tree_util.tree_map(zeros, params),
            nu=jax.tree_util.tree_map(zeros, params))

    def fused_apply(self, grads, state: FusedAdamState, params):
        import jax
        import jax.numpy as jnp

        from ..ops.pallas.fused_adam import fused_adam_leaf

        count = optax.safe_int32_increment(state.count)
        f32 = jnp.float32
        # scalar bits identical to optax.bias_correction
        bc1 = 1 - self.b1 ** count.astype(f32)
        bc2 = 1 - self.b2 ** count.astype(f32)
        lr = state.hyperparams["learning_rate"]
        mask = (self.trainable_mask(params)
                if callable(self.trainable_mask) else self.trainable_mask)
        if mask is None:
            mask = jax.tree_util.tree_map(lambda _: True, params)

        def leaf(p, g, m, v, on):
            if not on:
                # optax.masked pass-through: updates == raw grads (zero for
                # params outside the loss graph)
                return p + g, m, v
            return fused_adam_leaf(p, g, m, v, lr, bc1, bc2,
                                   wd=self.weight_decay, b1=self.b1,
                                   b2=self.b2, eps=self.eps,
                                   m_dtype=self.m_dtype,
                                   use_pallas=self.use_pallas)
        out = jax.tree_util.tree_map(leaf, params, grads, state.mu, state.nu,
                                     mask)
        is_triple = lambda x: isinstance(x, tuple) and len(x) == 3  # noqa
        new_p = jax.tree_util.tree_map(lambda t: t[0], out, is_leaf=is_triple)
        new_m = jax.tree_util.tree_map(lambda t: t[1], out, is_leaf=is_triple)
        new_v = jax.tree_util.tree_map(lambda t: t[2], out, is_leaf=is_triple)
        return new_p, FusedAdamState(hyperparams=dict(state.hyperparams),
                                     count=count, mu=new_m, nu=new_v)


def adam(lr: float = 1e-5, weight_decay: float = 0.0,
         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8,
         trainable_mask=None,
         moments_dtype: str = "float32",
         impl: str = "optax"):
    """torch.optim.Adam equivalent (coupled L2 weight decay).

    ``trainable_mask``: pytree (or prefix) of bools. torch skips params whose
    ``.grad is None`` — params outside every loss graph (inactive task heads in
    phase-1 leave-one-out, detached aux projections and the frozen backbone in
    phase 2) are never decayed nor moment-tracked. JAX grads are zeros instead
    of None, so coupled weight decay WOULD silently decay frozen params every
    step; the mask restores the exact torch semantics.

    ``moments_dtype``: "float32" (default, exact torch parity) or "bfloat16"
    (opt-in HBM-bandwidth lever; see _scale_by_adam_lowp).

    ``impl``: "optax" (default — the chain below) or "fused" (the
    single-pass Pallas kernel, see FusedAdam; same math, measured A/B in
    BASELINE.md)."""
    if impl == "fused":
        return FusedAdam(lr, weight_decay, b1, b2, eps, trainable_mask,
                         moments_dtype)

    def make(learning_rate):
        steps = []
        if weight_decay:
            steps.append(optax.add_decayed_weights(weight_decay))
        if moments_dtype in (None, "float32"):
            steps.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
        else:
            import jax.numpy as jnp
            steps.append(_scale_by_adam_lowp(b1, b2, eps,
                                             jnp.dtype(moments_dtype)))
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
    if (isinstance(optimizer, FusedAdam) and mesh is not None
            and mesh.shape.get("model", 1) > 1 and optimizer.use_pallas):
        # pallas_call has no GSPMD partitioning spec: on a TP mesh the
        # model-axis-sharded leaves (TRN fc0/fc1, parallel/mesh.py) would be
        # gathered whole per device or fail to lower. Same-math jnp path
        # partitions natively (ADVICE r3).
        import logging
        logging.getLogger(__name__).warning(
            "optimizer.impl=fused on a tensor-parallel mesh (model=%d): "
            "using the identical-math jnp path instead of the Pallas kernel",
            mesh.shape["model"])
        optimizer.use_pallas = False
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
