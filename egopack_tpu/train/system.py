"""The multi-task system: backbone + task heads + fused jitted steps.

This is the TPU-native heart of the framework. Where the reference runs four
sequential PyTorch forwards and one backward per iteration with Python dispatch
between them (/root/reference/main_temporal.py:87-130), here *all four task
branches and the backward pass live inside ONE jitted XLA program* — the
multi-task loss is a sum, so one ``jax.grad`` over the fused loss reproduces
the reference's ``torch.stack(losses).sum().backward()`` exactly while letting
XLA schedule every matmul back-to-back on the MXU.

Phase-2 (EgoPack) steps reproduce the reference gradient topology
(/root/reference/main_egopack.py:45-61):
- aux-task features are ``stop_gradient``-ed before GraphONE interaction
- the k-NN edge computation is non-differentiable
- ``backprop_temporal_graph=False`` stops gradients at the backbone output
- graphone conv weights DO receive gradients through the interacted features
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..data.graphs import GraphSpec
from ..models.backbone import TemporalGraph
from ..models.graphone import GraphONE
from ..ops.losses import bce_with_logits, cross_entropy, masked_mean

TASK_ORDER = ("ar", "lta", "oscc", "pnr")

# checkpoint keys mirror the reference state dict
# (/root/reference/main_temporal.py:410-416)
CKPT_KEYS = {"ar": "task/recognition", "oscc": "task/oscc",
             "lta": "task/lta", "pnr": "task/pnr"}


@dataclass
class TaskSetup:
    name: str
    head: Any  # linen head module
    spec: GraphSpec
    weight: float = 1.0
    # LTA forecast-node fill mode ("avg"/"zero"): lets the loader ship ONLY
    # the real input clips and the jitted step materialize the redundant
    # forecast nodes on device (see MultiTaskSystem.expand_x)
    append_node: Optional[str] = None


def lta_full_adjacency(base_adj: jax.Array, y: jax.Array, radius: float,
                       ) -> jax.Array:
    """Per-sample LTA adjacency: radius chain + forecast edges, in-jit.

    Reproduces /root/reference/models/transforms/lta_temp_connectivity.py:49-55
    including the strict ``y > 0`` forecast count (see data/graphs.py).
    y: (B, N, 2); returns (B, N, N) bool.
    """
    b, n = y.shape[0], y.shape[1]
    verb = y[..., 0]
    num_input = (verb == -1).sum(axis=1)  # (B,)
    num_forecast = (verb > 0).sum(axis=1)
    t_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)[None]  # targets
    s_idx = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)[None]  # sources
    ni = num_input[:, None, None]
    nf = num_forecast[:, None, None]
    src_lo = jnp.ceil(ni - radius).astype(jnp.int32)
    extra = ((s_idx >= jnp.maximum(src_lo, 0)) & (s_idx < ni)
             & (t_idx >= ni) & (t_idx < ni + nf))
    return base_adj[None] | extra


def _global_norm(tree) -> jax.Array:
    """L2 norm over every leaf (optax.global_norm semantics)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(l.astype(jnp.float32)))
                        for l in leaves))


def _subtree_norms(tree, prefix: str) -> Dict[str, jax.Array]:
    """Per-layer L2 norms: one scalar per (component, top-level module)
    subtree — e.g. ``grad_norm/temporal_graph/gcn_0``. The cheap middle
    ground to ``wandb.watch(model, log="all")``'s per-parameter histograms
    (/root/reference/main_temporal.py:262): same debugging granularity
    (which layer's gradients vanished/exploded) at a few extra reduction
    scalars instead of full histogram transfers."""
    out = {}
    for k1, v1 in tree.items():
        if isinstance(v1, dict) and v1 and all(
                isinstance(v2, dict) for v2 in v1.values()):
            for k2, v2 in v1.items():
                out[f"{prefix}/{k1}/{k2}"] = _global_norm(v2)
        else:
            out[f"{prefix}/{k1}"] = _global_norm(v1)
    return out


def _leaf_path_name(path) -> str:
    return "/".join(str(getattr(k, "key", getattr(k, "idx", k)))
                    for k in path)


def _tree_histograms(tree, prefix: str, bins: int) -> Dict[str, tuple]:
    """Per-parameter value histograms (counts + bin edges), computed on
    device — the FULL ``wandb.watch(model, log="all")`` analog
    (/root/reference/main_temporal.py:262, main_egopack.py:309-314):
    per-parameter weight/gradient distributions, where ``_subtree_norms`` is
    the cheap always-on scalar tier. The transfer is tiny (2·bins+1 floats
    per leaf), so these snapshots are cheap to take at epoch cadence."""
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    return {f"{prefix}/{_leaf_path_name(p)}":
            jnp.histogram(leaf.astype(jnp.float32).ravel(), bins=bins)
            for p, leaf in flat}


def _phase1_task_loss(name: str, logits, y) -> jax.Array:
    """Per-element phase-1 criteria (/root/reference/main_temporal.py:281-298):
    AR/LTA: plain CE(ignore −1) summed over verb+noun heads; OSCC: plain CE;
    PNR: BCE-with-logits on the float one-hot."""
    if name in ("ar", "lta"):
        return jnp.stack([cross_entropy(l, y[..., i])
                          for i, l in enumerate(logits)]).sum(0)  # (B, N)
    if name == "oscc":
        return cross_entropy(logits, y)  # (B,)
    if name == "pnr":
        return bce_with_logits(logits, y.astype(jnp.float32))  # (B, N)
    raise ValueError(name)



def _effective_banks(params, banks):
    """freeze=False support: when bank values live in the param tree
    ('graphone_banks'), rebuild the banks from params so gradients flow into
    them (the reference's nn.Embedding.from_pretrained(freeze=False))."""
    if "graphone_banks" not in params:
        return banks
    from ..models.graphone import PrototypeBank
    return {t: PrototypeBank(params["graphone_banks"][t], banks[t].mask)
            for t in banks}


class MultiTaskSystem:
    """Owns the backbone + heads and builds the fused jitted steps."""

    def __init__(self, backbone: TemporalGraph, tasks: Dict[str, TaskSetup],
                 compute_dtype: jnp.dtype = jnp.float32,
                 fused_layout: Optional[str] = None):
        self.backbone = backbone
        self.tasks = tasks
        self.compute_dtype = compute_dtype
        # "slice": pool fused, then re-slice per task for graph reasoning
        # (reason_multi). "concat": keep the concatenated node set through
        # the WHOLE reason stack — block-diagonal aggregation + task-onehot
        # LN — slicing once at the heads (kills the trace ledger's
        # fusion-boundary `slice-done` family; see docs/ARCHITECTURE.md).
        # "auto" (default): pick by concatenated node count — measured
        # crossover in BASELINE.md "Fused-layout A/B" (concat 1.065× at
        # M=752 where the step is Adam-HBM-bound and the block-diagonal
        # matmul rides the idle MXU; 0.81× at M=6016 where its O(M²) FLOPs
        # hit a compute-bound step). None → env EGOPACK_FUSED_LAYOUT
        # (resolved here at build time, a plumbed attribute thereafter).
        if fused_layout is None:
            import os
            fused_layout = os.environ.get("EGOPACK_FUSED_LAYOUT", "auto")
        self.fused_layout = fused_layout

    # Auto-policy crossover: concat measured 1.065× at M=752 and 0.815× at
    # M=6016 (same chip, interleaved A/B — BASELINE.md). The block-diagonal
    # aggregation costs O(M²·H) FLOPs vs the slice layout's O(Σ b·n²·H), so
    # the win shrinks as M grows; 1024 keeps the measured-win regime (all
    # reference batch-16/32 configs) on concat without extrapolating into
    # the measured-loss regime.
    CONCAT_AUTO_MAX_NODES = 1024

    def _resolve_layout(self, total_nodes: int) -> str:
        layout = self.fused_layout
        if layout == "auto":
            return ("concat" if total_nodes <= self.CONCAT_AUTO_MAX_NODES
                    else "slice")
        if layout not in ("concat", "slice"):
            # fail loudly: a typo'd value silently running the wrong A/B arm
            # would poison a parity or timing measurement
            raise ValueError(
                f"fused_layout must be 'auto'|'concat'|'slice', got {layout!r}")
        return layout

    # ---------------- initialization ----------------
    def init_params(self, rng: jax.Array, feature_dim: int) -> Dict[str, Any]:
        params: Dict[str, Any] = {}
        ks = jax.random.split(rng, len(self.tasks) + 1)
        any_spec = next(iter(self.tasks.values())).spec
        x = jnp.zeros((1, any_spec.num_nodes, self.backbone.num_segments,
                       feature_dim), jnp.float32)
        adj = jnp.asarray(any_spec.adjacency)
        pos = jnp.asarray(any_spec.pos)
        params["temporal_graph"] = self.backbone.init(
            ks[0], x, adj, pos)["params"]
        h = jnp.zeros((1, any_spec.num_nodes, self.backbone.hidden_size),
                      jnp.float32)
        for i, (name, setup) in enumerate(sorted(self.tasks.items())):
            params[CKPT_KEYS[name]] = setup.head.init(ks[i + 1], h)["params"]
        return params

    # ---------------- forward pieces ----------------
    def expand_x(self, name: str, x: jax.Array) -> jax.Array:
        """Materialize COMPACT host batches into the full dense node layout
        ON DEVICE (shape-gated and static under jit; full batches pass
        through untouched). The host pipeline ships only non-redundant
        bytes — at the reference batch size this cuts per-step H2D traffic
        ~2.5× (7.5 → 3.0 MB):

        - PNR compact ``(B, N, D)``: each frame feature repeats S× per node
          (reference /root/reference/data/ego4d_oscc.py:291 does the repeat
          host-side) → ``(B, N, S, D)``.
        - LTA compact ``(B, n_input, S, D)``: the 20 forecast nodes are a
          broadcast of the input mean (or zeros) —
          /root/reference/data/ego4d_fho.py:384-391 fills them host-side —
          → ``(B, num_nodes, S, D)``. ``append_node="random"`` keeps the
          host-side full layout (host rng is not reproducible on device).
        """
        setup = self.tasks[name]
        if x.ndim == 3:
            x = jnp.repeat(x[:, :, None, :], self.backbone.num_segments,
                           axis=2)
        n = setup.spec.num_nodes
        if x.shape[1] != n:
            n_fill = n - x.shape[1]
            mode = setup.append_node or "avg"
            if mode == "avg":
                fill = jnp.broadcast_to(
                    jnp.mean(x, axis=1, keepdims=True),
                    (x.shape[0], n_fill) + x.shape[2:])
            elif mode == "zero":
                fill = jnp.zeros((x.shape[0], n_fill) + x.shape[2:], x.dtype)
            else:
                raise ValueError(
                    f"compact batch for {name} with append_node={mode}; "
                    "the loader must ship the full layout for this mode")
            x = jnp.concatenate([x, fill], axis=1)
        return x

    def _fuse_sig(self, x) -> Tuple[int, int]:
        """(segments, feature_dim) AFTER expansion — what fusion compares."""
        s = self.backbone.num_segments if x.ndim == 3 else x.shape[2]
        return (s, x.shape[-1])

    def backbone_features(self, params, batch, name: str, train: bool,
                          rng: Optional[jax.Array]) -> Tuple[jax.Array, jax.Array]:
        """Run the shared backbone on one task's dense batch; returns
        (features (B, N, H), node_mask (B, N))."""
        setup = self.tasks[name]
        x = self.expand_x(name, batch["x"]).astype(self.compute_dtype)
        y = batch["y"]
        valid = batch["valid"]
        node_mask = jnp.broadcast_to(valid[:, None], x.shape[:2])
        base_adj = jnp.asarray(setup.spec.adjacency)
        if setup.spec.lta_extra:
            adj = lta_full_adjacency(base_adj, y, setup.spec.radius)
        else:
            adj = base_adj
        rngs = {"dropout": rng} if (train and rng is not None) else None
        feat = self.backbone.apply(
            {"params": params["temporal_graph"]}, x, adj,
            jnp.asarray(setup.spec.pos), node_mask, train=train, rngs=rngs)
        return feat.astype(jnp.float32), node_mask

    def head_apply(self, params, name: str, method: str, *args,
                   train: bool = False, rng: Optional[jax.Array] = None, **kw):
        head = self.tasks[name].head
        rngs = {"dropout": rng} if (train and rng is not None) else None
        return head.apply({"params": params[CKPT_KEYS[name]]}, *args,
                          train=train, rngs=rngs, method=method, **kw)

    def _task_adj(self, name: str, y: jax.Array) -> jax.Array:
        setup = self.tasks[name]
        base_adj = jnp.asarray(setup.spec.adjacency)
        if setup.spec.lta_extra:
            return lta_full_adjacency(base_adj, y, setup.spec.radius)
        return base_adj

    def _concat_static(self, metas):
        """Host-precomputed constants for the concat fused layout: per-row
        task/sample/node ids, the STATIC part of the block-diagonal adjacency
        (every task's base radius graph; LTA's dynamic forecast edges are
        added on device), the same-(task, sample) pair mask, the task-onehot
        assignment and the concatenated node positions. All shapes are
        static per (names, batch) signature, so this runs once per trace."""
        import numpy as np
        tid, sid, nid, pos_cc = [], [], [], []
        for ti, (name, b, n) in enumerate(metas):
            tid.append(np.full(b * n, ti, np.int32))
            sid.append(np.repeat(np.arange(b, dtype=np.int32), n))
            nid.append(np.tile(np.arange(n, dtype=np.int32), b))
            pos_cc.append(np.tile(np.asarray(self.tasks[name].spec.pos), b))
        tid, sid, nid = map(np.concatenate, (tid, sid, nid))
        pos_cc = np.concatenate(pos_cc)
        same = (tid[:, None] == tid[None]) & (sid[:, None] == sid[None])
        static_adj = np.zeros((tid.size, tid.size), bool)
        off = 0
        for ti, (name, b, n) in enumerate(metas):
            a = np.asarray(self.tasks[name].spec.adjacency)
            sel = slice(off, off + b * n)
            static_adj[sel, sel] = (same[sel, sel]
                                    & a[nid[sel][:, None], nid[sel][None, :]])
            off += b * n
        onehot = (tid[None, :] == np.arange(len(metas),
                                            dtype=np.int32)[:, None])
        return tid, sid, nid, static_adj, same, onehot.astype(np.float32), \
            pos_cc

    def _concat_adjacency(self, metas, batches, static_adj, same, tid, sid,
                          nid) -> jax.Array:
        """Block-diagonal in-neighbor mask over the concatenated node set:
        the static base graphs plus each LTA-style task's y-dependent
        forecast edges (lta_full_adjacency semantics, rephrased as
        elementwise conditions over per-row vectors — no scatter)."""
        adj = jnp.asarray(static_adj)
        sid_j, nid_j = jnp.asarray(sid), jnp.asarray(nid)
        same_j = None
        for ti, (name, b, n) in enumerate(metas):
            spec = self.tasks[name].spec
            if not spec.lta_extra:
                continue
            if same_j is None:
                same_j = jnp.asarray(same)
            verb = batches[name]["y"][..., 0]           # (b, n)
            ni = (verb == -1).sum(axis=1)               # (b,)
            nf = (verb > 0).sum(axis=1)
            is_t = jnp.asarray(tid == ti)               # (M,) static
            ni_r = ni[sid_j]                            # (M,)
            nf_r = nf[sid_j]
            src_lo = jnp.ceil(ni_r - spec.radius).astype(jnp.int32)
            src_ok = is_t & (nid_j >= jnp.maximum(src_lo, 0)) & (nid_j < ni_r)
            fc = is_t & (nid_j >= ni_r) & (nid_j < ni_r + nf_r)
            adj = adj | (fc[:, None] & src_ok[None, :] & same_j)
        return adj

    def fused_backbone_features(self, params, batches, names, train: bool,
                                rng: Optional[jax.Array]):
        """Pool the node sets of ALL task branches in ONE matmul, then run
        per-task graph reasoning. Numerics-preserving (pooling is per-node);
        this turns 3-4 small (B·N, S·D) matmuls into one large one on the MXU.
        Requires every task to share (S, D) — true for all reference configs
        (num_segments=3 everywhere; PNR repeats frames 3×).

        ``fused_layout="concat"`` keeps the concatenated layout through the
        whole reason stack (TemporalGraph.reason_concat) and slices per task
        exactly once, here, after the final residual."""
        xs, metas = [], []
        for name in names:
            x = self.expand_x(name, batches[name]["x"]).astype(
                self.compute_dtype)
            b, n = x.shape[0], x.shape[1]
            xs.append(x.reshape(1, b * n, x.shape[2], x.shape[3]))
            metas.append((name, b, n))
        rngs = {"dropout": rng} if (train and rng is not None) else None
        x_all = jnp.concatenate(xs, axis=1)
        h_all = self.backbone.apply({"params": params["temporal_graph"]},
                                    x_all, train=train, rngs=rngs,
                                    method="pool")[0]
        masks = [jnp.broadcast_to(batches[name]["valid"][:, None], (b, n))
                 for name, b, n in metas]
        layout = self._resolve_layout(sum(b * n for _, b, n in metas))
        if layout == "concat":
            tid, sid, nid, static_adj, same, onehot, pos_cc = \
                self._concat_static(metas)
            adj_cc = self._concat_adjacency(metas, batches, static_adj, same,
                                            tid, sid, nid)
            mask_cc = jnp.concatenate([m.reshape(-1) for m in masks])
            feats_cc = self.backbone.apply(
                {"params": params["temporal_graph"]}, h_all[None], adj_cc,
                jnp.asarray(pos_cc), mask_cc, jnp.asarray(onehot),
                train=train, rngs=rngs, method="reason_concat")
            out, off = {}, 0
            for (name, b, n), mask in zip(metas, masks):
                feat = feats_cc[0, off:off + b * n].reshape(b, n, -1)
                out[name] = (feat.astype(jnp.float32), mask)
                off += b * n
            return out
        hs, adjs, poss = [], [], []
        off = 0
        for name, b, n in metas:
            hs.append(h_all[off:off + b * n].reshape(b, n, -1))
            off += b * n
            adjs.append(self._task_adj(name, batches[name]["y"]))
            poss.append(jnp.asarray(self.tasks[name].spec.pos))
        feats = self.backbone.apply(
            {"params": params["temporal_graph"]}, hs, adjs, poss, masks,
            train=train, rngs=rngs, method="reason_multi")
        return {name: (feat.astype(jnp.float32), mask)
                for (name, _, _), feat, mask in zip(metas, feats, masks)}

    def _can_fuse(self, batches, names) -> bool:
        shapes = {self._fuse_sig(batches[n]["x"]) for n in names}
        return len(shapes) == 1 and len(names) > 1

    # ---------------- phase 1: fused MTL step ----------------
    def _make_phase1_loss_fn(self, active: Tuple[str, ...]):
        def loss_fn(params, batches, rng):
            total = 0.0
            logs = {}
            fused = self._can_fuse(batches, active)
            if fused:
                feats = self.fused_backbone_features(
                    params, batches, active, train=True,
                    rng=jax.random.fold_in(rng, 1000))
            for i, name in enumerate(active):
                k1, k2 = jax.random.split(jax.random.fold_in(rng, i))
                batch = batches[name]
                if fused:
                    feat, node_mask = feats[name]
                else:
                    feat, node_mask = self.backbone_features(
                        params, batch, name, train=True, rng=k1)
                tfeat = self.head_apply(params, name, "forward_features", feat,
                                        train=True, rng=k2)
                if name == "oscc":
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, node_mask, train=True, rng=k2)
                else:
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, train=True, rng=k2)
                per_elem = _phase1_task_loss(name, logits, batch["y"])
                mask = batch["valid"] if per_elem.ndim == 1 else node_mask
                loss = masked_mean(per_elem, mask)
                logs[f"{name}_loss"] = loss
                total = total + self.tasks[name].weight * loss
            return total, logs

        return loss_fn

    def make_train_step(self, optimizer, active: Tuple[str, ...],
                        log_norms: bool = True,
                        per_layer_norms: bool = False):
        """One jitted step over the active task subset. ``active`` is static —
        the step is compiled once per enabled-task pattern (mirrors the
        reference's weight>0 gating). ``log_norms=False`` drops the two
        global-norm reductions (full passes over all grads + params) from the
        fused program — a bandwidth lever on the Adam-bound step.
        ``per_layer_norms=True`` adds one scalar per model subtree (see
        _subtree_norms)."""
        loss_fn = self._make_phase1_loss_fn(active)

        def inner_step(params, opt_state, batches, rng):
            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, batches, rng)
            if log_norms:
                # gradient/parameter observability — the wandb.watch(model,
                # log="all") analog (/root/reference/main_temporal.py:262)
                logs["grad_norm"] = _global_norm(grads)
                logs["param_norm"] = _global_norm(params)
            if per_layer_norms:
                logs.update(_subtree_norms(grads, "grad_norm"))
                logs.update(_subtree_norms(params, "param_norm"))
            if hasattr(optimizer, "fused_apply"):
                # single-pass Pallas Adam (optim.FusedAdam): decay + moments
                # + parameter step fused, one read/write per tensor
                params, opt_state = optimizer.fused_apply(grads, opt_state,
                                                          params)
            else:
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = jax.tree_util.tree_map(
                    lambda p, u: p + u, params, updates)
            return params, opt_state, logs

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, batches, rng, lr):
            opt_state.hyperparams["learning_rate"] = lr
            return inner_step(params, opt_state, batches, rng)

        step.inner = inner_step
        return step

    def make_train_step_multi(self, optimizer, active: Tuple[str, ...],
                              steps_per_call: int, log_norms: bool = True,
                              per_layer_norms: bool = False):
        """``steps_per_call`` sequential optimizer steps over as many distinct
        batch groups inside ONE jitted program, UNROLLED (``lax.scan`` over
        steps measured ~50× slower on this stack). Mathematically identical to
        K dispatched calls of ``make_train_step``; amortizes dispatch latency
        — at the reference's batch 16 this lifts measured throughput ~2.3×
        (BASELINE.md). ``batch_list`` is a tuple of K per-task batch dicts;
        logs come back stacked with a leading K axis.

        RNG schedule: step ``k`` uses ``fold_in(rng, gstep0 + k)`` where
        ``gstep0`` is the epoch-relative index of the first step in the group
        and ``rng`` the epoch key — the SAME key a single-step driver run
        derives, so spc=1 and spc=K runs are bitwise identical (verified by
        ``test_steps_per_call_matches_single_step``).

        ``log_norms="last"`` computes the global grad/param norms only on the
        group's LAST inner step (scalars in the logs, not K-stacked): the two
        full passes over all grads+params are an observability EXTRA beyond
        the reference (wandb.watch logs at intervals, never per step), and
        at steps_per_call=K this prices them at 1/K — a bandwidth lever on
        the Adam-bound step. Params are bit-identical for any setting."""
        last_only = log_norms == "last"
        inner = self.make_train_step(optimizer, active,
                                     False if last_only else log_norms,
                                     per_layer_norms).inner
        inner_last = (self.make_train_step(optimizer, active, True,
                                           per_layer_norms).inner
                      if last_only else inner)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state, batch_list, rng, gstep0, lr):
            opt_state.hyperparams["learning_rate"] = lr
            all_logs = []
            for k in range(steps_per_call):
                fn = inner_last if k == steps_per_call - 1 else inner
                params, opt_state, logs = fn(
                    params, opt_state, batch_list[k],
                    jax.random.fold_in(rng, gstep0 + k))
                all_logs.append(logs)
            logs = {key: jnp.stack([l[key] for l in all_logs])
                    for key in all_logs[0]}
            if last_only:  # last-step-only norm scalars, unstacked
                logs.update({k: v for k, v in all_logs[-1].items()
                             if k not in all_logs[0]})
            return params, opt_state, logs

        return multi_step

    def make_histogram_fn(self, active: Tuple[str, ...], graphone=None,
                          bins: int = 64, **phase2_kw):
        """Jitted observability snapshot: recompute gradients on ONE batch
        group and return per-parameter histograms of gradients AND weights —
        the complete ``wandb.watch(model, log="all")`` analog (see
        ``_tree_histograms``). Runs OUTSIDE the train step at a configured
        epoch cadence (``log_histograms_every``), so the hot loop carries no
        histogram cost. Phase-1 signature ``(params, batches, rng)`` when
        ``graphone`` is None; phase-2 ``(params, banks, batches, rng)``
        otherwise (``phase2_kw`` forwards to ``make_egopack_loss_fn``)."""
        if graphone is None:
            loss_fn = self._make_phase1_loss_fn(active)

            @jax.jit
            def hist_fn(params, batches, rng):
                grads = jax.grad(loss_fn, has_aux=True)(params, batches,
                                                        rng)[0]
                return {**_tree_histograms(grads, "grad_hist", bins),
                        **_tree_histograms(params, "param_hist", bins)}
        else:
            loss_fn = self.make_egopack_loss_fn(active, graphone, **phase2_kw)

            @jax.jit
            def hist_fn(params, banks, batches, rng):
                grads = jax.grad(loss_fn, has_aux=True)(params, banks,
                                                        batches, rng)[0]
                return {**_tree_histograms(grads, "grad_hist", bins),
                        **_tree_histograms(params, "param_hist", bins)}

        return hist_fn

    # ---------------- eval forward (phase 1 & 2) ----------------
    def make_eval_step(self, name: str, aux: Tuple[str, ...] = (),
                       graphone: Optional[GraphONE] = None,
                       late_fusion: bool = True):
        """Jitted eval forward for one task; optional GraphONE interaction
        (/root/reference/validate.py:33-60)."""

        def step(params, batch, banks):
            feat, node_mask = self.backbone_features(params, batch, name,
                                                     train=False, rng=None)
            tfeat = self.head_apply(params, name, "forward_features", feat)
            aux_feats = None
            # post-features logged by meters: the task-projected features —
            # stacked with the interacted aux features in the graphone case
            # (/root/reference/validate.py:43,52-56)
            post_feat = tfeat
            if graphone is not None and aux:
                flat = feat.reshape(-1, feat.shape[-1])
                secondary = {t: self.head_apply(params, t, "forward_features",
                                                flat) for t in aux}
                inter, _ = graphone.apply(
                    {"params": params["graphone"]}, secondary,
                    _effective_banks(params, banks), method="interact")
                aux_feats = {t: v.reshape(feat.shape[0], feat.shape[1], -1)
                             for t, v in inter.items()}
                post_feat = jnp.stack(
                    [tfeat.reshape(-1, tfeat.shape[-1]), *inter.values()],
                    axis=1).reshape(feat.shape[0], feat.shape[1], -1)
            if late_fusion or aux_feats is None:
                if name == "oscc":
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, node_mask,
                                             aux_features=aux_feats)
                elif name == "pnr":
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, None,
                                             aux_features=aux_feats)
                else:
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, None,
                                             aux_features=aux_feats)
            else:
                # early fusion: max over stacked primary+aux features
                # (/root/reference/validate.py:49)
                mixed = jnp.stack([tfeat, *aux_feats.values()], axis=1).max(1)
                if name == "oscc":
                    logits = self.head_apply(params, name, "forward_logits",
                                             mixed, node_mask)
                else:
                    logits = self.head_apply(params, name, "forward_logits",
                                             mixed)
            per_elem = _phase2_task_loss(self.tasks[name].head, name, logits,
                                         batch["y"])
            return logits, per_elem, post_feat, node_mask

        return jax.jit(step)

    # ---------------- phase 2: EgoPack step ----------------
    def make_egopack_loss_fn(self, active: Tuple[str, ...],
                             graphone: GraphONE,
                             backprop_temporal_graph: bool = True,
                             temporal_graph_train_mode: bool = False,
                             late_fusion: bool = True):
        """The phase-2 loss as a standalone function (params, banks, batches,
        rng) -> (loss, logs); used by the train steps and by the
        reference-in-the-loop parity tests."""
        all_tasks = tuple(self.tasks.keys())

        def task_loss(params, banks, name, batch, rng):
            banks = _effective_banks(params, banks)
            k1, k2 = jax.random.split(rng)
            feat, node_mask = self.backbone_features(
                params, batch, name, train=temporal_graph_train_mode, rng=k1)
            if not backprop_temporal_graph:
                feat = jax.lax.stop_gradient(feat)
            # interact only with tasks that HAVE prototype banks — the
            # reference would KeyError if a primary's aux set includes a task
            # outside the pretrained triple (only reachable via non-standard
            # enabled_tasks combinations); filtering is the graceful superset
            others = tuple(t for t in all_tasks
                           if t != name and t in graphone.task_labels)
            tfeat = self.head_apply(params, name, "forward_features", feat,
                                    train=True, rng=k2)
            flat = feat.reshape(-1, feat.shape[-1])
            # aux features are DETACHED before interaction
            # (/root/reference/main_egopack.py:53)
            secondary = {
                t: jax.lax.stop_gradient(
                    self.head_apply(params, t, "forward_features", flat,
                                    train=True, rng=jax.random.fold_in(k2, i)))
                for i, t in enumerate(others)
            }
            inter, _ = graphone.apply({"params": params["graphone"]},
                                      secondary, banks, method="interact")
            aux_feats = {t: v.reshape(feat.shape[0], feat.shape[1], -1)
                         for t, v in inter.items()}
            if late_fusion:
                if name == "oscc":
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, node_mask,
                                             aux_features=aux_feats,
                                             train=True, rng=k2)
                else:
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, None, aux_features=aux_feats,
                                             train=True, rng=k2)
            else:
                if name == "oscc":
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, node_mask, train=True, rng=k2)
                else:
                    logits = self.head_apply(params, name, "forward_logits",
                                             tfeat, None, train=True, rng=k2)
            per_elem = _phase2_task_loss(self.tasks[name].head, name, logits,
                                         batch["y"])
            mask = batch["valid"] if per_elem.ndim == 1 else node_mask
            return masked_mean(per_elem, mask)

        def loss_fn(params, banks, batches, rng):
            total, logs = 0.0, {}
            for i, name in enumerate(active):
                loss = task_loss(params, banks, name, batches[name],
                                 jax.random.fold_in(rng, i))
                logs[f"{name}_loss"] = loss
                total = total + self.tasks[name].weight * loss
            return total, logs

        return loss_fn

    def make_egopack_train_step(self, optimizer, active: Tuple[str, ...],
                                graphone: GraphONE,
                                backprop_temporal_graph: bool = True,
                                temporal_graph_train_mode: bool = False,
                                late_fusion: bool = True,
                                log_norms: bool = True,
                                per_layer_norms: bool = False):
        loss_fn = self.make_egopack_loss_fn(
            active, graphone, backprop_temporal_graph,
            temporal_graph_train_mode, late_fusion)

        def inner_step(params, opt_state, banks, batches, rng):
            (_, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                params, banks, batches, rng)
            if log_norms:
                logs["grad_norm"] = _global_norm(grads)
                logs["param_norm"] = _global_norm(params)
            if per_layer_norms:
                logs.update(_subtree_norms(grads, "grad_norm"))
                logs.update(_subtree_norms(params, "param_norm"))
            if hasattr(optimizer, "fused_apply"):
                params, opt_state = optimizer.fused_apply(grads, opt_state,
                                                          params)
            else:
                updates, opt_state = optimizer.update(grads, opt_state,
                                                      params)
                params = jax.tree_util.tree_map(lambda p, u: p + u, params,
                                                updates)
            return params, opt_state, logs

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(params, opt_state, banks, batches, rng, lr):
            opt_state.hyperparams["learning_rate"] = lr
            return inner_step(params, opt_state, banks, batches, rng)

        step.inner = inner_step
        return step

    def make_egopack_train_step_multi(self, optimizer, active, graphone,
                                      steps_per_call: int, **kw):
        """Unrolled multi-step variant of the EgoPack step (same rationale,
        rng schedule and ``log_norms="last"`` lever as
        ``make_train_step_multi``)."""
        last_only = kw.get("log_norms", True) == "last"
        inner_kw = dict(kw)
        if last_only:
            inner_kw["log_norms"] = False
        inner = self.make_egopack_train_step(optimizer, active, graphone,
                                             **inner_kw).inner
        inner_last = inner
        if last_only:
            inner_kw["log_norms"] = True
            inner_last = self.make_egopack_train_step(
                optimizer, active, graphone, **inner_kw).inner

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def multi_step(params, opt_state, banks, batch_list, rng, gstep0, lr):
            opt_state.hyperparams["learning_rate"] = lr
            all_logs = []
            for k in range(steps_per_call):
                fn = inner_last if k == steps_per_call - 1 else inner
                params, opt_state, logs = fn(
                    params, opt_state, banks, batch_list[k],
                    jax.random.fold_in(rng, gstep0 + k))
                all_logs.append(logs)
            logs = {key: jnp.stack([l[key] for l in all_logs])
                    for key in all_logs[0]}
            if last_only:
                logs.update({k: v for k, v in all_logs[-1].items()
                             if k not in all_logs[0]})
            return params, opt_state, logs

        return multi_step


def _phase2_task_loss(head, name: str, logits, y) -> jax.Array:
    """Phase-2 criteria = each head's ``compute_loss``
    (/root/reference/main_egopack.py:61; notably OSCC gains label smoothing
    0.1 that phase 1 does not have)."""
    del name
    return head.compute_loss(logits, y)
