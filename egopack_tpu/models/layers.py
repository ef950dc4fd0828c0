"""Core layers: torch-init Linear, dense SAGE convolution, graph-mode
LayerNorm, sinusoidal positional encoding.

Each layer documents the exact reference semantics it reproduces; the
*implementations* are dense, mask-based and statically shaped so XLA tiles them
onto the MXU — no scatter/gather message passing exists on the device path
(SURVEY.md §2.4 maps each PyG CUDA kernel to its dense equivalent here).
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


def torch_kernel_init():
    """torch.nn.Linear default: kaiming_uniform(a=sqrt(5)) == U(±1/sqrt(fan_in)).

    Matching init keeps training dynamics comparable to the reference without
    copying any code (it is the documented torch default).
    """
    return nn.initializers.variance_scaling(1.0 / 3.0, "fan_in", "uniform")


class TLinear(nn.Module):
    """Linear layer with torch-default initialization (weight and bias)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        in_features = x.shape[-1]
        kernel = self.param("kernel", torch_kernel_init(),
                            (in_features, self.features), jnp.float32)
        bound = 1.0 / math.sqrt(in_features)

        def bias_init(key, shape, dtype=jnp.float32):
            return jax.random.uniform(key, shape, dtype, -bound, bound)

        # mixed-precision policy: matmul INPUTS run in the caller's compute
        # dtype (bf16 under compute_dtype=bfloat16 — halves the dominant
        # fc0 operand traffic), accumulation and activations stay f32.
        # Full bf16 propagation was measured SLOWER on v5e at these small
        # per-task shapes (cast overhead > bandwidth savings: 28.4k vs
        # 41.2k clips/s), so outputs deliberately remain f32 unless an
        # explicit ``dtype`` is requested.
        in_dtype = self.dtype or x.dtype
        y = jnp.dot(x.astype(in_dtype), kernel.astype(in_dtype),
                    preferred_element_type=jnp.float32)
        if self.use_bias:
            bias = self.param("bias", bias_init, (self.features,), jnp.float32)
            y = y + bias
        return y.astype(self.dtype) if self.dtype is not None else y


class LayerNorm(nn.Module):
    """Per-feature LayerNorm with torch defaults (eps=1e-5, affine)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        mean = x32.mean(-1, keepdims=True)
        var = ((x32 - mean) ** 2).mean(-1, keepdims=True)
        y = (x32 - mean) * jax.lax.rsqrt(var + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class GraphLayerNorm(nn.Module):
    """PyG ``gnn.LayerNorm(mode='graph')`` called WITHOUT a batch vector.

    The reference backbone wires LayerNorm into ``gnn.Sequential`` as
    ``"x -> x"`` (/root/reference/models/graph.py:43), so PyG normalizes over
    the *entire batched node tensor*: ``x = x - x.mean(); x / (x.std(unbiased
    =False) + eps)`` followed by a per-feature affine. This cross-sample
    coupling is load-bearing for parity — a per-node LayerNorm trains
    differently. Masked here so padded nodes don't pollute the statistics.
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jax.Array, node_mask: Optional[jax.Array] = None,
                 task_onehot: Optional[jax.Array] = None) -> jax.Array:
        """Graph-mode LN. With ``task_onehot (T, M)`` the input is the
        CONCATENATED layout ``x (1, M, H)`` holding several tasks' node sets
        stacked on the node axis; each task gets its own whole-tensor masked
        statistics (the same two-pass mean/var as the per-task path) without
        slicing the layout — per-task reductions ride two tiny ``(T, M)``
        matmuls (the fused-layout design, docs/ARCHITECTURE.md)."""
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        x32 = x.astype(jnp.float32)
        if task_onehot is not None:
            m = node_mask.astype(jnp.float32)  # (M,)
            cnt = jnp.maximum(task_onehot @ m * dim, 1.0)          # (T,)
            row_sum = (x32[0] * m[:, None]).sum(-1)                # (M,)
            mean_t = (task_onehot @ row_sum) / cnt                 # (T,)
            mean = (task_onehot.T @ mean_t)[None, :, None]         # (1, M, 1)
            row_var = (((x32 - mean) ** 2)[0] * m[:, None]).sum(-1)
            var_t = (task_onehot @ row_var) / cnt
            var = (task_onehot.T @ var_t)[None, :, None]
        elif node_mask is None:
            mean = x32.mean()
            var = ((x32 - mean) ** 2).mean()
        else:
            m = node_mask.astype(jnp.float32)[..., None]  # (B, N, 1)
            count = jnp.maximum(m.sum() * dim, 1.0)
            mean = (x32 * m).sum() / count
            var = (((x32 - mean) ** 2) * m).sum() / count
        y = (x32 - mean) / (jnp.sqrt(var) + self.epsilon)
        return (y * scale + bias).astype(x.dtype)


class DenseSAGEConv(nn.Module):
    """GraphSAGE convolution over a dense in-neighbor mask.

    Matches PyG ``SAGEConv`` math (documented behavior of
    torch_geometric.nn.SAGEConv, used at /root/reference/models/graph.py:42 with
    ``project=True`` and at /root/reference/models/graphONE/graphONE.py:60 with
    ``aggr='max', bias=False, project=False``):

    - ``project``: messages are ``relu(W_p x_j + b_p)`` instead of raw ``x_j``
    - aggregation over in-neighbors ``j`` with ``adj[t, j] = 1`` (mean or max);
      a node with no in-neighbors aggregates to 0 (PyG scatter semantics)
    - output ``W_l · agg (+ b_l) + W_r · x_t`` — root weight never has a bias

    Dense form: aggregation is one (B, N, N) × (B, N, H) matmul (mean) or a
    masked max — MXU-friendly, no scatter.
    """

    features: int
    aggr: str = "mean"
    project: bool = False
    use_bias: bool = True
    # None: bf16-inputs/f32-activations mixed precision (TLinear policy).
    # jnp.bfloat16: FULL activation propagation — outputs stay bf16 between
    # layers (halves inter-layer HBM traffic; an opt-in non-parity lever,
    # measured in BASELINE.md "bf16 propagation").
    dtype: Optional[jnp.dtype] = None

    def setup(self):
        if self.project:
            self.lin_project = TLinear(self.features, dtype=self.dtype,
                                       name="lin_project")
        self.lin_l = TLinear(self.features, use_bias=self.use_bias,
                             dtype=self.dtype, name="lin_l")
        self.lin_r = TLinear(self.features, use_bias=False, dtype=self.dtype,
                             name="lin_r")

    def _aggregate(self, msg: jax.Array, adj: jax.Array) -> jax.Array:
        if adj.ndim == 2:
            adj = jnp.broadcast_to(adj[None], (msg.shape[0],) + adj.shape)
        a = adj.astype(msg.dtype)
        if self.aggr == "mean":
            deg = jnp.maximum(a.sum(-1, keepdims=True), 1.0)
            agg = jnp.einsum("bts,bsh->bth", a, msg,
                             preferred_element_type=jnp.float32
                             ).astype(msg.dtype) / deg
        elif self.aggr == "max":
            neg = jnp.finfo(msg.dtype).min
            masked = jnp.where(adj[..., None], msg[:, None, :, :], neg)
            agg = masked.max(axis=2)
        else:
            raise ValueError(f"Unknown aggregation: {self.aggr}")
        return jnp.where(adj.any(-1, keepdims=True), agg, 0.0)

    def __call__(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        # x: (B, N, H); adj: (B, N, N) or (N, N) bool in-neighbor mask.
        # A fused whole-layer Pallas kernel existed here behind
        # EGOPACK_SAGE_IMPL=pallas; it measured at exact XLA parity at every
        # batch size (XLA already fuses this into MXU matmuls at roofline)
        # and was removed — see docs/ARCHITECTURE.md "Pallas ledger".
        msg = nn.relu(self.lin_project(x)) if self.project else x
        agg = self._aggregate(msg, adj)
        return self.lin_l(agg) + self.lin_r(x)

    def concat(self, x: jax.Array, adj: jax.Array) -> jax.Array:
        """Concatenated-layout variant: ``x (1, M, H)`` stacks every task's
        node set; ``adj (M, M)`` is the block-diagonal in-neighbor mask over
        the whole concatenated set (blocks = one per (task, sample)). The
        aggregation is ONE MXU-shaped (M, M)·(M, H) matmul instead of T
        batched tiny-N einsums, and no slice/concat boundary exists anywhere
        in the layer (the `slice-done` family in the MTL trace ledger).
        Mean aggregation only (the backbone's config)."""
        if self.aggr != "mean":
            raise NotImplementedError("concat layout supports mean aggr")
        msg = nn.relu(self.lin_project(x)) if self.project else x
        a = adj.astype(msg.dtype)                       # (M, M)
        deg = jnp.maximum(a.sum(-1, keepdims=True), 1.0)
        agg = (jnp.einsum("ts,bsh->bth", a, msg,
                          preferred_element_type=jnp.float32)
               .astype(msg.dtype) / deg)
        agg = jnp.where(adj.any(-1)[None, :, None], agg, 0.0)
        return self.lin_l(agg) + self.lin_r(x)

    def multi(self, xs, adjs):
        """Cross-graph fused variant: the per-node matmuls (project / lin_l /
        lin_r) run ONCE over the concatenation of every graph's node set (one
        large MXU matmul instead of T small ones); only the tiny per-graph
        adjacency aggregation stays separate. Numerics-identical to calling
        ``__call__`` per graph."""
        sizes = [(x.shape[0], x.shape[1]) for x in xs]
        flat = jnp.concatenate([x.reshape(1, -1, x.shape[-1]) for x in xs], 1)
        msg_flat = nn.relu(self.lin_project(flat)) if self.project else flat
        aggs, off = [], 0
        for (b, n), adj in zip(sizes, adjs):
            msg = msg_flat[0, off:off + b * n].reshape(b, n, -1)
            off += b * n
            aggs.append(self._aggregate(msg, adj).reshape(1, b * n, -1))
        agg_flat = jnp.concatenate(aggs, 1)
        out_flat = self.lin_l(agg_flat) + self.lin_r(flat)
        outs, off = [], 0
        for b, n in sizes:
            outs.append(out_flat[0, off:off + b * n].reshape(b, n, -1))
            off += b * n
        return outs


def positional_encoding(pos: jax.Array, out_channels: int,
                        base_freq: float = 1e-4) -> jax.Array:
    """PyG ``gnn.PositionalEncoding`` (used at /root/reference/models/graph.py:37):
    frequencies = logspace(0, 1, C/2, base=base_freq); output =
    ``[sin(pos·f), cos(pos·f)]`` concatenated on the channel axis."""
    half = out_channels // 2
    if half > 1:
        exponents = jnp.linspace(0.0, 1.0, half)
    else:
        exponents = jnp.zeros((max(half, 1),))
    freqs = jnp.asarray(base_freq) ** exponents  # (half,)
    angles = pos.astype(jnp.float32)[..., None] * freqs  # (..., half)
    return jnp.concatenate([jnp.sin(angles), jnp.cos(angles)], axis=-1)
