"""Shared temporal-graph backbone.

Mirrors ``Graph`` (/root/reference/models/graph.py:15-65): pre-dropout → TRN
pooling → ``x + net(x + PE(pos))`` where net = depth × [SAGEConv(project=True)
→ graph-LayerNorm → LeakyReLU(0.2)] + Linear. The TPU-native difference: the
graph is a dense static in-neighbor mask, all four task branches share this one
module inside a single jitted step, and node masks make padded val batches
exact.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import instantiate
from .layers import DenseSAGEConv, GraphLayerNorm, TLinear, positional_encoding
from .pooling import TRNPooling


class TemporalGraph(nn.Module):
    """Temporal backbone over dense per-task graphs.

    Inputs: ``x (B, N, S, D)``, ``adj (N, N) | (B, N, N)`` bool in-neighbor
    mask, ``pos (N,)`` node positions, ``node_mask (B, N)`` valid-node mask.
    Output: node features ``(B, N, hidden_size)``.
    """

    input_size: int
    hidden_size: int = 1024
    depth: int = 3
    pre_dropout: float = 0.0
    temporal_pooling: Optional[Any] = None  # config node or linen module
    num_segments: int = 8
    # None (default, reference-parity numerics): bf16 matmul inputs with f32
    # activations between layers. jnp.bfloat16: FULL activation propagation
    # through pooling + GNN — an opt-in bandwidth lever like
    # optimizer.moments_dtype; measured per batch size in BASELINE.md.
    propagate_dtype: Optional[Any] = None

    def setup(self):
        tp = self.temporal_pooling
        if hasattr(tp, "items") and not isinstance(tp, nn.Module):
            tp = dict(tp)  # flax freezes dict attributes; unfreeze for hydra
        if isinstance(tp, dict):
            # hydra-style: instantiate(cfg, input_size, hidden_size, num_segments)
            # (/root/reference/models/graph.py:33)
            tp = instantiate(tp, self.input_size, self.hidden_size,
                             self.num_segments, dtype=self.propagate_dtype)
        elif tp is None:
            tp = TRNPooling(self.input_size, self.hidden_size,
                            self.num_segments, dtype=self.propagate_dtype)
        self.pooling = tp
        self.pre_drop = nn.Dropout(self.pre_dropout)
        self.convs = [DenseSAGEConv(self.hidden_size, aggr="mean", project=True,
                                    dtype=self.propagate_dtype,
                                    name=f"sage{i}") for i in range(self.depth)]
        self.norms = [GraphLayerNorm(name=f"gn{i}") for i in range(self.depth)]
        self.out_lin = TLinear(self.hidden_size, dtype=self.propagate_dtype,
                               name="out_lin")

    def pool(self, x: jax.Array, train: bool = False) -> jax.Array:
        """Pre-dropout + temporal pooling: (B, N, S, D) → (B, N, H).

        Exposed separately so the fused multi-task step can concatenate the
        node sets of ALL task branches into one large MXU matmul (the pooling
        MLP is per-node, so fusing across tasks is numerics-preserving)."""
        x = self.pre_drop(x, deterministic=not train)
        return self.pooling(x, train=train)

    def reason(self, h: jax.Array, adj: jax.Array, pos: jax.Array,
               node_mask: Optional[jax.Array] = None,
               train: bool = False) -> jax.Array:
        """Graph reasoning over pooled node features: PE + depth×SAGE +
        global residual (/root/reference/models/graph.py:60-63)."""
        if self.depth <= 0:
            return h
        pe = positional_encoding(pos, self.hidden_size).astype(h.dtype)
        z = h + pe if pe.ndim == h.ndim else h + pe[None]
        for conv, norm in zip(self.convs, self.norms):
            z = conv(z, adj)
            z = norm(z, node_mask)
            z = nn.leaky_relu(z, negative_slope=0.2)
        z = self.out_lin(z)
        return h + z

    def reason_multi(self, hs, adjs, poss, node_masks, train: bool = False):
        """Graph reasoning for several task branches at once: the per-node
        matmuls of every SAGE layer and the output Linear are fused across
        branches (``DenseSAGEConv.multi``); adjacency aggregation and the
        graph-mode LayerNorm stay per branch, so the result is numerically
        identical to calling ``reason`` per task."""
        if self.depth <= 0:
            return list(hs)
        zs = [h + positional_encoding(p, self.hidden_size).astype(h.dtype)[None]
              for h, p in zip(hs, poss)]
        for conv, norm in zip(self.convs, self.norms):
            zs = conv.multi(zs, adjs)
            zs = [nn.leaky_relu(norm(z, m), negative_slope=0.2)
                  for z, m in zip(zs, node_masks)]
        sizes = [(z.shape[0], z.shape[1]) for z in zs]
        flat = jnp.concatenate([z.reshape(1, -1, z.shape[-1]) for z in zs], 1)
        out_flat = self.out_lin(flat)
        outs, off = [], 0
        for (b, n), h in zip(sizes, hs):
            outs.append(h + out_flat[0, off:off + b * n].reshape(b, n, -1))
            off += b * n
        return outs

    def reason_concat(self, h: jax.Array, adj_cc: jax.Array, pos_cc: jax.Array,
                      mask_cc: jax.Array, task_onehot: jax.Array,
                      train: bool = False) -> jax.Array:
        """Graph reasoning over the CONCATENATED node set of several task
        branches — the zero-slice alternative to ``reason_multi``: the whole
        stack (PE add, SAGE convs, graph-LN, output Linear, residual) runs on
        one ``(1, M, H)`` layout, with block-diagonal aggregation
        (``DenseSAGEConv.concat``) and task-onehot LN statistics. The per-task
        split happens ONCE, in the caller, after the final residual.

        h (1, M, H); adj_cc (M, M) bool; pos_cc (M,); mask_cc (M,) bool;
        task_onehot (T, M) float."""
        if self.depth <= 0:
            return h
        z = h + positional_encoding(pos_cc,
                                    self.hidden_size).astype(h.dtype)[None]
        for conv, norm in zip(self.convs, self.norms):
            z = conv.concat(z, adj_cc)
            z = norm(z, mask_cc, task_onehot)
            z = nn.leaky_relu(z, negative_slope=0.2)
        return h + self.out_lin(z)

    def __call__(self, x: jax.Array, adj: jax.Array, pos: jax.Array,
                 node_mask: Optional[jax.Array] = None,
                 train: bool = False) -> jax.Array:
        h = self.pool(x, train)
        return self.reason(h, adj, pos, node_mask, train)
