"""Pallas TPU kernel: fused dense-SAGE layer.

One Mosaic kernel for a whole GraphSAGE layer over dense temporal graphs —
``msg = relu(z @ Wp + bp)``; mean-aggregation as a per-sample (N, N)
normalized-adjacency contraction; ``out = agg @ Wl + bl + z @ Wr`` — all three
matmuls and the aggregation run back-to-back in VMEM with the layer weights
resident (the XLA path round-trips each intermediate through HBM).

Scope: static per-task adjacency (AR/OSCC/PNR chains). LTA's label-dependent
forecast edges make its adjacency per-sample; that branch stays on the XLA
path. Forward-only: training keeps the XLA implementation (measured at the
roofline already, see ROADMAP.md); this kernel serves inference/eval paths and
documents the fused-kernel recipe for the backbone.

Enable per call via ``DenseSAGEConv(..)``'s ``impl`` or globally with
``EGOPACK_SAGE_IMPL=pallas`` (eval paths only).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sage_kernel(z_ref, aggm_ref, wp_ref, bp_ref, wl_ref, bl_ref, wr_ref,
                 out_ref, *, tile_rows: int):
    """All-2D formulation: aggregation is a block-diagonal
    (I_samples ⊗ A/deg) matmul — Mosaic-friendly (no 3D dot/transpose)."""
    z = z_ref[:].astype(jnp.float32)  # (tile, H)
    msg = jnp.maximum(
        jnp.dot(z, wp_ref[:], preferred_element_type=jnp.float32)
        + bp_ref[0:1, :], 0.0)
    aggm = aggm_ref[0:tile_rows, 0:tile_rows]
    agg = jnp.dot(aggm, msg, preferred_element_type=jnp.float32)
    out = (jnp.dot(agg, wl_ref[:], preferred_element_type=jnp.float32)
           + bl_ref[0:1, :]
           + jnp.dot(z, wr_ref[:], preferred_element_type=jnp.float32))
    out_ref[:] = out


def _tile_samples(batch: int, n_nodes: int) -> int:
    """Largest divisor of ``batch`` keeping the row tile ≤ 256 and the row
    count a multiple of 8 (f32 sublane)."""
    best = 1
    for s in range(1, batch + 1):
        if batch % s == 0 and s * n_nodes <= 256 and (s * n_nodes) % 8 == 0:
            best = s
    return best


def can_fuse(batch: int, n_nodes: int) -> bool:
    """Whether a (batch, n_nodes) graph admits an aligned row tiling."""
    s = _tile_samples(batch, n_nodes)
    return batch % s == 0 and (s * n_nodes) % 8 == 0


def fused_sage(z: jax.Array, adj: jax.Array, wp: jax.Array, bp: jax.Array,
               wl: jax.Array, bl: jax.Array, wr: jax.Array,
               interpret: bool = False) -> jax.Array:
    """Fused SAGE layer (project=True, mean aggregation, lin_l bias,
    lin_r no-bias) over ``z (B, N, H)`` with shared ``adj (N, N)``.

    Matches ``DenseSAGEConv.__call__`` up to f32 accumulation order (tested)."""
    b, n, h = z.shape
    spt = _tile_samples(b, n)
    tile_rows = spt * n
    grid = (b // spt,)

    adj_f = adj.astype(jnp.float32)
    deg = jnp.maximum(adj_f.sum(-1, keepdims=True), 1.0)
    adjn = adj_f / deg  # zero-degree rows aggregate to 0
    # block-diagonal aggregation matrix for one tile of `spt` samples,
    # padded to Mosaic's (8, 128) f32 minimum tile
    aggm = jnp.kron(jnp.eye(spt, dtype=jnp.float32), adjn)  # (tile, tile)
    rows_pad = max(((tile_rows + 7) // 8) * 8, 8)
    lane_pad = max(((tile_rows + 127) // 128) * 128, 128)
    aggm_p = jnp.zeros((rows_pad, lane_pad), jnp.float32).at[
        :tile_rows, :tile_rows].set(aggm)
    bp_p = jnp.zeros((8, h), jnp.float32).at[0].set(bp.astype(jnp.float32))
    bl_p = jnp.zeros((8, h), jnp.float32).at[0].set(bl.astype(jnp.float32))

    kernel = functools.partial(_sage_kernel, tile_rows=tile_rows)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_rows, h), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows_pad, lane_pad), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((h, h), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, h), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * n, h), jnp.float32),
        interpret=interpret,
    )(z.reshape(b * n, h).astype(jnp.float32), aggm_p,
      wp.astype(jnp.float32), bp_p,
      wl.astype(jnp.float32), bl_p,
      wr.astype(jnp.float32))
    return out.reshape(b, n, h)
