"""Pallas TPU kernel: fused normalize → cosine-distance matmul → top-k.

The EgoPack interaction's hot op (SURVEY.md §3.3): for every batch node, find
the k nearest prototypes by cosine dissimilarity. The reference materializes
the full (B, P) distance matrix and argsorts it on the GPU
(/root/reference/models/graphONE/graphONE.py:119-141). Here a single Mosaic
kernel streams prototype tiles through VMEM: normalize → MXU matmul → running
k-best merge, so the (M, P) distance matrix never touches HBM and the top-k
needs no full sort.

Layout: grid (M_tiles, P_tiles) with the P axis innermost; per-row running
(k)-best values/indices live in VMEM scratch that persists across the P sweep.
Each tile contributes its k smallest candidates (k iterations of min+mask),
then merges with the running buffer (k iterations over a 2k-wide array).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INF = float("inf")


def _row_topk(d: jax.Array, base_idx: jax.Array, k: int
              ) -> Tuple[jax.Array, jax.Array]:
    """k smallest per row of d (M, C); returns (vals (M, k), idx (M, k))."""
    m, c = d.shape
    cols = jax.lax.broadcasted_iota(jnp.int32, (m, c), 1)
    big = jnp.int32(2 ** 30)
    vals, idxs = [], []
    for _ in range(k):
        v = d.min(axis=1, keepdims=True)              # (M, 1)
        # first-occurrence argmin without cumsum (unsupported in Mosaic)
        i = jnp.where(d == v, cols, big).min(axis=1, keepdims=True)
        vals.append(v)
        idxs.append(i + base_idx)
        d = jnp.where(cols == i, _INF, d)
    return jnp.concatenate(vals, 1), jnp.concatenate(idxs, 1)


def _knn_kernel(f_ref, b_ref, mask_ref, out_val_ref, out_idx_ref,
                fn_scr, val_scr, idx_scr, *, k: int, p_tile: int):
    p_i = pl.program_id(1)
    n_p = pl.num_programs(1)

    @pl.when(p_i == 0)
    def _init():
        f = f_ref[:].astype(jnp.float32)
        norm = jnp.sqrt(jnp.sum(f * f, axis=1, keepdims=True))
        fn_scr[:] = f / norm
        val_scr[:] = jnp.full_like(val_scr, _INF)
        idx_scr[:] = jnp.zeros_like(idx_scr)

    b = b_ref[:].astype(jnp.float32)
    bnorm = jnp.sqrt(jnp.sum(b * b, axis=1, keepdims=True))
    bn = b / jnp.maximum(bnorm, 1e-30)
    d = 1.0 - jnp.dot(fn_scr[:], bn.T, preferred_element_type=jnp.float32)
    # mask padded prototype rows (mask is (1, P_TILE) int32)
    d = jnp.where(mask_ref[:] > 0, d, _INF)

    cand_v, cand_i = _row_topk(d, p_i * p_tile, k)
    merged_v = jnp.concatenate([val_scr[:], cand_v], axis=1)
    merged_i = jnp.concatenate([idx_scr[:], cand_i], axis=1)
    cols = jax.lax.broadcasted_iota(jnp.int32, merged_v.shape, 1)
    big = jnp.int32(2 ** 30)
    new_v, sel = [], []
    for _ in range(k):
        v = merged_v.min(axis=1, keepdims=True)
        c = jnp.where(merged_v == v, cols, big).min(axis=1, keepdims=True)
        is_min = cols == c
        i = jnp.where(is_min, merged_i, 0).sum(axis=1, keepdims=True)
        new_v.append(v)
        sel.append(i)
        merged_v = jnp.where(is_min, _INF, merged_v)
    val_scr[:] = jnp.concatenate(new_v, 1)
    idx_scr[:] = jnp.concatenate(sel, 1)

    @pl.when(p_i == n_p - 1)
    def _out():
        out_val_ref[:] = val_scr[:]
        out_idx_ref[:] = idx_scr[:]


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("k", "m_tile", "p_tile",
                                             "interpret"))
def cosine_knn_pallas(features: jax.Array, bank: jax.Array,
                      bank_mask: jax.Array, k: int,
                      m_tile: int = 128, p_tile: int = 512,
                      interpret: bool = False
                      ) -> Tuple[jax.Array, jax.Array]:
    """k nearest valid prototypes by cosine dissimilarity.

    features (M, F), bank (P, F), bank_mask (P,) bool →
    (indices (M, k) int32, distances (M, k) f32). Rows are padded to tile
    multiples internally; callers see the original M.
    """
    m, f = features.shape
    p = bank.shape[0]
    m_pad = _round_up(max(m, 8), m_tile)
    p_pad = _round_up(p, p_tile)
    feats = jnp.zeros((m_pad, f), jnp.float32).at[:m].set(
        features.astype(jnp.float32) + 0)
    # padded feature rows are all-zero → 0/0 in normalize; make them 1s
    if m_pad > m:
        feats = feats.at[m:].set(1.0)
    bank_p = jnp.zeros((p_pad, f), jnp.float32).at[:p].set(
        bank.astype(jnp.float32))
    mask_p = jnp.zeros((1, p_pad), jnp.int32).at[0, :p].set(
        bank_mask.astype(jnp.int32))

    grid = (m_pad // m_tile, p_pad // p_tile)
    kernel = functools.partial(_knn_kernel, k=k, p_tile=p_tile)
    out_val, out_idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m_tile, f), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p_tile, f), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, p_tile), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((m_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((m_tile, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((m_pad, k), jnp.float32),
            jax.ShapeDtypeStruct((m_pad, k), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((m_tile, f), jnp.float32),
            pltpu.VMEM((m_tile, k), jnp.float32),
            pltpu.VMEM((m_tile, k), jnp.int32),
        ],
        interpret=interpret,
    )(feats, bank_p, mask_p)
    return out_idx[:m], out_val[:m]
