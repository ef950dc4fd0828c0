"""Pallas TPU kernel: fused Adam update (coupled weight decay, torch math).

The headline train step at batch 16 is bound by optimizer HBM traffic
(BASELINE.md decomposition: ~1 ms of the 2.2 ms step is Adam's f32 passes
over ~30M params). This kernel performs the ENTIRE per-leaf update in one
pass — read p, g, m, v once; write p, m, v once (7 memory streams, the
information-theoretic floor for f32 Adam) — with the exact update math of
the production optax chain (train/optim.py:79-95, itself the torch.optim.Adam
semantics of /root/reference/main_temporal.py:265):

    u  = g + wd·p                       (coupled L2, optax.add_decayed_weights)
    m' = b1·m + (1-b1)·u                (optax.scale_by_adam)
    v' = b2·v + (1-b2)·u²
    p' = p - lr · (m'/bc1) / (sqrt(v'/bc2) + eps)

``bc1/bc2 = 1 - b^count`` are computed OUTSIDE the kernel with the same jnp
expression optax uses, so the scalar bits match. Moments may be stored in
bfloat16 (``moments_dtype``): compute stays f32, storage traffic halves —
the same numerics as optim._scale_by_adam_lowp.

Leaves whose flat size is not a multiple of 128 lanes (small biases) take a
plain jnp fallback with the identical expression — XLA fuses those into one
loop anyway; the Pallas path matters only for the large tensors that carry
the bandwidth.
"""

from __future__ import annotations

import functools
import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# rows per grid step over the (R, 128) view: 512×128×4B = 256 KB per f32
# stream; 7 streams ≈ 1.75 MB VMEM — safely under the ~16 MB budget with
# double buffering
_BLOCK_ROWS = 512
_LANES = 128
# below this many elements the dispatch overhead outweighs any bandwidth win.
# Overridable: on this image's tunneled dev TPU, Mosaic compiles cost ~300s
# for the first kernel shape and ~170s per additional shape (measured,
# BASELINE.md), so EGOPACK_FUSED_ADAM_MIN_SIZE=1048576 restricts Pallas to
# the two big-leaf shape classes (95% of optimizer bytes) to fit compile
# windows; direct-attached TPUs compile in seconds and can keep the default.
_MIN_PALLAS_SIZE = int(os.environ.get("EGOPACK_FUSED_ADAM_MIN_SIZE",
                                      16 * 1024))


def _adam_math(p, g, m, v, lr, bc1, bc2, *, wd, b1, b2, eps, m_dtype):
    """The shared update expression (kernel and fallback use THIS).

    Low-precision moments round to ``m_dtype`` BEFORE the rescale — matching
    optim._scale_by_adam_lowp, which stores bf16 and rescales from the
    stored (rounded) values; for float32 the casts are no-ops."""
    u = g + wd * p if wd else g
    m2 = (b1 * m + (1.0 - b1) * u).astype(m_dtype)
    v2 = (b2 * v + (1.0 - b2) * (u * u)).astype(m_dtype)
    m2f = m2.astype(jnp.float32)
    v2f = v2.astype(jnp.float32)
    upd = (m2f / bc1) / (jnp.sqrt(v2f / bc2) + eps)
    return p + upd * (-lr), m2, v2


def _adam_kernel(p_ref, g_ref, m_ref, v_ref, sc_ref,
                 po_ref, mo_ref, vo_ref, *, wd, b1, b2, eps, m_dtype):
    lr = sc_ref[0, 0]
    bc1 = sc_ref[0, 1]
    bc2 = sc_ref[0, 2]
    p = p_ref[:].astype(jnp.float32)
    g = g_ref[:].astype(jnp.float32)
    m = m_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    p2, m2, v2 = _adam_math(p, g, m, v, lr, bc1, bc2,
                            wd=wd, b1=b1, b2=b2, eps=eps, m_dtype=m_dtype)
    po_ref[:] = p2
    mo_ref[:] = m2
    vo_ref[:] = v2


def fused_adam_leaf(p: jax.Array, g: jax.Array, m: jax.Array, v: jax.Array,
                    lr: jax.Array, bc1: jax.Array, bc2: jax.Array, *,
                    wd: float, b1: float, b2: float, eps: float,
                    m_dtype, use_pallas: bool = True
                    ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """One leaf's full Adam step -> (p', m', v'). Pallas single-pass kernel
    for 128-lane-aligned leaves; identical-math jnp fallback otherwise.

    ``use_pallas=False`` forces the jnp path for every leaf — required under
    a tensor-parallel mesh, where pallas_call has no GSPMD partitioning spec
    and model-axis-sharded leaves would be gathered whole onto each device
    (the jnp math partitions natively)."""
    size = p.size
    if not use_pallas or size < _MIN_PALLAS_SIZE or size % _LANES != 0:
        p2, m2, v2 = _adam_math(
            p.astype(jnp.float32), g.astype(jnp.float32),
            m.astype(jnp.float32), v.astype(jnp.float32), lr, bc1, bc2,
            wd=wd, b1=b1, b2=b2, eps=eps, m_dtype=m_dtype)
        return (p2.astype(p.dtype).reshape(p.shape),
                m2.reshape(p.shape), v2.reshape(p.shape))

    rows = size // _LANES
    shape2d = (rows, _LANES)
    br = min(_BLOCK_ROWS, rows)
    grid = (pl.cdiv(rows, br),)
    scalars = jnp.stack([lr.astype(jnp.float32),
                         bc1.astype(jnp.float32),
                         bc2.astype(jnp.float32)]).reshape(1, 3)
    row_spec = pl.BlockSpec((br, _LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    kernel = functools.partial(_adam_kernel, wd=wd, b1=b1, b2=b2, eps=eps,
                               m_dtype=m_dtype)
    p2, m2, v2 = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[row_spec, row_spec, row_spec, row_spec,
                  pl.BlockSpec((1, 3), lambda i: (0, 0),
                               memory_space=pltpu.SMEM)],
        out_specs=(row_spec, row_spec, row_spec),
        out_shape=(jax.ShapeDtypeStruct(shape2d, p.dtype),
                   jax.ShapeDtypeStruct(shape2d, m_dtype),
                   jax.ShapeDtypeStruct(shape2d, m_dtype)),
        # p/m/v update in place on the donated buffers
        input_output_aliases={0: 0, 2: 1, 3: 2},
        interpret=jax.default_backend() != "tpu",
    )(p.reshape(shape2d), g.reshape(shape2d), m.reshape(shape2d),
      v.reshape(shape2d), scalars)
    return (p2.reshape(p.shape), m2.reshape(p.shape), v2.reshape(p.shape))
