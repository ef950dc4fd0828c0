#!/usr/bin/env python3
"""Bound the cost of the graph-mode LayerNorm full reductions.

The reference's LayerNorm normalizes over the ENTIRE node tensor (whole-
tensor scalar mean/std — load-bearing parity quirk, PARITY.md), which is a
full-reduction sync point per layer per task branch. This probe interleaves
the production MTL step against a WRONG-NUMERICS variant whose LayerNorm is
affine-only (no statistics), bounding the maximum win any LN-statistics
optimization (e.g. fusing the per-task reductions into one segmented pass)
could deliver. Measured round 3: 0.995x — the statistics are free; the
wrong-numerics variant lives only here, swapped in while the probe arm
traces, never in egopack_tpu model code.

Timing methodology (interleaved same-process windows, true fetch-sync)
lives in bench.run_interleaved_arms; the step builder is bench.build_mtl_step.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402  (repo-root bench.py — the shared harness)
from egopack_tpu.models import backbone as _backbone  # noqa: E402
from egopack_tpu.models.layers import GraphLayerNorm  # noqa: E402

SPC = 8


class AffineOnlyLN(GraphLayerNorm):
    """GraphLayerNorm minus the whole-tensor statistics (same params, wrong
    numerics by construction) — the probe's upper-bound arm."""

    @nn.compact
    def __call__(self, x, node_mask=None):
        dim = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (dim,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (dim,), jnp.float32)
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)


def build_and_warm(name):
    """Build + trace one arm (3 warmup calls force the jit trace while the
    LN class swap is in place; the compiled executable then sticks to the
    arm's step closure)."""
    t0 = time.time()
    step, params, opt_state, batch_list, _mesh = bench.build_mtl_step(SPC)
    rng = jax.random.PRNGKey(1)
    for i in range(3):
        params, opt_state, logs = step(params, opt_state, batch_list,
                                       jax.random.fold_in(rng, i),
                                       i * SPC, 1e-5)
    bench._sync(logs)
    print(f"[{name}] built+warm in {time.time() - t0:.1f}s", flush=True)
    return {"step": step, "params": params, "opt_state": opt_state,
            "extra": (), "batch_list": batch_list, "spc": SPC, "lr": 1e-5}


def main():
    from egopack_tpu.utils.platform import apply_env_platform
    apply_env_platform()
    bench.setup_compilation_cache()
    bench.require_device()

    arms = {"baseline": build_and_warm("baseline")}
    _backbone.GraphLayerNorm = AffineOnlyLN  # trace-time swap, probe arm only
    try:
        arms["ln_identity"] = build_and_warm("ln_identity")
    finally:
        _backbone.GraphLayerNorm = GraphLayerNorm
    bench.run_interleaved_arms(arms)


if __name__ == "__main__":
    main()
