"""bfloat16 compute path: losses match float32 within bf16 tolerance (the
benchmark configuration keeps params + accumulation in f32)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
import jax.numpy as jnp
from egopack_tpu.parallel import mesh as pmesh
from egopack_tpu.train import optim as topt


def test_bf16_losses_close_to_f32():
    feat_dim, hidden = 64, 32
    mesh = pmesh.make_mesh(1, 1)
    opt = topt.adam(1e-5, 0.0)
    active = ("ar", "oscc", "lta", "pnr")

    losses = {}
    for dtype in (jnp.float32, jnp.bfloat16):
        system = ge._build_system(hidden, 64, feat_dim)
        system.compute_dtype = dtype
        params = system.init_params(jax.random.PRNGKey(0), feat_dim)
        params = pmesh.place_params(params, mesh)
        opt_state = opt.init(params)
        step = system.make_train_step(opt, active)
        batches = {n: pmesh.shard_batch(b, mesh) for n, b in
                   ge._synthetic_batches(system, 8, feat_dim).items()}
        _, _, logs = step(params, opt_state, batches, jax.random.PRNGKey(1),
                          1e-5)
        losses[str(dtype.__name__)] = {k: float(v) for k, v in logs.items()}

    for k in losses["float32"]:
        assert losses["bfloat16"][k] == pytest.approx(
            losses["float32"][k], rel=0.05), (k, losses)
