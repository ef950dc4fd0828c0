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


def test_host_bf16_transfer_matches_device_cast():
    """Casting x to bf16 on the HOST before transfer (halves H2D bytes) is
    bitwise identical to shipping f32 and letting the device cast — both are
    one round-to-nearest-even f32->bf16 conversion."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes
    import numpy as np

    import __graft_entry__ as ge

    feat_dim, hidden = 16, 16
    system = ge._build_system(hidden, 16, feat_dim)
    system.compute_dtype = jnp.bfloat16
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)
    batch = ge._synthetic_batches(system, 4, feat_dim, seed=1)["ar"]
    f32 = {k: np.asarray(v) for k, v in batch.items()}
    host_cast = dict(f32)
    host_cast["x"] = f32["x"].astype(ml_dtypes.bfloat16)

    @jax.jit
    def fwd(params, b):
        feat, _ = system.backbone_features(params, b, "ar", train=False,
                                           rng=None)
        return feat

    a = np.asarray(fwd(params, {k: jnp.asarray(v) for k, v in f32.items()}))
    b = np.asarray(fwd(params, {k: jnp.asarray(v)
                                for k, v in host_cast.items()}))
    np.testing.assert_array_equal(a, b)


def test_bf16_propagation_losses_close_and_dtype_propagates():
    """``propagate_dtype=bf16`` (full activation propagation through pooling
    + GNN — the opt-in bandwidth lever, BASELINE.md "bf16 propagation")
    keeps losses within bf16 tolerance of the f32-activation policy, and the
    backbone really does emit bf16 between layers (the policy's entire
    point: halved inter-layer HBM traffic)."""
    feat_dim, hidden = 64, 32
    mesh = pmesh.make_mesh(1, 1)
    opt = topt.adam(1e-5, 0.0)
    active = ("ar", "oscc", "lta", "pnr")

    losses = {}
    for name, pdt in (("f32act", None), ("bf16prop", jnp.bfloat16)):
        system = ge._build_system(hidden, 64, feat_dim, propagate_dtype=pdt)
        system.compute_dtype = jnp.bfloat16
        params = system.init_params(jax.random.PRNGKey(0), feat_dim)
        params = pmesh.place_params(params, mesh)
        opt_state = opt.init(params)
        step = system.make_train_step(opt, active)
        batches = {n: pmesh.shard_batch(b, mesh) for n, b in
                   ge._synthetic_batches(system, 8, feat_dim).items()}
        _, _, logs = step(params, opt_state, batches, jax.random.PRNGKey(1),
                          1e-5)
        losses[name] = {k: float(v) for k, v in logs.items()}
        assert all(np.isfinite(v) for v in losses[name].values()), losses

    for k in losses["f32act"]:
        assert losses["bf16prop"][k] == pytest.approx(
            losses["f32act"][k], rel=0.05), (k, losses)

    # the intermediate activations are actually bf16 under propagation
    system = ge._build_system(hidden, 64, feat_dim,
                              propagate_dtype=jnp.bfloat16)
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)
    batch = ge._synthetic_batches(system, 4, feat_dim)["ar"]
    x = system.expand_x("ar", batch["x"]).astype(jnp.bfloat16)
    b, n = x.shape[:2]
    pooled = system.backbone.apply(
        {"params": params["temporal_graph"]},
        x.reshape(1, b * n, *x.shape[2:]), method="pool")
    assert pooled.dtype == jnp.bfloat16
