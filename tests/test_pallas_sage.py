"""Pallas fused SAGE layer: parity with DenseSAGEConv (interpret mode)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egopack_tpu.data.graphs import ar_spec, pnr_spec
from egopack_tpu.models.layers import DenseSAGEConv
from egopack_tpu.ops.pallas.sage import can_fuse, fused_sage


@pytest.mark.parametrize("spec,b", [(ar_spec(9, 1.0), 8), (pnr_spec(16, 1.0), 4)])
def test_fused_sage_matches_dense(spec, b):
    rng = np.random.default_rng(0)
    h = 128
    x = jnp.asarray(rng.normal(size=(b, spec.num_nodes, h)), dtype=jnp.float32)
    adj = jnp.asarray(spec.adjacency)
    conv = DenseSAGEConv(h, aggr="mean", project=True)
    params = conv.init(jax.random.PRNGKey(0), x, adj)
    expect = conv.apply(params, x, adj)
    p = params["params"]
    got = fused_sage(x, adj, p["lin_project"]["kernel"],
                     p["lin_project"]["bias"], p["lin_l"]["kernel"],
                     p["lin_l"]["bias"], p["lin_r"]["kernel"], interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_can_fuse_tiling():
    assert can_fuse(16, 9)   # 8 samples x 9 nodes = 72 rows
    assert can_fuse(16, 4)
    assert can_fuse(16, 16)
    assert not can_fuse(1, 9)  # 9 rows, no multiple-of-8 tiling


def test_env_flag_dispatch(monkeypatch):
    """EGOPACK_SAGE_IMPL=pallas routes DenseSAGEConv through the fused kernel
    (interpret mode off-TPU) with identical outputs."""
    rng = np.random.default_rng(1)
    h = 128
    x = jnp.asarray(rng.normal(size=(8, 4, h)), dtype=jnp.float32)
    adj = jnp.asarray(np.eye(4, k=1, dtype=bool) | np.eye(4, k=-1, dtype=bool))
    conv = DenseSAGEConv(h, aggr="mean", project=True)
    params = conv.init(jax.random.PRNGKey(0), x, adj)
    base = np.asarray(conv.apply(params, x, adj))
    monkeypatch.setenv("EGOPACK_SAGE_IMPL", "pallas")
    got = np.asarray(conv.apply(params, x, adj))
    np.testing.assert_allclose(got, base, rtol=1e-5, atol=1e-5)
