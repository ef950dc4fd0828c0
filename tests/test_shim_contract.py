"""Property-based cross-check of the PyG contract (VERDICT r2 next #6).

The reference-in-the-loop parity tests execute the real reference composition
over ``tests/refshim`` re-implementations of the PyG primitives (no
torch_geometric exists in this image). The shims and the production dense jax
layers were written independently from the PyG 2.3 docs; this suite turns
"two independent readings agree" into an executed invariant by fuzzing the
primitives against each other over randomized graphs — isolated nodes,
self-loops, dense/empty adjacencies, max-aggregation ties, missing scatter
rows, near-constant tensors.

Contract sources: /root/reference/models/graph.py:42 (SAGEConv project=True),
/root/reference/models/graphONE/graphONE.py:60 (SAGEConv aggr='max',
bias=False), graph.py:43 (graph-mode LayerNorm), graphONE.py prototype
scatter.
"""

import os
import sys

import numpy as np
import torch

import jax
import jax.numpy as jnp

from egopack_tpu.models.layers import (DenseSAGEConv, GraphLayerNorm,
                                       positional_encoding)

_SHIM = os.path.join(os.path.dirname(os.path.abspath(__file__)), "refshim")
if _SHIM not in sys.path:
    sys.path.insert(0, _SHIM)

from torch_geometric.nn import LayerNorm as ShimLayerNorm  # noqa: E402
from torch_geometric.nn import PositionalEncoding as ShimPosEnc  # noqa: E402
from torch_geometric.nn import SAGEConv as ShimSAGEConv  # noqa: E402
from torch_geometric.utils import scatter as shim_scatter  # noqa: E402


def _random_adj(rng, n, density, self_loops, isolate_some):
    adj = rng.random((n, n)) < density
    if not self_loops:
        np.fill_diagonal(adj, False)
    else:
        np.fill_diagonal(adj, True)
    if isolate_some and n > 2:
        # nodes with NO in-neighbors must aggregate to exactly 0
        adj[rng.integers(0, n)] = False
        adj[rng.integers(0, n)] = False
    return adj


def _adj_to_edge_index(adj):
    """Dense in-neighbor mask -> PyG [src; dst] edge list: adj[t, s]=True
    means s is an in-neighbor of t (source->target flow)."""
    dst, src = np.nonzero(adj)
    return torch.tensor(np.stack([src, dst]), dtype=torch.long)


def test_fuzz_sageconv_shim_matches_dense_jax():
    rng = np.random.default_rng(0)
    cases = 0
    for case in range(120):
        n = int(rng.integers(2, 12))
        h = int(rng.choice([4, 8]))
        aggr = ["mean", "max"][case % 2]
        project = bool((case // 2) % 2)
        bias = bool((case // 4) % 2)
        density = float(rng.choice([0.0, 0.2, 0.5, 1.0]))
        adj = _random_adj(rng, n, density, self_loops=bool(case % 3 == 0),
                          isolate_some=bool(case % 3 == 1))
        x = rng.normal(size=(n, h)).astype(np.float32)
        if aggr == "max" and case % 4 == 0:
            # force exact ties between competing messages
            x = np.round(x, 1)

        shim = ShimSAGEConv(h, h, aggr=aggr, bias=bias, project=project)
        with torch.no_grad():
            t_out = shim(torch.tensor(x), _adj_to_edge_index(adj)).numpy()

        layer = DenseSAGEConv(features=h, aggr=aggr, project=project,
                              use_bias=bias)
        params = {}
        if project:
            params["lin_project"] = {
                "kernel": jnp.asarray(shim.lin.weight.detach().numpy().T),
                "bias": jnp.asarray(shim.lin.bias.detach().numpy())}
        params["lin_l"] = {
            "kernel": jnp.asarray(shim.lin_l.weight.detach().numpy().T)}
        if bias:
            params["lin_l"]["bias"] = jnp.asarray(
                shim.lin_l.bias.detach().numpy())
        params["lin_r"] = {
            "kernel": jnp.asarray(shim.lin_r.weight.detach().numpy().T)}
        j_out = layer.apply({"params": params}, jnp.asarray(x)[None],
                            jnp.asarray(adj))[0]
        np.testing.assert_allclose(np.asarray(j_out), t_out,
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"case {case}: n={n} h={h} "
                                           f"aggr={aggr} project={project} "
                                           f"bias={bias} density={density}")
        cases += 1
    assert cases >= 100


def test_fuzz_graph_layernorm_shim_matches_jax():
    rng = np.random.default_rng(1)
    ln_j = GraphLayerNorm()
    for case in range(120):
        b = int(rng.integers(1, 5))
        n = int(rng.integers(1, 9))
        h = int(rng.choice([3, 8, 16]))
        scale = float(rng.choice([1.0, 1e-3, 1e3]))
        x = (rng.normal(size=(b, n, h)) * scale).astype(np.float32)
        const = None
        if case % 5 == 0:
            # var=0 edge: output must collapse to (approximately) the affine
            # bias. XLA strength-reduces mean's divide-by-constant to a
            # multiply by rounded 1/n, so the jax mean can carry a 1-ulp
            # error that the x/(std+eps) contract amplifies by up to
            # |c|·2^-23/eps — bound the comparison by that amplification.
            const = float(rng.choice([0.5, 2.0, -1.25]))
            x = np.full((b, n, h), const, np.float32)
        weight = rng.normal(size=h).astype(np.float32)
        bias = rng.normal(size=h).astype(np.float32)

        shim = ShimLayerNorm(h)
        with torch.no_grad():
            shim.weight.copy_(torch.tensor(weight))
            shim.bias.copy_(torch.tensor(bias))
            t_out = shim(torch.tensor(x.reshape(-1, h))).numpy()

        params = {"scale": jnp.asarray(weight), "bias": jnp.asarray(bias)}
        j_out = ln_j.apply({"params": params}, jnp.asarray(x))
        if const is not None:
            amp = abs(const) * 2.0 ** -23 / 1e-5 * float(np.abs(weight).max())
            np.testing.assert_allclose(
                np.asarray(j_out).reshape(-1, h), t_out,
                rtol=0, atol=2 * amp + 1e-6,
                err_msg=f"const case {case}: c={const}")
            np.testing.assert_allclose(  # and both sit at the bias
                t_out, np.broadcast_to(bias, t_out.shape), rtol=0,
                atol=2 * amp + 1e-6, err_msg=f"const-bias case {case}")
        else:
            np.testing.assert_allclose(
                np.asarray(j_out).reshape(-1, h), t_out, rtol=2e-4, atol=2e-5,
                err_msg=f"case {case}: b={b} n={n} h={h} scale={scale}")

        # masked variant: stats over valid nodes only == shim over the
        # valid rows alone (padded nodes must not pollute the statistics)
        mask = rng.random((b, n)) < 0.7
        if mask.any():
            with torch.no_grad():
                t_masked = shim(torch.tensor(x[mask])).numpy()
            j_masked = ln_j.apply({"params": params}, jnp.asarray(x),
                                  jnp.asarray(mask))
            np.testing.assert_allclose(
                np.asarray(j_masked)[mask], t_masked, rtol=2e-4, atol=2e-5,
                err_msg=f"masked case {case}")


def test_fuzz_scatter_shim_matches_jax_segment_ops():
    rng = np.random.default_rng(2)
    for case in range(160):
        reduce = ["sum", "mean", "max", "min"][case % 4]
        m = int(rng.integers(0, 20))  # includes empty src
        d = int(rng.choice([1, 4]))
        size = int(rng.integers(1, 8))
        src = rng.normal(size=(m, d)).astype(np.float32)
        idx = rng.integers(0, size, m)

        t_out = shim_scatter(torch.tensor(src), torch.tensor(idx),
                             dim_size=size, reduce=reduce).numpy()

        jsrc, jidx = jnp.asarray(src), jnp.asarray(idx)
        if reduce == "sum":
            j_out = jax.ops.segment_sum(jsrc, jidx, num_segments=size)
        elif reduce == "mean":
            s = jax.ops.segment_sum(jsrc, jidx, num_segments=size)
            c = jax.ops.segment_sum(jnp.ones((m,)), jidx, num_segments=size)
            j_out = s / jnp.maximum(c, 1.0)[:, None]
        else:
            seg = (jax.ops.segment_max if reduce == "max"
                   else jax.ops.segment_min)(jsrc, jidx, num_segments=size)
            cnt = jax.ops.segment_sum(jnp.ones((m,)), jidx,
                                      num_segments=size)
            # PyG contract: untouched rows stay 0 (scatter_reduce
            # include_self=False over a zero-initialized output)
            j_out = jnp.where(cnt[:, None] > 0, seg, 0.0)
        np.testing.assert_allclose(np.asarray(j_out), t_out,
                                   rtol=1e-6, atol=1e-6,
                                   err_msg=f"case {case}: reduce={reduce} "
                                           f"m={m} size={size}")


def test_fuzz_positional_encoding_matches_shim():
    rng = np.random.default_rng(3)
    for case in range(100):
        c = int(rng.choice([2, 4, 8, 16, 32]))
        n = int(rng.integers(1, 30))
        pos = (rng.normal(size=n) * rng.choice([1, 10, 100])).astype(np.float32)
        shim = ShimPosEnc(c)
        with torch.no_grad():
            t_out = shim(torch.tensor(pos)).numpy()
        j_out = positional_encoding(jnp.asarray(pos), c)
        np.testing.assert_allclose(np.asarray(j_out), t_out,
                                   rtol=1e-4, atol=1e-5,
                                   err_msg=f"case {case}: c={c}")
