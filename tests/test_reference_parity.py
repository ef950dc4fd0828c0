"""Reference-in-the-loop differential parity (VERDICT round-1, item 1).

These tests EXECUTE the actual reference model code — /root/reference's
``models/graph.py``, ``models/tasks/*.py``, ``models/graphONE/graphONE.py``,
``graphone.py``, ``criterion/wrapper.py``, and the LTA connectivity transform —
on CPU torch via the minimal PyG shims in ``tests/refshim/``, port the torch
weights into ``egopack_tpu``'s flax params, and assert numeric agreement
layer-by-layer: pooling output, backbone output, head features/logits/losses,
prototype banks, GraphONE interaction, and one full train-step gradient for
both phases.

What this proves: the reference's *composition* (module wiring, detach
boundaries, loss routing, n_tasks bincount, ``y>0`` edge quirk, fusion rules)
agrees numerically with this framework. See tests/refshim/README.md for the
shim-semantics caveat.
"""

from __future__ import annotations

import importlib
import os
import sys
from typing import Dict

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from egopack_tpu.data import graphs as g  # noqa: E402
from egopack_tpu.models.backbone import TemporalGraph  # noqa: E402
from egopack_tpu.models.graphone import (  # noqa: E402
    GraphONE, PrototypeBank, build_prototypes, make_prototype_step)
from egopack_tpu.models import heads as jheads  # noqa: E402
from egopack_tpu.train.system import (  # noqa: E402
    CKPT_KEYS, MultiTaskSystem, TaskSetup)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SHIM = os.path.join(REPO, "tests", "refshim")
REF = "/root/reference"

pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")

# small-but-nontrivial dims: distinct values catch transposition bugs
D, S, H, F = 24, 3, 64, 48   # input dim, segments, hidden, task feature size
NV, NN = 6, 5                # verbs, nouns
B = 3                        # graphs per batch


@pytest.fixture(scope="module")
def ref():
    """Import the actual reference model code against the refshim packages."""
    for p in (REF, SHIM):
        if p not in sys.path:
            sys.path.insert(0, p)
    tg = importlib.import_module("torch_geometric")
    assert "refshim" in tg.__file__, "shim did not win the import race"
    names = {
        "graph": "models.graph",
        "tasks": "models.tasks",
        "graphONE": "models.graphONE.graphONE",
        "build": "graphone",
        "wrapper": "criterion.wrapper",
        "ltatc": "models.transforms.lta_temp_connectivity",
        "tgdata": "torch_geometric.data",
    }
    mods = type("RefMods", (), {})()
    for attr, modname in names.items():
        setattr(mods, attr, importlib.import_module(modname))
    return mods


# ---------------------------------------------------------------- porting

def t2j(t: torch.Tensor) -> jnp.ndarray:
    # .copy() matters: jnp.asarray of a host numpy array is ZERO-COPY on the
    # CPU backend, so without it an in-place torch optimizer step would mutate
    # the "ported" jax params through the shared buffer
    return jnp.asarray(t.detach().cpu().numpy().copy())


def port_lin(lin: torch.nn.Linear) -> Dict[str, jnp.ndarray]:
    out = {"kernel": t2j(lin.weight).T}
    if lin.bias is not None:
        out["bias"] = t2j(lin.bias)
    return out


def port_ln(ln) -> Dict[str, jnp.ndarray]:
    return {"scale": t2j(ln.weight), "bias": t2j(ln.bias)}


def build_torch_backbone(ref, depth: int = 3):
    torch.manual_seed(7)
    tp_cfg = {"_target_": "models.temporal_pooling.trn_pooling.TRNPooling",
              "hidden_size": H, "dropout": 0.0}
    model = ref.graph.Graph(input_size=D, hidden_size=H, depth=depth,
                            pre_dropout=0.0, temporal_pooling=tp_cfg,
                            num_segments=S)
    model.eval()
    return model


def build_jax_backbone(depth: int = 3) -> TemporalGraph:
    return TemporalGraph(
        input_size=D, hidden_size=H, depth=depth, pre_dropout=0.0,
        temporal_pooling={"_target_": "egopack_tpu.models.pooling.TRNPooling",
                          "hidden_size": H, "dropout": 0.0},
        num_segments=S)


def port_backbone(tmodel, jparams: dict, depth: int = 3) -> dict:
    """Copy torch Graph weights into the flax TemporalGraph param tree."""
    proj = tmodel.temporal_pooling.proj
    pool = jparams["pooling"]
    pool["fc0"], pool["ln0"] = port_lin(proj[0]), port_ln(proj[1])
    pool["fc1"], pool["ln1"] = port_lin(proj[4]), port_ln(proj[5])
    pool["fc_out"] = port_lin(proj[8])
    if depth > 0:
        mods = list(tmodel.net.mods)
        for d in range(depth):
            sage, gln = mods[3 * d], mods[3 * d + 1]
            jparams[f"sage{d}"] = {"lin_project": port_lin(sage.lin),
                                   "lin_l": port_lin(sage.lin_l),
                                   "lin_r": port_lin(sage.lin_r)}
            jparams[f"gn{d}"] = port_ln(gln)
        jparams["out_lin"] = port_lin(mods[-1])
    return jparams


def port_projection(tnet, jp: dict) -> dict:
    """ProjectionTask.net = Sequential(Dropout, Linear, LN, ReLU, Linear)."""
    jp["proj_fc0"] = port_lin(tnet[1])
    jp["proj_ln"] = port_ln(tnet[2])
    jp["proj_fc1"] = port_lin(tnet[4])
    return jp


def _only_child(node: dict) -> str:
    (key,) = node.keys()
    return key


def port_classifier(tcls, node: dict) -> None:
    """(Dropout, Linear) Sequential -> _Classifier/TLinear_0."""
    node[_only_child(node)] = port_lin(tcls[1])


def port_head(ttask, jp: dict, kind: str, aux=()) -> dict:
    port_projection(ttask.net, jp)
    if kind in ("ar", "lta"):
        for i in range(len(ttask.classifiers)):
            port_classifier(ttask.classifiers[i], jp[f"cls{i}"])
        for t in aux:
            for i in range(len(ttask.classifiers)):
                port_classifier(ttask.aux_classifiers[t][i],
                                jp[f"aux_{t}_cls{i}"])
    else:
        port_classifier(ttask.classifier, jp["cls"])
        for t in aux:
            port_classifier(ttask.aux_classifiers[t], jp[f"aux_{t}_cls"])
    return jp


# ---------------------------------------------------------------- batches

def dense_to_torch(ref, x: np.ndarray, y: np.ndarray, spec,
                   y_per_graph: bool = False, edge_adjs=None):
    """Dense (B, N, ...) batch -> collated shim-PyG Data with chain edges."""
    b, n = x.shape[:2]
    xs = torch.tensor(x.reshape(b * n, *x.shape[2:]), dtype=torch.float32)
    if y_per_graph:
        ys = torch.tensor(y.reshape(b, *y.shape[1:]))
    else:
        ys = torch.tensor(y.reshape(b * n, *y.shape[2:]))
    pos = torch.tensor(np.tile(spec.pos, b), dtype=torch.float32)
    batch_vec = torch.arange(b).repeat_interleave(n)
    srcs, dsts = [], []
    for i in range(b):
        adj = spec.adjacency if edge_adjs is None else edge_adjs[i]
        t_idx, s_idx = np.nonzero(adj)  # adj[t, s]: s -> t
        srcs.append(s_idx + i * n)
        dsts.append(t_idx + i * n)
    edge_index = torch.tensor(
        np.stack([np.concatenate(srcs), np.concatenate(dsts)]),
        dtype=torch.long)
    return ref.tgdata.Data(x=xs, y=ys, pos=pos, edge_index=edge_index,
                           batch=batch_vec)


def make_batch(rng: np.random.Generator, spec, kind: str):
    n = spec.num_nodes
    x = rng.standard_normal((B, n, S, D)).astype(np.float32)
    if kind == "ar":
        y = np.full((B, n, 2), -1, np.int64)
        y[:, n // 2, 0] = rng.integers(0, NV, B)
        y[:, n // 2, 1] = rng.integers(0, NN, B)
    elif kind == "lta":
        y = np.zeros((B, n, 2), np.int64)
        y[:, :2] = -1
        y[:, 2:, 0] = rng.integers(0, NV, (B, n - 2))  # include verb==0 rows
        y[:, 2:, 1] = rng.integers(0, NN, (B, n - 2))
    elif kind == "oscc":
        y = rng.integers(0, 2, B).astype(np.int64)
    elif kind == "pnr":
        y = np.zeros((B, n), np.int64)
        y[np.arange(B), rng.integers(0, n, B)] = 1
    return x, y


def jbatch(x, y):
    return {"x": jnp.asarray(x), "y": jnp.asarray(y),
            "valid": jnp.ones(x.shape[0], bool)}


# ---------------------------------------------------------------- backbone

@pytest.mark.parametrize("depth", [1, 3])
def test_backbone_matches_reference(ref, depth):
    tmodel = build_torch_backbone(ref, depth)
    jmodel = build_jax_backbone(depth)
    rng = np.random.default_rng(0)
    spec = g.ar_spec()
    x, y = make_batch(rng, spec, "ar")

    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(spec.adjacency),
                         jnp.asarray(spec.pos))["params"]
    params = jax.tree_util.tree_map(lambda a: a, dict(params))
    port_backbone(tmodel, params, depth)

    data = dense_to_torch(ref, x, y, spec)
    with torch.no_grad():
        tout = tmodel(data).numpy().reshape(B, spec.num_nodes, H)

    # pooling sub-layer
    with torch.no_grad():
        tpool = tmodel.temporal_pooling(data.x).numpy().reshape(
            B, spec.num_nodes, H)
    jpool = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x),
                                    method="pool"))
    np.testing.assert_allclose(jpool, tpool, rtol=1e-4, atol=1e-5)

    jout = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(spec.adjacency),
                                   jnp.asarray(spec.pos)))
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-5)


def test_backbone_matches_on_oscc_graph(ref):
    tmodel = build_torch_backbone(ref)
    jmodel = build_jax_backbone()
    rng = np.random.default_rng(1)
    spec = g.oscc_spec()
    x, y = make_batch(rng, spec, "oscc")
    params = jmodel.init(jax.random.PRNGKey(0), jnp.asarray(x),
                         jnp.asarray(spec.adjacency),
                         jnp.asarray(spec.pos))["params"]
    params = dict(params)
    port_backbone(tmodel, params)
    data = dense_to_torch(ref, x, np.zeros((B, 4, 1), np.int64), spec)
    with torch.no_grad():
        tout = tmodel(data).numpy().reshape(B, spec.num_nodes, H)
    jout = np.asarray(jmodel.apply({"params": params}, jnp.asarray(x),
                                   jnp.asarray(spec.adjacency),
                                   jnp.asarray(spec.pos)))
    np.testing.assert_allclose(jout, tout, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- heads

def _torch_feat(rng: np.random.Generator, n: int):
    feat = rng.standard_normal((B, n, H)).astype(np.float32)
    return feat, torch.tensor(feat.reshape(B * n, H))


def test_recognition_head_matches(ref):
    torch.manual_seed(11)
    aux = ("lta", "oscc")
    ttask = ref.tasks.RecognitionTask(input_size=H, features_size=F,
                                      heads=(NV, NN), aux_tasks=aux)
    ttask.eval()
    jtask = jheads.RecognitionTask(name_="ar", input_size=H, features_size=F,
                                   heads=(NV, NN), aux_tasks=aux)
    rng = np.random.default_rng(2)
    feat, tfeat = _torch_feat(rng, 9)
    jp = dict(jtask.init(jax.random.PRNGKey(0), jnp.asarray(feat))["params"])
    port_head(ttask, jp, "ar", aux)

    with torch.no_grad():
        t_proj = ttask.forward_features(tfeat).numpy()
    j_proj = np.asarray(jtask.apply({"params": jp}, jnp.asarray(feat),
                                    method="forward_features"))
    np.testing.assert_allclose(j_proj.reshape(-1, F), t_proj,
                               rtol=1e-4, atol=1e-5)

    # plain logits
    with torch.no_grad():
        t_logits = ttask.forward_logits(torch.tensor(t_proj))
    j_logits = jtask.apply({"params": jp}, jnp.asarray(j_proj), None,
                           method="forward_logits")
    for tl, jl in zip(t_logits, j_logits):
        np.testing.assert_allclose(np.asarray(jl).reshape(tl.shape),
                                   tl.numpy(), rtol=1e-4, atol=1e-5)

    # late-fusion logits with aux features
    aux_np = {t: rng.standard_normal((B, 9, F)).astype(np.float32)
              for t in aux}
    with torch.no_grad():
        t_fused = ttask.forward_logits(
            torch.tensor(t_proj),
            aux_features={t: torch.tensor(v.reshape(-1, F))
                          for t, v in aux_np.items()})
    j_fused = jtask.apply({"params": jp}, jnp.asarray(j_proj), None,
                          {t: jnp.asarray(v) for t, v in aux_np.items()},
                          method="forward_logits")
    for tl, jl in zip(t_fused, j_fused):
        np.testing.assert_allclose(np.asarray(jl).reshape(tl.shape),
                                   tl.numpy(), rtol=1e-4, atol=1e-5)

    # loss with ignore labels
    y = np.full((B * 9, 2), -1, np.int64)
    y[::9] = [[2, 3]] * B
    with torch.no_grad():
        t_loss = ttask.compute_loss(t_fused, torch.tensor(y)).numpy()
    j_loss = np.asarray(jtask.apply(
        {"params": jp}, [jnp.asarray(np.asarray(l)) for l in j_fused],
        jnp.asarray(y.reshape(B, 9, 2)), method="compute_loss"))
    np.testing.assert_allclose(j_loss.reshape(-1), t_loss, rtol=1e-4,
                               atol=1e-5)


def test_oscc_head_matches(ref):
    torch.manual_seed(12)
    aux = ("ar", "pnr")
    ttask = ref.tasks.OSCCTask(input_size=H, features_size=F, aux_tasks=aux)
    ttask.eval()
    jtask = jheads.OSCCTask(name_="oscc", input_size=H, features_size=F,
                            aux_tasks=aux)
    rng = np.random.default_rng(3)
    n = 4
    feat, tfeat = _torch_feat(rng, n)
    jp = dict(jtask.init(jax.random.PRNGKey(0), jnp.asarray(feat))["params"])
    port_head(ttask, jp, "oscc", aux)

    batch_vec = torch.arange(B).repeat_interleave(n)
    aux_np = {t: rng.standard_normal((B, n, F)).astype(np.float32)
              for t in aux}
    with torch.no_grad():
        t_proj = ttask.forward_features(tfeat)
        t_logits = ttask.forward_logits(
            t_proj, batch_vec,
            aux_features={t: torch.tensor(v.reshape(-1, F))
                          for t, v in aux_np.items()})
    j_proj = jtask.apply({"params": jp}, jnp.asarray(feat),
                         method="forward_features")
    np.testing.assert_allclose(np.asarray(j_proj).reshape(-1, F),
                               t_proj.numpy(), rtol=1e-4, atol=1e-5)
    j_logits = jtask.apply({"params": jp}, j_proj, None,
                           {t: jnp.asarray(v) for t, v in aux_np.items()},
                           method="forward_logits")
    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=1e-4, atol=1e-5)

    # all three loss functions on identical logits
    y = np.array([0, 1, 1], np.int64)
    for loss_func in ("ce", "bce", "focal"):
        t_lf = ref.tasks.OSCCTask(input_size=H, features_size=F,
                                  loss_func=loss_func)
        j_lf = jheads.OSCCTask(name_="oscc", input_size=H, features_size=F,
                               loss_func=loss_func)
        with torch.no_grad():
            t_loss = t_lf.compute_loss(t_logits, torch.tensor(y)).numpy()
        jp_lf = dict(j_lf.init(jax.random.PRNGKey(0),
                               jnp.asarray(feat))["params"])
        j_loss = np.asarray(j_lf.apply(
            {"params": jp_lf}, jnp.asarray(t_logits.numpy()), jnp.asarray(y),
            method="compute_loss"))
        if t_loss.ndim == 2:  # bce/focal are per-class; reference means later
            t_loss = t_loss.mean(-1)
        np.testing.assert_allclose(j_loss, t_loss, rtol=1e-4, atol=1e-6,
                                   err_msg=loss_func)


def test_pnr_head_matches(ref):
    torch.manual_seed(13)
    aux = ("ar",)
    ttask = ref.tasks.PNRTask(input_size=H, features_size=F, aux_tasks=aux)
    ttask.eval()
    jtask = jheads.PNRTask(name_="pnr", input_size=H, features_size=F,
                           aux_tasks=aux)
    rng = np.random.default_rng(4)
    n = 16
    feat, tfeat = _torch_feat(rng, n)
    jp = dict(jtask.init(jax.random.PRNGKey(0), jnp.asarray(feat))["params"])
    port_head(ttask, jp, "pnr", aux)
    aux_np = {"ar": rng.standard_normal((B, n, F)).astype(np.float32)}
    with torch.no_grad():
        t_proj = ttask.forward_features(tfeat)
        t_logits = ttask.forward_logits(
            t_proj, aux_features={"ar": torch.tensor(
                aux_np["ar"].reshape(-1, F))})
    j_proj = jtask.apply({"params": jp}, jnp.asarray(feat),
                         method="forward_features")
    j_logits = jtask.apply({"params": jp}, j_proj, None,
                           {"ar": jnp.asarray(aux_np["ar"])},
                           method="forward_logits")
    np.testing.assert_allclose(np.asarray(j_logits).reshape(-1),
                               t_logits.numpy(), rtol=1e-4, atol=1e-5)
    y = np.zeros((B, n), np.int64)
    y[:, 5] = 1
    with torch.no_grad():
        t_loss = ttask.compute_loss(t_logits, torch.tensor(
            y.reshape(-1))).numpy()
    j_loss = np.asarray(jtask.apply({"params": jp}, j_logits, jnp.asarray(y),
                                    method="compute_loss"))
    np.testing.assert_allclose(j_loss.reshape(-1), t_loss, rtol=1e-4,
                               atol=1e-6)


def test_lta_transform_matches(ref):
    """The y>0 forecast-count quirk, executed in the real reference code."""
    spec = g.lta_spec()
    rng = np.random.default_rng(5)
    transform = ref.ltatc.LTATemporalConnectivity(r=spec.radius)
    for trial in range(6):
        y = np.zeros((22, 2), np.int64)
        y[:2] = -1
        y[2:, 0] = rng.integers(0, NV, 20)  # zeros included -> quirk active
        y[2:, 1] = rng.integers(0, NN, 20)
        data = ref.tgdata.Data(
            x=torch.zeros(22, 4), y=torch.tensor(y),
            pos=torch.arange(22, dtype=torch.float32))
        data = transform(data)
        dense_ref = np.zeros((22, 22), bool)
        src, dst = data.edge_index.numpy()
        dense_ref[dst, src] = True
        from egopack_tpu.train.system import lta_full_adjacency
        mine = np.asarray(lta_full_adjacency(
            jnp.asarray(spec.adjacency), jnp.asarray(y[None]),
            spec.radius))[0]
        np.testing.assert_array_equal(mine, dense_ref, err_msg=f"trial {trial}")


# ------------------------------------------------------------- full systems

def build_torch_heads(ref, aux_map=None):
    torch.manual_seed(21)
    aux_map = aux_map or {}
    return {
        "ar": ref.tasks.RecognitionTask(input_size=H, features_size=F,
                                        heads=(NV, NN),
                                        aux_tasks=aux_map.get("ar")),
        "lta": ref.tasks.LTATask(input_size=H, features_size=F,
                                 heads=(NV, NN), aux_tasks=aux_map.get("lta")),
        "oscc": ref.tasks.OSCCTask(input_size=H, features_size=F,
                                   aux_tasks=aux_map.get("oscc")),
        "pnr": ref.tasks.PNRTask(input_size=H, features_size=F,
                                 aux_tasks=aux_map.get("pnr")),
    }


def build_system(weights=None, aux_map=None):
    weights = weights or {}
    aux_map = aux_map or {}
    specs = {"ar": g.ar_spec(), "lta": g.lta_spec(), "oscc": g.oscc_spec(),
             "pnr": g.pnr_spec()}
    mk = {
        "ar": lambda aux: jheads.RecognitionTask(
            name_="ar", input_size=H, features_size=F, heads=(NV, NN),
            aux_tasks=aux),
        "lta": lambda aux: jheads.LTATask(
            name_="lta", input_size=H, features_size=F, heads=(NV, NN),
            aux_tasks=aux),
        "oscc": lambda aux: jheads.OSCCTask(
            name_="oscc", input_size=H, features_size=F, aux_tasks=aux),
        "pnr": lambda aux: jheads.PNRTask(
            name_="pnr", input_size=H, features_size=F, aux_tasks=aux),
    }
    tasks = {n: TaskSetup(n, mk[n](aux_map.get(n)), specs[n],
                          weights.get(n, 1.0)) for n in specs}
    return MultiTaskSystem(build_jax_backbone(), tasks)


def port_system(ref, tmodel, theads, system, aux_map=None) -> dict:
    aux_map = aux_map or {}
    params = system.init_params(jax.random.PRNGKey(0), D)
    params = jax.tree_util.tree_map(lambda a: a, dict(params))
    port_backbone(tmodel, params["temporal_graph"])
    for name, thead in theads.items():
        port_head(thead, params[CKPT_KEYS[name]], name,
                  aux_map.get(name) or ())
    return params


def lta_torch_edges(ref, spec, y: np.ndarray):
    """Per-sample dense adjacencies via the REAL reference LTA transform."""
    transform = ref.ltatc.LTATemporalConnectivity(r=spec.radius)
    adjs = []
    for i in range(y.shape[0]):
        data = ref.tgdata.Data(x=torch.zeros(spec.num_nodes, 1),
                               y=torch.tensor(y[i]),
                               pos=torch.tensor(spec.pos))
        data = transform(data)
        dense = np.zeros((spec.num_nodes, spec.num_nodes), bool)
        src, dst = data.edge_index.numpy()
        dense[dst, src] = True
        adjs.append(dense)
    return adjs


class _DuckDataset:
    has_joint_label = False
    num_labels = 2


def torch_phase1_total_loss(ref, tmodel, theads, weights, batches_np, specs):
    """The reference train() loss math (main_temporal.py:87-128), executing
    the real MetricSelectorWrapper. Returns (total torch scalar with graph
    attached, per-task float dict)."""
    ce = torch.nn.CrossEntropyLoss(reduction="none", ignore_index=-1)
    crit = {
        "ar": ref.wrapper.MetricSelectorWrapper(ce, dataset=_DuckDataset()),
        "lta": ref.wrapper.MetricSelectorWrapper(ce, dataset=_DuckDataset()),
        "oscc": torch.nn.CrossEntropyLoss(reduction="none", ignore_index=-1),
        "pnr": torch.nn.BCEWithLogitsLoss(reduction="none"),
    }
    losses, t_task_losses = [], {}
    for name in ("ar", "lta", "oscc", "pnr"):
        x, y = batches_np[name]
        spec = specs[name]
        edge_adjs = (lta_torch_edges(ref, spec, y) if name == "lta" else None)
        data = dense_to_torch(ref, x, y, spec, y_per_graph=(name == "oscc"),
                              edge_adjs=edge_adjs)
        feat = tmodel(data)
        tfeat = theads[name].forward_features(feat)
        if name == "oscc":
            logits = theads[name].forward_logits(tfeat, data.batch)
            loss = crit[name](logits, data.y)
        elif name == "pnr":
            logits = theads[name].forward_logits(tfeat)
            loss = crit[name](logits, data.y.float())
        else:
            logits = theads[name].forward_logits(tfeat)
            loss = crit[name](logits, data.y)
        t_task_losses[name] = float(loss.detach().mean())
        losses.append(weights[name] * loss.mean())
    return torch.stack(losses).sum(), t_task_losses


def test_phase1_mtl_loss_and_gradients_match(ref):
    """Full fused MTL step vs the reference train() math (executing the real
    MetricSelectorWrapper), including gradients."""
    tmodel = build_torch_backbone(ref)
    theads = build_torch_heads(ref)
    for m in theads.values():
        m.eval()
    weights = {"ar": 1.0, "lta": 0.5, "oscc": 1.0, "pnr": 2.0}
    system = build_system(weights)
    params = port_system(ref, tmodel, theads, system)

    rng = np.random.default_rng(6)
    batches_np = {n: make_batch(rng, system.tasks[n].spec, n)
                  for n in ("ar", "lta", "oscc", "pnr")}

    # ---- torch side: main_temporal.py:87-128 semantics
    specs = {n: system.tasks[n].spec for n in batches_np}
    total_t, t_task_losses = torch_phase1_total_loss(
        ref, tmodel, theads, weights, batches_np, specs)
    total_t.backward()

    # ---- jax side: the production fused loss fn
    loss_fn = system._make_phase1_loss_fn(("ar", "lta", "oscc", "pnr"))
    jbatches = {n: jbatch(*batches_np[n]) for n in batches_np}
    (total_j, logs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, jbatches, jax.random.PRNGKey(0))

    assert abs(float(total_j) - float(total_t)) < 2e-5
    for name in t_task_losses:
        assert abs(float(logs[f"{name}_loss"]) - t_task_losses[name]) < 2e-5, name

    # ---- gradient parity on representative leaves of every subtree
    checks = [
        (tmodel.temporal_pooling.proj[0].weight,
         grads["temporal_graph"]["pooling"]["fc0"]["kernel"], True),
        (tmodel.net.mods[0].lin_l.weight,
         grads["temporal_graph"]["sage0"]["lin_l"]["kernel"], True),
        (tmodel.net.mods[-1].weight,
         grads["temporal_graph"]["out_lin"]["kernel"], True),
        (theads["ar"].net[1].weight,
         grads["task/recognition"]["proj_fc0"]["kernel"], True),
        (theads["oscc"].classifier[1].weight,
         grads["task/oscc"]["cls"][_only_child(
             grads["task/oscc"]["cls"])]["kernel"], True),
        (theads["pnr"].net[4].weight,
         grads["task/pnr"]["proj_fc1"]["kernel"], True),
        (theads["lta"].classifiers[1][1].weight,
         grads["task/lta"]["cls1"][_only_child(
             grads["task/lta"]["cls1"])]["kernel"], True),
    ]
    for tparam, jgrad, transpose in checks:
        tg = tparam.grad.numpy()
        jg = np.asarray(jgrad)
        np.testing.assert_allclose(jg.T if transpose else jg, tg,
                                   rtol=2e-4, atol=1e-6)


@pytest.fixture(scope="module")
def proto_setup(ref):
    """Shared: backbone+heads both sides, prototype banks built BOTH ways."""
    tmodel = build_torch_backbone(ref)
    theads = build_torch_heads(ref)
    for m in theads.values():
        m.eval()
    system = build_system()
    params = port_system(ref, tmodel, theads, system)

    rng = np.random.default_rng(7)
    spec = system.tasks["ar"].spec
    ar_batches = [make_batch(rng, spec, "ar") for _ in range(3)]
    aux_tasks = ("ar", "lta", "pnr")  # the MTL triple for novel-task OSCC

    # reference build (real code)
    tdata = [dense_to_torch(ref, x, y, spec) for x, y in ar_batches]
    tbanks = ref.build.build_graphone(
        tmodel, theads["ar"], [theads[t] for t in aux_tasks], tdata,
        device="cpu")

    # my build (production path)
    step = make_prototype_step(system, aux_tasks, NV, NN)
    loader = [{"x": x, "y": y, "valid": np.ones(B, bool)}
              for x, y in ar_batches]
    jbanks = build_prototypes(step, params, loader, NV, NN,
                              n_tasks=len(aux_tasks))
    return tmodel, theads, system, params, tbanks, jbanks, aux_tasks


def test_prototype_banks_match(proto_setup):
    _, _, _, _, tbanks, jbanks, aux_tasks = proto_setup
    for t in aux_tasks:
        tvals = tbanks[t].numpy()
        p = tvals.shape[0]
        assert jbanks[t].num_valid == p
        np.testing.assert_allclose(np.asarray(jbanks[t].values)[:p], tvals,
                                   rtol=1e-4, atol=1e-5, err_msg=t)


def port_graphone(tgo, jgo, jparams: dict, task_labels) -> dict:
    for d in range(jgo.depth):
        for ti, task in enumerate(task_labels):
            stage = tgo.conv_stages[task][d]
            sage, ln, lin = stage.mods[0], stage.mods[1], stage.mods[3]
            row = 0 if jgo.share_params else ti
            jparams["w_l"] = jparams["w_l"].at[d, row].set(t2j(sage.lin_l.weight).T)
            jparams["w_r"] = jparams["w_r"].at[d, row].set(t2j(sage.lin_r.weight).T)
            jparams["ln_scale"] = jparams["ln_scale"].at[d, row].set(t2j(ln.weight))
            jparams["ln_bias"] = jparams["ln_bias"].at[d, row].set(t2j(ln.bias))
            jparams["w_proj"] = jparams["w_proj"].at[d, row].set(t2j(lin.weight).T)
            jparams["b_proj"] = jparams["b_proj"].at[d, row].set(t2j(lin.bias))
    return jparams


def _pad_banks(tbanks) -> Dict[str, PrototypeBank]:
    banks = {}
    for t, v in tbanks.items():
        vals = v.numpy()
        p = vals.shape[0]
        padded = np.zeros((128, vals.shape[1]), np.float32)
        padded[:p] = vals
        mask = np.zeros(128, bool)
        mask[:p] = True
        banks[t] = PrototypeBank(jnp.asarray(padded), jnp.asarray(mask))
    return banks


@pytest.mark.parametrize("residual,distance", [(True, "cosine"),
                                               (False, "cosine"),
                                               (True, "l2")])
def test_graphone_interact_matches(ref, proto_setup, residual, distance):
    _, _, _, _, tbanks, _, aux_tasks = proto_setup
    task_labels = tuple(sorted(aux_tasks))
    hidden = 40
    torch.manual_seed(31)
    tgo = ref.graphONE.GraphONE(
        {t: tbanks[t] for t in aux_tasks}, features_size=F,
        hidden_size=hidden, k=4, depth=2, residual=residual,
        distance_func=distance)
    tgo.eval()
    jgo = GraphONE(task_labels=task_labels, features_size=F,
                   hidden_size=hidden, k=4, depth=2, residual=residual,
                   distance_func=distance)
    rng = np.random.default_rng(8)
    feats_np = {t: rng.standard_normal((10, F)).astype(np.float32)
                for t in aux_tasks}
    banks = _pad_banks(tbanks)
    jparams = dict(jgo.init(jax.random.PRNGKey(0),
                            {t: jnp.asarray(v) for t, v in feats_np.items()},
                            banks, method="interact")["params"])
    port_graphone(tgo, jgo, jparams, task_labels)

    with torch.no_grad():
        tout, tclosest = tgo.interact(
            {t: torch.tensor(v) for t, v in feats_np.items()})
    jout, jclosest = jgo.apply(
        {"params": jparams}, {t: jnp.asarray(v) for t, v in feats_np.items()},
        banks, method="interact")
    for t in aux_tasks:
        np.testing.assert_allclose(np.asarray(jout[t]), tout[t].numpy(),
                                   rtol=2e-4, atol=1e-5, err_msg=t)
        np.testing.assert_array_equal(np.asarray(jclosest[t]),
                                      tclosest[t][0].numpy(), err_msg=t)


@pytest.mark.parametrize("backprop", [True, False])
def test_phase2_egopack_loss_and_gradients_match(ref, proto_setup, backprop):
    """Novel-task OSCC phase-2 step vs main_egopack.py:45-61 semantics,
    executed with the real reference modules, including detach topology."""
    tmodel, theads_plain, system_plain, _, tbanks, _, aux_tasks = proto_setup
    task_labels = tuple(sorted(aux_tasks))
    hidden = F  # reference default shape for interact -> head fusion

    torch.manual_seed(41)
    aux_map = {"oscc": task_labels}
    theads = build_torch_heads(ref, aux_map)
    for m in theads.values():
        m.eval()
    tgo = ref.graphONE.GraphONE({t: tbanks[t] for t in aux_tasks},
                                features_size=F, hidden_size=hidden,
                                k=4, depth=2, residual=True)
    tgo.eval()

    system = build_system(aux_map=aux_map)
    params = port_system(ref, tmodel, theads, system, aux_map)
    jgo = GraphONE(task_labels=task_labels, features_size=F,
                   hidden_size=hidden, k=4, depth=2, residual=True)
    banks = _pad_banks(tbanks)
    dummy_feats = {t: jnp.zeros((4, F)) for t in task_labels}
    gparams = dict(jgo.init(jax.random.PRNGKey(0), dummy_feats, banks,
                            method="interact")["params"])
    port_graphone(tgo, jgo, gparams, task_labels)
    params["graphone"] = gparams

    rng = np.random.default_rng(9)
    spec = system.tasks["oscc"].spec
    x, y = make_batch(rng, spec, "oscc")

    # ---- torch side (main_egopack.py:102-155 + train_step_task)
    tmodel.zero_grad(set_to_none=True)
    for m in theads.values():
        m.zero_grad(set_to_none=True)
    tgo.zero_grad(set_to_none=True)
    data = dense_to_torch(ref, x, y, spec, y_per_graph=True)
    with torch.set_grad_enabled(backprop):
        feat = tmodel(data)
    primary = theads["oscc"]
    others = [theads[t] for t in ("ar", "lta", "pnr")]
    feat_primary = primary.forward_features(feat)
    secondary, _ = tgo.interact(
        {t.name: t.forward_features(feat).detach() for t in others})
    logits = primary.forward_logits(features=feat_primary, batch=data.batch,
                                    aux_features=secondary)
    t_loss = primary.compute_loss(logits, data.y).mean()
    t_loss.backward()

    # ---- jax side (production loss fn)
    loss_fn = system.make_egopack_loss_fn(
        ("oscc",), jgo, backprop_temporal_graph=backprop,
        temporal_graph_train_mode=False, late_fusion=True)
    (j_loss, _), grads = jax.value_and_grad(loss_fn, has_aux=True)(
        params, banks, {"oscc": jbatch(x, y)}, jax.random.PRNGKey(0))

    assert abs(float(j_loss) - float(t_loss)) < 2e-5

    # gradient topology + values
    def tgrad(p):
        return (np.zeros(p.shape, np.float32) if p.grad is None
                else p.grad.numpy())

    # primary head gets gradients
    np.testing.assert_allclose(
        np.asarray(grads["task/oscc"]["proj_fc0"]["kernel"]).T,
        tgrad(primary.net[1].weight), rtol=2e-4, atol=1e-7)
    # graphone convs get gradients (through interacted features)
    sage0 = tgo.conv_stages[task_labels[0]][0].mods[0]
    np.testing.assert_allclose(
        np.asarray(grads["graphone"]["w_l"][0, 0]).T,
        tgrad(sage0.lin_l.weight), rtol=2e-4, atol=1e-7)
    # aux heads are DETACHED: zero grads both sides
    ar_jg = np.asarray(grads["task/recognition"]["proj_fc0"]["kernel"])
    assert np.all(ar_jg == 0)
    assert theads["ar"].net[1].weight.grad is None
    # backbone grads: present iff backprop_temporal_graph
    bb_jg = np.asarray(grads["temporal_graph"]["pooling"]["fc0"]["kernel"])
    bb_tg = tgrad(tmodel.temporal_pooling.proj[0].weight)
    if backprop:
        assert np.abs(bb_jg).max() > 0
        np.testing.assert_allclose(bb_jg.T, bb_tg, rtol=2e-4, atol=1e-7)
    else:
        assert np.all(bb_jg == 0) and np.all(bb_tg == 0)


@pytest.mark.parametrize("late_fusion", [True, False])
def test_eval_step_matches_reference_validate(ref, proto_setup, late_fusion):
    """The eval forward with graphone interaction — late fusion AND the
    early-fusion max-mix — against the reference validate() composition
    (/root/reference/validate.py:33-60) executed with the real modules.
    Checks logits, per-element loss, and the stacked post-features the
    meters consume."""
    tmodel, _, _, _, tbanks, _, aux_tasks = proto_setup
    task_labels = tuple(sorted(aux_tasks))

    torch.manual_seed(51)
    aux_map = {"oscc": task_labels}
    theads = build_torch_heads(ref, aux_map)
    for m in theads.values():
        m.eval()
    tgo = ref.graphONE.GraphONE({t: tbanks[t] for t in aux_tasks},
                                features_size=F, hidden_size=F,
                                k=4, depth=2, residual=True)
    tgo.eval()

    system = build_system(aux_map=aux_map)
    params = port_system(ref, tmodel, theads, system, aux_map)
    jgo = GraphONE(task_labels=task_labels, features_size=F,
                   hidden_size=F, k=4, depth=2, residual=True)
    banks = _pad_banks(tbanks)
    dummy = {t: jnp.zeros((4, F)) for t in task_labels}
    gparams = dict(jgo.init(jax.random.PRNGKey(0), dummy, banks,
                            method="interact")["params"])
    port_graphone(tgo, jgo, gparams, task_labels)
    params["graphone"] = gparams

    rng = np.random.default_rng(12)
    spec = system.tasks["oscc"].spec
    x, y = make_batch(rng, spec, "oscc")

    # ---- reference composition (validate.py:33-60), real modules
    data = dense_to_torch(ref, x, y, spec, y_per_graph=True)
    others = [theads[t] for t in ("ar", "lta", "pnr")]
    with torch.no_grad():
        feat = tmodel(data)
        feat_primary = theads["oscc"].forward_features(feat)
        feat_secondary = {t.name: t.forward_features(feat) for t in others}
        inter, _ = tgo.interact(feat_secondary)
        t_post = torch.stack([feat_primary, *inter.values()], dim=1)
        if late_fusion:
            t_logits = theads["oscc"].forward_logits(
                features=feat_primary, batch=data.batch, aux_features=inter)
        else:
            mixed = torch.stack([feat_primary, *inter.values()],
                                dim=1).max(1).values
            t_logits = theads["oscc"].forward_logits(mixed, data.batch)
        t_loss = theads["oscc"].compute_loss(t_logits, data.y)

    # ---- this framework's jitted eval step
    eval_step = system.make_eval_step("oscc", aux=("ar", "lta", "pnr"),
                                      graphone=jgo, late_fusion=late_fusion)
    j_logits, j_per_elem, j_post, _ = eval_step(params, jbatch(x, y), banks)

    np.testing.assert_allclose(np.asarray(j_logits), t_logits.numpy(),
                               rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(j_per_elem), t_loss.numpy(),
                               rtol=2e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(j_post).reshape(t_post.shape), t_post.numpy(),
        rtol=2e-4, atol=1e-5)


# ------------------------------------------------- optimizer trajectories

def test_phase1_training_trajectory_matches(ref):
    """Multi-step OPTIMIZER-IN-THE-LOOP parity: 3 epochs x 2 steps of the
    full MTL recipe — torch.optim.Adam(weight_decay>0, coupled L2) +
    CosineAnnealingLR stepped per epoch (/root/reference/main_temporal.py:
    265-279, coupled decay over ALL params since configure_optimizers just
    returns parameters()) against this framework's production
    ``make_train_step`` + ``optim.adam`` + ``build_lr_fn`` on identical batch
    streams. Asserts every per-step per-task loss and the final parameters.
    This extends the single-step gradient parity above into executed
    optimizer/schedule trajectory parity."""
    from egopack_tpu.train import optim as jo

    tmodel = build_torch_backbone(ref)
    theads = build_torch_heads(ref)
    for m in theads.values():
        m.eval()  # dropout is 0 everywhere; LayerNorm has no mode state
    weights = {"ar": 1.0, "lta": 0.5, "oscc": 1.0, "pnr": 2.0}
    active = ("ar", "lta", "oscc", "pnr")
    system = build_system(weights)
    params = port_system(ref, tmodel, theads, system)
    specs = {n: system.tasks[n].spec for n in active}

    n_epochs, steps_per_epoch = 3, 2
    base_lr, wd = 1e-3, 1e-2
    rng = np.random.default_rng(17)
    stream = [{n: make_batch(rng, specs[n], n) for n in active}
              for _ in range(n_epochs * steps_per_epoch)]

    topt = torch.optim.Adam(
        [p for m in (tmodel, *theads.values()) for p in m.parameters()],
        lr=base_lr, weight_decay=wd)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt, T_max=n_epochs)

    optimizer = jo.adam(lr=base_lr, weight_decay=wd)
    opt_state = optimizer.init(params)
    step = system.make_train_step(optimizer, active)
    lr_fn = jo.build_lr_fn(base_lr, jo.cosine_annealing(n_epochs))

    key = jax.random.PRNGKey(3)
    it = iter(stream)
    for epoch in range(n_epochs):
        lr = lr_fn(epoch)
        assert abs(topt.param_groups[0]["lr"] - lr) < 1e-12
        for _ in range(steps_per_epoch):
            batches_np = next(it)
            topt.zero_grad(set_to_none=True)
            total_t, t_task = torch_phase1_total_loss(
                ref, tmodel, theads, weights, batches_np, specs)
            total_t.backward()
            topt.step()

            jbatches = {n: jbatch(*batches_np[n]) for n in active}
            params, opt_state, logs = step(params, opt_state, jbatches,
                                           key, lr)
            for name in active:
                np.testing.assert_allclose(
                    float(logs[f"{name}_loss"]), t_task[name],
                    rtol=5e-4, atol=1e-5,
                    err_msg=f"epoch {epoch} {name}")
        tsched.step()

    # final parameters across every subtree (same leaves as the gradient
    # parity checks, now after 6 coupled-decay Adam steps + 2 LR changes)
    final_checks = [
        (tmodel.temporal_pooling.proj[0].weight,
         params["temporal_graph"]["pooling"]["fc0"]["kernel"]),
        (tmodel.net.mods[0].lin_l.weight,
         params["temporal_graph"]["sage0"]["lin_l"]["kernel"]),
        (tmodel.net.mods[-1].weight,
         params["temporal_graph"]["out_lin"]["kernel"]),
        (theads["ar"].net[1].weight,
         params["task/recognition"]["proj_fc0"]["kernel"]),
        (theads["oscc"].classifier[1].weight,
         params["task/oscc"]["cls"][_only_child(
             params["task/oscc"]["cls"])]["kernel"]),
        (theads["pnr"].net[4].weight,
         params["task/pnr"]["proj_fc1"]["kernel"]),
        (theads["lta"].classifiers[1][1].weight,
         params["task/lta"]["cls1"][_only_child(
             params["task/lta"]["cls1"])]["kernel"]),
    ]
    for tparam, jparam in final_checks:
        np.testing.assert_allclose(np.asarray(jparam).T,
                                   tparam.detach().numpy(),
                                   rtol=1e-3, atol=5e-5)


def test_phase2_training_trajectory_matches(ref):
    """Phase-2 OPTIMIZER-IN-THE-LOOP parity: 2 epochs x 2 steps of novel-task
    OSCC training with cross-task interaction — torch Adam over model + all
    heads + graphone (/root/reference/main_egopack.py:317-325; detached aux
    projections have grad=None so torch never touches or DECAYS them) vs this
    framework's production ``make_egopack_train_step`` with the driver's
    structural trainable mask (driver.py:487-496). Executes the homegrown
    mask/coupled-decay interaction the single-step test can't see."""
    from egopack_tpu.train import optim as jo
    from egopack_tpu.train.driver import trainable_mask_fn

    # fresh modules (module-scoped fixtures must not be mutated by optimizer
    # steps) — banks built with the plain heads, as build_graphone does
    tmodel = build_torch_backbone(ref)
    theads_plain = build_torch_heads(ref)
    for m in theads_plain.values():
        m.eval()
    aux_tasks = ("ar", "lta", "pnr")
    rng_np = np.random.default_rng(7)
    spec_ar = g.ar_spec()
    ar_batches = [make_batch(rng_np, spec_ar, "ar") for _ in range(3)]
    tdata = [dense_to_torch(ref, x, y, spec_ar) for x, y in ar_batches]
    tbanks = ref.build.build_graphone(
        tmodel, theads_plain["ar"], [theads_plain[t] for t in aux_tasks],
        tdata, device="cpu")

    task_labels = tuple(sorted(aux_tasks))
    aux_map = {"oscc": task_labels}
    theads = build_torch_heads(ref, aux_map)
    for m in theads.values():
        m.eval()
    torch.manual_seed(41)
    tgo = ref.graphONE.GraphONE({t: tbanks[t] for t in aux_tasks},
                                features_size=F, hidden_size=F,
                                k=4, depth=2, residual=True)
    tgo.eval()

    system = build_system(aux_map=aux_map)
    params = port_system(ref, tmodel, theads, system, aux_map)
    jgo = GraphONE(task_labels=task_labels, features_size=F,
                   hidden_size=F, k=4, depth=2, residual=True)
    banks = _pad_banks(tbanks)
    dummy = {t: jnp.zeros((4, F)) for t in task_labels}
    gparams = dict(jgo.init(jax.random.PRNGKey(0), dummy, banks,
                            method="interact")["params"])
    port_graphone(tgo, jgo, gparams, task_labels)
    params["graphone"] = gparams

    n_epochs, steps_per_epoch = 2, 2
    base_lr, wd = 1e-3, 1e-2
    rng_b = np.random.default_rng(23)
    spec = system.tasks["oscc"].spec
    stream = [make_batch(rng_b, spec, "oscc")
              for _ in range(n_epochs * steps_per_epoch)]

    # torch: the reference optimizer param list (frozen bank embeddings and
    # detached aux projections ride along with grad=None)
    topt_all = torch.optim.Adam(
        [p for m in (tmodel, *theads.values(), tgo) for p in m.parameters()],
        lr=base_lr, weight_decay=wd)
    tsched = torch.optim.lr_scheduler.CosineAnnealingLR(topt_all,
                                                        T_max=n_epochs)

    # jax: the production masked optimizer (driver.py:490-494, backprop on)
    optimizer = jo.adam(lr=base_lr, weight_decay=wd,
                        trainable_mask=trainable_mask_fn(
                            ["task/oscc", "graphone", "temporal_graph"]))
    opt_state = optimizer.init(params)
    step = system.make_egopack_train_step(
        optimizer, ("oscc",), jgo, backprop_temporal_graph=True,
        temporal_graph_train_mode=False, late_fusion=True)
    lr_fn = jo.build_lr_fn(base_lr, jo.cosine_annealing(n_epochs))

    ar_proj0 = np.asarray(params["task/recognition"]["proj_fc0"]["kernel"]).copy()
    key = jax.random.PRNGKey(5)
    it = iter(stream)
    primary = theads["oscc"]
    others = [theads[t] for t in ("ar", "lta", "pnr")]
    for epoch in range(n_epochs):
        lr = lr_fn(epoch)
        assert abs(topt_all.param_groups[0]["lr"] - lr) < 1e-12
        for _ in range(steps_per_epoch):
            x, y = next(it)
            topt_all.zero_grad(set_to_none=True)
            data = dense_to_torch(ref, x, y, spec, y_per_graph=True)
            feat = tmodel(data)
            feat_primary = primary.forward_features(feat)
            secondary, _ = tgo.interact(
                {t.name: t.forward_features(feat).detach() for t in others})
            logits = primary.forward_logits(features=feat_primary,
                                            batch=data.batch,
                                            aux_features=secondary)
            t_loss = primary.compute_loss(logits, data.y).mean()
            t_loss.backward()
            topt_all.step()

            params, opt_state, logs = step(params, opt_state, banks,
                                           {"oscc": jbatch(x, y)}, key, lr)
            np.testing.assert_allclose(float(logs["oscc_loss"]),
                                       float(t_loss.detach()),
                                       rtol=5e-4, atol=1e-5,
                                       err_msg=f"epoch {epoch}")
        tsched.step()

    # trained subtrees agree after 4 masked-decay Adam steps
    np.testing.assert_allclose(
        np.asarray(params["task/oscc"]["proj_fc0"]["kernel"]).T,
        primary.net[1].weight.detach().numpy(), rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["graphone"]["w_l"][0, 0]).T,
        tgo.conv_stages[task_labels[0]][0].mods[0].lin_l.weight.detach().numpy(),
        rtol=1e-3, atol=5e-5)
    np.testing.assert_allclose(
        np.asarray(params["temporal_graph"]["pooling"]["fc0"]["kernel"]).T,
        tmodel.temporal_pooling.proj[0].weight.detach().numpy(),
        rtol=1e-3, atol=5e-5)
    # detached aux projections: untouched on BOTH sides (torch grad=None ==
    # structural mask; coupled decay must NOT have moved them)
    np.testing.assert_array_equal(
        np.asarray(params["task/recognition"]["proj_fc0"]["kernel"]), ar_proj0)
    np.testing.assert_array_equal(
        theads["ar"].net[1].weight.detach().numpy().T, ar_proj0)
