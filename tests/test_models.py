"""Model layer: numeric parity of layers vs hand-computed reference math,
shape contracts of backbone + heads, GraphONE interaction semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from egopack_tpu.data.graphs import ar_spec, oscc_spec
from egopack_tpu.models import (DenseSAGEConv, GraphLayerNorm, LTATask,
                                OSCCTask, PNRTask, RecognitionTask,
                                TemporalGraph, TRNPooling, positional_encoding)
from egopack_tpu.models.graphone import (GraphONE, PrototypeBank,
                                         finalize_prototypes)
from egopack_tpu.ops.knn import cosine_dissimilarity, prototype_topk
from egopack_tpu.ops.losses import (bce_with_logits, cross_entropy,
                                    masked_mean, sigmoid_focal_loss)


def test_positional_encoding_matches_pyg_formula():
    # PyG: freqs = logspace(0, 1, C/2, base=1e-4); out = [sin, cos] concat
    pos = np.array([-4.0, 0.0, 3.0])
    C = 8
    got = np.asarray(positional_encoding(jnp.asarray(pos), C))
    freqs = 1e-4 ** np.linspace(0, 1, C // 2)
    ang = pos[:, None] * freqs[None]
    expect = np.concatenate([np.sin(ang), np.cos(ang)], -1)
    np.testing.assert_allclose(got, expect, atol=1e-6)


def test_dense_sage_mean_parity():
    """DenseSAGEConv(project=True, mean) vs hand-computed PyG SAGEConv math."""
    rng = np.random.default_rng(0)
    B, N, H = 2, 4, 8
    x = rng.normal(size=(B, N, H)).astype(np.float32)
    adj = np.asarray(oscc_spec().adjacency)  # 4-node chain

    conv = DenseSAGEConv(H, aggr="mean", project=True)
    params = conv.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(adj))
    out = np.asarray(conv.apply(params, jnp.asarray(x), jnp.asarray(adj)))

    p = params["params"]
    Wp, bp = np.asarray(p["lin_project"]["kernel"]), np.asarray(p["lin_project"]["bias"])
    Wl, bl = np.asarray(p["lin_l"]["kernel"]), np.asarray(p["lin_l"]["bias"])
    Wr = np.asarray(p["lin_r"]["kernel"])

    msg = np.maximum(x @ Wp + bp, 0)
    expect = np.zeros_like(x)
    for b in range(B):
        for t in range(N):
            nbrs = np.nonzero(adj[t])[0]
            agg = msg[b, nbrs].mean(0) if len(nbrs) else np.zeros(H)
            expect[b, t] = agg @ Wl + bl + x[b, t] @ Wr
    np.testing.assert_allclose(out, expect, atol=1e-5)


def test_dense_sage_max_no_neighbors():
    # a node with zero in-neighbors aggregates to 0 (PyG scatter semantics)
    x = jnp.ones((1, 2, 4))
    adj = jnp.zeros((2, 2), bool)
    conv = DenseSAGEConv(4, aggr="max")
    params = conv.init(jax.random.PRNGKey(0), x, adj)
    out = conv.apply(params, x, adj)
    p = params["params"]
    expect = jnp.zeros((4,)) @ p["lin_l"]["kernel"] + p["lin_l"]["bias"] \
        + x[0, 0] @ p["lin_r"]["kernel"]
    np.testing.assert_allclose(np.asarray(out[0, 0]), np.asarray(expect), atol=1e-6)


def test_graph_layer_norm_global_stats():
    """mode='graph' without batch: normalize over the ENTIRE tensor."""
    rng = np.random.default_rng(1)
    x = rng.normal(2.0, 3.0, size=(2, 3, 4)).astype(np.float32)
    ln = GraphLayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    out = np.asarray(ln.apply(params, jnp.asarray(x)))
    mean, std = x.mean(), x.std()  # global, biased
    np.testing.assert_allclose(out, (x - mean) / (std + 1e-5), atol=1e-5)
    # masked: stats over valid nodes only
    mask = np.array([[True, True, True], [True, False, False]])
    out_m = np.asarray(ln.apply(params, jnp.asarray(x), jnp.asarray(mask)))
    sel = x[mask]
    np.testing.assert_allclose(out_m[0], (x[0] - sel.mean()) / (sel.std() + 1e-5),
                               atol=1e-5)


def test_trn_pooling_shapes():
    tp = TRNPooling(input_size=16, output_size=32, num_segments=3,
                    hidden_size=24, dropout=0.5)
    x = jnp.ones((2, 9, 3, 16))
    params = tp.init(jax.random.PRNGKey(0), x)
    out = tp.apply(params, x)
    assert out.shape == (2, 9, 32)
    # train-mode dropout needs an rng and changes values
    out_t = tp.apply(params, x, train=True, rngs={"dropout": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(out), np.asarray(out_t))


def test_backbone_forward_and_residual():
    spec = ar_spec(9, k=1.0)
    model = TemporalGraph(input_size=16, hidden_size=32, depth=3,
                          temporal_pooling=None, num_segments=3)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 3, 16)),
                    dtype=jnp.float32)
    adj = jnp.asarray(spec.adjacency)
    pos = jnp.asarray(spec.pos)
    params = model.init(jax.random.PRNGKey(0), x, adj, pos)
    out = model.apply(params, x, adj, pos)
    assert out.shape == (2, 9, 32)
    # depth=0 → pure pooling output (reference: no net attribute)
    m0 = TemporalGraph(input_size=16, hidden_size=32, depth=0,
                       temporal_pooling=None, num_segments=3)
    p0 = m0.init(jax.random.PRNGKey(0), x, adj, pos)
    assert m0.apply(p0, x, adj, pos).shape == (2, 9, 32)


# --- losses
def test_cross_entropy_ignore_and_smoothing():
    logits = jnp.asarray([[2.0, 1.0, 0.1], [0.3, 0.2, 0.1]])
    labels = jnp.asarray([0, -1])
    out = np.asarray(cross_entropy(logits, labels))
    lp = jax.nn.log_softmax(logits[0])
    np.testing.assert_allclose(out[0], -lp[0], atol=1e-6)
    assert out[1] == 0.0
    # smoothing: (1-eps)*nll + eps*mean(-logp)
    sm = np.asarray(cross_entropy(logits, labels, label_smoothing=0.1))
    np.testing.assert_allclose(sm[0], 0.9 * (-lp[0]) + 0.1 * (-lp).mean(),
                               rtol=1e-5)


def test_bce_and_focal_match_definitions():
    logits = jnp.asarray([1.5, -0.3])
    targets = jnp.asarray([1.0, 0.0])
    p = jax.nn.sigmoid(logits)
    expect_bce = -(targets * jnp.log(p) + (1 - targets) * jnp.log(1 - p))
    np.testing.assert_allclose(np.asarray(bce_with_logits(logits, targets)),
                               np.asarray(expect_bce), atol=1e-6)
    pt = p * targets + (1 - p) * (1 - targets)
    at = 0.5 * targets + 0.5 * (1 - targets)
    expect_focal = at * expect_bce * (1 - pt) ** 2
    np.testing.assert_allclose(np.asarray(sigmoid_focal_loss(logits, targets)),
                               np.asarray(expect_focal), atol=1e-6)


def test_masked_mean_includes_ignored_nodes():
    # denominator counts ALL valid nodes (reference .mean() over zeros)
    vals = jnp.asarray([1.0, 0.0, 3.0, 5.0])
    mask = jnp.asarray([True, True, True, False])
    np.testing.assert_allclose(float(masked_mean(vals, mask)), 4.0 / 3.0)


# --- heads
def test_recognition_head_fusion_sum_and_mean():
    head = RecognitionTask(name_="ar", input_size=8, features_size=8,
                           heads=(5, 4), aux_tasks=("oscc", "lta"))
    x = jnp.ones((2, 3, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    feats = head.apply(params, x, method="forward_features")
    logits = head.apply(params, feats, method="forward_logits")
    assert logits[0].shape == (2, 3, 5) and logits[1].shape == (2, 3, 4)
    aux = {"oscc": feats, "lta": feats}
    fused = head.apply(params, feats, None, aux, method="forward_logits")
    prim = logits
    aux_l = [head.apply(params, feats, t, method="forward_aux_logits")
             for t in aux]
    expect0 = prim[0] + aux_l[0][0] + aux_l[1][0]
    np.testing.assert_allclose(np.asarray(fused[0]), np.asarray(expect0),
                               atol=1e-5)
    loss = head.compute_loss(logits, jnp.zeros((2, 3, 2), jnp.int32))
    assert loss.shape == (2, 3)


def test_oscc_head_pool_and_loss():
    head = OSCCTask(name_="oscc", input_size=8, features_size=8)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 8)),
                    dtype=jnp.float32)
    params = head.init(jax.random.PRNGKey(0), x)
    feats = head.apply(params, x, method="forward_features")
    logits = head.apply(params, feats, method="forward_logits")
    assert logits.shape == (2, 2)
    loss = head.compute_loss(logits, jnp.asarray([0, 1]))
    assert loss.shape == (2,)


def test_pnr_head_squeeze():
    head = PNRTask(name_="pnr", input_size=8, features_size=8)
    x = jnp.ones((2, 16, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    feats = head.apply(params, x, method="forward_features")
    logits = head.apply(params, feats, method="forward_logits")
    assert logits.shape == (2, 16)
    assert head.compute_loss(logits, jnp.zeros((2, 16))).shape == (2, 16)


def test_lta_generate():
    head = LTATask(name_="lta", input_size=8, features_size=8, heads=(6, 5))
    x = jnp.ones((2, 22, 8))
    params = head.init(jax.random.PRNGKey(0), x)
    feats = head.apply(params, x, method="forward_features")
    logits = head.apply(params, feats, method="forward_logits")
    preds, _ = head.generate_from_logits(logits, jax.random.PRNGKey(1), K=5)
    assert preds[0].shape == (2, 22, 5)
    assert (np.asarray(preds[0]) < 6).all() and (np.asarray(preds[1]) < 5).all()


# --- graphone
def test_prototype_topk_masks_padding():
    f = jnp.asarray(np.eye(4, 8, dtype=np.float32))
    bank = jnp.asarray(np.random.default_rng(0).normal(size=(16, 8)),
                       dtype=jnp.float32)
    mask = jnp.asarray([True] * 3 + [False] * 13)
    idx, dist = prototype_topk(f, bank, mask, k=2)
    assert (np.asarray(idx) < 3).all()
    assert np.isfinite(np.asarray(dist)).all()
    # matches brute-force cosine ranking over valid rows
    d = np.asarray(cosine_dissimilarity(f, bank))[:, :3]
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], d.argmin(1))


def test_finalize_prototypes_padding_and_scaling():
    sums = {"ar": np.arange(12, dtype=np.float64).reshape(6, 2)}
    counts = np.array([2, 0, 1, 0, 3, 0])
    banks = finalize_prototypes(sums, counts, pad_multiple=4)
    b = banks["ar"]
    assert b.values.shape[0] == 4 and b.num_valid == 3
    np.testing.assert_allclose(np.asarray(b.values[0]), [0.0, 0.5])
    np.testing.assert_allclose(np.asarray(b.values[2]), [8 / 3, 9 / 3])


def test_graphone_interact_shapes_and_residual():
    tasks = ("ar", "oscc")
    g = GraphONE(task_labels=tasks, features_size=8, hidden_size=8, k=2,
                 depth=2, residual=True)
    feats = {t: jnp.asarray(np.random.default_rng(3).normal(size=(6, 8)),
                            dtype=jnp.float32) for t in tasks}
    banks = {t: PrototypeBank(
        jnp.asarray(np.random.default_rng(4).normal(size=(16, 8)),
                    dtype=jnp.float32),
        jnp.asarray([True] * 10 + [False] * 6)) for t in tasks}
    params = g.init(jax.random.PRNGKey(0), feats, banks, method="interact")
    out, closest = g.apply(params, feats, banks, method="interact")
    assert out["ar"].shape == (6, 8)
    assert closest["ar"].shape == (6,)
    assert (np.asarray(closest["ar"]) < 10).all()


def test_graphone_identity_rows_skip_bitwise_matches_gather(monkeypatch):
    """The static identity-rows skip (round-4 ledger fix) is bitwise equal to
    the forced ``w[d][rows]`` gather, and a task SUBSET (non-identity rows)
    still routes through the gather and agrees with itself."""
    tasks = ("ar", "lta", "oscc")
    g = GraphONE(task_labels=tasks, features_size=8, hidden_size=8, k=2,
                 depth=2, residual=True)
    rng = np.random.default_rng(11)
    feats = {t: jnp.asarray(rng.normal(size=(5, 8)), dtype=jnp.float32)
             for t in tasks}
    banks = {t: PrototypeBank(
        jnp.asarray(rng.normal(size=(16, 8)), dtype=jnp.float32),
        jnp.asarray([True] * 12 + [False] * 4)) for t in tasks}
    params = g.init(jax.random.PRNGKey(2), feats, banks, method="interact")

    monkeypatch.delenv("EGOPACK_FORCE_ROWS_GATHER", raising=False)
    out_skip, close_skip = g.apply(params, feats, banks, method="interact")
    monkeypatch.setenv("EGOPACK_FORCE_ROWS_GATHER", "1")
    out_gather, close_gather = g.apply(params, feats, banks, method="interact")
    for t in tasks:
        np.testing.assert_array_equal(np.asarray(out_skip[t]),
                                      np.asarray(out_gather[t]))
        np.testing.assert_array_equal(np.asarray(close_skip[t]),
                                      np.asarray(close_gather[t]))

    # subset of tasks → rows != arange(T): gather path regardless of the env
    sub_f = {"lta": feats["lta"]}
    sub_b = {"lta": banks["lta"]}
    out_sub_forced, _ = g.apply(params, sub_f, sub_b, method="interact")
    monkeypatch.delenv("EGOPACK_FORCE_ROWS_GATHER", raising=False)
    out_sub, _ = g.apply(params, sub_f, sub_b, method="interact")
    np.testing.assert_array_equal(np.asarray(out_sub["lta"]),
                                  np.asarray(out_sub_forced["lta"]))
    # and it uses the lta row of the stage weights, not the ar row:
    # same features fed under the FIRST task label must differ
    out_as_ar, _ = g.apply(params, {"ar": feats["lta"]},
                           {"ar": banks["lta"]}, method="interact")
    assert not np.array_equal(np.asarray(out_sub["lta"]),
                              np.asarray(out_as_ar["ar"]))


def test_graphone_identity_rows_skip_gradients_match_gather():
    """Grad-path equality for the identity-rows skip (advisor r4): the
    gather arm's grad-scatter over ``w[d][rows]`` must produce bitwise the
    same parameter gradients as the direct ``w[d]`` arm. Uses the
    ``force_rows_gather`` module attribute (part of the traced config, not a
    trace-time env read)."""
    tasks = ("ar", "lta", "oscc")
    rng = np.random.default_rng(23)
    feats = {t: jnp.asarray(rng.normal(size=(5, 8)), dtype=jnp.float32)
             for t in tasks}
    banks = {t: PrototypeBank(
        jnp.asarray(rng.normal(size=(16, 8)), dtype=jnp.float32),
        jnp.asarray([True] * 12 + [False] * 4)) for t in tasks}
    g_skip = GraphONE(task_labels=tasks, features_size=8, hidden_size=8, k=2,
                      depth=2, residual=True, force_rows_gather=False)
    g_gather = g_skip.clone(force_rows_gather=True)
    params = g_skip.init(jax.random.PRNGKey(2), feats, banks,
                         method="interact")

    def make_scalar(module):
        def scalar(p, f):
            out, _ = module.apply(p, f, banks, method="interact")
            return sum((v * (i + 1)).sum()
                       for i, v in enumerate(out.values()))
        return scalar

    g_p_skip, g_f_skip = jax.grad(make_scalar(g_skip), argnums=(0, 1))(
        params, feats)
    g_p_gat, g_f_gat = jax.grad(make_scalar(g_gather), argnums=(0, 1))(
        params, feats)
    for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g_p_skip),
            jax.tree_util.tree_leaves_with_path(g_p_gat)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=str(path))
    for t in tasks:
        np.testing.assert_array_equal(np.asarray(g_f_skip[t]),
                                      np.asarray(g_f_gat[t]))


def test_graphone_banks_get_no_gradient():
    g = GraphONE(task_labels=("ar",), features_size=4, hidden_size=4, k=1,
                 depth=1, freeze=True)
    feats = {"ar": jnp.ones((2, 4))}

    def loss_fn(bank_vals):
        banks = {"ar": PrototypeBank(bank_vals, jnp.asarray([True, True]))}
        params = g.init(jax.random.PRNGKey(0), feats, banks, method="interact")
        out, _ = g.apply(params, feats, banks, method="interact")
        return out["ar"].sum()

    grad = jax.grad(loss_fn)(jnp.ones((2, 4)))
    np.testing.assert_allclose(np.asarray(grad), 0.0)


def test_prototype_topk_l2():
    """l2 distance path (reference cdist/4096, graphONE.py:127,148-149)."""
    rng = np.random.default_rng(5)
    f = jnp.asarray(rng.normal(size=(6, 8)), dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(size=(12, 8)), dtype=jnp.float32)
    mask = jnp.asarray([True] * 10 + [False] * 2)
    idx, dist = prototype_topk(f, bank, mask, k=3, distance="l2")
    # brute force
    d = np.linalg.norm(np.asarray(f)[:, None] - np.asarray(bank)[None, :10],
                       axis=-1) / 4096.0
    np.testing.assert_array_equal(np.asarray(idx)[:, 0], d.argmin(1))
    np.testing.assert_allclose(np.asarray(dist)[:, 0], d.min(1), rtol=1e-4)


def test_graphone_l2_and_shared_params():
    g = GraphONE(task_labels=("ar", "lta"), features_size=8, hidden_size=8,
                 k=2, depth=2, distance_func="l2", share_params=True)
    feats = {t: jnp.asarray(np.random.default_rng(6).normal(size=(4, 8)),
                            dtype=jnp.float32) for t in ("ar", "lta")}
    banks = {t: PrototypeBank(
        jnp.asarray(np.random.default_rng(7).normal(size=(8, 8)),
                    dtype=jnp.float32),
        jnp.asarray([True] * 8)) for t in ("ar", "lta")}
    params = g.init(jax.random.PRNGKey(0), feats, banks, method="interact")
    # shared params: stage weights have task axis of size 1
    assert params["params"]["w_l"].shape[1] == 1
    out, _ = g.apply(params, feats, banks, method="interact")
    assert out["ar"].shape == (4, 8)
    # identical inputs + shared weights + identical banks → identical outputs
    feats_same = {t: feats["ar"] for t in ("ar", "lta")}
    banks_same = {t: banks["ar"] for t in ("ar", "lta")}
    out2, _ = g.apply(params, feats_same, banks_same, method="interact")
    np.testing.assert_allclose(np.asarray(out2["ar"]), np.asarray(out2["lta"]),
                               atol=1e-6)


def test_compact_batch_expansion_bitwise_equals_full():
    """COMPACT host layouts (LTA input-clips-only, PNR un-repeated frames)
    expand on device to exactly the tensors the host used to ship
    (MultiTaskSystem.expand_x); full layouts pass through untouched."""
    from egopack_tpu.data.graphs import lta_spec, pnr_spec
    from egopack_tpu.models.backbone import TemporalGraph
    from egopack_tpu.models.heads import LTATask, PNRTask
    from egopack_tpu.train.system import MultiTaskSystem, TaskSetup

    backbone = TemporalGraph(
        input_size=8, hidden_size=16, depth=1,
        temporal_pooling={"_target_": "egopack_tpu.models.pooling.TRNPooling",
                          "hidden_size": 16, "dropout": 0.0},
        num_segments=3)
    tasks = {
        "lta": TaskSetup("lta", LTATask(name_="lta", input_size=16,
                                        features_size=16, heads=(4, 5)),
                         lta_spec(), append_node="avg"),
        "pnr": TaskSetup("pnr", PNRTask(name_="pnr", input_size=16,
                                        features_size=16), pnr_spec()),
    }
    system = MultiTaskSystem(backbone, tasks)
    rng = np.random.default_rng(0)

    # LTA: compact (B, 2, S, D) == host-filled full (B, 22, S, D)
    inputs = rng.standard_normal((3, 2, 3, 8)).astype(np.float32)
    full = np.concatenate(
        [inputs, np.broadcast_to(inputs.mean(1, keepdims=True),
                                 (3, 20, 3, 8))], axis=1)
    out = np.asarray(system.expand_x("lta", jnp.asarray(inputs)))
    np.testing.assert_array_equal(out, full)
    passthrough = np.asarray(system.expand_x("lta", jnp.asarray(full)))
    np.testing.assert_array_equal(passthrough, full)

    # PNR: compact (B, N, D) == host-repeated (B, N, 3, D)
    frames = rng.standard_normal((3, 16, 8)).astype(np.float32)
    full_pnr = np.repeat(frames[:, :, None, :], 3, axis=2)
    out = np.asarray(system.expand_x("pnr", jnp.asarray(frames)))
    np.testing.assert_array_equal(out, full_pnr)

    # zero mode
    tasks["lta"] = TaskSetup("lta", tasks["lta"].head, lta_spec(),
                             append_node="zero")
    sz = MultiTaskSystem(backbone, tasks)
    out = np.asarray(sz.expand_x("lta", jnp.asarray(inputs)))
    assert (out[:, 2:] == 0).all() and np.array_equal(out[:, :2], inputs)

    # random mode must refuse compact input
    tasks["lta"] = TaskSetup("lta", tasks["lta"].head, lta_spec(),
                             append_node="random")
    sr = MultiTaskSystem(backbone, tasks)
    with pytest.raises(ValueError):
        sr.expand_x("lta", jnp.asarray(inputs))
