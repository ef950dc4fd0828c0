"""Validation correctness: metrics invariant to batch partitioning/padding,
and the graphone-interaction eval path."""

import jax
import numpy as np
import pytest

import __graft_entry__ as ge
from egopack_tpu.data import Ego4dOSCCDataset, Ego4dRecognitionDataset, build_dataloader
from egopack_tpu.eval.meters import build_meter_for_dataset
from egopack_tpu.eval.validate import validate
from egopack_tpu.models.graphone import GraphONE, PrototypeBank


@pytest.fixture(scope="module")
def small_system():
    feat_dim, hidden = 32, 16
    system = ge._build_system(hidden, 16, feat_dim)
    params = system.init_params(jax.random.PRNGKey(0), feat_dim)
    return system, params, feat_dim


def test_padding_does_not_change_valid_outputs(ego4d_root, small_system):
    """A batch of 4 valid samples padded to 7 must produce the SAME logits on
    the valid rows as the unpadded batch of 4 — the masked graph-LayerNorm
    must exclude padded nodes from its statistics.

    (Note: metrics are NOT invariant to batch *partitioning* — the reference's
    graph-mode LayerNorm couples samples within a batch by design; only
    padding must be inert.)"""
    import jax.numpy as jnp
    from egopack_tpu.data.loader import collate, device_batch

    system, params, _ = small_system
    for task, ds_cls, kw in [
        ("ar", Ego4dRecognitionDataset, dict(num_segments=3)),
        ("oscc", Ego4dOSCCDataset, dict(num_segments=3)),
    ]:
        ds = ds_cls("val", root=ego4d_root, **kw)
        samples = [ds.get(i) for i in range(4)]
        step = system.make_eval_step(task)
        out4 = step(params, device_batch(collate(samples, pad_to=4)), {})[0]
        out7 = step(params, device_batch(collate(samples, pad_to=7)), {})[0]
        if task == "ar":
            for a, b in zip(out4, out7):
                np.testing.assert_allclose(np.asarray(a),
                                           np.asarray(b)[:4], atol=1e-5)
        else:
            np.testing.assert_allclose(np.asarray(out4),
                                       np.asarray(out7)[:4], atol=1e-5)


def test_eval_with_graphone_interaction(ego4d_root, small_system):
    """AR eval with late-fusion cross-task interaction runs and differs from
    the plain eval (aux logits contribute)."""
    system, params, _ = small_system
    hidden = 16
    aux = ("oscc", "lta", "pnr")
    # give the AR head aux classifiers by rebuilding with aux_tasks
    from egopack_tpu.models.heads import RecognitionTask
    from egopack_tpu.train.system import CKPT_KEYS, TaskSetup
    import jax.numpy as jnp

    head = RecognitionTask(name_="ar", input_size=hidden, features_size=hidden,
                           heads=(ge.N_VERBS, ge.N_NOUNS), aux_tasks=aux)
    system.tasks["ar"] = TaskSetup("ar", head, system.tasks["ar"].spec, 1.0)
    params[CKPT_KEYS["ar"]] = head.init(
        jax.random.PRNGKey(3), jnp.zeros((1, 9, hidden)))["params"]

    g = GraphONE(task_labels=aux, features_size=hidden, hidden_size=hidden,
                 k=2, depth=1, residual=True)
    rngnp = np.random.default_rng(0)
    banks = {t: PrototypeBank(
        jnp.asarray(rngnp.normal(size=(8, hidden)), dtype=jnp.float32),
        jnp.asarray([True] * 6 + [False] * 2)) for t in aux}
    feats0 = {t: jnp.zeros((2, hidden)) for t in aux}
    params["graphone"] = g.init(jax.random.PRNGKey(4), feats0, banks,
                                method="interact")["params"]

    ds = Ego4dRecognitionDataset("val", num_segments=3, root=ego4d_root)
    loader = build_dataloader(ds, 10, False, 0, False)
    plain = system.make_eval_step("ar")
    fused = system.make_eval_step("ar", aux=aux, graphone=g, late_fusion=True)

    m1 = build_meter_for_dataset(ds)
    validate(plain, params, banks, loader, m1, "ar")
    m2 = build_meter_for_dataset(ds)
    validate(fused, params, banks, loader, m2, "ar")
    # both produce sane metrics; logits differ because aux classifiers fire
    l1 = np.concatenate(m1._verb_logits)
    l2 = np.concatenate(m2._verb_logits)
    assert l1.shape == l2.shape
    assert not np.allclose(l1, l2)
