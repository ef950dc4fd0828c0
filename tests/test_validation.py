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


def test_metrics_invariant_to_batch_padding(ego4d_root, small_system):
    """24 OSCC val samples; batch 5 → last batch padded. Accuracy must equal
    the single-batch run (padding excluded everywhere)."""
    system, params, _ = small_system
    ds = Ego4dOSCCDataset("val", num_segments=3, root=ego4d_root)
    step = system.make_eval_step("oscc")
    results = {}
    for bs in (5, 24):
        loader = build_dataloader(ds, bs, False, 0, False)
        meter = build_meter_for_dataset(ds)
        validate(step, params, {}, loader, meter, "oscc")
        results[bs] = meter.get_logs()["accuracy"]
    assert results[5] == pytest.approx(results[24])


def test_ar_metrics_invariant_to_batch_padding(ego4d_root, small_system):
    system, params, _ = small_system
    ds = Ego4dRecognitionDataset("val", num_segments=3, root=ego4d_root)
    step = system.make_eval_step("ar")
    results = {}
    for bs in (7, 60):
        loader = build_dataloader(ds, bs, False, 0, False)
        meter = build_meter_for_dataset(ds)
        validate(step, params, {}, loader, meter, "ar")
        logs = meter.get_logs()
        results[bs] = (logs["verbs_top1"], logs["nouns_top5"])
    assert results[7] == pytest.approx(results[60])


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
