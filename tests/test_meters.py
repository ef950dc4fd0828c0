"""Metric + meter suite against hand-computed golden values."""

import numpy as np
import pytest

from egopack_tpu.eval import metrics as M


def test_topk_accuracy_micro_ignore():
    logits = np.array([[0.1, 0.9, 0.0], [0.8, 0.1, 0.1], [0.2, 0.3, 0.5]])
    labels = np.array([1, 0, -1])
    assert M.topk_accuracy_micro(logits, labels, 1) == 1.0
    labels2 = np.array([0, 0, -1])
    assert M.topk_accuracy_micro(logits, labels2, 1) == 0.5
    assert M.topk_accuracy_micro(logits, labels2, 2) == 1.0


def test_macro_accuracy_over_present_classes():
    logits = np.array([[0.9, 0.1], [0.9, 0.1], [0.1, 0.9], [0.9, 0.1]])
    labels = np.array([0, 0, 1, 1])
    # class 0: 2/2, class 1: 1/2 → macro 0.75
    assert M.macro_accuracy(logits, labels, 2) == pytest.approx(0.75)
    # class never present is excluded from the mean
    assert M.macro_accuracy(logits, labels, 5) == pytest.approx(0.75)


def test_calibration_error_single_bin_l2():
    # 1 bin, l2: |mean(acc) − mean(conf)|
    logits = np.array([[4.0, 0.0], [4.0, 0.0]])
    labels = np.array([0, 1])  # acc = 0.5
    conf = 1 / (1 + np.exp(-4.0))  # softmax top-1 prob
    expect = abs(0.5 - conf)
    got = M.calibration_error(logits, labels, n_bins=1, norm="l2")
    assert got == pytest.approx(expect, rel=1e-6)


def test_binary_auroc_known_value():
    probs = np.array([0.1, 0.4, 0.35, 0.8])
    labels = np.array([0, 0, 1, 1])
    # classic sklearn example → AUC = 0.75
    assert M.binary_auroc(probs, labels) == pytest.approx(0.75)


def test_binary_auroc_with_ties():
    probs = np.array([0.5, 0.5, 0.5, 0.5])
    labels = np.array([0, 1, 0, 1])
    assert M.binary_auroc(probs, labels) == pytest.approx(0.5)


def test_levenshtein_golden():
    assert M.levenshtein([1, 2, 3], [1, 2, 3]) == 0
    assert M.levenshtein([1, 2, 3], [1, 3]) == 1
    assert M.levenshtein([1, 2, 3], [4, 5, 6]) == 3
    assert M.levenshtein([], [1, 2]) == 2
    # kitten → sitting as ints
    assert M.levenshtein([10, 8, 19, 19, 4, 13],
                         [18, 8, 19, 19, 8, 13, 6]) == 3


def test_sequence_edit_distance_best_of_k():
    labels = np.array([[1, 2, 3, 4]])
    preds = np.stack([
        np.array([[1, 2, 3, 4]]),      # perfect (k=0)
        np.array([[4, 3, 2, 1]]),      # bad (k=1)
    ], axis=-1)  # (1, 4, 2)
    out = M.sequence_edit_distance(preds, labels)
    assert out[0] == 0.0


def test_top2_confusion():
    logits = np.array([[0.5, 0.4, 0.1],   # top1=0 top2=1, label 1 → counted
                       [0.5, 0.4, 0.1],   # label 0 → correct top1, not counted
                       [0.1, 0.2, 0.7]])  # label 0 → top2=1 wrong, not counted
    labels = np.array([1, 0, 0])
    cm = M.top2_confusion(logits, labels, 3)
    assert cm[1, 0] == 1 and cm.sum() == 1


def test_multitask_accuracy_both_heads_must_hit():
    preds = (np.array([[0.9, 0.1], [0.9, 0.1]]),
             np.array([[0.1, 0.9], [0.9, 0.1]]))
    targets = (np.array([0, 0]), np.array([1, 1]))
    # sample 0: both heads correct; sample 1: second head wrong
    assert M.multitask_topk_accuracy(preds, targets, 1) == pytest.approx(0.5)


def test_class_filter():
    preds = (np.array([1.0, 2.0, 3.0]),)
    targets = (np.array([0, 4, 2]),)
    (p,), (t,) = M.class_filter(preds, targets, (np.array([0, 2]),))
    np.testing.assert_array_equal(t, [0, 2])
    np.testing.assert_array_equal(p, [1.0, 3.0])


def test_recognition_meter_tables(ego4d_root):
    from egopack_tpu.data import Ego4dRecognitionDataset
    from egopack_tpu.eval.meters import Ego4dRecognitionMeter

    ds = Ego4dRecognitionDataset("val", num_segments=3, root=ego4d_root)
    meter = Ego4dRecognitionMeter(ds, save_features=True)
    rng = np.random.default_rng(0)
    logits = (rng.normal(size=(20, 12)), rng.normal(size=(20, 9)))
    labels = np.stack([rng.integers(0, 12, 20), rng.integers(0, 9, 20)], 1)
    meter.update(logits, labels, 1.0)
    meter.update_features(post=rng.normal(size=(20, 8)))
    logs = meter.get_logs()
    assert 0 <= logs["verbs_top1"] <= 1
    tables = meter.confusion_tables("verbs")
    assert len(tables["class_acc"]["class"]) == 12
    emb = meter.feature_embedding("post")
    assert emb.shape == (20, 2)


def test_confusion_plot_frontend(ego4d_root, tmp_path):
    """Heatmap PNG + actual-->predicted table (reference utils/plots.py)."""
    from egopack_tpu.data import Ego4dRecognitionDataset
    from egopack_tpu.eval.meters import Ego4dRecognitionMeter
    from egopack_tpu.utils import plots

    ds = Ego4dRecognitionDataset("val", num_segments=3, root=ego4d_root)
    meter = Ego4dRecognitionMeter(ds, log_confusion=True)
    rng = np.random.default_rng(1)
    logits = (rng.normal(size=(30, 12)), rng.normal(size=(30, 9)))
    labels = np.stack([rng.integers(0, 12, 30), rng.integers(0, 9, 30)], 1)
    meter.update(logits, labels, 1.0)

    cm = meter.confusion("verbs")
    assert cm.shape == (12, 12) and cm.sum() == 30

    png = tmp_path / "confusion.png"
    assert plots.save_confusion_heatmap(cm, str(png))
    assert png.stat().st_size > 0

    # un-normalized table lists every nonzero cell
    rows = plots.generate_confusion_table(cm, [f"v{i}" for i in range(12)],
                                          normalize=False)
    assert sum(count for _, count in rows) == 30
    assert all("-->" in head for head, _ in rows)
    # normalized table reproduces the reference's .long() truncation: only
    # cells that make up an entire row survive
    norm_rows = plots.generate_confusion_table(
        np.eye(3) * 5, ["a", "b", "c"], normalize=True)
    assert norm_rows == [("a --> a", 1), ("b --> b", 1), ("c --> c", 1)]


def test_anticipation_meter(ego4d_root):
    from egopack_tpu.data import Ego4dAnticipationDataset
    from egopack_tpu.eval.meters import Ego4dAnticipationMeter

    ds = Ego4dAnticipationDataset("val", num_segments=3, root=ego4d_root)
    assert ds.graph_spec().num_nodes == ds.num_nodes == 6
    s = ds.get(0)
    assert s["x"].shape == (6, 3, 32)
    assert (s["y"][:-1] == -1).all() and (s["y"][-1] >= 0).all()

    meter = Ego4dAnticipationMeter(ds)
    rng = np.random.default_rng(0)
    logits = (rng.normal(size=(12, 12)), rng.normal(size=(12, 9)))
    labels = np.stack([rng.integers(0, 12, 12), rng.integers(0, 9, 12)], 1)
    labels[0] = -1
    meter.update(logits, labels, 0.5)
    logs = meter.get_logs()
    assert 0 <= logs["verbs_recall_top5"] <= 1
    assert 0 <= logs["nouns_accuracy_top1"] <= 1
