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


def test_meter_state_merge_matches_single(ego4d_root):
    """Sharded multi-host eval contract: metering half the batches on each of
    two meters and merging states must reproduce the single-meter metrics
    exactly (order-insensitive accumulators), for every meter class."""
    from egopack_tpu.data import (Ego4dLTADataset, Ego4dOSCCDataset,
                                  Ego4dPNRDataset, Ego4dRecognitionDataset)
    from egopack_tpu.eval.meters import build_meter_for_dataset

    rng = np.random.default_rng(7)

    def updates_recognition(_):
        for i in range(4):
            logits = (rng.normal(size=(10, 12)), rng.normal(size=(10, 9)))
            labels = np.stack([rng.integers(0, 12, 10),
                               rng.integers(0, 9, 10)], 1)
            yield (logits, labels, float(rng.uniform(0.5, 2.0)))

    def updates_oscc(_):
        for i in range(4):
            yield (rng.normal(size=(10, 2)), rng.integers(0, 2, 10),
                   float(rng.uniform(0.5, 2.0)))

    def updates_pnr(_):
        for i in range(4):
            yield dict(logits=rng.normal(size=(6, 16)),
                       labels=rng.integers(0, 2, (6, 16)),
                       loss=float(rng.uniform(0.5, 2.0)),
                       start_frame=rng.integers(0, 10, 6),
                       end_frame=rng.integers(100, 200, 6),
                       pnr_frame=rng.integers(20, 80, 6))

    def updates_lta(_):
        for i in range(4):
            n = 2 * 22
            logits = (rng.normal(size=(n, 12)), rng.normal(size=(n, 9)))
            labels = np.stack([rng.integers(0, 12, n),
                               rng.integers(0, 9, n)], 1)
            preds = (rng.integers(0, 12, (n, 5)), rng.integers(0, 9, (n, 5)))
            yield (logits, labels, preds, float(rng.uniform(0.5, 2.0)))

    cases = [
        (Ego4dRecognitionDataset, updates_recognition, "args"),
        (Ego4dOSCCDataset, updates_oscc, "args"),
        (Ego4dPNRDataset, updates_pnr, "kwargs"),
        (Ego4dLTADataset, updates_lta, "args"),
    ]
    for cls, gen, mode in cases:
        ds = cls("val", num_segments=3, root=ego4d_root) \
            if cls is not Ego4dPNRDataset else cls("val", root=ego4d_root)
        single = build_meter_for_dataset(ds, save_features=True)
        halves = [build_meter_for_dataset(ds, save_features=True)
                  for _ in range(2)]
        for i, upd in enumerate(gen(None)):
            for m in (single, halves[i % 2]):
                if mode == "kwargs":
                    m.update(upd["logits"], upd["labels"], upd["loss"],
                             start_frame=upd["start_frame"],
                             end_frame=upd["end_frame"],
                             pnr_frame=upd["pnr_frame"])
                else:
                    m.update(*upd)
                m.update_features(post=np.full((3, 4), float(i)))
        # state round-trips through the npz allgather wire format
        # (non-executable by construction — no pickle on peer data)
        from egopack_tpu.parallel import multihost as mh
        pid, st = mh.state_from_bytes(mh.state_to_bytes(1, halves[1].state()))
        assert pid == 1
        halves[0].merge_state(st, include_loss=True)
        a, b = single.get_logs(), halves[0].get_logs()
        assert a.keys() == b.keys()
        for k in a:
            assert a[k] == pytest.approx(b[k], rel=1e-12), (cls.__name__, k)
        assert len(halves[0]._post_features) == len(single._post_features)


def test_feature_wire_cap_subsamples_uniformly():
    """The cross-process feature cap ships a uniform subsample over the whole
    accumulated epoch, not the first batches (ADVICE r3: first-N truncation
    over-represented early val batches in merged t-SNE plots)."""
    from egopack_tpu.eval.meters import BaseMeter

    m = BaseMeter(save_features=True)
    for i in range(10):
        m.update_features(post=np.full((500, 4), float(i)))
    shipped = m._capped(m._post_features)
    rows = np.concatenate(shipped)
    assert len(rows) == BaseMeter.FEATURE_WIRE_CAP
    # every source batch represented, in proportion (500/5000 -> ~200 each)
    batch_ids, counts = np.unique(rows[:, 0], return_counts=True)
    assert list(batch_ids) == [float(i) for i in range(10)]
    assert counts.min() >= 190 and counts.max() <= 210

    # under the cap: pass-through, no concatenation or reordering
    small = BaseMeter(save_features=True)
    small.update_features(post=np.full((3, 4), 1.0))
    small.update_features(post=np.full((3, 4), 2.0))
    out = small._capped(small._post_features)
    assert len(out) == 2 and len(out[0]) == 3
