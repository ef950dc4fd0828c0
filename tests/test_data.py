"""Data layer: samplers (golden parity), graph specs, datasets on the fixture,
collation and multiloader semantics."""

import numpy as np

from egopack_tpu.data import (Ego4dLTADataset, Ego4dOSCCDataset,
                              Ego4dPNRDataset, Ego4dRecognitionDataset,
                              MultiLoader, ar_spec, build_dataloader, collate,
                              lta_extra_adjacency_host, lta_spec, oscc_spec,
                              radius_adjacency)
from egopack_tpu.data.sampling import (random_sampling_indices,
                                       uniform_sampling_indices)


# --- samplers: semantics pinned against /root/reference/data/base_dataset.py:128-155
def test_uniform_sampling_golden():
    # uniform_sampling_indices(10, 8) per the reference __main__ block
    np.testing.assert_array_equal(
        uniform_sampling_indices(10, 8), [0, 1, 2, 3, 5, 6, 7, 8])
    got = uniform_sampling_indices(100, 8)
    expect = np.linspace(0, 100, 8, endpoint=False, dtype=int) + (100 // 8 // 2)
    np.testing.assert_array_equal(got, expect)


def test_random_sampling_bounds(rng):
    for size, n in [(5, 8), (10, 8), (100, 8), (7, 3), (3, 3)]:
        idx = random_sampling_indices(size, n, rng)
        assert idx.shape == (n,)
        assert (idx >= 0).all() and (idx < max(size, 1)).all()
        assert (np.diff(idx) >= 0).all() or size // n == 0


def test_random_sampling_strided_structure(rng):
    # with size divisible by n, index i lies in [i*size/n, i*size/n + size/n)
    size, n = 96, 8
    for _ in range(10):
        idx = random_sampling_indices(size, n, rng)
        base = np.arange(n) * (size // n)
        assert ((idx >= base) & (idx < base + size // n)).all()


# --- graph specs
def test_chain_adjacency_k1():
    spec = ar_spec(9, k=1.0)
    adj = spec.adjacency
    assert adj.shape == (9, 9)
    for i in range(9):
        for j in range(9):
            assert adj[i, j] == (abs(i - j) == 1)


def test_radius_adjacency_k2():
    adj = radius_adjacency(np.arange(5), 2.5)
    assert adj[0, 2] and not adj[0, 3]


def test_lta_extra_adjacency_quirk():
    # (y[:,0] > 0) strictly: forecast clips with verb 0 shrink the target set
    spec = lta_spec(2, 20, k=1.0)
    y_verb = np.array([-1, -1] + [1] * 20)
    adj = lta_extra_adjacency_host(spec, y_verb)
    assert adj[2:, 1].all() and not adj[:, 0].any()
    y_verb2 = np.array([-1, -1] + [1] * 10 + [0] * 10)
    adj2 = lta_extra_adjacency_host(spec, y_verb2)
    assert adj2[2:12, 1].all() and not adj2[12:, 1].any()


# --- datasets over the synthetic fixture
def test_ar_dataset_shapes(ego4d_root, rng):
    ds = Ego4dRecognitionDataset("train", num_segments=3, root=ego4d_root)
    assert len(ds) == 60  # 2 clips × 30 actions
    s = ds.get(0, rng)
    assert s["x"].shape == (9, 3, 32)
    assert s["y"].shape == (9, 2)
    center = 4
    assert (s["y"][np.arange(9) != center] == -1).all()
    assert s["y"][center, 0] >= 0
    assert ds.num_class_labels == (12, 9)


def test_lta_dataset_shapes(ego4d_root, rng):
    ds = Ego4dLTADataset("train", num_segments=3, root=ego4d_root)
    # 30 actions per clip → 30 - 2 - 20 = 8 windows per clip × 2 clips
    assert len(ds) == 16
    s = ds.get(0, rng)
    # COMPACT layout: only the 2 real input clips ship; the 20 forecast
    # nodes (their mean) materialize on device (MultiTaskSystem.expand_x)
    assert s["x"].shape == (2, 3, 32)
    assert s["y"].shape == (22, 2)
    assert (s["y"][:2] == -1).all() and (s["y"][2:] >= 0).all()
    # append_node="random" has no device-reproducible fill → full layout
    dr = Ego4dLTADataset("train", num_segments=3, root=ego4d_root,
                         append_node="random", verbose=False)
    sr = dr.get(0, rng)
    assert sr["x"].shape == (22, 3, 32)


def test_oscc_dataset(ego4d_root, rng):
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    assert len(ds) == 24
    s = ds.get(0, rng)
    assert s["x"].shape == (4, 3, 32)
    assert s["y"] in (0, 1)
    # val sampling is deterministic
    dv = Ego4dOSCCDataset("val", num_segments=3, root=ego4d_root)
    a, b = dv.get(0), dv.get(0)
    np.testing.assert_array_equal(a["x"], b["x"])


def test_pnr_dataset(ego4d_root, rng):
    ds = Ego4dPNRDataset("train", num_segments=16, root=ego4d_root)
    # only state-change samples keep a pnr_frame (12 of 24)
    assert len(ds) == 12
    s = ds.get(0, rng)
    # COMPACT layout: each frame feature ships once; the 3× per-node repeat
    # (reference ego4d_oscc.py:291) happens on device
    assert s["x"].shape == (16, 32)
    assert s["y"].sum() == 1  # one-hot at nearest frame
    v = Ego4dPNRDataset("val", num_segments=16, root=ego4d_root).get(0)
    assert v["y"].sum() == 1


def test_collate_padding():
    samples = [{"x": np.ones((4, 3, 8), np.float32), "y": np.int32(1)}
               for _ in range(3)]
    batch = collate(samples, pad_to=5)
    assert batch["x"].shape == (5, 4, 3, 8)
    assert batch["valid"].tolist() == [True] * 3 + [False] * 2
    assert (batch["y"][3:] == -1).all()


def test_multiloader_wraparound(ego4d_root):
    ar = Ego4dRecognitionDataset("train", num_segments=3, root=ego4d_root)
    oscc = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    dl_ar = build_dataloader(ar, 8, True, 0, True, seed=1)     # 7 batches
    dl_oscc = build_dataloader(oscc, 8, True, 0, True, seed=1)  # 3 batches
    ml = MultiLoader([dl_ar, dl_oscc], [1.0, 1.0])
    steps = list(ml)
    assert len(steps) == len(ml) == 7  # epoch = longest loader
    assert all(a is not None and o is not None for a, o in steps)
    # weight 0 → None stream
    ml0 = MultiLoader([dl_ar, dl_oscc], [1.0, 0.0])
    first = next(iter(ml0))
    assert first[1] is None


def test_dataloader_determinism(ego4d_root):
    """Two runs with the same seed/epoch stream identical batches (each
    re-iteration WITHIN a run reshuffles — see test_wraparound_reshuffles)."""
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    streams = []
    for _ in range(2):
        dl = build_dataloader(ds, 4, True, 0, True, seed=7)
        dl.set_epoch(3)
        streams.append([b["y"].copy() for b in dl])
    for a, b in zip(*streams):
        np.testing.assert_array_equal(a, b)


def test_wraparound_reshuffles(ego4d_root):
    """Re-iterating a loader within an epoch (multiloader wraparound) must
    reshuffle and redraw augmentations, like re-iterating a torch DataLoader."""
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    dl = build_dataloader(ds, 4, True, 0, True, seed=3)
    dl.set_epoch(1)
    first = [b["y"].copy() for b in dl]   # pass 0
    second = [b["y"].copy() for b in dl]  # pass 1 (wraparound)
    assert any(not np.array_equal(a, b) for a, b in zip(first, second))
    # but a fresh loader at the same epoch reproduces pass 0 exactly
    dl2 = build_dataloader(ds, 4, True, 0, True, seed=3)
    dl2.set_epoch(1)
    again = [b["y"].copy() for b in dl2]
    for a, b in zip(first, again):
        np.testing.assert_array_equal(a, b)


def test_abandoned_prefetch_thread_stops(ego4d_root):
    """Dropping an iterator mid-pass must not leak a blocked worker thread."""
    import threading
    import time

    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    dl = build_dataloader(ds, 2, True, 2, True, seed=1)
    before = threading.active_count()
    for _ in range(10):
        it = iter(dl)
        next(it)
        it.close()  # abandon mid-pass
    time.sleep(0.5)
    assert threading.active_count() <= before + 1


def test_feature_store_pt_conversion(tmp_path):
    """One-time .pt→.npy conversion path (reference process(),
    data/ego4d_fho.py:142-168) using a real torch tensor file."""
    import torch
    from egopack_tpu.data.base import FeatureStore

    raw = tmp_path / "raw" / "features" / "omnivore_video_swinl"
    raw.mkdir(parents=True)
    feats = torch.randn(50, 16)
    torch.save(feats, raw / "vid_x.pt")
    store = FeatureStore(str(tmp_path), "omnivore_video_swinl", ["vid_x"],
                         "meta.csv")
    np.testing.assert_allclose(np.asarray(store["vid_x"]), feats.numpy(),
                               rtol=1e-6)
    assert store.feature_dim == 16
    # idempotent: second load skips conversion
    store2 = FeatureStore(str(tmp_path), "omnivore_video_swinl", ["vid_x"],
                          "meta.csv")
    assert store2["vid_x"].shape == (50, 16)


def test_batch_sampling_indices_matches_per_row():
    """The vectorized sampler (host hot path) must reproduce the per-row
    reference semantics: uniform path bitwise, random path same support and
    per-row uniform jitter in [0, size//n)."""
    import numpy as np
    from egopack_tpu.data import sampling

    sizes = np.array([0, 1, 2, 3, 7, 12, 45, 100])
    n = 3
    # uniform: bitwise equal to the per-row function
    got = sampling.batch_sampling_indices(sizes, n, None)
    for i, s in enumerate(sizes):
        want = sampling.uniform_sampling_indices(int(s), n)
        np.testing.assert_array_equal(got[i], want, err_msg=f"size={s}")

    # random: indices in-range, jitter bounded like the reference's
    # rng.integers(0, size // n), degenerate sizes follow the linspace path
    rng = np.random.default_rng(0)
    for _ in range(50):
        got = sampling.batch_sampling_indices(sizes, n, rng)
        for i, s in enumerate(sizes):
            s = int(s)
            base = np.arange(n) * (s / n)
            if s // n > 0:
                assert (got[i] >= np.floor(base)).all()
                assert (got[i] <= np.round(np.clip(base + s // n - 1 + 0.5,
                                                   0, s))).all()
            else:
                np.testing.assert_array_equal(got[i], base.astype(int))


def test_oscc_remove_overlapping_segments():
    """Train-time overlap filter (reference data/ego4d_oscc.py:81-98): a
    positive (has parent_pnr_frame) and a negative interval of the SAME video
    that overlap on closed [start_sec, end_sec] are BOTH dropped; different
    videos and non-overlapping pairs survive."""
    from egopack_tpu.data.osccpnr import Ego4dOSCCDataset

    def clip(uid, video, s, e, pnr):
        return {"unique_id": uid, "video_uid": video,
                "parent_start_sec": s, "parent_end_sec": e,
                "parent_pnr_frame": pnr}

    clips = [
        clip("p_hit", "vidA", 0.0, 8.0, 120),    # overlaps n_hit -> dropped
        clip("n_hit", "vidA", 7.5, 15.0, None),  # overlaps p_hit -> dropped
        clip("p_edge", "vidA", 20.0, 28.0, 700), # touches n_edge at 28.0
        clip("n_edge", "vidA", 28.0, 36.0, None),# closed interval -> BOTH out
        clip("p_far", "vidA", 50.0, 58.0, 1600), # no neg overlap -> kept
        clip("n_far", "vidA", 70.0, 78.0, None), # no pos overlap -> kept
        clip("p_othervid", "vidB", 0.0, 8.0, 99),# vidB: no neg at all -> kept
    ]
    out = Ego4dOSCCDataset._remove_overlapping(clips)
    assert {c["unique_id"] for c in out} == {"p_far", "n_far", "p_othervid"}


def test_pnr_crop_offset_reference_quirk(ego4d_root):
    """The reference's train crop start uses np.random.uniform(8 - len) — a
    single POSITIONAL low with high=1.0, i.e. a draw BETWEEN 8-len and 1.0
    (either order), NOT uniform(0, 8-len) (ego4d_oscc.py:248). Pinned with a
    stub rng."""
    ds = Ego4dPNRDataset("train", num_segments=16, root=ego4d_root,
                         verbose=False)
    seg = ds.annotations[0]

    class StubRng:
        def __init__(self, u, r):
            self._u, self._r = u, r

        def uniform(self, lo, hi):  # random_len draw
            assert (lo, hi) == (5, 8)
            return self._u

        def random(self):  # offset draw
            return self._r

    # len=5 → lo=3: offset = 3 + (1-3)*r ∈ {3.0 at r=0, 1.0 at r=1}
    s0 = ds.get(0, StubRng(5.0, 0.0))
    s1 = ds.get(0, StubRng(5.0, 1.0))
    f0, f1 = float(s0["start_frame"]), float(s1["start_frame"])
    import numpy as _np
    expect0 = _np.floor((seg.start_sec + 3.0) * 30)
    expect1 = _np.floor((seg.start_sec + 1.0) * 30)
    # the PNR clamp may reset start_frame when pnr < crop start; check the
    # pre-clamp values via the formula when no clamp fired
    if seg.pnr_frame is not None and seg.pnr_frame >= expect0:
        assert f0 == expect0
    if seg.pnr_frame is not None and seg.pnr_frame >= expect1:
        assert f1 == expect1


def test_multiloader_zero_batch_loader_ends_epoch(ego4d_root):
    """An enabled loader with ZERO batches (dataset < batch_size with
    drop_last) ends the epoch cleanly like the reference multiloader — not
    PEP-479 RuntimeError."""
    ar = Ego4dRecognitionDataset("train", num_segments=3, root=ego4d_root)
    empty = build_dataloader(ar, 1000, True, 0, True, seed=1)  # 0 batches
    full = build_dataloader(ar, 8, True, 0, True, seed=1)
    ml = MultiLoader([full, empty], [1.0, 1.0])
    steps = list(ml)  # must not raise
    assert steps == [] or all(len(s) == 2 for s in steps)


# --- worker-process pool (round-robin whole batches, bitwise-same stream) ---

def _stream_arrays(loader, n_passes=1):
    out = []
    for _ in range(n_passes):
        for b in loader:
            out.append({k: (np.asarray(v).copy() if k != "uid" else v)
                        for k, v in b.items()})
    return out


def test_worker_pool_stream_bitwise_matches_single_process(ego4d_root):
    """WorkerPoolLoader (2 forked producers) streams the EXACT batches of the
    in-process loader: shuffled train passes including a wraparound
    re-iteration, and the val tail-padded partial batch."""
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root,
                          aug_prob=0.5)  # augmentations exercise _sample_rng
    ref = build_dataloader(ds, 4, True, 0, True, seed=7)
    pool = build_dataloader(ds, 4, True, 0, True, seed=7, worker_processes=2)
    try:
        ref.set_epoch(3)
        pool.set_epoch(3)
        a = _stream_arrays(ref, n_passes=2)   # pass 0 + wraparound pass 1
        b = _stream_arrays(pool, n_passes=2)
        assert len(a) == len(b) and len(a) > 0
        for x, y in zip(a, b):
            assert x.keys() == y.keys()
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)

        # val: padded partial final batch, no shuffle
        val = Ego4dOSCCDataset("val", num_segments=3, root=ego4d_root,
                               aug_prob=0)
        ref_v = build_dataloader(val, 5, False, 0, False, seed=7)
        pool_v = build_dataloader(val, 5, False, 0, False, seed=7,
                                  worker_processes=3)
        try:
            av = _stream_arrays(ref_v)
            bv = _stream_arrays(pool_v)
            assert len(av) == len(bv) and len(av) > 0
            for x, y in zip(av, bv):
                for k in x:
                    np.testing.assert_array_equal(x[k], y[k], err_msg=k)
        finally:
            pool_v.close()
    finally:
        pool.close()


def test_worker_pool_abandoned_pass_recovers(ego4d_root):
    """MultiLoader wraparound abandons iterators mid-pass; the pool's next
    iteration must discard the stale generation and resync exactly."""
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    ref = build_dataloader(ds, 4, True, 0, True, seed=5)
    pool = build_dataloader(ds, 4, True, 0, True, seed=5, worker_processes=2)
    try:
        ref.set_epoch(1)
        pool.set_epoch(1)
        it = iter(pool)
        next(it)  # consume one batch, abandon the rest of pass 0
        ref_it = iter(ref)
        next(ref_it)
        # pass 1 streams identically on both
        b_pool = [dict(b) for b in pool]
        b_ref = [dict(b) for b in ref]
        assert len(b_pool) == len(b_ref) > 0
        for x, y in zip(b_ref, b_pool):
            for k in x:
                np.testing.assert_array_equal(np.asarray(x[k]),
                                              np.asarray(y[k]), err_msg=k)
    finally:
        pool.close()


class _ExplodingDataset:
    """Wraps a dataset so every get() raises — drives the pool's
    worker-exception propagation path."""

    def __init__(self, base):
        self.base = base

    def __len__(self):
        return len(self.base)

    def get(self, idx, rng):
        raise ValueError("synthetic get failure")


class _ExitingDataset(_ExplodingDataset):
    """get() hard-kills the worker process (no exception to report) —
    drives the pool's silent-death detection path."""

    def get(self, idx, rng):
        import os
        os._exit(13)


def test_worker_pool_worker_error_propagates(ego4d_root):
    """An exception inside a worker's dataset.get() must raise in the
    consumer (with the worker traceback), not hang the training loop —
    the process-pool analog of the prefetch thread's err-list."""
    import pytest
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    pool = build_dataloader(_ExplodingDataset(ds), 4, True, 0, True, seed=5,
                            worker_processes=2)
    try:
        with pytest.raises(RuntimeError, match="synthetic get failure"):
            next(iter(pool))
    finally:
        pool.close()


def test_worker_pool_dead_worker_raises(ego4d_root):
    """A worker that dies without reporting (segfault/OOM-kill analog:
    os._exit) must surface as a RuntimeError after the liveness poll, not
    an indefinite oq.get() block."""
    import pytest
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    pool = build_dataloader(_ExitingDataset(ds), 4, True, 0, True, seed=5,
                            worker_processes=2)
    try:
        with pytest.raises(RuntimeError, match="died"):
            next(iter(pool))
    finally:
        pool.close()


def test_worker_pool_close_and_finalizer_reap_workers(ego4d_root):
    """close() must reap the forked workers; a pool dropped WITHOUT close()
    must be reaped by its weakref finalizer (sweep/e2e processes would
    otherwise accumulate copy-on-write images of the jax parent)."""
    import gc
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root, aug_prob=0)
    pool = build_dataloader(ds, 4, True, 0, True, seed=5, worker_processes=2)
    it = iter(pool)
    next(it)
    procs = list(pool._procs)
    assert all(p.is_alive() for p in procs)
    pool.close()
    assert all(not p.is_alive() for p in procs)

    pool2 = build_dataloader(ds, 4, True, 0, True, seed=5, worker_processes=2)
    it2 = iter(pool2)
    next(it2)
    procs2 = list(pool2._procs)
    del pool2, it2
    gc.collect()
    for p in procs2:
        p.join(timeout=10)
    assert all(not p.is_alive() for p in procs2)


def test_worker_pool_spawn_context_stream_matches(ego4d_root, monkeypatch):
    """EGOPACK_POOL_CTX=spawn (the fork-safe child image; workers re-import
    and unpickle the dataset instead of inheriting it) must stream the same
    batches as the default fork context."""
    monkeypatch.setenv("EGOPACK_POOL_CTX", "spawn")
    ds = Ego4dOSCCDataset("train", num_segments=3, root=ego4d_root,
                          aug_prob=0.5)
    ref = build_dataloader(ds, 4, True, 0, True, seed=7)
    pool = build_dataloader(ds, 4, True, 0, True, seed=7, worker_processes=2)
    try:
        a = _stream_arrays(ref)
        b = _stream_arrays(pool)
        assert len(a) == len(b) > 0
        for x, y in zip(a, b):
            for k in x:
                np.testing.assert_array_equal(x[k], y[k], err_msg=k)
    finally:
        pool.close()
