"""Host-side batching: dense collation, multiloader schedule, async prefetch.

Replaces the PyG DataLoader + ``multiloader`` stack
(/root/reference/utils/dataloading.py:8-70). Collation stacks fixed-shape numpy
samples into dense ``(B, N, S, D)`` arrays with a ``valid`` mask, so XLA sees
one static shape per task forever. ``MultiLoader`` preserves the reference's
epoch semantics exactly: epoch length = longest enabled loader, exhausted
loaders restart until all have completed once (:24-47).

Prefetching uses a background thread per loader (the device runs async, so one
host core still overlaps batch assembly with TPU compute).
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np

from .base import BaseDataset

_ARRAY_KEYS_PASSTHROUGH = ("uid", "clip_uid", "last_idx")


def collate(samples: List[Dict[str, Any]], pad_to: Optional[int] = None) -> Dict[str, Any]:
    """Stack sample dicts; optionally right-pad to ``pad_to`` with valid mask."""
    batch: Dict[str, Any] = {}
    n = len(samples)
    size = pad_to or n
    for key in samples[0]:
        vals = [s[key] for s in samples]
        if key in _ARRAY_KEYS_PASSTHROUGH:
            batch[key] = vals + [vals[-1]] * (size - n)
            continue
        arr = np.stack(vals)
        if size > n:
            pad = np.repeat(arr[-1:], size - n, axis=0)
            if np.issubdtype(arr.dtype, np.integer):
                pad = np.full_like(pad, -1)  # padded labels are ignored
            else:
                pad = np.zeros_like(pad)
            arr = np.concatenate([arr, pad], axis=0)
        batch[key] = arr
    valid = np.zeros(size, dtype=bool)
    valid[:n] = True
    batch["valid"] = valid
    return batch


class DataLoader:
    """Deterministic, re-iterable loader over a dense dataset.

    Mirrors ``build_dataloader`` (/root/reference/utils/dataloading.py:56-70):
    seeded shuffle, ``drop_last`` for train; val pads the final partial batch
    (the reference keeps it ragged — dense TPU batches can't, so we pad+mask).
    """

    def __init__(self, dataset: BaseDataset, batch_size: int, shuffle: bool,
                 drop_last: bool, seed: int = 0, prefetch: int = 4,
                 process_shard: Optional[tuple] = None):
        """``process_shard=(index, count)`` makes this a multi-host loader:
        the GLOBAL epoch schedule (same seed on every process) is computed
        identically everywhere and each process materializes only its
        contiguous block of every global batch — multiloader epoch semantics
        are preserved exactly across hosts."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch = prefetch
        self.process_shard = process_shard
        if process_shard is not None:
            assert batch_size % process_shard[1] == 0, \
                f"batch_size {batch_size} not divisible by " \
                f"{process_shard[1]} processes"
        self._epoch = 0
        self._pass = 0  # re-iteration counter within an epoch (wraparound)

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch
        self._pass = 0

    def _index_batches(self, pass_idx: int) -> List[np.ndarray]:
        rng = np.random.default_rng((self.seed, self._epoch, pass_idx))
        order = np.arange(len(self.dataset))
        if self.shuffle:
            rng.shuffle(order)
        nb = len(self)
        return [order[i * self.batch_size:(i + 1) * self.batch_size]
                for i in range(nb)]

    def _sample_rng(self, pass_idx: int, idx: int) -> np.random.Generator:
        """Augmentation rng keyed by the GLOBAL dataset index (not stream
        position): a process-sharded loader draws bit-identical jitter for
        sample i as the unsharded loader, so shards reassemble the global
        batches exactly even when augmentations consume randomness — and
        different processes never share correlated streams.

        Counter-based Philox with an explicit key: ~1.6× cheaper to construct
        than ``default_rng(tuple)`` (no SeedSequence hashing), which matters
        at thousands of constructions/s on one host core."""
        mix = (((self.seed * 1000003 + self._epoch) * 1000003 + pass_idx)
               & 0xFFFFFFFFFFFFFFFF)
        return np.random.Generator(np.random.Philox(key=[mix, int(idx)]))

    def _produce(self, pass_idx: int,
                 stride: Optional[tuple] = None) -> Iterator[Dict[str, Any]]:
        """``stride=(w, W)`` yields only batches ``k`` with ``k % W == w`` —
        the round-robin split worker-pool processes use. Batch content is
        position-independent (the index schedule is global and the
        augmentation rng is keyed by global dataset index), so W strided
        producers interleave into the exact single-producer stream."""
        local_bs = self.batch_size
        for k, idxs in enumerate(self._index_batches(pass_idx)):
            if stride is not None and k % stride[1] != stride[0]:
                continue
            if self.process_shard is not None:
                pid, count = self.process_shard
                per = self.batch_size // count
                local_bs = per
                idxs = idxs[pid * per:(pid + 1) * per]
            if len(idxs) == 0:  # partial global batch owned by other hosts
                # every process must yield the same number of batches; emit a
                # fully-padded (all-invalid) batch from sample 0
                samples = [self.dataset.get(0, self._sample_rng(pass_idx, 0))]
                batch = collate(samples, pad_to=local_bs)
                batch["valid"][:] = False
                yield batch
                continue
            samples = [self.dataset.get(int(i), self._sample_rng(pass_idx, i))
                       for i in idxs]
            yield collate(samples, pad_to=local_bs)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        # each re-iteration (multiloader wraparound) reshuffles and redraws
        # augmentations, like re-iterating a torch DataLoader; still fully
        # deterministic via the (seed, epoch, pass) tuple
        pass_idx = self._pass
        self._pass += 1
        if self.prefetch <= 0:
            yield from self._produce(pass_idx)
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        sentinel = object()
        err: List[BaseException] = []
        stop = threading.Event()

        def worker():
            try:
                for b in self._produce(pass_idx):
                    while not stop.is_set():
                        try:
                            q.put(b, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if stop.is_set():
                        return
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                while not stop.is_set():
                    try:
                        q.put(sentinel, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is sentinel:
                    if err:
                        raise err[0]
                    return
                yield item
        finally:
            # abandoned iterators (multiloader wraparound) must not leak a
            # blocked worker thread holding batches
            stop.set()


_POOL_ERROR = "__worker_error__"


def _pool_worker(loader: "DataLoader", wid: int, nworkers: int,
                 cmd_q, out_q, cur_gen) -> None:
    """Worker-process loop: produce this worker's round-robin share of each
    requested pass. Pure numpy — never touches jax. Runs until the ``None``
    shutdown sentinel (or parent exit; workers are daemonic).

    ``cur_gen`` is the consumer's live generation counter: when the pass
    this worker is producing goes stale (MultiLoader wraparound abandoned
    it), the worker stops instead of grinding out — and blocking the queue
    with — the remainder of a pass nobody will consume. Stale items the
    worker did enqueue still precede the new pass's items in its queue
    (single producer), so the consumer's stale-drop loop stays correct.

    Exceptions in ``dataset.get()``/collate are shipped to the consumer as a
    ``(gen, (_POOL_ERROR, traceback))`` item — mirroring the in-process
    prefetch thread's err-list propagation — so a bad sample raises in the
    training loop instead of hanging it."""
    while True:
        msg = cmd_q.get()
        if msg is None:
            return
        gen, epoch, pass_idx = msg
        loader._epoch = epoch
        try:
            for b in loader._produce(pass_idx, stride=(wid, nworkers)):
                out_q.put((gen, b))
                if cur_gen.value != gen:  # pass abandoned: next command
                    break
        except BaseException:
            import traceback
            out_q.put((gen, (_POOL_ERROR, traceback.format_exc())))
            return


def _close_pool(procs, cmd_qs, out_qs, cur_gen) -> None:
    """Shut a worker pool down. Module-level so ``weakref.finalize`` can
    hold it without keeping the loader alive; also the body of ``close()``."""
    import queue as _q
    import time as _time
    cur_gen.value += 1  # mark any in-flight pass stale so producers wind down
    for cq in cmd_qs:
        try:
            cq.put(None)
        except (ValueError, OSError):
            pass
    # drain the output queues so a producer blocked in a full put() can
    # complete it, observe the stale generation and exit on its own
    deadline = _time.time() + 5.0
    while any(p.is_alive() for p in procs) and _time.time() < deadline:
        for oq in out_qs:
            try:
                oq.get_nowait()
            except _q.Empty:
                pass
        _time.sleep(0.05)
    for p in procs:
        if p.is_alive():
            p.terminate()
        p.join(timeout=5)


class WorkerPoolLoader:
    """Multi-process batch production: N forked workers each materialize
    WHOLE batches round-robin (worker w owns batches ``k % N == w``) and the
    consumer interleaves their queues back into the global order.

    The stream is bitwise-identical to the single-process ``DataLoader``
    by construction: the index schedule is computed from (seed, epoch, pass)
    identically everywhere, and the augmentation rng is keyed by GLOBAL
    dataset index (``_sample_rng``) — the same property that makes multihost
    ``process_shard`` streams exact. This is the process-pool answer to the
    reference's ``num_workers`` DataLoader processes
    (/root/reference/utils/dataloading.py:56-70), which its GIL-bound
    Python ``get()`` needs just as much as ours does.

    Abandoned iterations (MultiLoader wraparound abandons exhausted-loader
    iterators mid-pass) are handled with a generation counter: producers
    stop a stale pass as soon as they observe the bumped shared generation,
    and whatever stale items they did enqueue are drained and dropped by
    the next iteration. Worker exceptions propagate to the consumer (which
    also watches for silent worker death and stalls) — see ``_pool_worker``.
    """

    # consumer patience: a single oq.get() polls at GET_TIMEOUT_S so worker
    # death is noticed promptly; an alive-but-silent worker (e.g. a
    # fork-inherited-lock deadlock in the child) trips the stall limit
    # instead of hanging the training loop forever
    GET_TIMEOUT_S = 5.0

    def __init__(self, loader: DataLoader, num_workers: int):
        import multiprocessing as mp
        import os
        assert num_workers > 0
        self.loader = loader
        self.num_workers = num_workers
        self.stall_limit_s = float(
            os.environ.get("EGOPACK_POOL_STALL_S", "300"))
        # fork (default): datasets hold open memmaps that are inherited for
        # free; workers only run numpy (no jax state is ever touched). fork
        # from a process whose jax/tunnel threads are live is nonetheless
        # fork-unsafe in principle (inherited locks); EGOPACK_POOL_CTX=spawn
        # trades a per-worker dataset pickle for a clean child image, and
        # the consumer's stall detector (STALL_LIMIT_S) converts any
        # residual deadlock into a legible error either way.
        self._ctx = mp.get_context(os.environ.get("EGOPACK_POOL_CTX", "fork"))
        self._gen = 0
        self._cur_gen = self._ctx.Value("L", 0, lock=False)
        self._cmd_qs: list = []
        self._out_qs: list = []
        self._procs: list = []
        self._finalizer = None

    # -- DataLoader-compatible surface --
    def __len__(self) -> int:
        return len(self.loader)

    def set_epoch(self, epoch: int) -> None:
        self.loader.set_epoch(epoch)

    @property
    def dataset(self) -> BaseDataset:
        return self.loader.dataset

    def _start(self) -> None:
        import weakref
        for w in range(self.num_workers):
            cq = self._ctx.Queue()
            oq = self._ctx.Queue(maxsize=max(2, self.loader.prefetch))
            p = self._ctx.Process(
                target=_pool_worker,
                args=(self.loader, w, self.num_workers, cq, oq,
                      self._cur_gen), daemon=True)
            p.start()
            self._cmd_qs.append(cq)
            self._out_qs.append(oq)
            self._procs.append(p)
        # safety net for callers that drop the loader without close():
        # forked daemon workers are full copy-on-write images of the jax
        # parent, too heavy to leak for the life of a sweep process
        self._finalizer = weakref.finalize(
            self, _close_pool, self._procs, self._cmd_qs, self._out_qs,
            self._cur_gen)

    def close(self) -> None:
        if self._finalizer is not None:
            self._finalizer()  # idempotent; detaches itself after one call
            self._finalizer = None
        self._procs, self._cmd_qs, self._out_qs = [], [], []

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        import queue as _q
        import time as _time
        if not self._procs:
            self._start()
        pass_idx = self.loader._pass
        self.loader._pass += 1
        self._gen += 1
        gen = self._gen
        self._cur_gen.value = gen  # unsticks workers still on a stale pass
        for cq in self._cmd_qs:
            cq.put((gen, self.loader._epoch, pass_idx))
        for k in range(len(self.loader)):
            w = k % self.num_workers
            oq, p = self._out_qs[w], self._procs[w]
            waited = 0.0
            while True:
                try:
                    g, item = oq.get(timeout=self.GET_TIMEOUT_S)
                except _q.Empty:
                    if not p.is_alive():
                        raise RuntimeError(
                            f"loader worker {w} died (exitcode "
                            f"{p.exitcode}) without reporting an error")
                    waited += self.GET_TIMEOUT_S
                    if waited >= self.stall_limit_s:
                        raise RuntimeError(
                            f"loader worker {w} produced nothing for "
                            f"{waited:.0f}s (EGOPACK_POOL_STALL_S="
                            f"{self.stall_limit_s:.0f}); if this is a "
                            "fork-inherited-lock deadlock, retry with "
                            "EGOPACK_POOL_CTX=spawn")
                    continue
                if isinstance(item, tuple) and item[:1] == (_POOL_ERROR,):
                    raise RuntimeError(
                        f"loader worker {w} failed:\n{item[1]}")
                if g == gen:  # drop items from abandoned passes
                    break
            yield item


def build_dataloader(dataset: BaseDataset, batch_size: int, shuffle: bool,
                     num_workers: int, drop_last: bool, seed: int = 0,
                     process_shard: Optional[tuple] = None,
                     worker_processes: int = 0):
    """Signature-compatible with the reference builder; ``num_workers`` maps to
    prefetch depth (threading model). ``worker_processes>0`` adds a
    round-robin process pool on top (``WorkerPoolLoader``) — the stream is
    bitwise-identical either way (tested)."""
    loader = DataLoader(dataset, batch_size, shuffle, drop_last, seed,
                        prefetch=max(2, num_workers),
                        process_shard=process_shard)
    if worker_processes > 0:
        return WorkerPoolLoader(loader, worker_processes)
    return loader


class MultiLoader:
    """Zip N loaders; epoch ends when ALL have been exhausted at least once.

    Exhausted loaders restart immediately (wraparound), matching
    /root/reference/utils/dataloading.py:8-47. Loaders with weight 0 (or None)
    yield ``None`` forever.
    """

    def __init__(self, loaders: Sequence[Optional[DataLoader]],
                 weights: Sequence[float]):
        self.loaders = list(loaders)
        self.weights = list(weights)

    def __len__(self) -> int:
        active = [len(l) for l, w in zip(self.loaders, self.weights)
                  if l is not None and w > 0]
        return max(active) if active else 0

    def __iter__(self):
        iterators = [iter(l) if l is not None and w > 0 else None
                     for l, w in zip(self.loaders, self.weights)]
        completed = [it is None for it in iterators]
        while True:
            out = []
            for i, l in enumerate(self.loaders):
                if iterators[i] is None:
                    out.append(None)
                    continue
                try:
                    out.append(next(iterators[i]))
                except StopIteration:
                    completed[i] = True
                    if all(completed):
                        return
                    iterators[i] = iter(l)
                    try:
                        out.append(next(iterators[i]))
                    except StopIteration:
                        # zero-batch loader (dataset smaller than batch_size
                        # with drop_last): end the epoch cleanly like the
                        # reference multiloader's propagated StopIteration —
                        # PEP 479 would otherwise turn this into RuntimeError
                        return
            yield tuple(out)


multiloader = MultiLoader  # reference-compatible alias


def device_batch(batch):
    """Ship only the array fields the jitted steps consume (x, y, valid)."""
    import jax.numpy as jnp
    keep = {"x", "y", "valid"}
    return {k: jnp.asarray(v) for k, v in batch.items() if k in keep}


def device_prefetch(iterator, put, depth: int = 2):
    """Stay ``depth`` device transfers ahead of the consumer so H2D copies
    overlap with the running step (double buffering; the device queue is
    async, the host thread only pays enqueue cost)."""
    import collections
    buf = collections.deque()
    for item in iterator:
        buf.append(put(item))
        if len(buf) >= depth:
            yield buf.popleft()
    while buf:
        yield buf.popleft()
