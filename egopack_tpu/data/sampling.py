"""Frame-index samplers for clip features.

Semantics match /root/reference/data/base_dataset.py:128-155 exactly (golden
tests pin them): ``random_sampling_indices`` places n jittered strided indices,
``uniform_sampling_indices`` places n strided indices offset to segment centers.
These run host-side in the data pipeline (tiny, numpy) — the device never sees
dynamic shapes.
"""

from __future__ import annotations

import numpy as np


def random_sampling_indices(size: int, n: int, rng: np.random.Generator) -> np.ndarray:
    """Jittered strided sampling of ``n`` indices in ``[0, size]``.

    Parity: reference clips to ``size`` (not ``size - 1``) and rounds, so an
    index equal to ``size`` is possible when the jitter lands at the boundary —
    callers slice with ``min(idx, len-1)`` exactly like ``np.take`` on the
    reference path would raise and fall into its zero-fill guard. We reproduce
    the index math verbatim and let the caller apply the same guard.
    """
    average_duration = size // n
    if average_duration > 0:
        indices = np.multiply(list(range(n)), size / n)
        indices = indices + rng.integers(0, average_duration, size=n)
        indices = np.clip(indices, 0, size)
    else:
        indices = np.linspace(0, size, n, endpoint=False, dtype=int)
    return np.round(indices).astype(int)


def uniform_sampling_indices(size: int, n: int) -> np.ndarray:
    offsets = np.linspace(0, size, n, endpoint=False, dtype=int)
    offsets = offsets + (size // n // 2)
    return offsets.astype(int)


def random_sampling(data: np.ndarray, num_segments: int,
                    rng: np.random.Generator) -> np.ndarray:
    indices = random_sampling_indices(data.shape[0], num_segments, rng)
    return np.take(data, indices, axis=0)


def uniform_sampling(data: np.ndarray, num_segments: int) -> np.ndarray:
    indices = uniform_sampling_indices(data.shape[0], num_segments)
    return np.take(data, indices, axis=0)
