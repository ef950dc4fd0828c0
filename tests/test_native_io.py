"""Native gather library: builds, matches the numpy fallback bit-for-bit,
and the datasets produce identical samples either way."""

import numpy as np
import pytest

from egopack_tpu.io import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native gather library unavailable (no g++?)")
    return lib


def test_gather_rows_matches_numpy(lib, rng):
    src = rng.normal(size=(100, 48)).astype(np.float32)
    idx = np.array([0, 5, 99, 120, -1, 3])  # incl. clamp + zero-fill
    out = native.gather_rows(src, idx)
    expect = np.take(src, np.clip(idx, 0, 99), axis=0).copy()
    expect[idx < 0] = 0
    np.testing.assert_array_equal(out, expect)


def test_gather_rows_multithreaded(lib, rng):
    src = rng.normal(size=(1000, 64)).astype(np.float32)
    idx = rng.integers(0, 1000, size=4096)
    out = native.gather_rows(src, idx, n_threads=4)
    np.testing.assert_array_equal(out, src[idx])


def test_gather_interp_matches_reference_math(lib, rng):
    src = rng.normal(size=(50, 32)).astype(np.float32)
    lo = np.array([0, 3, 10, 49])
    hi = np.array([0, 4, 11, 49])
    frac = np.array([0.0, 0.25, 0.75, 0.5], np.float32)
    out = native.gather_interp(src, lo, hi, frac)
    np.testing.assert_array_equal(out[0], src[0])   # lo==hi → exact copy
    np.testing.assert_array_equal(out[3], src[49])
    np.testing.assert_allclose(out[1], 0.75 * src[3] + 0.25 * src[4], rtol=1e-6)


def test_datasets_identical_with_and_without_native(ego4d_root, monkeypatch):
    from egopack_tpu.data import (Ego4dPNRDataset, Ego4dRecognitionDataset)

    ar = Ego4dRecognitionDataset("val", num_segments=3, root=ego4d_root)
    pnr = Ego4dPNRDataset("val", num_segments=16, root=ego4d_root)
    with_native = [ar.get(0)["x"], pnr.get(0)["x"]]
    monkeypatch.setattr(native, "get_lib", lambda: None)
    without = [ar.get(0)["x"], pnr.get(0)["x"]]
    for a, b in zip(with_native, without):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7)
