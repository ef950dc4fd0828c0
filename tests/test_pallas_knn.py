"""Pallas kNN kernel: exact parity with the XLA path (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from egopack_tpu.ops.knn import prototype_topk
from egopack_tpu.ops.pallas.knn_topk import cosine_knn_pallas


@pytest.mark.parametrize("m,p,k", [(37, 300, 4), (8, 128, 2), (130, 700, 8)])
def test_pallas_knn_matches_xla(m, p, k):
    rng = np.random.default_rng(m + p + k)
    f = jnp.asarray(rng.normal(size=(m, 64)), dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(size=(p, 64)), dtype=jnp.float32)
    mask = jnp.asarray(rng.random(p) < 0.8)
    idx_p, d_p = cosine_knn_pallas(f, bank, mask, k=k, m_tile=8, p_tile=128,
                                   interpret=True)
    idx_x, d_x = prototype_topk(f, bank, mask, k, impl="xla")
    np.testing.assert_array_equal(np.asarray(idx_p), np.asarray(idx_x))
    np.testing.assert_allclose(np.asarray(d_p), np.asarray(d_x), atol=1e-5)


def test_pallas_knn_never_selects_padding():
    rng = np.random.default_rng(0)
    f = jnp.asarray(rng.normal(size=(16, 32)), dtype=jnp.float32)
    bank = jnp.asarray(rng.normal(size=(256, 32)), dtype=jnp.float32)
    mask = jnp.asarray(np.arange(256) < 5)
    idx, d = cosine_knn_pallas(f, bank, mask, k=3, m_tile=8, p_tile=128,
                               interpret=True)
    assert (np.asarray(idx) < 5).all()
    assert np.isfinite(np.asarray(d)).all()
