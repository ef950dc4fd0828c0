"""Numerical parity against torch (CPU) for every loss and normalization the
reference relies on. These pin OUR implementations to the exact torch
semantics the reference's training dynamics depend on — without running any
reference code."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from egopack_tpu.ops.losses import (bce_with_logits, cross_entropy,
                                    sigmoid_focal_loss)


@pytest.fixture
def data(rng):
    logits = rng.normal(size=(12, 7)).astype(np.float32) * 3
    labels = rng.integers(0, 7, size=12).astype(np.int64)
    labels[3] = -1
    labels[9] = -1
    return logits, labels


def test_cross_entropy_matches_torch(data):
    logits, labels = data
    ours = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
    theirs = F.cross_entropy(torch.from_numpy(logits),
                             torch.from_numpy(labels),
                             reduction="none", ignore_index=-1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_label_smoothing_matches_torch(data):
    logits, labels = data
    ours = np.asarray(cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                    label_smoothing=0.1))
    theirs = F.cross_entropy(torch.from_numpy(logits),
                             torch.from_numpy(labels),
                             reduction="none", ignore_index=-1,
                             label_smoothing=0.1).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_bce_matches_torch(rng):
    logits = rng.normal(size=(16,)).astype(np.float32) * 4
    targets = rng.integers(0, 2, size=16).astype(np.float32)
    ours = np.asarray(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets)))
    theirs = F.binary_cross_entropy_with_logits(
        torch.from_numpy(logits), torch.from_numpy(targets),
        reduction="none").numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_focal_matches_torchvision_formula(rng):
    # torchvision.ops.sigmoid_focal_loss reference math, alpha=0.5 gamma=2
    logits = rng.normal(size=(8, 2)).astype(np.float32)
    targets = rng.integers(0, 2, size=(8, 2)).astype(np.float32)
    ours = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                         jnp.asarray(targets)))
    p = torch.sigmoid(torch.from_numpy(logits))
    t = torch.from_numpy(targets)
    ce = F.binary_cross_entropy_with_logits(torch.from_numpy(logits), t,
                                            reduction="none")
    p_t = p * t + (1 - p) * (1 - t)
    expected = (0.5 * t + 0.5 * (1 - t)) * ce * (1 - p_t) ** 2
    np.testing.assert_allclose(ours, expected.numpy(), rtol=1e-5, atol=1e-6)


def test_layernorm_matches_torch(rng):
    from egopack_tpu.models.layers import LayerNorm
    import jax

    x = rng.normal(size=(5, 16)).astype(np.float32) * 2 + 1
    ln = LayerNorm()
    params = ln.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(ln.apply(params, jnp.asarray(x)))
    theirs = F.layer_norm(torch.from_numpy(x), (16,)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=1e-5)


def test_adam_step_matches_torch(rng):
    """One optimizer step on identical params/grads: ours vs torch.optim.Adam
    (coupled weight decay)."""
    import jax
    from egopack_tpu.train import optim as topt

    w0 = rng.normal(size=(4, 3)).astype(np.float32)
    g = rng.normal(size=(4, 3)).astype(np.float32)

    ours_opt = topt.adam(lr=1e-3, weight_decay=1e-2)
    params = {"w": jnp.asarray(w0)}
    state = ours_opt.init(params)
    updates, _ = ours_opt.update({"w": jnp.asarray(g)}, state, params)
    ours = np.asarray(params["w"] + updates["w"])

    tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
    opt = torch.optim.Adam([tw], lr=1e-3, weight_decay=1e-2)
    tw.grad = torch.from_numpy(g.copy())
    opt.step()
    np.testing.assert_allclose(ours, tw.detach().numpy(), rtol=1e-5, atol=1e-7)


def test_cosine_annealing_matches_torch_scheduler():
    from egopack_tpu.train import optim as topt

    w = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.Adam([w], lr=1e-4)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(opt, T_max=40)
    ours = topt.build_lr_fn(1e-4, topt.cosine_annealing(40), False)
    for epoch in range(40):
        assert ours(epoch) == pytest.approx(sched.get_last_lr()[0], rel=1e-6)
        sched.step()
