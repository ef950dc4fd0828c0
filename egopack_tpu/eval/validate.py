"""Validation loops (device forward + host meters).

Mirrors /root/reference/validate.py: ``validate`` (AR + OSCC), ``validate_lta``
(categorical sequence sampling), ``validate_pnr`` (keyframe localization). The
jitted eval step comes prebuilt from ``MultiTaskSystem.make_eval_step`` so each
epoch reuses one compiled program; meters consume numpy on host.

``sharded=True`` (multi-host): each process's loader materializes only its
block of every global batch; logits/features are fetched as this process's
addressable block and metered locally, while the per-batch loss is a global
on-device reduction (identical replicated scalar on every process). Meter
states merge at epoch end (multihost.merge_meter) so the final metrics equal
the single-process full-set metrics exactly.
"""

from __future__ import annotations

import jax
import numpy as np

from ..data.loader import device_batch as _device_batch
from ..ops.losses import masked_mean
from ..parallel.multihost import local_block
from .meters import BaseMeter

_device_masked_mean = jax.jit(masked_mean)


def _node_mask(batch) -> np.ndarray:
    valid = np.asarray(batch["valid"])
    n = batch["y"].shape[1] if batch["y"].ndim > 1 else None
    return np.repeat(valid[:, None], n, 1) if n else valid


def _host_masked_mean(per_elem, mask: np.ndarray) -> float:
    """ops.losses.masked_mean math in numpy: one D2H fetch of the per-element
    losses, zero eager device ops (each of which round-trips the remote-TPU
    tunnel — CLAUDE.md environment rules)."""
    pe = np.asarray(per_elem, np.float32)
    m = mask.astype(np.float32)
    return float((pe * m).sum() / max(m.sum(), 1.0))


def _batch_loss(per_elem, batch, dbatch, node_mask_dev, sharded: bool) -> float:
    """Per-batch scalar loss. Single-process: numpy over the fetched
    per-element losses. Sharded: the per-element array spans ALL processes'
    blocks, so the masked mean runs on device (GSPMD inserts the cross-host
    reduction; the scalar comes back replicated and identical everywhere)."""
    if sharded:
        mask = dbatch["valid"] if per_elem.ndim == 1 else node_mask_dev
        return float(_device_masked_mean(per_elem, mask))
    return _host_masked_mean(
        per_elem,
        np.asarray(batch["valid"]) if per_elem.ndim == 1 else _node_mask(batch))


def _fetcher(sharded: bool):
    return local_block if sharded else np.asarray


def _pre_features(batch, valid) -> np.ndarray:
    """The reference's pre-feature convention (validate.py:54-57): segment-mean
    of the raw input when x has a segment axis, x itself otherwise. Compact
    layouts are equivalent here: PNR ships un-repeated (B, N, D) frames whose
    S-fold repeat has the frame itself as segment-mean; LTA ships only the
    real input clips — the forecast nodes the loader would fill are broadcasts
    of the input mean, i.e. one duplicated t-SNE point per sample."""
    x = np.asarray(batch["x"])[valid]
    return x.mean(-2) if x.ndim == 4 else x


def validate(eval_step, params, banks, loader, meter: BaseMeter,
             task_name: str, put=None, sharded: bool = False) -> BaseMeter:
    """Task-generic eval (AR, OSCC) — /root/reference/validate.py:14-60.

    ``put`` places a host batch on device(s); the drivers pass a mesh-sharding
    variant so eval rides the same DP mesh as training."""
    put = put or _device_batch
    fetch = _fetcher(sharded)
    for batch in loader:
        dbatch = put(batch)
        logits, per_elem, feat, nm = eval_step(params, dbatch, banks)
        valid = np.asarray(batch["valid"])
        loss = _batch_loss(per_elem, batch, dbatch, nm, sharded)
        y = np.asarray(batch["y"])
        if meter.save_features:
            # reference: pre = raw segment-mean, post = task-projected
            # (stacked with interacted aux, in the graphone case) features
            # (/root/reference/validate.py:43,52-56)
            meter.update_features(_pre_features(batch, valid),
                                  fetch(feat)[valid])
        if task_name == "ar":
            v = fetch(logits[0])[valid].reshape(-1, logits[0].shape[-1])
            n = fetch(logits[1])[valid].reshape(-1, logits[1].shape[-1])
            meter.update((v, n), y[valid].reshape(-1, 2), loss)
        elif task_name == "oscc":
            meter.update(fetch(logits)[valid], y[valid], loss)
        else:
            raise ValueError(task_name)
    return meter


def validate_lta(eval_step, params, banks, loader, meter: BaseMeter,
                 sample_fn, rng: jax.Array, put=None,
                 sharded: bool = False) -> BaseMeter:
    """LTA eval with K=5 categorical samples per node
    (/root/reference/validate.py:63-106)."""
    put = put or _device_batch
    fetch = _fetcher(sharded)
    for i, batch in enumerate(loader):
        dbatch = put(batch)
        logits, per_elem, feat, nm = eval_step(params, dbatch, banks)
        preds, logits = sample_fn(logits, jax.random.fold_in(rng, i))
        valid = np.asarray(batch["valid"])
        loss = _batch_loss(per_elem, batch, dbatch, nm, sharded)
        y = np.asarray(batch["y"])
        if meter.save_features:
            # the reference's LTA loop never passes features to the meter
            # (validate.py:107 drops them) though its BaseMeter supports it;
            # this extends the base convention to LTA (PARITY.md)
            meter.update_features(_pre_features(batch, valid),
                                  fetch(feat)[valid])
        flat = lambda a: fetch(a)[valid].reshape((-1,) + a.shape[2:])
        meter.update((flat(logits[0]), flat(logits[1])),
                     y[valid].reshape(-1, 2),
                     (flat(preds[0]), flat(preds[1])), loss)
    return meter


def validate_pnr(eval_step, params, banks, loader, meter: BaseMeter,
                 put=None, sharded: bool = False) -> BaseMeter:
    """PNR eval with localization metadata
    (/root/reference/validate.py:109-150)."""
    put = put or _device_batch
    fetch = _fetcher(sharded)
    for batch in loader:
        dbatch = put(batch)
        logits, per_elem, feat, nm = eval_step(params, dbatch, banks)
        valid = np.asarray(batch["valid"])
        loss = _batch_loss(per_elem, batch, dbatch, nm, sharded)
        if meter.save_features:
            # reference's PNR loop drops features (validate.py:150) though
            # its BaseMeter supports them; extended here (PARITY.md)
            meter.update_features(_pre_features(batch, valid),
                                  fetch(feat)[valid])
        meter.update(fetch(logits)[valid],
                     np.asarray(batch["y"])[valid], loss,
                     start_frame=np.asarray(batch["start_frame"])[valid],
                     end_frame=np.asarray(batch["end_frame"])[valid],
                     pnr_frame=np.asarray(batch["pnr_frame"])[valid])
    return meter
