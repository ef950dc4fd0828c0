"""Test-split prediction export (Ego4D challenge submissions).

The reference builds ``test_unannotated`` windows and carries the sample
identifiers precisely so predictions can be submitted to the Ego4D
benchmarks (/root/reference/data/ego4d_fho.py:340-347,396 for LTA;
/root/reference/data/ego4d_oscc.py:43-76 keeps ``unique_id`` and parent
frame metadata for OSCC/PNR), but the reference repo ships no writer for
any task. This module completes the flow for every task with an
unannotated split:

- **LTA** (official challenge JSON): ``{"<clip_uid>_<last_idx>":
  {"verb": [[...]*K], "noun": [[...]*K]}}`` with K=5 sampled sequences.
- **OSCC**: ``{"<unique_id>": {"state_change": bool, "prob_change": p}}``.
- **PNR**: ``{"<unique_id>": {"pnr_frame": f}}`` — the node argmax mapped
  back to an absolute parent-video frame with the same ``(end-start)/16``
  rule the localization meter uses
  (/root/reference/utils/meters/ego4d.py:356-366).

Usage::

    python -m egopack_tpu.predict resume_from=MTL_ar-lta-pnr \
        dataset_lta.root=data/ego4d validation_split=test_unannotated \
        task=lta output=lta_predictions.json
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .config import compose, default_config_dir, instantiate as _inst
from .data.loader import build_dataloader
from .eval.validate import _device_batch
from .train.checkpoint import (load_artifact, merge_loaded_params,
                               unpack_artifact)
from .utils.logging import setup_logging

logger = logging.getLogger(__name__)


def _only_key(node: dict) -> str:
    (key,) = node.keys()
    return key


def _infer_class_heads(payload: dict) -> Tuple[int, int]:
    """(n_verbs, n_nouns) from the artifact's AR classifier kernels — lets a
    pure OSCC/PNR predictor run without the fho_lta annotation files."""
    node = payload["task/recognition"]
    sizes = []
    for i in (0, 1):
        cls = node[f"cls{i}"]
        sizes.append(int(np.asarray(cls[_only_key(cls)]["kernel"]).shape[1]))
    return tuple(sizes)


class Predictor:
    """Artifact -> full system + jitted eval step for one primary task.

    Rebuilds exactly what ``evaluate.py`` does but from a SINGLE dataset (the
    primary task's test split) so prediction export does not require the other
    tasks' annotation files. Phase-2 artifacts bring their prototype banks and
    GraphONE convs along (reference main_egopack.py:453-459)."""

    def __init__(self, cfg, task: str):
        from .train.system import MultiTaskSystem, TaskSetup
        from .models.heads import (LTATask, OSCCTask, PNRTask,
                                   RecognitionTask)
        from .data.graphs import ar_spec, lta_spec, oscc_spec, pnr_spec

        assert cfg.resume_from, "predict requires resume_from=<artifact>"
        self.task = task
        self.cfg = cfg
        dset_key = {"ar": "dataset_recognition", "oscc": "dataset_oscc",
                    "lta": "dataset_lta", "pnr": "dataset_pnr"}[task]
        dset = _inst(cfg[dset_key], split=cfg.validation_split)
        self.dset = dset
        hidden = cfg.model.hidden_size
        # backbone segments-per-node is the AR/LTA sampling count (the driver
        # uses dataset_recognition.num_segments too; PNR's num_segments is its
        # NODE count — each node carries the frame feature repeated 3×)
        backbone = _inst(cfg.model, _recursive_=False,
                         input_size=dset.features_size,
                         num_segments=cfg.dataset_recognition.num_segments)

        loaded, meta = load_artifact(cfg.artifact_dir, cfg.resume_from)
        self.meta = meta
        # phase-2 artifacts carry aux classifiers on the primary head + the
        # prototype banks (reference main_egopack.py:453-459); rebuild them so
        # challenge predictions come from the full EgoPack model (same
        # reconstruction path as egopack_tpu.evaluate)
        (phase2, banks, graphone, aux_tasks, late_fusion,
         extra) = unpack_artifact(loaded, meta, cfg)
        self.aux = (tuple(t for t in aux_tasks if t != task)
                    if phase2 else None)
        if task in ("ar", "lta"):
            class_heads = dset.num_class_labels
        else:
            class_heads = _infer_class_heads(loaded)
        heads = {
            "ar": RecognitionTask(name_="ar", input_size=hidden,
                                  features_size=hidden, heads=class_heads,
                                  aux_tasks=self.aux if task == "ar" else None),
            "oscc": OSCCTask(name_="oscc", input_size=hidden,
                             features_size=(hidden if phase2
                                            else cfg.oscc_feat_size),
                             aux_tasks=self.aux if task == "oscc" else None),
            "lta": LTATask(name_="lta", input_size=hidden, features_size=hidden,
                           heads=class_heads,
                           aux_tasks=self.aux if task == "lta" else None),
            "pnr": PNRTask(name_="pnr", input_size=hidden, features_size=hidden,
                           aux_tasks=self.aux if task == "pnr" else None),
        }
        specs = {"ar": ar_spec(9, cfg.k), "oscc": oscc_spec(cfg.k),
                 "lta": lta_spec(k=cfg.k), "pnr": pnr_spec(16, cfg.k)}
        specs[task] = dset.graph_spec(cfg.k)
        lta_append = (dset.append_node if task == "lta"
                      else cfg.dataset_lta.get("append_node", "avg"))
        self.system = MultiTaskSystem(
            backbone, {n: TaskSetup(
                n, heads[n], specs[n],
                append_node=lta_append if n == "lta" else None)
                for n in heads})
        params = self.system.init_params(jax.random.PRNGKey(cfg.seed),
                                         dset.features_size)
        params = merge_loaded_params(params, loaded)
        params.update(extra)
        self.banks = banks or {}
        if phase2:
            logger.info("EgoPack artifact: predicting with %s-bank interaction",
                        "/".join(self.aux))
        self.params = params
        self.eval_step = self.system.make_eval_step(
            task, aux=self.aux or (), graphone=graphone,
            late_fusion=late_fusion)

    def loader(self):
        cfg = self.cfg
        return build_dataloader(self.dset, cfg.batch_size, False,
                                cfg.num_workers, False, seed=cfg.seed)


def predict_lta(cfg, output: str = "lta_predictions.json") -> Dict[str, dict]:
    setup_logging()
    p = Predictor(cfg, "lta")
    lta_head = p.system.tasks["lta"].head

    @jax.jit
    def sample(logits, key):
        return lta_head.generate_from_logits(logits, key)

    n_input = p.dset.n_input_clips
    predictions: Dict[str, dict] = {}
    rng = jax.random.PRNGKey(cfg.seed)
    for i, batch in enumerate(p.loader()):
        logits, _, _, _ = p.eval_step(p.params, _device_batch(batch), p.banks)
        preds, _ = sample(logits, jax.random.fold_in(rng, i))
        verbs = np.asarray(preds[0])  # (B, N, K)
        nouns = np.asarray(preds[1])
        valid = np.asarray(batch["valid"])
        for b in range(len(valid)):
            if not valid[b]:
                continue
            key = f"{batch['clip_uid'][b]}_{batch['last_idx'][b]}"
            predictions[key] = {
                "verb": verbs[b, n_input:].T.tolist(),  # (K, Z)
                "noun": nouns[b, n_input:].T.tolist(),
            }
    _write(predictions, output, "LTA")
    return predictions


def predict_oscc(cfg, output: str = "oscc_predictions.json") -> Dict[str, dict]:
    setup_logging()
    p = Predictor(cfg, "oscc")
    predictions: Dict[str, dict] = {}
    for batch in p.loader():
        logits, _, _, _ = p.eval_step(p.params, _device_batch(batch), p.banks)
        probs = jax.nn.softmax(jnp.asarray(logits), axis=-1)
        probs = np.asarray(probs)  # (B, 2)
        valid = np.asarray(batch["valid"])
        for b in range(len(valid)):
            if not valid[b]:
                continue
            predictions[str(batch["uid"][b])] = {
                "state_change": bool(probs[b, 1] > probs[b, 0]),
                "prob_change": float(probs[b, 1]),
            }
    _write(predictions, output, "OSCC")
    return predictions


def predict_pnr(cfg, output: str = "pnr_predictions.json") -> Dict[str, dict]:
    setup_logging()
    p = Predictor(cfg, "pnr")
    predictions: Dict[str, dict] = {}
    for batch in p.loader():
        logits, _, _, _ = p.eval_step(p.params, _device_batch(batch), p.banks)
        logits = np.asarray(logits)  # (B, 16)
        valid = np.asarray(batch["valid"])
        starts = np.asarray(batch["start_frame"])
        ends = np.asarray(batch["end_frame"])
        idx = logits.argmax(-1)
        # same mapping as the localization meter (reference ego4d.py:356-366)
        frames = starts + (ends - starts) / logits.shape[1] * idx
        for b in range(len(valid)):
            if not valid[b]:
                continue
            predictions[str(batch["uid"][b])] = {
                "pnr_frame": float(frames[b]),
            }
    _write(predictions, output, "PNR")
    return predictions


def _write(predictions: dict, output: str, label: str) -> None:
    with open(output, "w") as f:
        json.dump(predictions, f)
    logger.info("Wrote %d %s predictions to %s", len(predictions), label,
                output)


PREDICTORS = {"lta": predict_lta, "oscc": predict_oscc, "pnr": predict_pnr}


def main(argv: Optional[List[str]] = None) -> None:
    from .utils.platform import apply_env_platform
    apply_env_platform()
    argv = list(argv if argv is not None else sys.argv[1:])
    output = None
    task = "lta"
    overrides = []
    for a in argv:
        if a.startswith("output="):
            output = a.split("=", 1)[1]
        elif a.startswith("task="):
            task = a.split("=", 1)[1]
        else:
            overrides.append(a)
    assert task in PREDICTORS, (
        f"task={task} has no prediction writer (choose from "
        f"{sorted(PREDICTORS)}; AR windows come from the fho_lta annotations "
        "which ship no unannotated split)")
    cfg = compose(default_config_dir(), "defaults", overrides=overrides)
    PREDICTORS[task](cfg, output or f"{task}_predictions.json")


if __name__ == "__main__":
    main()
