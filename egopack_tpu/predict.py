"""LTA test-split prediction export (Ego4D challenge submission format).

The reference's LTA dataset builds ``test_unannotated`` windows and carries
``(clip_uid, last_idx)`` precisely so predictions can be submitted to the
Ego4D Long-Term Anticipation benchmark (/root/reference/data/ego4d_fho.py:
340-347,396), but the reference repo ships no writer. This module completes
the flow: load an artifact, run the LTA loader, sample K=5 sequences per
window and emit the challenge JSON
``{"<clip_uid>_<last_idx>": {"verb": [[...]*K], "noun": [[...]*K]}}``.

Usage::

    python -m egopack_tpu.predict resume_from=MTL_ar-lta-pnr \
        dataset_lta.root=data/ego4d validation_split=test_unannotated \
        output=lta_predictions.json
"""

from __future__ import annotations

import json
import logging
import sys
from typing import Dict, List

import jax
import numpy as np

from .config import compose, default_config_dir
from .data.loader import build_dataloader
from .eval.validate import _device_batch
from .train.checkpoint import load_artifact, merge_loaded_params
from .utils.logging import setup_logging

logger = logging.getLogger(__name__)


def predict_lta(cfg, output: str = "lta_predictions.json") -> Dict[str, dict]:
    setup_logging()
    assert cfg.resume_from, "predict requires resume_from=<artifact>"
    # only the LTA dataset is needed (cfg.validation_split picks the split,
    # e.g. test_unannotated)
    from .train.system import MultiTaskSystem, TaskSetup
    from .models.heads import LTATask, OSCCTask, PNRTask, RecognitionTask
    from .config import instantiate as _inst

    dset = _inst(cfg.dataset_lta, split=cfg.validation_split)
    hidden = cfg.model.hidden_size
    backbone = _inst(cfg.model, _recursive_=False,
                     input_size=dset.features_size,
                     num_segments=cfg.dataset_lta.num_segments)

    loaded, meta = load_artifact(cfg.artifact_dir, cfg.resume_from)
    loaded.pop("epoch", None)
    bank_vals = loaded.pop("graphone_banks", None)
    bank_masks = loaded.pop("graphone_bank_masks", None)
    gparams = loaded.pop("graphone", None)
    phase2 = gparams is not None
    assert not phase2 or (bank_vals is not None and bank_masks is not None), (
        "EgoPack artifact lacks prototype banks; it predates the complete "
        "phase-2 artifact format and cannot be used for prediction")

    # phase-2 artifacts carry aux classifiers on the LTA head + the
    # prototype banks (reference main_egopack.py:453-459); rebuild them so
    # challenge predictions come from the full EgoPack model
    aux_tasks = tuple(meta.get("aux_tasks") or
                      (sorted(bank_vals) if bank_vals else ()))
    lta_aux = tuple(t for t in aux_tasks if t != "lta") if phase2 else None
    heads = {
        "ar": RecognitionTask(name_="ar", input_size=hidden,
                              features_size=hidden,
                              heads=dset.num_class_labels),
        "oscc": OSCCTask(name_="oscc", input_size=hidden,
                         features_size=(hidden if phase2
                                        else cfg.oscc_feat_size)),
        "lta": LTATask(name_="lta", input_size=hidden, features_size=hidden,
                       heads=dset.num_class_labels, aux_tasks=lta_aux),
        "pnr": PNRTask(name_="pnr", input_size=hidden, features_size=hidden),
    }
    from .data.graphs import ar_spec, oscc_spec, pnr_spec
    specs = {"ar": ar_spec(9, cfg.k), "oscc": oscc_spec(cfg.k),
             "lta": dset.graph_spec(cfg.k), "pnr": pnr_spec(16, cfg.k)}
    system = MultiTaskSystem(
        backbone, {n: TaskSetup(n, heads[n], specs[n]) for n in heads})
    params = system.init_params(jax.random.PRNGKey(cfg.seed),
                                dset.features_size)
    params = merge_loaded_params(params, loaded)

    banks = {}
    graphone = None
    if phase2:
        from .config import to_container
        from .models.graphone import GraphONE, PrototypeBank
        import jax.numpy as jnp
        banks = {t: PrototypeBank(jnp.asarray(bank_vals[t]),
                                  jnp.asarray(bank_masks[t]))
                 for t in bank_vals}
        gcfg = dict(meta.get("graphone") or to_container(cfg.graphone))
        graphone = GraphONE(task_labels=aux_tasks, features_size=hidden,
                            **gcfg)
        params["graphone"] = gparams
        if not gcfg.get("freeze", True):
            params["graphone_banks"] = {t: jnp.asarray(v)
                                        for t, v in bank_vals.items()}
        logger.info("EgoPack artifact: predicting with %s-bank interaction",
                    "/".join(lta_aux))

    loader = build_dataloader(dset, cfg.batch_size, False, cfg.num_workers,
                              False, seed=cfg.seed)
    eval_step = system.make_eval_step(
        "lta", aux=lta_aux or (), graphone=graphone,
        late_fusion=bool(meta.get("late_fusion", cfg.late_fusion)))
    lta_head = system.tasks["lta"].head

    @jax.jit
    def sample(logits, key):
        return lta_head.generate_from_logits(logits, key)

    n_input = dset.n_input_clips
    predictions: Dict[str, dict] = {}
    rng = jax.random.PRNGKey(cfg.seed)
    for i, batch in enumerate(loader):
        logits, _, _, _ = eval_step(params, _device_batch(batch), banks)
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
    with open(output, "w") as f:
        json.dump(predictions, f)
    logger.info("Wrote %d LTA predictions to %s", len(predictions), output)
    return predictions


def main(argv: List[str] = None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    output = "lta_predictions.json"
    overrides = []
    for a in argv:
        if a.startswith("output="):
            output = a.split("=", 1)[1]
        else:
            overrides.append(a)
    cfg = compose(default_config_dir(), "defaults", overrides=overrides)
    predict_lta(cfg, output)


if __name__ == "__main__":
    main()
