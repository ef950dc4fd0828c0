"""Worker for the real 2-process jax.distributed test (test_multihost.py).

Each process: initialize the distributed runtime over localhost, build a
4-device global mesh (2 virtual CPU devices per process), load ITS shard of
the same global batch schedule, run one fused train step, print the loss and
a parameter checksum. The parent asserts both processes agree with each other
and with a single-process control run of the identical global batch.
"""

import json
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags +
                               " --xla_force_host_platform_device_count=2").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main() -> None:
    coord, n_proc, pid, root = (sys.argv[1], int(sys.argv[2]),
                                int(sys.argv[3]), sys.argv[4])
    artifact_dir = sys.argv[5] if len(sys.argv) > 5 else None
    if coord != "single":
        # through the production wrapper: its idempotency check must not
        # touch the XLA backend before jax.distributed.initialize runs
        from egopack_tpu.parallel import multihost as _mh
        _mh.initialize(coord, n_proc, pid)
        assert jax.process_count() == n_proc
    assert len(jax.devices()) == 2 * n_proc

    import numpy as np  # noqa: E402

    from egopack_tpu.config import compose, default_config_dir, instantiate
    from egopack_tpu.data.loader import build_dataloader
    from egopack_tpu.models.heads import RecognitionTask
    from egopack_tpu.models.backbone import TemporalGraph
    from egopack_tpu.parallel import mesh as pmesh
    from egopack_tpu.parallel import multihost as mh
    from egopack_tpu.train import optim as topt
    from egopack_tpu.train.system import MultiTaskSystem, TaskSetup
    from egopack_tpu.data import graphs as G

    cfg = compose(default_config_dir(), "defaults",
                  overrides=[f"dataset_recognition.root={root}",
                             f"dataset_lta.root={root}",
                             f"dataset_pnr.root={root}"])
    ds = instantiate(cfg.dataset_recognition, split="train")

    # (data=n_proc, model=2): every process owns BOTH model columns of its
    # data row, so batch-sharded-model-replicated eval outputs present two
    # identical-batch-slice addressable shards per process — exercising
    # local_block's dedupe (multihost + megatron TP on the TRN MLP)
    mesh = pmesh.make_mesh(n_proc, 2)
    hidden = 16
    backbone = TemporalGraph(input_size=ds.features_size, hidden_size=hidden,
                             depth=2, temporal_pooling={
                                 "_target_": "egopack_tpu.models.pooling.TRNPooling",
                                 "hidden_size": 16, "dropout": 0.0},
                             num_segments=3)
    from egopack_tpu.models.heads import LTATask, PNRTask
    ds_lta = instantiate(cfg.dataset_lta, split="val")
    # aux_tasks gives the AR head its aux classifiers (phase-2 style) for
    # the graphone-interact eval below; unused by the phase-1 train step
    head = RecognitionTask(name_="ar", input_size=hidden, features_size=hidden,
                           heads=ds.num_class_labels,
                           aux_tasks=("lta", "pnr"))
    lta_head = LTATask(name_="lta", input_size=hidden, features_size=hidden,
                       heads=ds_lta.num_class_labels)
    pnr_head = PNRTask(name_="pnr", input_size=hidden, features_size=hidden)
    system = MultiTaskSystem(backbone, {
        "ar": TaskSetup("ar", head, G.ar_spec(), 1.0),
        "lta": TaskSetup("lta", lta_head,
                         ds_lta.graph_spec(k=1.0), 1.0,
                         append_node=ds_lta.append_node),
        "pnr": TaskSetup("pnr", pnr_head, G.pnr_spec(16, 1.0), 1.0),
    })
    params = system.init_params(jax.random.PRNGKey(0), ds.features_size)
    params = pmesh.place_params(params, mesh)
    opt = topt.adam(1e-3, 0.0)
    opt_state = topt.init_opt_state(opt, params, mesh)
    step = system.make_train_step(opt, ("ar",))

    loader = build_dataloader(ds, 8, True, 0, True, seed=7,
                              process_shard=mh.process_shard())
    batch = next(iter(loader))
    batches = {"ar": mh.put_batch(batch, mesh)}
    params, opt_state, logs = step(params, opt_state, batches,
                                   jax.random.PRNGKey(1), 1e-3)
    jax.block_until_ready(params)

    # replicated outputs: identical on every process
    loss = float(logs["ar_loss"])
    checksum = float(sum(
        np.abs(np.asarray(jax.device_get(l))).sum()
        for l in jax.tree_util.tree_leaves(params)))

    # sharded validation: each process meters only its loader block; merged
    # meter logs must equal the single-process control exactly. Covers all
    # three fetch shapes: AR (tuple logits), LTA (tuple logits + sampled
    # prediction tensors with a K axis), PNR (scalar-logit grid + host-side
    # localization metadata fields)
    from egopack_tpu.eval.meters import build_meter_for_dataset
    from egopack_tpu.eval.validate import validate, validate_lta, validate_pnr
    sharded = n_proc > 1
    put = lambda b: mh.put_batch(b, mesh)  # noqa: E731
    val_logs = {}

    def scalars(meter):
        return {k: float(v) for k, v in meter.get_logs().items()
                if isinstance(v, (int, float, np.floating))}

    ds_val = instantiate(cfg.dataset_recognition, split="val")
    val_loader = build_dataloader(ds_val, 8, False, 0, False, seed=7,
                                  process_shard=mh.process_shard())
    meter = build_meter_for_dataset(ds_val)
    validate(system.make_eval_step("ar"), params, None, val_loader, meter,
             "ar", put=put, sharded=sharded)
    if sharded:
        mh.merge_meter(meter)
    val_logs.update({f"ar/{k}": v for k, v in scalars(meter).items()})

    lta_loader = build_dataloader(ds_lta, 8, False, 0, False, seed=7,
                                  process_shard=mh.process_shard())
    meter = build_meter_for_dataset(ds_lta)
    sample_fn = jax.jit(lta_head.generate_from_logits)
    validate_lta(system.make_eval_step("lta"), params, None, lta_loader,
                 meter, sample_fn, jax.random.PRNGKey(5), put=put,
                 sharded=sharded)
    if sharded:
        mh.merge_meter(meter)
    val_logs.update({f"lta/{k}": v for k, v in scalars(meter).items()})

    ds_pnr = instantiate(cfg.dataset_pnr, split="val")
    pnr_loader = build_dataloader(ds_pnr, 8, False, 0, False, seed=7,
                                  process_shard=mh.process_shard())
    meter = build_meter_for_dataset(ds_pnr)
    validate_pnr(system.make_eval_step("pnr"), params, None, pnr_loader,
                 meter, put=put, sharded=sharded)
    if sharded:
        mh.merge_meter(meter)
    val_logs.update({f"pnr/{k}": v for k, v in scalars(meter).items()})

    # sharded prototype-bank build: process-sharded loader + data-mesh
    # segment sums must reproduce the single-process control's banks exactly
    from egopack_tpu.models.graphone import (build_prototypes,
                                             make_prototype_step)
    nv, nn2 = ds.num_class_labels
    ploader = build_dataloader(ds, 8, False, 0, False, seed=7,
                               process_shard=mh.process_shard())
    pstep = make_prototype_step(system, ("lta", "pnr"), nv, nn2, mesh=mesh)
    pbanks = build_prototypes(pstep, params, ploader, nv, nn2, n_tasks=2,
                              mesh=mesh)
    proto = {"valid": int(next(iter(pbanks.values())).num_valid),
             "checksum": float(sum(np.abs(np.asarray(b.values)).sum()
                                   for b in pbanks.values()))}

    # GraphONE interaction over MODEL-AXIS-SHARDED prototype banks (the
    # long-context analog) under real multi-process TP: sharded AR eval
    # with aux interaction must also match the single-process control
    from egopack_tpu.models.graphone import GraphONE, PrototypeBank
    import jax.numpy as jnp
    brng = np.random.default_rng(11)
    banks = {}
    for t in ("lta", "pnr"):
        vals = brng.normal(size=(128, hidden)).astype(np.float32)
        bmask = np.zeros(128, bool)
        bmask[:37] = True
        banks[t] = PrototypeBank(jnp.asarray(vals), jnp.asarray(bmask))
    banks = pmesh.place_banks(banks, mesh)
    graphone = GraphONE(task_labels=("lta", "pnr"), features_size=hidden,
                        hidden_size=hidden, k=4, depth=1, residual=True)
    feats0 = {t: jnp.zeros((4, hidden)) for t in ("lta", "pnr")}
    params["graphone"] = graphone.init(jax.random.PRNGKey(6), feats0, banks,
                                       method="interact")["params"]
    params = pmesh.place_params(params, mesh)
    ego_loader = build_dataloader(ds_val, 8, False, 0, False, seed=7,
                                  process_shard=mh.process_shard())
    meter = build_meter_for_dataset(ds_val)
    validate(system.make_eval_step("ar", aux=("lta", "pnr"),
                                   graphone=graphone),
             params, banks, ego_loader, meter, "ar", put=put,
             sharded=sharded)
    if sharded:
        mh.merge_meter(meter)
    val_logs.update({f"ego/{k}": v for k, v in scalars(meter).items()})

    if artifact_dir:
        # regression for the artifact-save deadlock: save_artifact's shard
        # gather is a collective, so EVERY process must reach it (gating the
        # call on process 0 would hang it while the others exit)
        from egopack_tpu.train.checkpoint import save_artifact
        save_artifact(artifact_dir, "MTL_ar", dict(params))

    print(json.dumps({"pid": pid, "loss": loss, "checksum": checksum,
                      "val": val_logs, "proto": proto}),
          flush=True)


if __name__ == "__main__":
    main()
