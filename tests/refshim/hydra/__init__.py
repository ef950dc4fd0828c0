"""Minimal hydra shim: utils.instantiate for _target_-style config nodes."""

import importlib
from types import SimpleNamespace


def _instantiate(config, *args, **kwargs):
    cfg = dict(config)
    target = cfg.pop("_target_")
    module, _, name = target.rpartition(".")
    cls = getattr(importlib.import_module(module), name)
    cfg.update(kwargs)
    return cls(*args, **cfg)


utils = SimpleNamespace(instantiate=_instantiate)
