"""``_target_`` instantiation, mirroring ``hydra.utils.instantiate``.

The reference instantiates datasets, the backbone, the optimizer and the LR
scheduler from config (``/root/reference/main_temporal.py:168,249,265,274``).
This module provides the same contract: a config node with a ``_target_`` key
names a callable by dotted path; remaining keys become kwargs, with call-site
kwargs taking precedence. ``_recursive_=False`` leaves nested nodes as configs
(the reference relies on this for ``model.temporal_pooling``,
``/root/reference/models/graph.py:33``).
"""

from __future__ import annotations

import importlib
from typing import Any

from .loader import ConfigNode


def locate(path: str) -> Any:
    """Import a dotted path to a callable/class."""
    module_path, _, attr = path.rpartition(".")
    if not module_path:
        raise ValueError(f"Cannot locate target: {path!r}")
    module = importlib.import_module(module_path)
    return getattr(module, attr)


def instantiate(cfg: Any, *args: Any, _recursive_: bool = True, **kwargs: Any) -> Any:
    if cfg is None:
        return None
    if not isinstance(cfg, dict):
        raise TypeError(f"instantiate expects a config node, got {type(cfg)}")
    if "_target_" not in cfg:
        raise ValueError("Config node has no _target_ key")

    recursive = cfg.get("_recursive_", _recursive_)
    call_kwargs = {}
    for k, v in cfg.items():
        if k in ("_target_", "_recursive_"):
            continue
        if recursive and isinstance(v, dict) and "_target_" in v:
            v = instantiate(v)
        call_kwargs[k] = v
    call_kwargs.update(kwargs)

    target = locate(cfg["_target_"])
    return target(*args, **call_kwargs)


__all__ = ["instantiate", "locate", "ConfigNode"]
