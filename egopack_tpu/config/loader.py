"""Hydra-compatible configuration system (lightweight, dependency-free).

The reference drives every experiment through hydra + OmegaConf
(``/root/reference/main_temporal.py:137`` uses ``@hydra.main(config_path="configs/",
config_name="defaults")``; sweep YAMLs emit ``key=value`` CLI overrides,
``/root/reference/experiments/mtl.yaml:19-39``). hydra is not available in this
image, so this module implements the subset of behavior the reference relies on:

- a config tree rooted at ``configs/defaults.yaml``
- a ``defaults:`` list with config groups (``model: graph``) and ``_self_``
- ``${path.to.key}`` interpolation (``configs/defaults.yaml:24`` in the reference
  uses ``T_max: ${num_epochs}``)
- dotted CLI overrides ``a.b.c=value`` including group overrides ``model=graph``
  and ``group/subgroup=name`` selections
- values parsed with YAML semantics (ints, floats, bools, lists)
"""

from __future__ import annotations

import copy
import os
import os.path as osp
import re
from typing import Any, Dict, List, Optional

import yaml


class ConfigNode(dict):
    """A dict with attribute access, mirroring OmegaConf's DictConfig surface."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - mirrors attribute protocol
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigNode({k: copy.deepcopy(v, memo) for k, v in self.items()})


_NUM_RE = re.compile(r"^[+-]?(\d+\.?\d*|\.\d+)[eE][+-]?\d+$")


def _coerce(obj: Any) -> Any:
    # YAML 1.1 parses '1e-5' (no dot) as a string; OmegaConf/hydra treat it as
    # a float — match that
    if isinstance(obj, str) and _NUM_RE.match(obj):
        return float(obj)
    return obj


def _wrap(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigNode({k: _wrap(v) for k, v in obj.items()})
    if isinstance(obj, list):
        return [_wrap(v) for v in obj]
    return _coerce(obj)


def to_container(cfg: Any) -> Any:
    """Plain-dict view of a config tree (OmegaConf.to_container equivalent)."""
    if isinstance(cfg, dict):
        return {k: to_container(v) for k, v in cfg.items()}
    if isinstance(cfg, list):
        return [to_container(v) for v in cfg]
    return cfg


def _merge(dst: ConfigNode, src: Dict[str, Any]) -> ConfigNode:
    for k, v in src.items():
        if isinstance(v, dict) and isinstance(dst.get(k), dict):
            _merge(dst[k], v)
        else:
            dst[k] = _wrap(v)
    return dst


def _get_path(cfg: Any, path: str) -> Any:
    node = cfg
    for part in path.split("."):
        node = node[part]
    return node


def _set_path(cfg: ConfigNode, path: str, value: Any) -> None:
    parts = path.split(".")
    node = cfg
    for part in parts[:-1]:
        if part not in node or not isinstance(node[part], dict):
            node[part] = ConfigNode()
        node = node[part]
    node[parts[-1]] = _wrap(value)


_INTERP_RE = re.compile(r"\$\{([a-zA-Z0-9_.]+)\}")


def _resolve_interpolations(cfg: ConfigNode) -> None:
    """Resolve ``${a.b}`` references against the config root (recursively)."""

    def resolve_value(v: Any) -> Any:
        if isinstance(v, str):
            full = _INTERP_RE.fullmatch(v)
            if full:
                return resolve_value(_get_path(cfg, full.group(1)))
            return _INTERP_RE.sub(lambda m: str(resolve_value(_get_path(cfg, m.group(1)))), v)
        return v

    def walk(node: Any) -> Any:
        if isinstance(node, dict):
            for k in list(node.keys()):
                node[k] = walk(node[k])
            return node
        if isinstance(node, list):
            return [walk(v) for v in node]
        return resolve_value(node)

    walk(cfg)


def _parse_value(raw: str) -> Any:
    try:
        return yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw


def _load_yaml(path: str) -> Dict[str, Any]:
    with open(path, "r") as f:
        return yaml.safe_load(f) or {}


def _compose(config_dir: str, name: str, group_overrides: Dict[str, str]) -> ConfigNode:
    """Compose a config file with its ``defaults:`` list (depth-first).

    ``name`` is relative to ``config_dir``; nested group entries resolve
    relative to the current file's directory (hydra semantics: the group
    ``temporal_pooling`` inside ``model/graph.yaml`` loads
    ``model/temporal_pooling/<choice>.yaml``). Overrides address groups by
    absolute path (``model/temporal_pooling=trn``).
    """
    path = osp.join(config_dir, name + ".yaml")
    raw = _load_yaml(path)
    defaults: List[Any] = raw.pop("defaults", [])
    base = osp.dirname(name)

    cfg = ConfigNode()
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            _merge(cfg, raw)
            self_merged = True
            continue
        if isinstance(entry, dict):
            (group, choice), = entry.items()
            group = str(group)
            if group.startswith("override "):
                # hydra logging overrides — no-op in this implementation
                continue
            abs_group = osp.join(base, group) if base else group
            # check the absolute path first WITHOUT eagerly consuming the
            # bare-name form (the eager fallback would silently swallow an
            # override meant for a different group sharing the last segment)
            if abs_group in group_overrides:
                choice = group_overrides.pop(abs_group)
            elif group in group_overrides:
                choice = group_overrides.pop(group)
            if choice is None:
                continue
            sub = _compose(config_dir, osp.join(abs_group, str(choice)),
                           group_overrides)
            node = cfg.setdefault(group.split("/")[-1], ConfigNode())
            _merge(node, sub)
    if not self_merged:
        _merge(cfg, raw)
    return cfg


def compose(config_dir: str, config_name: str = "defaults",
            overrides: Optional[List[str]] = None) -> ConfigNode:
    """Compose the final config: defaults tree + group choices + dotted overrides.

    ``overrides`` is a list of ``key=value`` strings in hydra CLI syntax
    (e.g. ``["model=graph", "model/temporal_pooling=trn", "k=1",
    "model.hidden_size=1024", "enabled_tasks=[ar,oscc,lta]"]``).
    """
    overrides = list(overrides or [])
    group_overrides: Dict[str, str] = {}
    value_overrides: List[tuple] = []

    for ov in overrides:
        ov = ov.lstrip("+")
        if "=" not in ov:
            raise ValueError(f"Malformed override (expected key=value): {ov!r}")
        key, _, raw = ov.partition("=")
        raw = raw.strip().strip("'\"")
        if "/" in key or ("." not in key and osp.isdir(osp.join(config_dir, key))):
            group_overrides[key] = raw
        else:
            value_overrides.append((key, _parse_value(raw)))

    cfg = _compose(config_dir, config_name, group_overrides)
    if group_overrides:
        # group overrides that did not match a defaults entry: compose directly
        for group, choice in group_overrides.items():
            sub = _compose(config_dir, osp.join(group, choice), {})
            node = cfg
            for part in group.split("/")[:-1]:
                node = node.setdefault(part, ConfigNode())
            _merge(node.setdefault(group.split("/")[-1], ConfigNode()), sub)

    for key, value in value_overrides:
        _set_path(cfg, key, value)

    _resolve_interpolations(cfg)
    return cfg


def default_config_dir() -> str:
    """Config tree location: ``EGOPACK_CONFIG_DIR`` env var if set (installed
    packages), else the repo-root ``configs/`` directory."""
    env = os.environ.get("EGOPACK_CONFIG_DIR")
    if env:
        return env
    return osp.join(osp.dirname(osp.dirname(osp.dirname(osp.abspath(__file__)))), "configs")
