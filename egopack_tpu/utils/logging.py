"""Run logging: console + JSONL metrics, wandb-compatible naming, optional
wandb passthrough when the package exists.

Replaces the reference's hard wandb coupling (/root/reference/main_temporal.py:
140-142, utils/wandb.py) with an offline-first logger. ``format_run_name``
reproduces ``format_wandb_run_name`` pattern substitution on the flattened
config (utils/wandb.py:5-24)."""

from __future__ import annotations

import json
import logging
import os
import os.path as osp
import time
from typing import Any, Dict, Optional

logger = logging.getLogger("egopack_tpu")


def flatten_cfg(d: Dict[str, Any], parent_key: str = "", sep: str = ".") -> Dict[str, Any]:
    items = {}
    for k, v in d.items():
        key = parent_key + sep + k if parent_key else k
        if isinstance(v, dict):
            items.update(flatten_cfg(v, key, sep))
        elif isinstance(v, list):
            items[key] = "-".join(str(x) for x in v)
        else:
            items[key] = v
    return items


def format_run_name(pattern: Optional[str], cfg: Dict[str, Any]) -> Optional[str]:
    """Substitute ``{dotted.key}`` tokens from the flattened config.

    str.format cannot address dotted keys (``{graphone.depth}`` parses as
    attribute access — a latent crash in the reference's
    ``format_wandb_run_name`` for exactly the patterns its own sweeps pass);
    plain token replacement handles every pattern the sweeps use."""
    if pattern is None:
        return None
    out = pattern
    for k, v in flatten_cfg(cfg).items():
        out = out.replace("{" + k + "}", str(v))
    return out


class RunLogger:
    """Console + metrics.jsonl; mirrors wandb.log's (dict, step) interface."""

    def __init__(self, output_dir: str, run_name: Optional[str] = None,
                 config: Optional[Dict[str, Any]] = None):
        self.run_name = run_name or time.strftime("run_%Y%m%d_%H%M%S")
        self.dir = osp.join(output_dir, self.run_name)
        # every run gets its OWN directory, like every wandb run gets its own
        # id: sweeps name runs by a pattern that often omits the seed, and
        # appending 3 seed runs into one metrics.jsonl silently turns the
        # reference's 3-seed mean±std protocol into n=1 (aggregate.py)
        if osp.exists(self.dir):
            i = 2
            while osp.exists(f"{self.dir}-{i}"):
                i += 1
            self.dir = f"{self.dir}-{i}"
        os.makedirs(self.dir)
        self._f = open(osp.join(self.dir, "metrics.jsonl"), "a")
        if config is not None:
            with open(osp.join(self.dir, "config.json"), "w") as f:
                json.dump(config, f, indent=2, default=str)
        # opt-in wandb passthrough (EGOPACK_WANDB=1 + wandb installed):
        # restores the reference's live dashboards without coupling to them
        self._wandb = None
        if os.environ.get("EGOPACK_WANDB") == "1":
            try:
                import wandb
                self._wandb = wandb.init(
                    project=os.environ.get("WANDB_PROJECT", "egopack_tpu"),
                    name=self.run_name, config=config, dir=self.dir)
            except Exception as e:  # offline-first: never fail the run
                logger.warning("wandb passthrough unavailable: %s", e)

    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None:
        record = {"step": step, "time": time.time()}
        record.update({k: _scalar(v) for k, v in metrics.items()})
        self._f.write(json.dumps(record, default=str) + "\n")
        self._f.flush()
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self) -> None:
        self._f.close()
        if self._wandb is not None:
            self._wandb.finish()


class NullLogger:
    """No-op RunLogger stand-in for non-zero multi-host processes."""

    dir = os.devnull

    def log(self, metrics, step=None):
        pass

    def close(self):
        pass


def _scalar(v):
    try:
        return float(v)
    except (TypeError, ValueError):
        return v


def setup_logging(level: int = logging.INFO) -> None:
    logging.basicConfig(
        level=level,
        format="[%(asctime)s][%(name)s][%(levelname)s] - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S")
