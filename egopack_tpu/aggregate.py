"""Aggregate run metrics across seeds (the reference's evaluation protocol).

The reference instructs evaluating every metric as the average of three runs
(/root/reference/README.md:36-39, sweep seeds {65, 72, 97}). Each run here
writes ``<output_dir>/<run>/metrics.jsonl`` + ``config.json``; this tool
groups runs by their config (ignoring the seed), takes each run's FINAL value
per metric, and prints mean ± std across seeds.

Usage::

    python -m egopack_tpu.aggregate outputs/ [--metric val/oscc/accuracy]
"""

from __future__ import annotations

import json
import os
import os.path as osp
import sys
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

import numpy as np


def load_runs(output_dir: str) -> List[Tuple[dict, Dict[str, float]]]:
    runs = []
    for name in sorted(os.listdir(output_dir)):
        run_dir = osp.join(output_dir, name)
        metrics_path = osp.join(run_dir, "metrics.jsonl")
        config_path = osp.join(run_dir, "config.json")
        if not (osp.exists(metrics_path) and osp.exists(config_path)):
            continue
        with open(config_path) as f:
            config = json.load(f)
        final: Dict[str, float] = {}
        with open(metrics_path) as f:
            for line in f:
                rec = json.loads(line)
                for k, v in rec.items():
                    if k in ("step", "time"):
                        continue
                    if isinstance(v, (int, float)):
                        final[k] = float(v)  # last occurrence wins
        if final:
            runs.append((config, final))
    return runs


def _group_key(config: dict) -> str:
    cfg = {k: v for k, v in config.items() if k != "seed"}
    return json.dumps(cfg, sort_keys=True, default=str)


def _flatten(d: dict, prefix: str = "") -> Dict[str, str]:
    out: Dict[str, str] = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(_flatten(v, key + "."))
        else:
            out[key] = json.dumps(v, default=str)
    return out


def _distinguishing_keys(rep_configs: List[dict]) -> List[str]:
    """Flattened config keys whose values differ between groups — sweeps
    varying e.g. graphone.depth must not collapse into one output label."""
    flats = [_flatten(c) for c in rep_configs]
    keys = set().union(*(f.keys() for f in flats))
    return sorted(k for k in keys
                  if k != "seed"
                  and len({f.get(k) for f in flats}) > 1)


def aggregate(output_dir: str, metric: Optional[str] = None) -> Dict[str, dict]:
    """Group by config-minus-seed; mean ± std of each final metric."""
    groups: Dict[str, List[Tuple[dict, Dict[str, float]]]] = defaultdict(list)
    for config, final in load_runs(output_dir):
        groups[_group_key(config)].append((config, final))

    diff_keys = _distinguishing_keys([runs[0][0]
                                      for runs in groups.values()])
    out: Dict[str, dict] = {}
    for key, runs in groups.items():
        configs = [c for c, _ in runs]
        seeds = sorted(c.get("seed") for c in configs)
        flat0 = _flatten(configs[0])
        sweep = " ".join(f"{k}={flat0.get(k)}" for k in diff_keys)
        label = "{}{}(seeds {})".format(
            "-".join(map(str, configs[0].get("enabled_tasks", ["?"]))),
            f" [{sweep}] " if sweep else "", seeds)
        metrics: Dict[str, dict] = {}
        names = set().union(*(f.keys() for _, f in runs))
        for m in sorted(names):
            if metric and m != metric:
                continue
            vals = [f[m] for _, f in runs if m in f]
            metrics[m] = {"mean": float(np.mean(vals)),
                          "std": float(np.std(vals)), "n": len(vals)}
        out[label] = metrics
    return out


def main(argv=None) -> None:
    argv = list(argv if argv is not None else sys.argv[1:])
    metric = None
    if "--metric" in argv:
        i = argv.index("--metric")
        metric = argv[i + 1]
        del argv[i:i + 2]
    output_dir = argv[0] if argv else "outputs"
    result = aggregate(output_dir, metric)
    for label, metrics in result.items():
        print(f"== {label}")
        for m, s in metrics.items():
            print(f"  {m}: {s['mean']:.4f} ± {s['std']:.4f} (n={s['n']})")


if __name__ == "__main__":
    main()
