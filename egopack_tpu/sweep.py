"""Local grid-sweep runner for wandb-sweep-format experiment YAMLs.

The reference launches experiments through ``wandb sweep <yaml>``
(/root/reference/README.md:36, experiments/*.yaml). wandb is unavailable and
unnecessary: this runner expands the same YAML schema (``parameters.*.values``
grids + a ``command`` template) and executes each configuration locally,
sequentially, as ``python3 <program> <overrides>``.

Usage::

    python -m egopack_tpu.sweep experiments/mtl.yaml [--dry-run] [extra=override ...]
"""

from __future__ import annotations

import itertools
import subprocess
import sys
from typing import Any, Dict, List

import yaml


def _format_value(v: Any) -> str:
    if isinstance(v, list):
        return "[" + ",".join(str(x) for x in v) + "]"
    return str(v)


def expand_grid(spec: Dict[str, Any]) -> List[Dict[str, Any]]:
    params = spec.get("parameters", {})
    keys = list(params.keys())
    grids = [params[k]["values"] if "values" in params[k]
             else [params[k].get("value")] for k in keys]
    return [dict(zip(keys, combo)) for combo in itertools.product(*grids)]


def build_commands(spec: Dict[str, Any], extra: List[str] = ()) -> List[List[str]]:
    program = spec["program"]
    template = spec.get("command", ["${env}", "python3", "${program}",
                                    "${args_no_hyphens}"])
    # drop EVERY wandb placeholder (${env}, ${program}, ${args...},
    # ${interpreter}, ...) — the grid overrides below play the ${args} role;
    # a leaked literal "${interpreter}" would hit the CLI override parser
    static_args = [a for a in template
                   if not (a.startswith("${") and a.endswith("}"))
                   and a not in ("python3", "python")]
    commands = []
    for combo in expand_grid(spec):
        overrides = [f"{k}={_format_value(v)}" for k, v in combo.items()]
        commands.append([sys.executable, program, *static_args, *overrides,
                         *extra])
    return commands


def main(argv: List[str] = None) -> int:
    argv = list(argv if argv is not None else sys.argv[1:])
    dry = "--dry-run" in argv
    argv = [a for a in argv if a != "--dry-run"]
    yaml_path, *extra = argv
    with open(yaml_path) as f:
        spec = yaml.safe_load(f)
    commands = build_commands(spec, extra)
    print(f"Sweep '{spec.get('name', yaml_path)}': {len(commands)} runs")
    for i, cmd in enumerate(commands):
        print(f"[{i + 1}/{len(commands)}] {' '.join(cmd)}")
        if dry:
            continue
        ret = subprocess.call(cmd)
        if ret != 0:
            print(f"Run {i + 1} failed with exit code {ret}", file=sys.stderr)
            return ret
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
