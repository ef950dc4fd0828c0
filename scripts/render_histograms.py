#!/usr/bin/env python3
"""Render a histograms_ep{N}.npz snapshot (log_histograms_every) to a PNG.

The training drivers write per-parameter gradient/weight histograms as NPZ
(driver._emit_histograms — the file-artifact analog of wandb.watch's
histogram panels). This offline renderer turns one snapshot into a grid of
bar plots, largest-|gradient| parameters first, so the "which layer
exploded/vanished" question the reference answers in the wandb UI is one
command here:

    python scripts/render_histograms.py <run_dir>/histograms_ep40.npz
    python scripts/render_histograms.py snap.npz --prefix param_hist --top 24
"""

import argparse
import os
import sys

import numpy as np


def render(npz_path: str, prefix: str = "grad_hist", top: int = 24,
           out: str = None) -> str:
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    data = np.load(npz_path)
    names = sorted({k[len(prefix) + 1:-len(":counts")] for k in data.files
                    if k.startswith(prefix + "/") and k.endswith(":counts")})
    if not names:
        raise SystemExit(f"no '{prefix}/' histograms in {npz_path} "
                         f"(prefixes: grad_hist, param_hist)")

    def mass(n):  # total |value| mass estimate from bin centers
        c = data[f"{prefix}/{n}:counts"].astype(np.float64)
        e = data[f"{prefix}/{n}:edges"]
        return float(np.abs((e[:-1] + e[1:]) / 2).dot(c))

    names = sorted(names, key=mass, reverse=True)[:top]
    cols = 4
    rows = (len(names) + cols - 1) // cols
    fig, axes = plt.subplots(rows, cols, figsize=(4 * cols, 2.2 * rows),
                             squeeze=False)
    for ax, name in zip(axes.flat, names):
        c = data[f"{prefix}/{name}:counts"]
        e = data[f"{prefix}/{name}:edges"]
        ax.bar((e[:-1] + e[1:]) / 2, c, width=np.diff(e), align="center")
        ax.set_title(name, fontsize=7)
        ax.tick_params(labelsize=6)
    for ax in axes.flat[len(names):]:
        ax.axis("off")
    fig.suptitle(f"{prefix} — {os.path.basename(npz_path)}", fontsize=10)
    fig.tight_layout()
    out = out or os.path.splitext(npz_path)[0] + f"_{prefix}.png"
    fig.savefig(out, dpi=110, bbox_inches="tight")
    plt.close(fig)
    return out


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("npz")
    ap.add_argument("--prefix", default="grad_hist",
                    choices=["grad_hist", "param_hist"])
    ap.add_argument("--top", type=int, default=24,
                    help="plot the N largest-mass parameters")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    print(render(args.npz, args.prefix, args.top, args.out))


if __name__ == "__main__":
    sys.exit(main())
