"""Confusion-matrix plotting frontend (reference utils/plots.py parity).

The reference renders a seaborn heatmap figure and a wandb.Table of
actual-->predicted counts (/root/reference/utils/plots.py:7-27). Here the
heatmap is plain matplotlib (headless Agg, no seaborn dependency) and the
table is framework-free rows; both degrade gracefully when matplotlib is
absent from the image.
"""

from __future__ import annotations

import logging
from typing import List, Optional, Sequence, Tuple

import numpy as np

logger = logging.getLogger(__name__)


def _normalize(confusion: np.ndarray) -> np.ndarray:
    # reference normalizes by (1 + row sum) to dodge empty rows
    # (/root/reference/utils/plots.py:8-9)
    return confusion / (1 + confusion.sum(1, keepdims=True))


def plot_confusion_matrix(confusion, normalize: bool = True):
    """Heatmap figure of a (C, C) confusion matrix
    (/root/reference/utils/plots.py:7-13). Returns a matplotlib Figure, or
    None when matplotlib is unavailable."""
    try:
        import matplotlib
        matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt
    except ImportError:  # pragma: no cover - matplotlib is in this image
        logger.warning("matplotlib unavailable; skipping confusion heatmap")
        return None
    confusion = np.asarray(confusion, np.float64)
    if normalize:
        confusion = _normalize(confusion)
    fig, ax = plt.subplots(dpi=300)
    im = ax.imshow(confusion, cmap="viridis", aspect="auto",
                   interpolation="nearest")
    fig.colorbar(im, ax=ax)
    ax.set_xlabel("Predicted")
    ax.set_ylabel("Actual")
    return fig


def save_confusion_heatmap(confusion, path: str,
                           normalize: bool = True) -> bool:
    """Render ``plot_confusion_matrix`` straight to ``path`` (PNG). Returns
    whether a file was written."""
    fig = plot_confusion_matrix(confusion, normalize=normalize)
    if fig is None:
        return False
    try:
        fig.savefig(path, bbox_inches="tight")
    finally:
        import matplotlib.pyplot as plt
        plt.close(fig)
    return True


def generate_confusion_table(confusion, labels: Sequence[str],
                             normalize: bool = True,
                             ) -> List[Tuple[str, int]]:
    """actual-->predicted rows with nonzero counts — the reference's
    wandb.Table payload (/root/reference/utils/plots.py:16-27) as plain
    rows. NOTE the reference normalizes then casts ``.long()``, so with
    normalize=True only cells that round down to >=1 survive; reproduced."""
    confusion = np.asarray(confusion, np.float64)
    if normalize:
        confusion = confusion / confusion.sum(1, keepdims=True)
    confusion = confusion.astype(np.int64)
    data: List[Tuple[str, int]] = []
    for i, label_actual in enumerate(labels):
        for j, label_pred in enumerate(labels):
            if confusion[i][j] > 0:
                data.append((f"{label_actual} --> {label_pred}",
                             int(confusion[i][j])))
    return data


def heatmap_path(run_dir: str, task: str, which: str,
                 epoch: int) -> Optional[str]:
    import os.path as osp
    return osp.join(run_dir, f"confusion_{task}_{which}_ep{epoch}.png")
