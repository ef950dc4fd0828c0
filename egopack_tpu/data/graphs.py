"""Static temporal-graph structure.

The reference builds per-sample edge lists with ``RadiusGraph(r=k+0.5)`` over
integer positions (/root/reference/main_temporal.py:168) and, for LTA, extra
edges from the last ``floor(r)`` input clips to every forecast node
(/root/reference/models/transforms/lta_temp_connectivity.py:37-56). Because
every task uses a fixed node count (AR 9, OSCC 4, PNR 16, LTA 22) and integer
chain positions, the edge structure is *static* per task — except for a
data-dependent quirk in the LTA transform (see ``lta_adjacency``).

TPU-native design: graphs are dense in-neighbor masks ``A[t, s] = 1`` iff node
``s`` sends a message to node ``t``. Message passing becomes a masked matmul;
no torch_cluster / dynamic scatter kernels exist anywhere on the device path.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np


@dataclass(frozen=True)
class GraphSpec:
    """Static description of one task's temporal graph."""

    name: str
    num_nodes: int
    pos: np.ndarray  # (N,) float — node positions fed to the positional encoding
    adjacency: np.ndarray  # (N, N) bool in-neighbor mask (radius graph part)
    lta_extra: bool = False  # whether LTA forecast edges are appended in-jit
    radius: float = 1.5
    num_input_clips: int = 0


def radius_adjacency(pos: np.ndarray, r: float) -> np.ndarray:
    """Dense equivalent of ``radius_graph(pos, r, loop=False)``: symmetric
    in-neighbor mask over integer positions."""
    pos = np.asarray(pos, dtype=np.float64).reshape(-1)
    d = np.abs(pos[:, None] - pos[None, :])
    adj = (d <= r) & ~np.eye(len(pos), dtype=bool)
    return adj


def ar_spec(window_size: int = 9, k: float = 1.0) -> GraphSpec:
    # AR positions are centered: arange(window) - window//2
    # (/root/reference/data/ego4d_fho.py:224)
    pos = np.arange(window_size, dtype=np.float32) - window_size // 2
    return GraphSpec("ar", window_size, pos, radius_adjacency(pos, k + 0.5),
                     radius=k + 0.5)


def oscc_spec(k: float = 1.0) -> GraphSpec:
    pos = np.arange(4, dtype=np.float32)  # /root/reference/data/ego4d_oscc.py:223
    return GraphSpec("oscc", 4, pos, radius_adjacency(pos, k + 0.5), radius=k + 0.5)


def pnr_spec(num_segments: int = 16, k: float = 1.0) -> GraphSpec:
    pos = np.arange(num_segments, dtype=np.float32)
    return GraphSpec("pnr", num_segments, pos, radius_adjacency(pos, k + 0.5),
                     radius=k + 0.5)


def lta_spec(num_input_clips: int = 2, num_forecast_clips: int = 20,
             k: float = 1.0) -> GraphSpec:
    n = num_input_clips + num_forecast_clips
    pos = np.arange(n, dtype=np.float32)
    return GraphSpec("lta", n, pos, radius_adjacency(pos, k + 0.5),
                     lta_extra=True, radius=k + 0.5,
                     num_input_clips=num_input_clips)


def lta_extra_adjacency_host(spec: GraphSpec, y_verb: np.ndarray) -> np.ndarray:
    """Host/reference-semantics LTA forecast edges for one sample.

    Parity quirk (/root/reference/models/transforms/lta_temp_connectivity.py:49-55):
    the number of forecast targets is ``(y[:, 0] > 0).sum()`` — *strictly*
    positive — so forecast clips whose verb label is 0 shrink the target range.
    Sources are the last ``floor(r)`` input clips (count of ``y[:, 0] == -1``);
    edges are directed source→target only.
    """
    n = spec.num_nodes
    adj = np.zeros((n, n), dtype=bool)
    num_input = int((y_verb == -1).sum())
    num_forecast = int((y_verb > 0).sum())
    src_lo = max(math.ceil(num_input - spec.radius), 0)
    n_src = min(math.floor(spec.radius), num_input)
    # reference builds src via arange(ceil(ni - r), ni) and tgt repeated
    # min(floor(r), ni) times; both give the same edge set
    for s in range(src_lo, num_input):
        for t in range(num_input, min(num_input + num_forecast, n)):
            adj[t, s] = True
    del n_src
    return adj
