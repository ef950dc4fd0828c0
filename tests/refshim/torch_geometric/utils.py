"""torch_geometric.utils shim: scatter + add_remaining_self_loops.

Semantics follow PyG 2.3 documentation: scatter reductions leave untouched
output rows at zero; ``add_remaining_self_loops`` drops existing self-loops
and appends one self-loop per node (0..N-1) after the non-loop edges.
"""

from __future__ import annotations

from typing import Optional, Tuple

import torch


def scatter(src: torch.Tensor, index: torch.Tensor, dim: int = 0,
            dim_size: Optional[int] = None, reduce: str = "sum") -> torch.Tensor:
    assert dim == 0, "refshim scatter supports dim=0 only"
    if dim_size is None:
        dim_size = int(index.max()) + 1 if index.numel() else 0
    shape = (dim_size,) + tuple(src.shape[1:])
    out = torch.zeros(shape, dtype=src.dtype, device=src.device)
    if src.numel() == 0:
        return out
    idx = index.view((-1,) + (1,) * (src.dim() - 1)).expand_as(src)
    if reduce in ("sum", "add"):
        out.scatter_add_(0, idx, src)
    elif reduce == "mean":
        out.scatter_add_(0, idx, src)
        cnt = torch.zeros(dim_size, dtype=src.dtype, device=src.device)
        cnt.scatter_add_(0, index, torch.ones_like(index, dtype=src.dtype))
        out = out / cnt.clamp(min=1).view((-1,) + (1,) * (src.dim() - 1))
    elif reduce == "max":
        out.scatter_reduce_(0, idx, src, reduce="amax", include_self=False)
    elif reduce == "min":
        out.scatter_reduce_(0, idx, src, reduce="amin", include_self=False)
    else:
        raise ValueError(f"unsupported reduce: {reduce}")
    return out


def add_remaining_self_loops(edge_index: torch.Tensor, edge_attr=None,
                             fill_value=None, num_nodes: Optional[int] = None,
                             ) -> Tuple[torch.Tensor, Optional[torch.Tensor]]:
    if num_nodes is None:
        num_nodes = int(edge_index.max()) + 1 if edge_index.numel() else 0
    row, col = edge_index[0], edge_index[1]
    mask = row != col
    loops = torch.arange(num_nodes, dtype=edge_index.dtype,
                         device=edge_index.device)
    loop_index = torch.stack([loops, loops])
    out = torch.cat([edge_index[:, mask], loop_index], dim=1)
    return out, None
