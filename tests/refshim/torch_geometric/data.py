"""torch_geometric.data shim: the attribute-bag ``Data`` graph container."""

from __future__ import annotations

import torch


class Data:
    """Graph container: named tensor attributes + a few derived properties.

    Mirrors the PyG ``Data`` surface the reference touches: ``.x .y .pos
    .edge_index .batch .edge_attr``, ``'batch' in data``, ``.to(device)``,
    ``.num_nodes``.
    """

    def __init__(self, x=None, edge_index=None, y=None, pos=None, batch=None,
                 **kwargs):
        self.x = x
        self.edge_index = edge_index
        self.y = y
        self.pos = pos
        self.batch = batch
        self.edge_attr = None
        for k, v in kwargs.items():
            setattr(self, k, v)

    def __contains__(self, key: str) -> bool:
        return getattr(self, key, None) is not None

    @property
    def num_nodes(self) -> int:
        if self.x is not None:
            return self.x.shape[0]
        if self.pos is not None:
            return self.pos.shape[0]
        raise AttributeError("Data has neither x nor pos")

    def to(self, device, non_blocking: bool = False):
        for k, v in list(self.__dict__.items()):
            if isinstance(v, torch.Tensor):
                setattr(self, k, v.to(device, non_blocking=non_blocking))
        return self


class Batch(Data):
    """Collated graphs; only what the parity tests construct by hand."""

    @classmethod
    def from_data_list(cls, graphs):
        x = torch.cat([g.x for g in graphs], dim=0)
        y = torch.cat([g.y for g in graphs], dim=0) if graphs[0].y is not None else None
        pos = torch.cat([g.pos for g in graphs], dim=0) if graphs[0].pos is not None else None
        batch = torch.cat([torch.full((g.num_nodes,), i, dtype=torch.long)
                           for i, g in enumerate(graphs)])
        edge_index = None
        if graphs[0].edge_index is not None:
            parts, off = [], 0
            for g in graphs:
                parts.append(g.edge_index + off)
                off += g.num_nodes
            edge_index = torch.cat(parts, dim=1)
        return cls(x=x, edge_index=edge_index, y=y, pos=pos, batch=batch)
