"""RemoveDuplicatedEdges shim: coalesce duplicate edges (sorted unique)."""

import torch


class RemoveDuplicatedEdges:
    def __call__(self, data):
        if data.edge_index is not None and data.edge_index.numel():
            data.edge_index = torch.unique(data.edge_index, dim=1)
        return data

    def __repr__(self) -> str:
        return "RemoveDuplicatedEdges()"
