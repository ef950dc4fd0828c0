"""torch_geometric.nn shim: the layers the reference model code instantiates.

Implements the documented PyG 2.3 semantics of SAGEConv (project / root_weight
/ mean|max aggregation over in-edges, source->target flow), graph-mode
LayerNorm (whole-tensor stats when called without a batch vector), Sequential
(signature-string dataflow), PositionalEncoding / TemporalEncoding, dense
Linear, global_max_pool, and radius_graph.
"""

from __future__ import annotations

from types import SimpleNamespace
from typing import Optional

import torch


class SAGEConv(torch.nn.Module):
    """GraphSAGE convolution (PyG semantics).

    - ``project=True``: messages are ``relu(W_p x_j + b_p)``
    - aggregation over in-neighbors of each target node (``edge_index`` is
      ``[src; dst]`` with source->target flow); nodes without in-edges get 0
    - output ``lin_l(agg) + lin_r(x)``; ``lin_r`` never has a bias
    """

    def __init__(self, in_channels: int, out_channels: int, aggr: str = "mean",
                 bias: bool = True, project: bool = False,
                 root_weight: bool = True, **kwargs):
        super().__init__()
        self.in_channels, self.out_channels = in_channels, out_channels
        self.aggr, self.project, self.root_weight = aggr, project, root_weight
        if project:
            self.lin = torch.nn.Linear(in_channels, in_channels, bias=True)
        self.lin_l = torch.nn.Linear(in_channels, out_channels, bias=bias)
        if root_weight:
            self.lin_r = torch.nn.Linear(in_channels, out_channels, bias=False)

    def forward(self, x: torch.Tensor, edge_index: torch.Tensor) -> torch.Tensor:
        x_src = self.lin(x).relu() if self.project else x
        src, dst = edge_index[0], edge_index[1]
        msg = x_src[src]
        n = x.shape[0]
        out = torch.zeros(n, msg.shape[1], dtype=msg.dtype, device=msg.device)
        if self.aggr == "mean":
            out.scatter_add_(0, dst.view(-1, 1).expand_as(msg), msg)
            cnt = torch.zeros(n, dtype=msg.dtype, device=msg.device)
            cnt.scatter_add_(0, dst, torch.ones_like(dst, dtype=msg.dtype))
            out = out / cnt.clamp(min=1).unsqueeze(-1)
        elif self.aggr == "max":
            out.scatter_reduce_(0, dst.view(-1, 1).expand_as(msg), msg,
                                reduce="amax", include_self=False)
        else:
            raise ValueError(f"unsupported aggr: {self.aggr}")
        out = self.lin_l(out)
        if self.root_weight:
            out = out + self.lin_r(x)
        return out


class LayerNorm(torch.nn.Module):
    """PyG graph-mode LayerNorm. Called without a batch vector (as the
    reference backbone does inside ``Sequential`` with ``"x -> x"``) it
    normalizes over the ENTIRE node tensor: ``(x - x.mean()) /
    (x.std(unbiased=False) + eps)`` then a per-feature affine."""

    def __init__(self, in_channels: int, eps: float = 1e-5,
                 affine: bool = True, mode: str = "graph"):
        super().__init__()
        self.eps, self.mode = eps, mode
        if affine:
            self.weight = torch.nn.Parameter(torch.ones(in_channels))
            self.bias = torch.nn.Parameter(torch.zeros(in_channels))
        else:
            self.weight = self.bias = None

    def forward(self, x: torch.Tensor, batch=None) -> torch.Tensor:
        assert self.mode == "graph" and batch is None, \
            "refshim LayerNorm implements the batch-less graph mode only"
        x = x - x.mean()
        out = x / (x.std(unbiased=False) + self.eps)
        if self.weight is not None:
            out = out * self.weight + self.bias
        return out


class Sequential(torch.nn.Module):
    """PyG's signature-string Sequential: ``Sequential('x, edges', [(mod,
    'x, edges -> x'), mod2, ...])`` threads named values through modules."""

    def __init__(self, input_args: str, modules):
        super().__init__()
        self.input_names = [a.strip() for a in input_args.split(",")]
        self.mods = torch.nn.ModuleList()
        self.specs = []
        for entry in modules:
            if isinstance(entry, (tuple, list)):
                mod, desc = entry
                ins, outs = desc.split("->")
                in_names = [a.strip() for a in ins.split(",")]
                out_names = [a.strip() for a in outs.split(",")]
            else:
                mod = entry
                in_names = out_names = [self.input_names[0]]
            self.mods.append(mod)
            self.specs.append((in_names, out_names))

    def __iter__(self):
        return iter(self.mods)

    def __getitem__(self, idx):
        return self.mods[idx]

    def forward(self, *args):
        env = dict(zip(self.input_names, args))
        res = None
        for mod, (ins, outs) in zip(self.mods, self.specs):
            res = mod(*[env[name] for name in ins])
            if len(outs) == 1:
                env[outs[0]] = res
            else:
                for name, value in zip(outs, res):
                    env[name] = value
        return res


class PositionalEncoding(torch.nn.Module):
    """Sinusoidal encoding: freq = logspace(0, 1, C/2, base=base_freq);
    out = [sin(x f), cos(x f)] concatenated on channels."""

    def __init__(self, out_channels: int, base_freq: float = 1e-4,
                 granularity: float = 1.0):
        super().__init__()
        self.granularity = granularity
        frequency = torch.logspace(0, 1, out_channels // 2, base_freq)
        self.register_buffer("frequency", frequency)

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        x = x / self.granularity if self.granularity != 1.0 else x
        out = x.view(-1, 1).float() * self.frequency.view(1, -1)
        return torch.cat([out.sin(), out.cos()], dim=-1)


class TemporalEncoding(torch.nn.Module):
    """cos(x w) with w_i = 1 / 10000^(i/C) (TGAT functional time encoding)."""

    def __init__(self, out_channels: int):
        super().__init__()
        w = 1.0 / (10000.0 ** (torch.arange(out_channels, dtype=torch.float32)
                               / out_channels))
        self.register_buffer("weight", w.view(1, -1))

    def forward(self, x: torch.Tensor) -> torch.Tensor:
        return (x.view(-1, 1).float() @ self.weight).cos()


class Linear(torch.nn.Linear):
    """PyG dense Linear (torch Linear surface; lazy in_channels unsupported)."""

    def __init__(self, in_channels: int, out_channels: int, bias: bool = True,
                 **kwargs):
        assert in_channels > 0, "refshim Linear does not support lazy init"
        super().__init__(in_channels, out_channels, bias=bias)


def global_max_pool(x: torch.Tensor, batch: Optional[torch.Tensor],
                    size: Optional[int] = None) -> torch.Tensor:
    if batch is None:
        return x.max(dim=0, keepdim=True).values
    size = int(batch.max()) + 1 if size is None else size
    out = torch.full((size, x.shape[-1]), float("-inf"), dtype=x.dtype,
                     device=x.device)
    out.scatter_reduce_(0, batch.view(-1, 1).expand_as(x), x, reduce="amax",
                        include_self=True)
    return out


def radius_graph(pos: torch.Tensor, r: float, batch=None, loop: bool = False,
                 max_num_neighbors: int = 32, flow: str = "source_to_target",
                 num_workers: int = 1) -> torch.Tensor:
    """All (neighbor, center) pairs within radius r. flow='source_to_target'
    returns edges neighbor->center (edge_index[0]=source, [1]=target)."""
    p = pos.float().view(pos.shape[0], -1)
    d = torch.cdist(p, p)
    within = d <= r
    if not loop:
        within &= ~torch.eye(p.shape[0], dtype=torch.bool, device=p.device)
    if batch is not None:
        within &= batch.view(-1, 1) == batch.view(1, -1)
    centers, neighbors = [], []
    for i in range(p.shape[0]):
        nbr = torch.nonzero(within[i], as_tuple=False).view(-1)
        nbr = nbr[:max_num_neighbors]
        neighbors.append(nbr)
        centers.append(torch.full_like(nbr, i))
    row = torch.cat(centers) if centers else torch.zeros(0, dtype=torch.long)
    col = torch.cat(neighbors) if neighbors else torch.zeros(0, dtype=torch.long)
    if flow == "source_to_target":
        return torch.stack([col, row])
    return torch.stack([row, col])


pool = SimpleNamespace(global_max_pool=global_max_pool)
