"""torch_geometric.transforms shim."""

from ..data import Data
from ..nn import radius_graph
from .remove_duplicated_edges import RemoveDuplicatedEdges  # noqa: F401


class BaseTransform:
    def __call__(self, data):
        raise NotImplementedError

    def __repr__(self) -> str:
        return f"{self.__class__.__name__}()"


class RadiusGraph(BaseTransform):
    """Replaces edge_index with the radius graph over ``data.pos``."""

    def __init__(self, r: float, loop: bool = False,
                 max_num_neighbors: int = 32, flow: str = "source_to_target",
                 num_workers: int = 1):
        self.r = r
        self.loop = loop
        self.max_num_neighbors = max_num_neighbors
        self.flow = flow
        self.num_workers = num_workers

    def __call__(self, data: Data) -> Data:
        data.edge_attr = None
        batch = data.batch if "batch" in data else None
        data.edge_index = radius_graph(
            data.pos, self.r, batch, self.loop,
            max_num_neighbors=self.max_num_neighbors, flow=self.flow)
        return data
