from .backbone import TemporalGraph
from .graphone import (GraphONE, PrototypeBank, build_prototypes,
                       finalize_prototypes)
from .heads import LTATask, OSCCTask, PNRTask, ProjectionTask, RecognitionTask
from .layers import (DenseSAGEConv, GraphLayerNorm, LayerNorm, TLinear,
                     positional_encoding)
from .pooling import TemporalPooling, TRNPooling

__all__ = [
    "TemporalGraph", "GraphONE", "PrototypeBank", "build_prototypes",
    "finalize_prototypes", "LTATask", "OSCCTask", "PNRTask", "ProjectionTask",
    "RecognitionTask", "DenseSAGEConv", "GraphLayerNorm", "LayerNorm",
    "TLinear", "positional_encoding", "TemporalPooling", "TRNPooling",
]
