from .base import BaseDataset
from .ego4d import FEATURE_SIZES, FEATURE_STRIDES, FEATURE_WINDOW_SIZES, FPS
from .fho import (Ego4dAnticipationDataset, Ego4dFHODataset, Ego4dLTADataset,
                  Ego4dRecognitionDataset)
from .graphs import (GraphSpec, ar_spec, lta_extra_adjacency_host, lta_spec,
                     oscc_spec, pnr_spec, radius_adjacency)
from .loader import DataLoader, MultiLoader, build_dataloader, collate, multiloader
from .osccpnr import Ego4dOSCCDataset, Ego4dPNRDataset
from .synthetic import generate_ego4d_fixture

__all__ = [
    "BaseDataset", "FEATURE_SIZES", "FEATURE_STRIDES", "FEATURE_WINDOW_SIZES",
    "FPS", "Ego4dAnticipationDataset", "Ego4dFHODataset", "Ego4dLTADataset",
    "Ego4dRecognitionDataset", "Ego4dOSCCDataset", "Ego4dPNRDataset",
    "GraphSpec", "ar_spec", "lta_spec", "oscc_spec", "pnr_spec",
    "radius_adjacency", "lta_extra_adjacency_host", "DataLoader", "MultiLoader",
    "build_dataloader", "collate", "multiloader", "generate_ego4d_fixture",
]
