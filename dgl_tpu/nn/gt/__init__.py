"""Graph transformer building blocks (reference ``python/dgl/nn/pytorch/gt/``).

These operate on dense padded batches (B, N, ...) — the natural TPU layout:
attention over all node pairs with structural biases, MXU-friendly.
"""
from .degree_encoder import DegreeEncoder
from .lap_pos_encoder import LapPosEncoder
from .path_encoder import PathEncoder
from .spatial_encoder import SpatialEncoder, SpatialEncoder3d
from .biased_mha import BiasedMHA
from .graphormer import GraphormerLayer
from .egt import EGTLayer

__all__ = [
    "DegreeEncoder",
    "LapPosEncoder",
    "PathEncoder",
    "SpatialEncoder",
    "SpatialEncoder3d",
    "BiasedMHA",
    "GraphormerLayer",
    "EGTLayer",
]
