"""Minibatch dataloading (reference ``python/dgl/dataloading/`` +
GraphBolt ``python/dgl/graphbolt/``).

TPU-native design: samplers run on host (numpy) and emit **fixed-shape
padded MFG blocks** — every minibatch has the same static shapes and pytree
structure, so the train step compiles exactly once (the reference instead
tolerates ragged minibatches; XLA cannot). A background prefetch thread
overlaps sampling + feature gather + host->device transfer with device
compute (the GraphBolt overlap story, ``graphbolt/dataloader.py:108-191``).
"""
from .base import (
    Sampler,
    BlockSampler,
    as_edge_prediction_sampler,
    find_exclude_eids,
    EdgePredictionSampler,
)
from .neighbor_sampler import (
    NeighborSampler,
    MultiLayerNeighborSampler,
    MultiLayerFullNeighborSampler,
    FixedShapeNeighborSampler,
    LaborSampler,
)
from .dataloader import DataLoader, NodeDataLoader, EdgeDataLoader
from .graph_loader import GraphDataLoader
from .negative_sampler import Uniform, GlobalUniform, PerSourceUniform
from .subgraph_samplers import ClusterGCNSampler, SAINTSampler, ShaDowKHopSampler
from .hetero_sampler import HeteroFixedShapeNeighborSampler
from .collators import (
    TensorizedDataset,
    DDPTensorizedDataset,
    create_tensorized_dataset,
    NodeCollator,
    EdgeCollator,
    GraphCollator,
)
from .spot_target import SpotTarget
from .capped import CappedNeighborSampler
from .worker_utils import (
    remove_parent_storage_columns,
    restore_parent_storage_columns,
    CollateWrapper,
    WorkerInitWrapper,
)
# distributed loaders under the reference's legacy names (reference
# ``dataloading/dataloader.py:1477-1540`` keeps the same shim). Resolved
# lazily: ``distributed`` imports ``dataloading.DataLoader``, so an eager
# import here would be circular.
DistDataLoader = DataLoader


def __getattr__(name):
    if name in ("DistNodeDataLoader", "DistEdgeDataLoader"):
        from ..distributed import dist_minibatch

        return getattr(dist_minibatch, name)
    raise AttributeError(name)


def __dir__():
    return sorted(
        set(globals()) | {"DistNodeDataLoader", "DistEdgeDataLoader"}
    )

__all__ = [
    "EdgePredictionSampler",
    "TensorizedDataset",
    "DDPTensorizedDataset",
    "create_tensorized_dataset",
    "NodeCollator",
    "EdgeCollator",
    "GraphCollator",
    "SpotTarget",
    "CappedNeighborSampler",
    "remove_parent_storage_columns",
    "restore_parent_storage_columns",
    "CollateWrapper",
    "WorkerInitWrapper",
    "DistNodeDataLoader",
    "DistEdgeDataLoader",
    "DistDataLoader",
    "GraphDataLoader",
    "Sampler",
    "BlockSampler",
    "as_edge_prediction_sampler",
    "find_exclude_eids",
    "NeighborSampler",
    "MultiLayerNeighborSampler",
    "MultiLayerFullNeighborSampler",
    "FixedShapeNeighborSampler",
    "LaborSampler",
    "DataLoader",
    "NodeDataLoader",
    "EdgeDataLoader",
    "Uniform",
    "GlobalUniform",
    "PerSourceUniform",
    "ClusterGCNSampler",
    "SAINTSampler",
    "ShaDowKHopSampler",
    "HeteroFixedShapeNeighborSampler",
]
