"""Explainability (reference ``python/dgl/nn/pytorch/explain/``)."""
from .gnnexplainer import GNNExplainer
from .hetero_gnnexplainer import HeteroGNNExplainer
from .pgexplainer import PGExplainer
from .hetero_pgexplainer import HeteroPGExplainer
from .subgraphx import SubgraphX
from .hetero_subgraphx import HeteroSubgraphX

__all__ = [
    "GNNExplainer",
    "HeteroGNNExplainer",
    "PGExplainer",
    "HeteroPGExplainer",
    "SubgraphX",
    "HeteroSubgraphX",
]
