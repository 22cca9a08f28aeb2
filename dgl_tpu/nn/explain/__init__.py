"""Explainability (reference ``python/dgl/nn/pytorch/explain/``)."""
from .gnnexplainer import GNNExplainer
from .pgexplainer import PGExplainer
from .subgraphx import SubgraphX

__all__ = ["GNNExplainer", "PGExplainer", "SubgraphX"]
