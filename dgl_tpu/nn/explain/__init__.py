"""Explainability (reference ``python/dgl/nn/pytorch/explain/``)."""
from .gnnexplainer import GNNExplainer
from .pgexplainer import PGExplainer

__all__ = ["GNNExplainer", "PGExplainer"]
