"""Graph convolution layers (reference ``python/dgl/nn/pytorch/conv/``)."""
from .graphconv import GraphConv
from .sageconv import SAGEConv
from .gatconv import GATConv
from .gatv2conv import GATv2Conv
from .ginconv import GINConv
from .relgraphconv import RelGraphConv
from .spectral import SGConv, APPNPConv, TAGConv, ChebConv
from .edgeconv import EdgeConv
from .gatedgraphconv import GatedGraphConv
from .nnconv import NNConv

__all__ = [
    "GraphConv",
    "SAGEConv",
    "GATConv",
    "GATv2Conv",
    "GINConv",
    "RelGraphConv",
    "SGConv",
    "APPNPConv",
    "TAGConv",
    "ChebConv",
    "EdgeConv",
    "GatedGraphConv",
    "NNConv",
]
