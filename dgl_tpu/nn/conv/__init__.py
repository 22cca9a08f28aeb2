"""Graph convolution layers (reference ``python/dgl/nn/pytorch/conv/``).

The reference's ``cugraph_*`` variants are CUDA-specific accelerations of
GATConv/RelGraphConv/SAGEConv; on TPU the base layers already lower to the
fused kernel path, so no separate variants exist.
"""
from .graphconv import GraphConv, precompute_graphconv
from ..utils_nn import EdgeWeightNorm
from .sageconv import SAGEConv, precompute_sage_neigh
from .gatconv import GATConv
from .gatv2conv import GATv2Conv
from .ginconv import GINConv
from .relgraphconv import RelGraphConv
from .spectral import SGConv, APPNPConv, TAGConv, ChebConv
from .edgeconv import EdgeConv
from .gatedgraphconv import GatedGraphConv
from .nnconv import NNConv
from .agnnconv import AGNNConv
from .dotgatconv import DotGatConv
from .gcn2conv import GCN2Conv
from .gineconv import GINEConv
from .cfconv import CFConv, ShiftedSoftplus
from .gmmconv import GMMConv
from .pnaconv import PNAConv
from .gatedgcnconv import GatedGCNConv
from .egatconv import EGATConv
from .edgegatconv import EdgeGATConv
from .dense import DenseGraphConv, DenseSAGEConv, DenseChebConv
from .hgtconv import HGTConv
from .grouprevres import GroupRevRes
from .dgnconv import DGNConv
from .twirlsconv import TWIRLSConv, TWIRLSUnfoldingAndAttention
from .atomicconv import AtomicConv
from .egnnconv import EGNNConv

__all__ = [
    "GraphConv",
    "precompute_graphconv",
    "precompute_sage_neigh",
    "EdgeWeightNorm",
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
    "AGNNConv",
    "DotGatConv",
    "GCN2Conv",
    "GINEConv",
    "CFConv",
    "ShiftedSoftplus",
    "GMMConv",
    "PNAConv",
    "GatedGCNConv",
    "EGATConv",
    "EdgeGATConv",
    "DenseGraphConv",
    "DenseSAGEConv",
    "DenseChebConv",
    "HGTConv",
    "GroupRevRes",
    "DGNConv",
    "TWIRLSConv",
    "TWIRLSUnfoldingAndAttention",
    "AtomicConv",
    "EGNNConv",
]
