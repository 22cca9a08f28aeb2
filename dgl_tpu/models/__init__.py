"""Model zoo: end-to-end GNN models composing the nn layer zoo.

Mirrors the reference's curated examples (``examples/core/gcn``,
``examples/core/gat``, ``examples/graphbolt/node_classification.py``,
``examples/pytorch/rgcn``) as importable flax modules.
"""
from .gcn import GCN
from .gat import GAT
from .sage import GraphSAGE
from .rgcn import RGCN
from .gin import GIN
from .graphormer import Graphormer, prepare_batch
from .device_sage import DeviceSAGE

__all__ = ["GCN", "GAT", "GraphSAGE", "DeviceSAGE", "RGCN", "GIN", "Graphormer", "prepare_batch"]
