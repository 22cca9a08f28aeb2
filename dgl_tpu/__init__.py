"""dgl_tpu: a TPU-native graph deep learning framework in JAX.

From-scratch reimplementation of the capabilities of DGL (dmlc/dgl) designed
for TPU: immutable padded CSR/CSC/COO graph pytrees, message passing lowered
to fused sorted-segment / Pallas kernels, fixed-shape sampling pipelines, and
SPMD distribution over ``jax.sharding`` meshes.
"""

from .base import ALL, DGLError, DGLWarning, NID, EID, NTYPE, ETYPE, is_all
from .graph import Graph, Relation
from .convert import (
    graph,
    heterograph,
    create_block,
    from_scipy,
    from_networkx,
    to_homogeneous,
    to_heterogeneous,
    rand_graph,
    rand_bipartite,
)
from . import function
from . import ops
from .ops import edge_softmax
from .batch import batch, unbatch, stack_graphs, pad_batch, slice_batch
from .readout import (
    readout_nodes,
    readout_edges,
    sum_nodes,
    mean_nodes,
    max_nodes,
    sum_edges,
    mean_edges,
    max_edges,
    softmax_nodes,
    softmax_edges,
    broadcast_nodes,
    broadcast_edges,
    topk_nodes,
    topk_edges,
)
from . import readout
from .subgraph import (
    node_subgraph,
    edge_subgraph,
    in_subgraph,
    out_subgraph,
    khop_in_subgraph,
    khop_out_subgraph,
    node_type_subgraph,
    edge_type_subgraph,
)
from . import subgraph as subgraph_module
from . import traversal
from . import propagate
from .propagate import prop_nodes_bfs, prop_nodes_topo, prop_edges_dfs
from . import transforms
from . import sampling
from . import data
from . import sparse
from . import geometry
from . import distributed
from . import mpops
from . import random_mod as random
from .random_mod import seed
from .homophily import (
    node_homophily,
    edge_homophily,
    linkx_homophily,
    adjusted_homophily,
    edge_label_informativeness,
    node_label_informativeness,
)
from .merge import merge
from . import storages
from . import optim
from .graphbolt.lazy import (
    LazyFeature,
    set_node_lazy_features,
    set_edge_lazy_features,
    set_src_lazy_features,
    set_dst_lazy_features,
)


def apply_each(data, fn, *args, **kwargs):
    """Apply ``fn`` to every value of a dict (or to a bare value) —
    reference ``dgl.apply_each`` (``python/dgl/utils/internal.py``)."""
    if isinstance(data, dict):
        return {k: fn(v, *args, **kwargs) for k, v in data.items()}
    return fn(data, *args, **kwargs)

from . import utils
from . import checkpoint
from .checkpoint import save_checkpoint, load_checkpoint
from .config import config, get_config
from .logging_mod import get_logger, enable_verbose_logging
from . import health
from . import dataloading
from . import graphbolt
from . import models
from . import parallel
from .data.serialize import save_graphs, load_graphs
from .transforms.functional import (
    add_self_loop,
    remove_self_loop,
    add_reverse_edges,
    add_edges,
    remove_edges,
    add_nodes,
    to_bidirected,
    to_simple,
    khop_graph,
    khop_adj,
    knn_graph,
    laplacian_lambda_max,
    metapath_reachable_graph,
    compact_graphs,
    to_block,
    reverse,
    line_graph,
    random_walk_pe,
    lap_pe,
    shortest_dist,
    reorder_graph,
    svd_pe,
)

from .transforms.functional import (
    sort_csr_by_tag,
    sort_csc_by_tag,
    adj_product_graph,
    adj_sum_graph,
    radius_graph,
    segmented_knn_graph,
    laplacian_pe,
    double_radius_node_labeling,
    remove_nodes,
    to_float,
    to_half,
    to_double,
    to_bfloat16,
    norm_by_dst,
    to_simple_graph,
    pairwise_squared_distance,
    rcmk_perm,
    metis_perm,
    knn,
    is_bidirected,
    update_graph_structure,
)
from .partition_mod import (
    partition_graph_with_halo,
    metis_partition,
    reshuffle_graph,
)
from .distributed.partition import metis_partition_assignment
from .propagate import prop_nodes, prop_edges  # reference top-level names
from .homophily import get_long_edges
from .convert import (
    to_networkx,
    bipartite_from_scipy,
    bipartite_from_networkx,
    block_to_graph,
)

# convenience alias matching `import dgl.function as fn`
fn = function

# reference-compatible aliases
DGLGraph = Graph
DGLHeteroGraph = Graph

__version__ = "0.1.0"

__all__ = [
    # core
    "ALL", "DGLError", "DGLWarning", "NID", "EID", "NTYPE", "ETYPE",
    "Graph", "Relation", "DGLGraph", "DGLHeteroGraph",
    # construction
    "graph", "heterograph", "create_block", "from_scipy", "from_networkx",
    "to_homogeneous", "to_heterogeneous", "rand_graph", "rand_bipartite",
    # message passing
    "function", "fn", "ops", "edge_softmax", "apply_each",
    # batching / readout
    "batch", "unbatch", "stack_graphs", "pad_batch", "slice_batch", "readout_nodes", "readout_edges",
    "sum_nodes", "mean_nodes", "max_nodes", "softmax_nodes",
    "broadcast_nodes", "topk_nodes",
    # subgraphs / structure
    "node_subgraph", "edge_subgraph", "in_subgraph", "out_subgraph",
    "khop_in_subgraph", "khop_out_subgraph", "node_type_subgraph",
    "edge_type_subgraph", "add_self_loop", "remove_self_loop",
    "add_reverse_edges", "add_edges", "remove_edges", "add_nodes",
    "to_bidirected", "to_simple", "khop_graph", "knn_graph", "to_block",
    "reverse", "line_graph", "compact_graphs", "reorder_graph", "merge",
    # positional encodings / metrics
    "random_walk_pe", "lap_pe", "svd_pe", "shortest_dist",
    "laplacian_lambda_max", "node_homophily", "edge_homophily",
    "linkx_homophily", "adjusted_homophily",
    # namespaces
    "transforms", "sampling", "dataloading", "graphbolt", "data", "nn",
    "models", "distributed", "parallel", "sparse", "geometry", "optim",
    "storages", "traversal", "propagate", "mpops", "utils", "random",
    "health",
    # state
    "seed", "save_graphs", "load_graphs", "save_checkpoint",
    "load_checkpoint", "config", "get_config", "get_logger",
    "LazyFeature", "set_node_lazy_features", "set_edge_lazy_features",
]
