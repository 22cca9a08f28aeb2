"""Distributed training layer — SPMD replacement of DistDGL
(reference ``python/dgl/distributed/``, ``src/rpc/``; SURVEY.md §5.8).

The reference's server/client RPC architecture collapses into:

- offline **partitioning** (``partition_graph``: METIS-style multilevel or
  random, writing per-part shards + a partition book, mirroring
  ``distributed/partition.py:817``);
- **fixed-shape shards** with precomputed halo routing tables
  (``build_shards``) so every part has identical static shapes;
- **halo exchange** via one ``jax.lax.all_to_all`` over the ``gp`` mesh axis
  inside ``shard_map`` (replacing remote sampling RPC + KVStore pulls);
- **DistTensor / DistEmbedding** as mesh-sharded arrays;
- gradient sync via XLA-inserted ``psum`` (replacing torch DDP).
"""
from .graph_partition_book import RangePartitionBook
GraphPartitionBook = RangePartitionBook  # reference class name
from .dist_graph import (
    DistGraph,
    sample_neighbors,
    node_split,
    edge_split,
    exit_client,
)
from ..dataloading import DataLoader as DistDataLoader  # reference name:
# seed-sharded loading is the ddp_rank/ddp_world_size args of DataLoader
# (reference dist_dataloader.py:23)
from .partition import (
    metis_partition_assignment,
    random_partition_assignment,
    partition_graph,
    load_partition,
    load_partition_book,
)
from .shard import GraphShards, build_shards
from .dist_spmm import dist_copy_u_sum, dist_spmm, halo_exchange
from .hetero_shard import (
    HeteroGraphShards,
    build_hetero_shards,
    dist_hetero_copy_u_sum,
    init_hetero_halo_state,
    dist_hetero_copy_u_sum_delayed,
)
from .dist_tensor import DistTensor, DistEmbedding
from .kvstore import (
    PartitionPolicy,
    NodePartitionPolicy,
    EdgePartitionPolicy,
    HeteroDataName,
    parse_hetero_data_name,
    IdMap,
    KVServer,
    KVClient,
    DistConnectError,
)
from .server import (
    DistGraphServer,
    CustomPool,
    MpCommand,
    NodeDataView,
    EdgeDataView,
    HeteroNodeView,
    HeteroEdgeView,
    PlaceHolder,
)
from . import optim
from .optim import DistSparseGradOptimizer
# collators live here in the reference (``distributed/dist_dataloader.py``)
from ..dataloading.collators import NodeCollator, EdgeCollator
from .dist_context import initialize, get_rank, get_world_size
from .cooperative import sparse_all_to_all_pull, sparse_all_to_all_push
from .dist_minibatch import (
    PartitionedGraphCSC,
    DistNeighborSampler,
    DistNodeDataLoader,
    DistEdgeDataLoader,
    pull_rows_in_shard_map,
    stack_blocks,
)

__all__ = [
    "RangePartitionBook",
    "GraphPartitionBook",
    "DistGraph",
    "sample_neighbors",
    "node_split",
    "edge_split",
    "exit_client",
    "DistDataLoader",
    "PartitionPolicy",
    "NodePartitionPolicy",
    "EdgePartitionPolicy",
    "HeteroDataName",
    "parse_hetero_data_name",
    "IdMap",
    "KVServer",
    "KVClient",
    "DistConnectError",
    "DistGraphServer",
    "CustomPool",
    "MpCommand",
    "NodeDataView",
    "EdgeDataView",
    "HeteroNodeView",
    "HeteroEdgeView",
    "PlaceHolder",
    "optim",
    "DistSparseGradOptimizer",
    "NodeCollator",
    "EdgeCollator",
    "metis_partition_assignment",
    "random_partition_assignment",
    "partition_graph",
    "load_partition",
    "load_partition_book",
    "GraphShards",
    "build_shards",
    "dist_copy_u_sum",
    "dist_spmm",
    "halo_exchange",
    "HeteroGraphShards",
    "build_hetero_shards",
    "dist_hetero_copy_u_sum",
    "init_hetero_halo_state",
    "dist_hetero_copy_u_sum_delayed",
    "DistTensor",
    "DistEmbedding",
    "initialize",
    "get_rank",
    "get_world_size",
    "sparse_all_to_all_pull",
    "sparse_all_to_all_push",
    "PartitionedGraphCSC",
    "DistNeighborSampler",
    "DistNodeDataLoader",
    "DistEdgeDataLoader",
    "pull_rows_in_shard_map",
    "stack_blocks",
]
