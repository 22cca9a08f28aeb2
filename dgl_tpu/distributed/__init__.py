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
from .device_dist_sampler import DeviceDistSampler, shard_csc_arrays
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
from ..dataloading.collators import NodeCollator, EdgeCollator, Collator
from . import graph_services
from .graph_services import (
    merge_graphs,
    find_edges,
    in_degrees,
    out_degrees,
    load_partition_feats,
    dgl_partition_to_graphbolt,
    gb_convert_single_dgl_partition,
    process_partitions,
    default_push_handler,
    default_pull_handler,
    ServerState,
)
from .role import (
    init_role,
    get_role,
    init_kvstore,
    get_kvstore,
    close_kvstore,
    get_trainer_rank,
    get_num_trainers,
    get_global_rank,
    read_ip_config,
    get_local_usable_addr,
    local_ip4_addr_list,
    alltoall,
    alltoall_cpu,
    alltoallv,
    alltoallv_cpu,
)
from .dist_context import initialize, get_rank, get_world_size
from .cooperative import sparse_all_to_all_pull, sparse_all_to_all_push
from .dist_minibatch import (
    PartitionedGraphCSC,
    DistNeighborSampler,
    DistNodeDataLoader,
    DistEdgeDataLoader,
    DistEtypeNeighborSampler,
    pull_rows_in_shard_map,
    stack_blocks,
)

__all__ = [
    "DeviceDistSampler",
    "shard_csc_arrays",
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
    "Collator",
    "merge_graphs",
    "find_edges",
    "in_degrees",
    "out_degrees",
    "load_partition_feats",
    "dgl_partition_to_graphbolt",
    "gb_convert_single_dgl_partition",
    "process_partitions",
    "default_push_handler",
    "default_pull_handler",
    "ServerState",
    "init_role",
    "get_role",
    "init_kvstore",
    "get_kvstore",
    "close_kvstore",
    "get_trainer_rank",
    "get_num_trainers",
    "get_global_rank",
    "read_ip_config",
    "get_local_usable_addr",
    "local_ip4_addr_list",
    "alltoall",
    "alltoall_cpu",
    "alltoallv",
    "alltoallv_cpu",
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
    "DistEtypeNeighborSampler",
    "pull_rows_in_shard_map",
    "stack_blocks",
]
