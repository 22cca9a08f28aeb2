"""SPMD distribution layer — the TPU-native replacement of DistDGL.

The reference's server/client RPC architecture (``python/dgl/distributed/``,
``src/rpc/``) collapses into JAX collectives over a ``jax.sharding.Mesh``
(SURVEY.md §5.8): data parallelism shards minibatches over the ``dp`` axis,
embedding tables / wide hidden layers shard over ``tp``, and graph-partition
parallelism (halo exchange) rides ``jax.lax.all_to_all`` over ICI.
"""
from .mesh import create_mesh, MeshAxes
from .spmd import (
    shard_batch,
    replicate,
    sharded_train_step,
)

__all__ = [
    "create_mesh",
    "MeshAxes",
    "shard_batch",
    "replicate",
    "sharded_train_step",
]
