"""In-memory halo partitioning (reference ``python/dgl/partition.py:139``
``partition_graph_with_halo``, ``:400`` ``metis_partition``).

These return partition SUBGRAPHS directly (the reference's C API
``_CAPI_DGLPartitionWithHalo_Hetero``); the on-disk shard workflow lives in
``distributed.partition.partition_graph``.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .base import DGLError, EID, NID
from .graph import Graph

__all__ = [
    "partition_graph_with_halo",
    "metis_partition",
    "reshuffle_graph",
]


def reshuffle_graph(g: Graph, node_part):
    """Relabel nodes so each partition owns a contiguous ID range
    (reference ``partition.py:97`` ``reshuffle_graph``); the original IDs
    are stored as ``ndata['orig_id']`` / ``edata['orig_id']``."""
    from . import convert

    node_part = np.asarray(node_part)
    n = g.num_nodes()
    order = np.argsort(node_part, kind="stable")          # new -> old
    new_of_old = np.empty(n, dtype=np.int64)
    new_of_old[order] = np.arange(n)
    src, dst = (np.asarray(a) for a in g.edges())
    # edges sorted by new dst id: inner edges of a part are contiguous
    eorder = np.argsort(new_of_old[dst], kind="stable")
    new_g = convert.graph(
        (new_of_old[src][eorder], new_of_old[dst][eorder]), num_nodes=n
    )
    for k, v in g.ndata.items():
        new_g.ndata[k] = jnp.asarray(v)[jnp.asarray(order)]
    for k, v in g.edata.items():
        new_g.edata[k] = jnp.asarray(v)[jnp.asarray(eorder)]
    new_g.ndata["orig_id"] = jnp.asarray(order)
    new_g.edata["orig_id"] = jnp.asarray(eorder)
    return new_g, np.asarray(node_part)[order]


def partition_graph_with_halo(g: Graph, node_part, extra_cached_hops: int,
                              reshuffle: bool = False):
    """Split ``g`` into per-partition subgraphs with ``extra_cached_hops``
    of HALO in-neighbors (reference ``partition.py:139``).

    Returns ``(parts, orig_nids, orig_eids)``: ``parts[p]`` carries
    ``ndata['inner_node']``/``ndata['part_id']``/``ndata[NID]`` and
    ``edata['inner_edge']``/``edata[EID]``; the two mappings are the
    reshuffled->original ID arrays when ``reshuffle`` else ``None``.
    """
    from .distributed.partition import _gather_in_neighbors
    from .subgraph import node_subgraph

    node_part = np.asarray(node_part)
    if node_part.shape[0] != g.num_nodes():
        raise DGLError("node_part must assign every node")
    orig_nids = orig_eids = None
    if reshuffle:
        g, node_part = reshuffle_graph(g, node_part)
        orig_nids = np.asarray(g.ndata["orig_id"])
        orig_eids = np.asarray(g.edata["orig_id"])
    num_parts = int(node_part.max()) + 1 if node_part.size else 0
    rel = g._relation(None)
    indptr, indices = rel.host_arrays("csc_indptr", "csc_indices")
    n = g.num_nodes()
    parts = {}
    for p in range(num_parts):
        owned = np.nonzero(node_part == p)[0].astype(np.int64)
        keep = np.zeros(n, dtype=bool)
        keep[owned] = True
        frontier = owned
        for _ in range(extra_cached_hops):
            nbrs = np.unique(_gather_in_neighbors(indptr, indices, frontier))
            nxt = nbrs[~keep[nbrs]]
            keep[nxt] = True
            frontier = nxt
            if nxt.size == 0:
                break
        all_nodes = np.nonzero(keep)[0].astype(np.int64)
        sub = node_subgraph(g, all_nodes)            # stores NID/EID
        inner = np.isin(all_nodes, owned)
        sub.ndata["inner_node"] = jnp.asarray(inner.astype(np.int8))
        sub.ndata["part_id"] = jnp.asarray(node_part[all_nodes])
        # an edge is inner iff its dst is an inner node (reference
        # ``partition.py:199`` get_inner_edge)
        _, d = sub.edges()
        sub.edata["inner_edge"] = jnp.asarray(inner.astype(np.int8))[
            jnp.asarray(d)
        ]
        parts[p] = sub
    return parts, orig_nids, orig_eids


def metis_partition(g: Graph, k: int, extra_cached_hops: int = 0,
                    reshuffle: bool = False, balance_ntypes=None,
                    balance_edges: bool = False, mode: str = "k-way"):
    """METIS-class partitioning into halo subgraphs (reference
    ``partition.py:400``; assignment from the multilevel partitioner in
    ``distributed/partition.py``)."""
    from .distributed.partition import metis_partition_assignment

    if mode not in ("k-way", "recursive"):
        raise DGLError("mode must be 'k-way' or 'recursive'")
    node_part = metis_partition_assignment(
        g, k, balance_ntypes, balance_edges
    )
    parts, _, _ = partition_graph_with_halo(
        g, node_part, extra_cached_hops, reshuffle
    )
    return parts
