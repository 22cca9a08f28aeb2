"""DistGraph facade + worker split helpers (reference
``python/dgl/distributed/dist_graph.py:488,1558,1606``).

In the SPMD architecture there are no graph servers: each worker holds
its partition (``load_partition``) and the partition book; cross-part
feature movement happens in collectives (``dist_spmm``/``hetero_shard``).
``DistGraph`` is the thin object that bundles the local partition with
the book so DistDGL-style training scripts port with minimal edits.
"""
from __future__ import annotations

import numpy as np

from ..base import DGLError

__all__ = ["DistGraph", "node_split", "edge_split", "exit_client"]


class DistGraph:
    """(reference ``dist_graph.py:488``). Construct from a partition
    directory written by ``partition_graph`` plus this worker's rank."""

    def __init__(self, graph_name_or_path, part_id: int = None,
                 part_config: str = None):
        from .partition import load_partition

        path = part_config or graph_name_or_path
        if part_id is None:
            from .dist_context import get_rank

            part_id = get_rank()
        self._part_id = part_id
        self.local_partition, self._book = load_partition(path, part_id)

    # -- queries (reference dist_graph.py:700-900) --------------------------

    def get_partition_book(self):
        return self._book

    @property
    def rank(self):
        return self._part_id

    def num_nodes(self, ntype=None):
        return int(self._book.num_nodes())

    def num_edges(self, etype=None):
        # total over parts is not stored per-etype in the book; expose the
        # local count scaled by parts as the reference's servers would sum
        return int(
            np.sum(self._book.metadata().get("num_edges",
                                             self.local_partition.num_edges()))
        )

    @property
    def ndata(self):
        nt = self.local_partition.ntypes[0]
        return self.local_partition._node_frames.setdefault(nt, {})

    @property
    def edata(self):
        cet = self.local_partition.canonical_etypes[0]
        return self.local_partition._edge_frames.setdefault(cet, {})

    def local_var(self):
        return self.local_partition.local_var()


def _split(ids_or_mask, partition_book, rank, force_even=True):
    arr = np.asarray(ids_or_mask)
    if arr.dtype == bool:
        ids = np.nonzero(arr)[0]
    else:
        ids = arr
    k = partition_book.num_partitions
    if rank is None:
        from .dist_context import get_rank

        rank = get_rank()
    if not 0 <= rank < k:
        raise DGLError(f"rank {rank} out of range for {k} partitions")
    # contiguous even split, remainder to the first ranks (reference
    # ``dist_graph.py:1558`` even_split)
    base = ids.shape[0] // k
    rem = ids.shape[0] % k
    lo = rank * base + min(rank, rem)
    hi = lo + base + (1 if rank < rem else 0)
    return ids[lo:hi]


def node_split(nodes, partition_book=None, ntype="_N", rank=None,
               force_even=True):
    """This worker's share of the given node ids/mask (reference
    ``dist_graph.py:1558``)."""
    return _split(nodes, partition_book, rank, force_even)


def edge_split(edges, partition_book=None, etype="_E", rank=None,
               force_even=True):
    """(reference ``dist_graph.py:1606``)."""
    return _split(edges, partition_book, rank, force_even)


def exit_client():
    """No-op in the SPMD architecture (reference ``dist_context.py``
    tears down RPC clients; there are none here)."""
