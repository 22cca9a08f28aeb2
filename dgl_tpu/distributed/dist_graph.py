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

__all__ = [
    "DistGraph",
    "sample_neighbors",
    "node_split",
    "edge_split",
    "exit_client",
]


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

    # -- owner-local sampling (reference ``graph_services.py:1037``) --------

    def _global_to_local(self):
        if getattr(self, "_g2l", None) is None:
            new_ids = np.asarray(self.local_partition.ndata["_new_id"])
            g2l = np.full(int(self._book.num_nodes()), -1, np.int64)
            g2l[new_ids] = np.arange(new_ids.shape[0])
            self._g2l = g2l
        return self._g2l

    def sample_neighbors(self, nodes, fanout, edge_dir="in", prob=None,
                         replace=False, seed=None):
        """Sample in-neighbors of OWNED seed nodes from the local partition
        (reference ``graph_services.py:1037`` ``sample_neighbors`` — the
        remote server round-trip of ``_distributed_access:737`` collapses to
        a local CSC pick because every in-edge of an owned node is stored
        with its partition, exactly like DistDGL's dst-owner placement).
        ``nodes`` are GLOBAL (partition-book) ids; the result is an edge
        subgraph over the global id space. Seeds owned by other partitions
        raise — cross-part minibatch workflows use
        :class:`~dgl_tpu.distributed.dist_minibatch.DistNeighborSampler`,
        which groups frontiers by owner.
        """
        if edge_dir != "in":
            raise DGLError("DistGraph.sample_neighbors samples in-edges "
                           "(dst-owner partition placement)")
        from .. import convert
        from ..base import EID, NID
        from ..sampling import sample_neighbors as local_sample

        nodes = np.atleast_1d(np.asarray(nodes, np.int64))
        lo, hi = (int(self._book._ranges[self._part_id]),
                  int(self._book._ranges[self._part_id + 1]))
        if nodes.size and not ((nodes >= lo) & (nodes < hi)).all():
            raise DGLError(
                f"seeds outside this rank's owned range [{lo},{hi}); use "
                "DistNeighborSampler for cross-partition minibatches"
            )
        g2l = self._global_to_local()
        local = g2l[nodes]
        frontier = local_sample(
            self.local_partition, local, fanout, prob=prob,
            replace=replace, copy_ndata=False, copy_edata=True, seed=seed,
        )
        u_l, v_l = (np.asarray(a) for a in frontier.edges())
        new_ids = np.asarray(self.local_partition.ndata["_new_id"])
        out = convert.graph(
            (new_ids[u_l], new_ids[v_l]),
            num_nodes=int(self._book.num_nodes()),
        )
        cet = frontier.canonical_etypes[0]
        eid = frontier._edge_frames.get(cet, {}).get(EID)
        if eid is not None:
            # the frontier's EIDs are induced positions into the LOCAL
            # partition; translate through the partition's stored parent
            # ids so consumers see GLOBAL edge ids (the reference
            # graph_services contract — global lookups / exclude_edges)
            pcet = self.local_partition.canonical_etypes[0]
            parent = self.local_partition._edge_frames.get(
                pcet, {}).get(EID)
            if parent is not None:
                eid = np.asarray(parent)[np.asarray(eid)]
            import jax.numpy as jnp

            out.edata[EID] = jnp.asarray(np.asarray(eid))
        return out


def sample_neighbors(g, nodes, fanout, edge_dir="in", prob=None,
                     replace=False, seed=None):
    """Reference-name entry point (``dgl.distributed.sample_neighbors``,
    ``graph_services.py:1037``): owner-local sampling on a
    :class:`DistGraph`; plain graphs fall through to
    :func:`dgl_tpu.sampling.sample_neighbors`."""
    if isinstance(g, DistGraph):
        return g.sample_neighbors(nodes, fanout, edge_dir=edge_dir,
                                  prob=prob, replace=replace, seed=seed)
    from ..sampling import sample_neighbors as local_sample

    return local_sample(g, nodes, fanout, edge_dir=edge_dir, prob=prob,
                        replace=replace, seed=seed)


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
