"""Distributed minibatch training: SPMD analog of DistDGL's remote sampling.

Reference workflow (``python/dgl/distributed/graph_services.py:737``
``_distributed_access``, ``:1037`` ``sample_neighbors``;
``dist_dataloader.py:792``): each trainer samples seed neighborhoods that
span partitions by sending per-partition requests to graph servers, merges
the responses into MFGs, and pulls input features from the KVStore.

TPU-native redesign (SURVEY.md §5.8 "fully SPMD sampling — preferred"):

- The graph is partitioned by *destination* owner (every in-edge of an owned
  node is local), nodes relabeled part-major (:class:`PartitionedGraphCSC`).
- Sampling runs on the host: for each MFG layer the frontier is grouped by
  owner partition and each partition answers from its local CSC — the same
  owner-grouped access pattern as ``_distributed_access``, with the RPC
  round-trip replaced by direct host indexing (single-controller) or a
  host-side exchange (multi-controller pods; the device path is identical).
- Input FEATURES never leave the device mesh: they live row-sharded
  (part-major) and are fetched per step with one masked request/response
  ``all_to_all`` pair (:func:`pull_rows_in_shard_map`) — the KVStore pull
  collapsed into collectives.
- Each rank trains on its OWN seeds (``node_split`` semantics,
  reference ``dist_graph.py:1558``), gradients sync with ``psum``.

Blocks are fixed-shape (same construction as
``dataloading.neighbor_sampler.FixedShapeNeighborSampler``), so one
compilation serves every step, and per-rank blocks stack into (P, ...)
pytrees consumed under ``shard_map``.
"""
from __future__ import annotations

from typing import List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError, NID

__all__ = [
    "PartitionedGraphCSC",
    "DistNeighborSampler",
    "DistNodeDataLoader",
    "pull_rows_in_shard_map",
    "stack_blocks",
]


class PartitionedGraphCSC:
    """Host-side dst-partitioned CSC with part-major global relabeling.

    Part ``p`` owns global (new) ids ``[ranges[p], ranges[p+1])`` and stores
    the in-edges of exactly those nodes (``indptr[p]`` over local dst rows,
    ``indices[p]`` holding GLOBAL src ids). The union of partitions is the
    original graph, so owner-local sampling is exact (reference partitions
    the same way: ``tools/partition_graph.py`` keeps in-edges with the dst).
    """

    def __init__(self, ranges, order, new_of_old, indptr, indices, eids):
        self.ranges = ranges                  # (P+1,)
        self.order = order                    # new -> old
        self.new_of_old = new_of_old          # old -> new
        self.indptr = indptr                  # list[P] of (n_p+1,)
        self.indices = indices                # list[P] of (E_p,) global new src
        self.eids = eids                      # list[P] of (E_p,) global eids
        self.num_parts = len(indptr)
        self.num_nodes = int(ranges[-1])

    @property
    def n_max(self) -> int:
        return int(max(ip.shape[0] - 1 for ip in self.indptr))

    @staticmethod
    def build(g, parts, num_parts: int) -> "PartitionedGraphCSC":
        rel = g._relation(None)
        E = rel.num_edges
        src = np.asarray(rel.src)[:E].astype(np.int64)
        dst = np.asarray(rel.dst)[:E].astype(np.int64)
        n = g.num_nodes()
        parts = np.asarray(parts, dtype=np.int64)
        order = np.argsort(parts, kind="stable")
        new_of_old = np.empty(n, dtype=np.int64)
        new_of_old[order] = np.arange(n)
        counts = np.bincount(parts, minlength=num_parts)
        ranges = np.concatenate([[0], np.cumsum(counts)])

        src_new = new_of_old[src]
        dst_new = new_of_old[dst]
        owner = np.searchsorted(ranges, dst_new, side="right") - 1
        indptr, indices, eids = [], [], []
        for p in range(num_parts):
            sel = np.nonzero(owner == p)[0]
            dl = dst_new[sel] - ranges[p]
            o = np.argsort(dl, kind="stable")
            sel = sel[o]
            dl = dl[o]
            ip = np.zeros(counts[p] + 1, np.int64)
            np.add.at(ip, dl + 1, 1)
            indptr.append(np.cumsum(ip))
            indices.append(src_new[sel])
            eids.append(sel.astype(np.int64))
        return PartitionedGraphCSC(ranges, order, new_of_old,
                                   indptr, indices, eids)

    def shard_rows(self, x_old) -> jnp.ndarray:
        """(N, ...) per-node data in OLD id order -> (P, n_max, ...) padded
        part-major shards (row ``i`` of part ``p`` is global new id
        ``ranges[p] + i``) — the DistTensor layout the feature pull serves."""
        x_old = np.asarray(x_old)
        n_max = self.n_max
        out = np.zeros((self.num_parts, n_max) + x_old.shape[1:], x_old.dtype)
        for p in range(self.num_parts):
            ids_old = self.order[self.ranges[p]: self.ranges[p + 1]]
            out[p, : ids_old.shape[0]] = x_old[ids_old]
        return jnp.asarray(out)

    def in_neighbors(self, node_new: int):
        """(global src ids, global eids) of one node — owner-local lookup."""
        p = int(np.searchsorted(self.ranges, node_new, side="right") - 1)
        local = int(node_new - self.ranges[p])
        lo, hi = self.indptr[p][local], self.indptr[p][local + 1]
        return self.indices[p][lo:hi], self.eids[p][lo:hi]


class DistNeighborSampler:
    """Fixed-shape multi-layer neighbor sampler over a partitioned graph.

    Per layer the frontier is grouped by owner partition; every owner
    answers from its local CSC (``_distributed_access`` merge semantics).
    Output blocks use GLOBAL (part-major) ids in ``srcdata[NID]``, ready for
    the sharded feature pull.
    """

    def __init__(self, pg: PartitionedGraphCSC, fanouts: Sequence[int],
                 batch_size: int, replace: bool = False,
                 seed: Optional[int] = None):
        self.pg = pg
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.replace = replace
        self._rng = np.random.default_rng(seed)

    def _assemble_block(self, seed_ids, res_nbr, res_eid, res_mask,
                        F_total: int):
        """Vectorized relabel + block build from per-seed (cap_dst,
        F_total) pick results; returns None when the native relabel is
        unavailable or seeds are duplicated (caller falls back)."""
        from .. import _native
        from ..dataloading.neighbor_sampler import _finalize_block

        cap_dst = seed_ids.shape[0]
        cap_src = cap_dst * (1 + F_total)
        sink = cap_dst - 1
        Ecap = cap_dst * F_total
        sent = np.where(
            seed_ids >= 0, seed_ids,
            -(np.arange(cap_dst, dtype=np.int64) + 2),
        )
        flat_nbr = res_nbr[res_mask]
        res = _native.unique_and_compact(np.concatenate([sent, flat_nbr]))
        if res is None:
            return None
        uniq, inv = res
        if uniq.shape[0] < cap_dst or not np.array_equal(
            uniq[:cap_dst], sent
        ):
            return None  # duplicate seeds: per-seed fallback handles them
        src_ids = np.full(cap_src, -1, dtype=np.int64)
        src_ids[: uniq.shape[0]] = uniq
        src_ids[:cap_dst] = seed_ids
        esrc = np.full(Ecap, sink, dtype=np.int64)
        edst = np.full(Ecap, sink, dtype=np.int64)
        eids_out = np.zeros(Ecap, dtype=np.int64)
        emask = np.zeros(Ecap, dtype=bool)
        rows, cols = np.nonzero(res_mask)
        pos = rows * F_total + cols
        esrc[pos] = inv[cap_dst:]
        edst[pos] = rows
        eids_out[pos] = res_eid[res_mask]
        emask[pos] = True

        class _IdtypeShimA:
            idtype = jnp.int32

        block = _finalize_block(
            _IdtypeShimA(), seed_ids, cap_dst, cap_src, src_ids,
            esrc, edst, eids_out, emask,
        )
        return block, src_ids

    def _sample_layer(self, seed_ids: np.ndarray, fanout: int):
        """One padded block like ``neighbor_sampler._build_padded_block``,
        with owner-grouped neighbor lookups."""
        from .. import _native, convert
        from ..dataloading.neighbor_sampler import _finalize_block

        pg = self.pg
        cap_dst = seed_ids.shape[0]
        cap_src = cap_dst * (1 + fanout)
        sink = cap_dst - 1
        Ecap = cap_dst * fanout

        # group the frontier by owner part (the _distributed_access pattern)
        real_slots = np.nonzero(seed_ids >= 0)[0]
        owners = (
            np.searchsorted(pg.ranges, seed_ids[real_slots], side="right") - 1
        )

        if _native.available():
            res_nbr = np.zeros((cap_dst, fanout), np.int64)
            res_eid = np.zeros((cap_dst, fanout), np.int64)
            res_mask = np.zeros((cap_dst, fanout), bool)
            ok = True
            for p in np.unique(owners):
                slots = real_slots[owners == p]
                local = seed_ids[slots] - pg.ranges[p]
                r = _native.sample_neighbors_fixed(
                    pg.indptr[p], pg.indices[p], pg.eids[p], local,
                    int(fanout), self.replace,
                    int(self._rng.integers(2**63)),
                )
                if r is None:
                    ok = False
                    break
                nbr, eid, mask = r
                res_nbr[slots] = nbr
                res_eid[slots] = eid
                res_mask[slots] = mask
            if ok:
                out = self._assemble_block(
                    seed_ids, res_nbr, res_eid, res_mask, int(fanout)
                )
                if out is not None:
                    return out

        src_ids = np.full(cap_src, -1, dtype=np.int64)
        src_ids[:cap_dst] = seed_ids
        lookup = {int(s): i for i, s in enumerate(seed_ids) if s >= 0}
        nxt = cap_dst
        esrc = np.full(Ecap, sink, dtype=np.int64)
        edst = np.full(Ecap, sink, dtype=np.int64)
        eids_out = np.zeros(Ecap, dtype=np.int64)
        emask = np.zeros(Ecap, dtype=bool)

        for p in np.unique(owners):
            for slot in real_slots[owners == p]:
                node = int(seed_ids[slot])
                nbrs, neids = pg.in_neighbors(node)
                deg = nbrs.shape[0]
                if deg == 0:
                    continue
                if self.replace or deg > fanout:
                    pick = self._rng.choice(
                        deg, size=min(fanout, deg), replace=self.replace
                    )
                else:
                    pick = np.arange(deg)
                for j, q in enumerate(pick):
                    u = int(nbrs[q])
                    loc = lookup.get(u)
                    if loc is None:
                        loc = nxt
                        lookup[u] = loc
                        src_ids[loc] = u
                        nxt += 1
                    pos = slot * fanout + j
                    esrc[pos] = loc
                    edst[pos] = slot
                    eids_out[pos] = neids[q]
                    emask[pos] = True

        class _IdtypeShim:
            idtype = jnp.int32

        block = _finalize_block(
            _IdtypeShim(), seed_ids, cap_dst, cap_src, src_ids,
            esrc, edst, eids_out, emask,
        )
        return block, src_ids

    def sample_blocks(self, seed_nodes):
        """seeds (global new ids) -> (input_nodes, output_nodes, blocks)."""
        seed_nodes = np.asarray(seed_nodes).astype(np.int64)
        if seed_nodes.shape[0] > self.batch_size:
            raise DGLError(
                f"{seed_nodes.shape[0]} seeds > batch_size {self.batch_size}"
            )
        cap0 = self.batch_size + 1
        cur = np.full(cap0, -1, dtype=np.int64)
        cur[: seed_nodes.shape[0]] = seed_nodes
        output_nodes = seed_nodes
        blocks = []
        for fanout in reversed(self.fanouts):
            block, cur = self._sample_layer(cur, fanout)
            blocks.insert(0, block)
        return cur, output_nodes, blocks


def node_split_by_owner(ids_new: np.ndarray, ranges: np.ndarray,
                        num_parts: int) -> List[np.ndarray]:
    """Split global (new) ids by owning partition — ``node_split`` semantics
    (reference ``dist_graph.py:1558``: each trainer works on the nodes its
    machine owns)."""
    owner = np.searchsorted(ranges, ids_new, side="right") - 1
    return [ids_new[owner == p] for p in range(num_parts)]


def stack_blocks(per_rank_blocks):
    """Stack P same-shape block lists into one (P, ...) pytree for
    ``shard_map``; strip the rank axis inside with
    ``jax.tree_util.tree_map(lambda a: a[0], blocks)``."""
    return jax.tree_util.tree_map(
        lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]), *per_rank_blocks
    )


def pull_rows_in_shard_map(ranges, table0, ids0, axis: str):
    """Fetch rows of a part-major row-sharded table for arbitrary global
    ids, callable INSIDE an existing ``shard_map`` (the KVStore pull of
    reference ``kvstore.py:1445`` as one masked request/response
    ``all_to_all`` pair; see also ``cooperative.sparse_all_to_all_pull``).

    ``table0``: (rows_max, F) this rank's shard. ``ids0``: (B,) global ids
    (out-of-range ids like padding return garbage rows — mask downstream).
    Returns (B, F).
    """
    ranges = jnp.asarray(ranges)
    nparts = jax.lax.axis_size(axis)
    me = jax.lax.axis_index(axis)
    owner = jnp.clip(
        jnp.searchsorted(ranges, ids0, side="right") - 1, 0, nparts - 1
    )
    onehot = owner[None, :] == jnp.arange(nparts)[:, None]          # (P, B)
    # not-mine slots carry sentinel -1: the RECEIVER reconstructs the
    # request mask from its own ownership range instead of a second
    # (P, B) int32 mask all_to_all (dryrun phase 7's HLO byte audit
    # showed the mask doubling the pull's id traffic)
    req = jnp.where(onehot, ids0[None, :], -1)
    req_t = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0)
    mine = jnp.logical_and(req_t >= ranges[me],
                           req_t < ranges[me + 1])
    local = jnp.clip(req_t - ranges[me], 0, table0.shape[0] - 1)
    rows = table0[local] * mine[..., None].astype(table0.dtype)     # (P, B, F)
    resp = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0)
    return jnp.sum(resp, axis=0)                                    # (B, F)


class DistNodeDataLoader:
    """Per-rank seed iteration + stacked fixed-shape MFGs.

    Mirrors reference ``DistDataLoader``/``DistNodeDataLoader``
    (``dist_dataloader.py:792``): every rank draws batches from its own
    ``node_split`` shard; short tails are padded so all ranks step in
    lockstep (collectives require it). Yields
    ``(input_nodes (P, S), output_nodes (P, B+1), blocks (P,...) pytree)``
    where padding slots carry id -1 in ``output_nodes`` masks.
    """

    def __init__(self, pg: PartitionedGraphCSC, train_ids_new,
                 sampler: DistNeighborSampler, batch_size: int,
                 shuffle: bool = True, seed: Optional[int] = None):
        self.pg = pg
        self.sampler = sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        self.splits = node_split_by_owner(
            np.asarray(train_ids_new, dtype=np.int64),
            pg.ranges, pg.num_parts,
        )
        self.steps_per_epoch = max(
            int(-(-len(s) // batch_size)) for s in self.splits
        )

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        orders = [
            self._rng.permutation(s) if self.shuffle else np.asarray(s)
            for s in self.splits
        ]
        B = self.batch_size
        for step in range(self.steps_per_epoch):
            in_nodes, out_nodes, blocks = [], [], []
            for p in range(self.pg.num_parts):
                batch = orders[p][step * B : (step + 1) * B]
                cur, out, blks = self.sampler.sample_blocks(batch)
                in_nodes.append(np.where(cur >= 0, cur, 0))
                padded_out = np.full(B, -1, dtype=np.int64)
                padded_out[: out.shape[0]] = out
                out_nodes.append(padded_out)
                blocks.append(blks)
            yield (
                jnp.asarray(np.stack(in_nodes)),
                jnp.asarray(np.stack(out_nodes)),
                [stack_blocks([blocks[p][l] for p in range(self.pg.num_parts)])
                 for l in range(len(self.sampler.fanouts))],
            )


class DistEdgeDataLoader:
    """Distributed edge-prediction loader (reference
    ``python/dgl/distributed/dist_dataloader.py:843`` ``DistEdgeDataLoader``:
    trainers iterate their own edge split, sample blocks for the endpoints
    plus uniform negatives, and train link prediction in lockstep).

    Seeds are edges in the partitioned (new) ID space, split by the dst's
    owning rank (edges live with their dst partition in CSC). Each step
    yields per-rank stacked, fixed-shape arrays:

    - ``pos (P, B, 2)`` positive (src, dst) pairs, -1 padded,
    - ``neg_dst (P, B, K)`` uniform negative dsts,
    - ``seeds (P, S)`` the unique endpoint ids fed to the sampler
      (S = B*(2+K)+1, -1 padded),
    - ``pos_idx (P, B, 2)`` / ``neg_idx (P, B, K)`` positions of each
      endpoint within ``seeds`` (clamped to 0 on padding — mask via pos/neg
      -1s),
    - ``input_nodes (P, S_in)`` and ``blocks`` as in ``DistNodeDataLoader``.
    """

    def __init__(self, pg: PartitionedGraphCSC, train_edges_new,
                 fanouts: Sequence[int], batch_size: int,
                 num_negatives: int = 1, shuffle: bool = True,
                 seed: Optional[int] = None):
        edges = np.asarray(train_edges_new, dtype=np.int64)
        if edges.ndim != 2 or edges.shape[1] != 2:
            raise DGLError("train_edges_new must be (E, 2) [src, dst] new ids")
        self.pg = pg
        self.batch_size = batch_size
        self.num_negatives = num_negatives
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)
        owner = np.searchsorted(pg.ranges, edges[:, 1], side="right") - 1
        self.splits = [edges[owner == p] for p in range(pg.num_parts)]
        self.steps_per_epoch = max(
            int(-(-len(s) // batch_size)) for s in self.splits
        )
        seed_cap = batch_size * (2 + num_negatives)
        self.sampler = DistNeighborSampler(pg, fanouts, batch_size=seed_cap)

    def __len__(self):
        return self.steps_per_epoch

    def __iter__(self):
        B, K = self.batch_size, self.num_negatives
        n_total = int(self.pg.ranges[-1])
        orders = [
            self._rng.permutation(len(s)) if self.shuffle
            else np.arange(len(s))
            for s in self.splits
        ]
        for step in range(self.steps_per_epoch):
            pos_r, neg_r, seeds_r, pidx_r, nidx_r = [], [], [], [], []
            in_r, blocks_r = [], []
            for p in range(self.pg.num_parts):
                sel = orders[p][step * B : (step + 1) * B]
                batch = self.splits[p][sel]
                nb = batch.shape[0]
                pos = np.full((B, 2), -1, dtype=np.int64)
                pos[:nb] = batch
                neg = self._rng.integers(0, n_total, size=(B, K))
                valid = np.concatenate([pos[:nb].ravel(), neg[:nb].ravel()])
                uniq = np.unique(valid)
                cur, _, blks = self.sampler.sample_blocks(uniq)
                # positions of endpoints within the sampler's seed slots:
                # uniq is sorted, so searchsorted beats an O(num_nodes)
                # lookup table per step
                pidx = np.where(
                    pos >= 0,
                    np.searchsorted(uniq, np.maximum(pos, 0)),
                    0,
                )
                nidx = np.searchsorted(uniq, neg)
                S = self.sampler.batch_size + 1
                seeds_pad = np.full(S, -1, dtype=np.int64)
                seeds_pad[: uniq.shape[0]] = uniq
                pos_r.append(pos)
                neg_r.append(neg)
                seeds_r.append(seeds_pad)
                pidx_r.append(pidx)
                nidx_r.append(nidx)
                in_r.append(np.where(cur >= 0, cur, 0))
                blocks_r.append(blks)
            yield (
                jnp.asarray(np.stack(pos_r)),
                jnp.asarray(np.stack(neg_r)),
                jnp.asarray(np.stack(seeds_r)),
                jnp.asarray(np.stack(pidx_r)),
                jnp.asarray(np.stack(nidx_r)),
                jnp.asarray(np.stack(in_r)),
                [stack_blocks([blocks_r[p][l]
                               for p in range(self.pg.num_parts)])
                 for l in range(len(self.sampler.fanouts))],
            )


__all__ += ["DistEdgeDataLoader"]


class DistEtypeNeighborSampler(DistNeighborSampler):
    """Per-edge-type fanout sampling over the homogenized partitioned graph
    (reference ``graph_services.py`` sample_etype_neighbors driving the
    DistDGL HETERO minibatch workflow, e.g. R-GCN/ogbn-mag).

    The graph is homogenized (``convert.to_homogeneous``), partitioned like
    :class:`PartitionedGraphCSC`, and each layer picks ``fanouts[t]``
    in-edges of each type per seed. Blocks keep STATIC shapes with a
    static per-slot etype layout: slot ``[seed, offs[t] + k]`` always
    holds a type-``t`` edge (masked when fewer exist), so the (E,) etypes
    array :class:`~dgl_tpu.nn.RelGraphConv` consumes is a constant.
    """

    def __init__(self, pg: PartitionedGraphCSC, type_per_edge,
                 etype_fanouts: Sequence[Sequence[int]], batch_size: int,
                 replace: bool = False, seed: Optional[int] = None):
        fanouts = [int(np.sum(f)) for f in etype_fanouts]
        super().__init__(pg, fanouts, batch_size, replace, seed)
        self.etype_fanouts = [np.asarray(f, np.int64) for f in etype_fanouts]
        self.type_per_edge = np.asarray(type_per_edge, np.int64)

    def layer_caps(self):
        """cap_dst of each layer's block: the innermost (last) layer seeds
        ``batch_size + 1`` slots; each outer layer's dst set is the inner
        layer's src capacity ``cap * (1 + sum(fanouts))``."""
        caps = [0] * len(self.etype_fanouts)
        cap = self.batch_size + 1
        for layer in range(len(self.etype_fanouts) - 1, -1, -1):
            caps[layer] = cap
            cap = cap * (1 + int(self.etype_fanouts[layer].sum()))
        return caps

    def slot_etypes(self, layer: int, cap_dst: Optional[int] = None):
        """The static (Ecap,) per-slot etype array of one layer's block."""
        f = self.etype_fanouts[layer]
        if cap_dst is None:
            cap_dst = self.layer_caps()[layer]
        per_seed = np.repeat(np.arange(f.shape[0], dtype=np.int64), f)
        return np.tile(per_seed, cap_dst)

    def _sample_layer_etype(self, seed_ids: np.ndarray, fanouts):
        from ..dataloading.neighbor_sampler import _finalize_block

        pg = self.pg
        fanouts = np.asarray(fanouts, np.int64)
        F_total = int(fanouts.sum())
        offs = np.concatenate([[0], np.cumsum(fanouts)])
        cap_dst = seed_ids.shape[0]
        cap_src = cap_dst * (1 + F_total)
        sink = cap_dst - 1
        Ecap = cap_dst * F_total

        real_slots = np.nonzero(seed_ids >= 0)[0]
        owners = (
            np.searchsorted(pg.ranges, seed_ids[real_slots], side="right") - 1
        )

        native = self._sample_layer_etype_native(
            seed_ids, fanouts, real_slots, owners
        )
        if native is not None:
            out = self._assemble_block(
                seed_ids, native[0], native[1], native[2], F_total
            )
            if out is not None:
                return out

        src_ids = np.full(cap_src, -1, dtype=np.int64)
        src_ids[:cap_dst] = seed_ids
        lookup = {int(s): i for i, s in enumerate(seed_ids) if s >= 0}
        nxt = cap_dst
        esrc = np.full(Ecap, sink, dtype=np.int64)
        edst = np.full(Ecap, sink, dtype=np.int64)
        eids_out = np.zeros(Ecap, dtype=np.int64)
        emask = np.zeros(Ecap, dtype=bool)

        for p in np.unique(owners):
            for slot in real_slots[owners == p]:
                node = int(seed_ids[slot])
                nbrs, neids = pg.in_neighbors(node)
                if nbrs.shape[0] == 0:
                    continue
                et = self.type_per_edge[neids]
                for t in range(fanouts.shape[0]):
                    f = int(fanouts[t])
                    if f == 0:
                        continue
                    cand = np.nonzero(et == t)[0]
                    if cand.size == 0:
                        continue
                    if self.replace or cand.size > f:
                        pick = cand[self._rng.choice(
                            cand.size, size=min(f, cand.size),
                            replace=self.replace,
                        )]
                    else:
                        pick = cand
                    for j, q in enumerate(pick):
                        u = int(nbrs[q])
                        loc = lookup.get(u)
                        if loc is None:
                            loc = nxt
                            lookup[u] = loc
                            src_ids[loc] = u
                            nxt += 1
                        pos = slot * F_total + int(offs[t]) + j
                        esrc[pos] = loc
                        edst[pos] = slot
                        eids_out[pos] = neids[q]
                        emask[pos] = True

        class _IdtypeShim:
            idtype = jnp.int32

        block = _finalize_block(
            _IdtypeShim(), seed_ids, cap_dst, cap_src, src_ids,
            esrc, edst, eids_out, emask,
        )
        return block, src_ids

    def _sample_layer_etype_native(self, seed_ids, fanouts, real_slots,
                                   owners):
        """Owner-grouped native per-etype pick: (cap_dst, F_total)
        nbr/eid/mask, or None when the native lib is unavailable."""
        from .. import _native

        if not _native.available():
            return None
        pg = self.pg
        cap_dst = seed_ids.shape[0]
        F_total = int(np.asarray(fanouts).sum())
        res_nbr = np.zeros((cap_dst, F_total), np.int64)
        res_eid = np.zeros((cap_dst, F_total), np.int64)
        res_mask = np.zeros((cap_dst, F_total), bool)
        for p in np.unique(owners):
            slots = real_slots[owners == p]
            local = seed_ids[slots] - pg.ranges[p]
            r = _native.sample_neighbors_etype(
                pg.indptr[p], pg.indices[p], pg.eids[p],
                self.type_per_edge, np.asarray(fanouts, np.int64), local,
                self.replace, int(self._rng.integers(2**63)),
            )
            if r is None:
                return None
            nbr, eid, mask = r
            res_nbr[slots] = nbr
            res_eid[slots] = eid
            res_mask[slots] = mask
        return res_nbr, res_eid, res_mask

    def sample_blocks(self, seed_nodes):
        seed_nodes = np.asarray(seed_nodes).astype(np.int64)
        if seed_nodes.shape[0] > self.batch_size:
            raise DGLError(
                f"{seed_nodes.shape[0]} seeds > batch_size {self.batch_size}"
            )
        cap0 = self.batch_size + 1
        cur = np.full(cap0, -1, dtype=np.int64)
        cur[: seed_nodes.shape[0]] = seed_nodes
        output_nodes = seed_nodes
        blocks = []
        for layer in range(len(self.etype_fanouts) - 1, -1, -1):
            block, cur = self._sample_layer_etype(
                cur, self.etype_fanouts[layer]
            )
            blocks.insert(0, block)
        return cur, output_nodes, blocks


__all__ += ["DistEtypeNeighborSampler"]
