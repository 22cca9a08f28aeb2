"""Heterogeneous fixed-shape neighbor sampler.

Extends the homogeneous static-shape MFG design (neighbor_sampler.py) to
heterographs (reference hetero ``NeighborSampler`` with per-etype fanouts,
``dataloading/neighbor_sampler.py`` + ``sample_neighbors`` etype dicts):
per-layer, per-canonical-etype fanouts; every node type gets a statically
capped slot space per layer (derived from batch_size x fanouts), with the
last slot per type as the padding sink. One pytree treedef across batches.
"""
from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np

from ..base import EID, NID
from ..graph import Graph
from .base import BlockSampler

__all__ = ["HeteroFixedShapeNeighborSampler"]


class HeteroFixedShapeNeighborSampler(BlockSampler):
    """``fanouts``: list (outermost-last like the homogeneous sampler's
    reversed use) of dicts {canonical_etype: fanout}. ``sample_blocks``
    takes seed dict {ntype: ids} (ids padded/truncated to ``batch_size``)."""

    def __init__(self, g: Graph, fanouts: Sequence[Dict], batch_size: int,
                 seed_ntype: str, replace: bool = False, seed=None, **kwargs):
        super().__init__(**kwargs)
        self.fanouts = [
            {g.to_canonical_etype(k): v for k, v in layer.items()}
            for layer in fanouts
        ]
        self.batch_size = batch_size
        self.seed_ntype = seed_ntype
        self.replace = replace
        self._rng = np.random.default_rng(seed)
        self._caps = self._compute_caps(g)

    def _compute_caps(self, g: Graph) -> List[Dict[str, int]]:
        """caps[l][ntype] = slot count (incl. sink) for layer l's dst space;
        caps has len(fanouts)+1 entries, last = seed layer."""
        L = len(self.fanouts)
        caps: List[Dict[str, int]] = [dict() for _ in range(L + 1)]
        caps[L] = {self.seed_ntype: self.batch_size + 1}
        for l in range(L - 1, -1, -1):
            layer_fanout = self.fanouts[l]
            nxt = caps[l + 1]
            cap: Dict[str, int] = dict(nxt)  # dst-in-src carryover
            for (st, et, dt), f in layer_fanout.items():
                if dt not in nxt:
                    continue
                cap[st] = cap.get(st, 0) + (nxt[dt] - 1) * f
            caps[l] = cap
        return caps

    def sample_blocks(self, g: Graph, seed_nodes, exclude_eids=None):
        from ..sampling.neighbor import sample_neighbors_fixed
        from .. import convert
        import jax.numpy as jnp

        excl: Dict = {}
        if exclude_eids is not None:
            # {etype: eids} — excluded picks are rerouted to the sink by
            # clearing their sample mask, so shapes stay static (reference
            # ``EdgePredictionSampler`` exclude semantics for heterographs)
            if not isinstance(exclude_eids, dict):
                raise TypeError(
                    "hetero exclude_eids must be {etype: eids}"
                )
            excl = {
                g.to_canonical_etype(k): np.asarray(v)
                for k, v in exclude_eids.items()
            }
        if not isinstance(seed_nodes, dict):
            seed_nodes = {self.seed_ntype: np.asarray(seed_nodes)}
        L = len(self.fanouts)
        # seed layer slots
        cur: Dict[str, np.ndarray] = {}
        cap0 = self._caps[L][self.seed_ntype]
        arr = np.full(cap0, -1, np.int64)
        s = np.asarray(seed_nodes[self.seed_ntype])[: self.batch_size]
        arr[: s.shape[0]] = s
        cur[self.seed_ntype] = arr
        output_nodes = dict(seed_nodes)
        blocks = []
        for l in range(L - 1, -1, -1):
            layer_fanout = self.fanouts[l]
            caps_src = self._caps[l]
            # src slot tables per ntype: dst slots first, then new uniques
            src_ids: Dict[str, np.ndarray] = {}
            lookup: Dict[str, Dict[int, int]] = {}
            nxt_free: Dict[str, int] = {}
            for nt, cap in caps_src.items():
                src_ids[nt] = np.full(cap, -1, np.int64)
                prior = cur.get(nt)
                lookup[nt] = {}
                if prior is not None:
                    src_ids[nt][: prior.shape[0]] = prior
                    for i, v in enumerate(prior):
                        if v >= 0 and int(v) not in lookup[nt]:
                            lookup[nt][int(v)] = i
                    nxt_free[nt] = prior.shape[0]
                else:
                    nxt_free[nt] = 0
            data_dict = {}
            eid_frames = {}
            emask_frames = {}
            for cet, f in layer_fanout.items():
                st, et, dt = cet
                if dt not in cur:
                    continue
                seeds_arr = cur[dt]
                cap_dst = seeds_arr.shape[0]
                sink_dst = cap_dst - 1
                sink_src = caps_src[st] - 1
                real = seeds_arr >= 0
                real_seeds = seeds_arr[real]
                nbr, eid, mask = sample_neighbors_fixed(
                    g, real_seeds, f, replace=self.replace, etype=cet,
                    seed=int(self._rng.integers(2**31)),
                )
                ex = excl.get(cet)
                if ex is not None and ex.size:
                    mask = mask & ~np.isin(eid, ex)
                Ecap = cap_dst * f
                esrc = np.full(Ecap, sink_src, np.int64)
                edst = np.full(Ecap, sink_dst, np.int64)
                eids_out = np.zeros(Ecap, np.int64)
                emask = np.zeros(Ecap, bool)
                slots = np.nonzero(real)[0]
                lk = lookup[st]
                sid = src_ids[st]
                for r, slot in enumerate(slots):
                    for j in range(f):
                        if not mask[r, j]:
                            continue
                        u = int(nbr[r, j])
                        loc = lk.get(u)
                        if loc is None:
                            loc = nxt_free[st]
                            if loc >= sink_src:  # never claim the sink
                                continue
                            lk[u] = loc
                            sid[loc] = u
                            nxt_free[st] = loc + 1
                        pos = slot * f + j
                        esrc[pos] = loc
                        edst[pos] = slot
                        eids_out[pos] = eid[r, j]
                        emask[pos] = True
                data_dict[cet] = (esrc, edst)
                eid_frames[cet] = eids_out
                emask_frames[cet] = emask
            block = convert.create_block(
                data_dict,
                num_src_nodes={nt: caps_src[nt] for nt in caps_src},
                num_dst_nodes={nt: cur[nt].shape[0] for nt in cur},
                idtype=g.idtype,
            )
            for cet in data_dict:
                rel = block._relations[cet]
                rel.max_in_degree = rel.num_edges_padded
                rel.max_out_degree = rel.num_edges_padded
            for nt, sid in src_ids.items():
                block._node_frames.setdefault(nt, {})[NID] = jnp.asarray(
                    np.where(sid >= 0, sid, 0)
                )
                block._node_frames[nt]["_mask"] = jnp.asarray(sid >= 0)
            for nt, darr in cur.items():
                block._dst_frames.setdefault(nt, {})[NID] = jnp.asarray(
                    np.where(darr >= 0, darr, 0)
                )
                block._dst_frames[nt]["_mask"] = jnp.asarray(darr >= 0)
            for cet in data_dict:
                block._edge_frames.setdefault(cet, {})[EID] = jnp.asarray(
                    eid_frames[cet]
                )
                block._edge_frames[cet]["_mask"] = jnp.asarray(
                    emask_frames[cet]
                )
            blocks.insert(0, block)
            cur = src_ids
        return cur, output_nodes, blocks
