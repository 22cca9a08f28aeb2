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
            nxt_free: Dict[str, int] = {}
            for nt, cap in caps_src.items():
                src_ids[nt] = np.full(cap, -1, np.int64)
                prior = cur.get(nt)
                if prior is not None:
                    src_ids[nt][: prior.shape[0]] = prior
                    nxt_free[nt] = prior.shape[0]
                else:
                    nxt_free[nt] = 0
            data_dict = {}
            eid_frames = {}
            emask_frames = {}
            # pass 1: per-etype picks (native fast path inside
            # sample_neighbors_fixed) collected in etype order
            picks = {}
            for cet, f in layer_fanout.items():
                st, et, dt = cet
                if dt not in cur:
                    continue
                seeds_arr = cur[dt]
                real = seeds_arr >= 0
                nbr, eid, mask = sample_neighbors_fixed(
                    g, seeds_arr[real], f, replace=self.replace, etype=cet,
                    seed=int(self._rng.integers(2**31)),
                )
                ex = excl.get(cet)
                if ex is not None and ex.size:
                    mask = mask & ~np.isin(eid, ex)
                picks[cet] = (nbr, eid, mask, np.nonzero(real)[0], f)

            # pass 2: per-ntype relabel via ONE first-occurrence unique
            # over [prior slots, all picks in etype order]. Exactly matches
            # the per-pick dict walk: drops only begin once capacity is
            # full, after which nothing is ever added, so first-appearance
            # rank == slot for every admitted node.
            streams: Dict[str, list] = {nt: [] for nt in caps_src}
            for cet, (nbr, eid, mask, slots, f) in picks.items():
                streams[cet[0]].append(nbr[mask])
            from ..graphbolt.base import (
                _unique_first_occurrence_inverse as _relabel,
            )

            offsets: Dict[str, Dict] = {}
            for nt, parts in streams.items():
                prior = cur.get(nt)
                nprior = prior.shape[0] if prior is not None else 0
                sent = (
                    np.where(
                        prior >= 0, prior,
                        -(np.arange(nprior, dtype=np.int64) + 2),
                    )
                    if prior is not None else np.zeros(0, np.int64)
                )
                stream = np.concatenate([sent] + parts) if parts or nprior \
                    else np.zeros(0, np.int64)
                uniq, inv = _relabel(stream)
                # prior slots are unique by construction (previous layer's
                # src table), so they occupy the first nprior unique ranks
                assert not nprior or np.array_equal(uniq[:nprior], sent)
                sink_src = caps_src[nt] - 1
                keep = min(uniq.shape[0], sink_src)
                src_ids[nt][:keep] = uniq[:keep]
                if nprior:
                    src_ids[nt][:nprior] = prior  # restore -1 padding
                nxt_free[nt] = max(keep, nprior)
                # per-etype segments of inv, in insertion order
                pos = nprior
                offsets[nt] = {}
                for cet, (nbr, eid, mask, slots, f) in picks.items():
                    if cet[0] != nt:
                        continue
                    cnt = int(mask.sum())
                    offsets[nt][cet] = inv[pos: pos + cnt]
                    pos += cnt

            # pass 3: fill the static edge arrays
            for cet, (nbr, eid, mask, slots, f) in picks.items():
                st, et, dt = cet
                seeds_arr = cur[dt]
                cap_dst = seeds_arr.shape[0]
                sink_dst = cap_dst - 1
                sink_src = caps_src[st] - 1
                Ecap = cap_dst * f
                esrc = np.full(Ecap, sink_src, np.int64)
                edst = np.full(Ecap, sink_dst, np.int64)
                eids_out = np.zeros(Ecap, np.int64)
                emask = np.zeros(Ecap, bool)
                rows, cols = np.nonzero(mask)
                loc = offsets[st][cet]
                ok = loc < sink_src  # capacity drops keep the sink
                pos = slots[rows] * f + cols
                esrc[pos[ok]] = loc[ok]
                edst[pos[ok]] = slots[rows[ok]]
                eids_out[pos[ok]] = eid[mask][ok]
                emask[pos[ok]] = True
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
