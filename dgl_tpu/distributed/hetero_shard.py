"""Heterogeneous fixed-shape shards + halo-exchange message passing.

Generalizes ``shard.py``/``dist_spmm.py`` to heterographs: per-ntype
part-major relabeling and halo routing tables, per-etype edge tables in the
extended (local + halo) source space, and a shard_map step that runs one
``all_to_all`` per source ntype followed by per-etype local SpMMs combined
per destination type (the R-GCN / papers100M distributed configuration).
"""
from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..graph import Graph

__all__ = [
    "HeteroGraphShards",
    "build_hetero_shards",
    "dist_hetero_copy_u_sum",
    "init_hetero_halo_state",
    "dist_hetero_copy_u_sum_delayed",
]


@dataclass
class HeteroGraphShards:
    num_parts: int
    ntypes: tuple
    cetypes: tuple
    n_max: Dict[str, int]
    h_max: Dict[str, int]
    e_max: Dict[tuple, int]
    ranges: Dict[str, np.ndarray]
    order: Dict[str, np.ndarray]        # new->old per ntype
    new_of_old: Dict[str, np.ndarray]
    # device tables
    send_idx: Dict[str, jnp.ndarray]    # per src ntype (P, P, h_max)
    send_mask: Dict[str, jnp.ndarray]
    src_ext: Dict[tuple, jnp.ndarray]   # per cetype (P, e_max)
    dst_local: Dict[tuple, jnp.ndarray]
    in_deg: Dict[str, jnp.ndarray]      # per dst ntype (P, n_max) total over etypes
    eids_tbl: Dict[tuple, np.ndarray]   # per cetype (P, e_max) original eids
    e_mask: Dict[tuple, np.ndarray]     # per cetype (P, e_max) real-edge mask

    def shard_features(self, feats: Dict[str, np.ndarray]):
        out = {}
        for nt, x in feats.items():
            x = np.asarray(x)
            buf = np.zeros((self.num_parts, self.n_max[nt]) + x.shape[1:],
                           x.dtype)
            r = self.ranges[nt]
            for p in range(self.num_parts):
                ids_old = self.order[nt][r[p] : r[p + 1]]
                buf[p, : ids_old.shape[0]] = x[ids_old]
            out[nt] = jnp.asarray(buf)
        return out

    def unshard(self, sharded: Dict[str, jnp.ndarray]):
        out = {}
        for nt, x in sharded.items():
            x = np.asarray(x)
            N = self.ranges[nt][-1]
            buf = np.zeros((N,) + x.shape[2:], x.dtype)
            r = self.ranges[nt]
            for p in range(self.num_parts):
                ids_old = self.order[nt][r[p] : r[p + 1]]
                buf[ids_old] = x[p, : ids_old.shape[0]]
            out[nt] = jnp.asarray(buf)
        return out

    def shard_edge_data(self, cet, w):
        """Map per-edge values ``w`` (E,[F]) of etype ``cet`` into the
        (P, e_max[, F]) layout matching ``src_ext``/``dst_local`` edge
        order; padding slots get zeros (reference DistGraph edata access)."""
        w = np.asarray(w)
        tbl = self.eids_tbl[cet]
        m = self.e_mask[cet]
        out = w[tbl] * m.reshape(m.shape + (1,) * (w.ndim - 1)).astype(
            w.dtype
        )
        return jnp.asarray(out)


def build_hetero_shards(g: Graph, assign: Dict[str, np.ndarray],
                        num_parts: int, pad_multiple: int = 8
                        ) -> HeteroGraphShards:
    def rup(x):
        return max(int(-(-x // pad_multiple) * pad_multiple), pad_multiple)

    ntypes = tuple(g.ntypes)
    cetypes = tuple(g.canonical_etypes)
    order, new_of_old, ranges, n_max = {}, {}, {}, {}
    for nt in ntypes:
        parts = np.asarray(assign[nt], np.int64)
        o = np.argsort(parts, kind="stable")
        order[nt] = o
        noo = np.empty(parts.shape[0], np.int64)
        noo[o] = np.arange(parts.shape[0])
        new_of_old[nt] = noo
        counts = np.bincount(parts, minlength=num_parts)
        ranges[nt] = np.concatenate([[0], np.cumsum(counts)])
        n_max[nt] = rup(int(counts.max()) if counts.size else 0)

    # collect halo requirements per src ntype: (q -> p) -> set of local rows
    halo_sets: Dict[str, list] = {
        nt: [[set() for _ in range(num_parts)] for _ in range(num_parts)]
        for nt in ntypes
    }
    edge_info = {}
    for cet in cetypes:
        st, _, dt = cet
        rel = g._relations[cet]
        E = rel.num_edges
        src = np.asarray(rel.src)[:E]
        dst = np.asarray(rel.dst)[:E]
        src_new = new_of_old[st][src]
        dst_new = new_of_old[dt][dst]
        sp_ = np.searchsorted(ranges[st], src_new, side="right") - 1
        dp_ = np.searchsorted(ranges[dt], dst_new, side="right") - 1
        sl = src_new - ranges[st][sp_]
        dl = dst_new - ranges[dt][dp_]
        edge_info[cet] = (sp_, sl, dp_, dl)
        rem = sp_ != dp_
        for q, p, r in zip(sp_[rem], dp_[rem], sl[rem]):
            halo_sets[st][q][p].add(int(r))

    h_max = {}
    halo_pos = {}
    for nt in ntypes:
        hm = 0
        for q in range(num_parts):
            for p in range(num_parts):
                hm = max(hm, len(halo_sets[nt][q][p]))
        h_max[nt] = rup(hm)
        halo_pos[nt] = {}
        for q in range(num_parts):
            for p in range(num_parts):
                rows = sorted(halo_sets[nt][q][p])
                halo_pos[nt][(q, p)] = {r: i for i, r in enumerate(rows)}

    send_idx, send_mask = {}, {}
    for nt in ntypes:
        si = np.zeros((num_parts, num_parts, h_max[nt]), np.int32)
        sm = np.zeros((num_parts, num_parts, h_max[nt]), bool)
        for q in range(num_parts):
            for p in range(num_parts):
                rows = sorted(halo_sets[nt][q][p])
                si[q, p, : len(rows)] = rows
                sm[q, p, : len(rows)] = True
        send_idx[nt] = jnp.asarray(si)
        send_mask[nt] = jnp.asarray(sm)

    src_ext, dst_local, e_max = {}, {}, {}
    eids_tbl, e_mask = {}, {}
    in_deg_np = {nt: np.zeros((num_parts, n_max[nt]), np.float32)
                 for nt in ntypes}
    for cet in cetypes:
        st, _, dt = cet
        sp_, sl, dp_, dl = edge_info[cet]
        counts = np.bincount(dp_, minlength=num_parts)
        em = rup(int(counts.max()) if counts.size else 0)
        e_max[cet] = em
        se = np.zeros((num_parts, em), np.int32)
        de = np.full((num_parts, em), n_max[dt], np.int32)
        et = np.zeros((num_parts, em), np.int64)
        emk = np.zeros((num_parts, em), bool)
        for p in range(num_parts):
            sel = np.nonzero(dp_ == p)[0]
            o = np.argsort(dl[sel], kind="stable")
            sel = sel[o]
            k = sel.shape[0]
            et[p, :k] = sel
            emk[p, :k] = True
            de[p, :k] = dl[sel]
            np.add.at(in_deg_np[dt][p], dl[sel], 1.0)
            ext = np.empty(k, np.int64)
            local = sp_[sel] == p
            ext[local] = sl[sel][local]
            rem = ~local
            if rem.any():
                qs = sp_[sel][rem]
                rows = sl[sel][rem]
                slots = np.array(
                    [halo_pos[st][(int(q), p)][int(r)]
                     for q, r in zip(qs, rows)], np.int64,
                )
                ext[rem] = n_max[st] + qs * h_max[st] + slots
            se[p, :k] = ext
        src_ext[cet] = jnp.asarray(se)
        dst_local[cet] = jnp.asarray(de)
        eids_tbl[cet] = et
        e_mask[cet] = emk

    return HeteroGraphShards(
        num_parts=num_parts, ntypes=ntypes, cetypes=cetypes,
        n_max=n_max, h_max=h_max, e_max=e_max,
        ranges=ranges, order=order, new_of_old=new_of_old,
        send_idx=send_idx, send_mask=send_mask,
        src_ext=src_ext, dst_local=dst_local,
        in_deg={nt: jnp.asarray(v) for nt, v in in_deg_np.items()},
        eids_tbl=eids_tbl, e_mask=e_mask,
    )


def _hetero_run(mesh, shards, feats, axis, mean, eweights=None,
                halo_state=None):
    """Shared driver for the fresh- and delayed-halo hetero SpMM.

    ``eweights``: optional {cetype: (P, e_max)} per-edge scalars laid out by
    ``shards.shard_edge_data`` (edge-weighted R-GCN / GCN-norm messages).
    ``halo_state``: optional {ntype: (P, P, h_max, F)} stale halo rows; when
    given, local aggregation reads the STALE rows while the fresh exchange
    runs (delayed aggregation, reference ``python/dgl/distgnn/``), and the
    fresh rows are returned as the new state.
    """
    ntypes = shards.ntypes
    cetypes = shards.cetypes
    s = NamedSharding(mesh, P(axis))
    put = lambda x: jax.device_put(x, s)  # noqa: E731

    delayed = halo_state is not None
    has_ew = eweights is not None
    xs = tuple(feats[nt] for nt in ntypes)
    sidx = tuple(put(shards.send_idx[nt]) for nt in ntypes)
    smask = tuple(put(shards.send_mask[nt]) for nt in ntypes)
    sext = tuple(put(shards.src_ext[cet]) for cet in cetypes)
    dloc = tuple(put(shards.dst_local[cet]) for cet in cetypes)
    indeg = tuple(put(shards.in_deg[nt]) for nt in ntypes)
    ew = tuple(
        put(eweights[cet]) if has_ew and cet in eweights else put(jnp.zeros((shards.num_parts, 1)))
        for cet in cetypes
    )
    halo = tuple(
        halo_state[nt] if delayed else put(jnp.zeros((shards.num_parts, 1)))
        for nt in ntypes
    )
    nt_index = {nt: i for i, nt in enumerate(ntypes)}

    specs = lambda tup: tuple(P(axis) for _ in tup)  # noqa: E731

    @partial(
        shard_map, mesh=mesh,
        in_specs=(specs(xs), specs(sidx), specs(smask), specs(sext),
                  specs(dloc), specs(indeg), specs(ew), specs(halo)),
        out_specs=(tuple(P(axis) for _ in ntypes),
                   tuple(P(axis) for _ in ntypes)),
    )
    def run(xs_blk, sidx_blk, smask_blk, sext_blk, dloc_blk, indeg_blk,
            ew_blk, halo_blk):
        # halo exchange once per src ntype
        ext_space = {}
        fresh = []
        for i, nt in enumerate(ntypes):
            x0 = xs_blk[i][0]
            sb = x0[sidx_blk[i][0]] * smask_blk[i][0][..., None].astype(x0.dtype)
            recv = jax.lax.all_to_all(sb, axis, split_axis=0, concat_axis=0,
                                      tiled=False)
            fresh.append(recv[None])
            use = halo_blk[i][0] if delayed else recv
            Pn, hm, F = use.shape
            ext_space[nt] = jnp.concatenate(
                [x0, use.reshape(Pn * hm, F)], axis=0
            )
        outs = [None] * len(ntypes)
        for j, cet in enumerate(cetypes):
            st, _, dt = cet
            msgs = ext_space[st][sext_blk[j][0]]
            if has_ew:
                msgs = msgs * ew_blk[j][0][..., None]
            agg = jax.ops.segment_sum(
                msgs, dloc_blk[j][0], num_segments=shards.n_max[dt],
                indices_are_sorted=True,
            )
            k = nt_index[dt]
            outs[k] = agg if outs[k] is None else outs[k] + agg
        res = []
        for i, nt in enumerate(ntypes):
            o = outs[i]
            if o is None:
                o = jnp.zeros_like(xs_blk[i][0])
            if mean:
                o = o / jnp.maximum(indeg_blk[i][0], 1.0)[:, None]
            res.append(o[None])
        return tuple(res), tuple(fresh)

    out, fresh = run(xs, sidx, smask, sext, dloc, indeg, ew, halo)
    outd = {nt: out[i] for i, nt in enumerate(ntypes)}
    if delayed:
        return outd, {nt: fresh[i] for i, nt in enumerate(ntypes)}
    return outd


def dist_hetero_copy_u_sum(mesh: Mesh, shards: HeteroGraphShards,
                           feats: Dict[str, jnp.ndarray],
                           axis: str = "gp", mean: bool = False,
                           eweights: Dict = None):
    """Per-etype halo-exchange SpMM, summed per destination ntype
    (``multi_update_all(copy_u, sum; cross sum)`` semantics; with
    ``eweights`` the message is ``u_mul_e``)."""
    return _hetero_run(mesh, shards, feats, axis, mean, eweights=eweights)


def init_hetero_halo_state(mesh: Mesh, shards: HeteroGraphShards,
                           feat_dims: Dict[str, int], dtype=jnp.float32,
                           axis: str = "gp"):
    """Zero halo cache per ntype for the delayed-aggregation variant."""
    s = NamedSharding(mesh, P(axis))
    return {
        nt: jax.device_put(
            jnp.zeros((shards.num_parts, shards.num_parts,
                       shards.h_max[nt], feat_dims[nt]), dtype), s
        )
        for nt in shards.ntypes
    }


def dist_hetero_copy_u_sum_delayed(mesh: Mesh, shards: HeteroGraphShards,
                                   feats: Dict[str, jnp.ndarray],
                                   halo_state: Dict,
                                   axis: str = "gp", mean: bool = False,
                                   eweights: Dict = None):
    """Delayed-halo hetero aggregation: remote rows come from the previous
    iteration's state while the fresh exchange overlaps with the local
    SpMMs. Returns ``(out_dict, new_halo_state)``; thread the state through
    the training loop (one-iteration staleness, reference distgnn)."""
    return _hetero_run(mesh, shards, feats, axis, mean, eweights=eweights,
                       halo_state=halo_state)
