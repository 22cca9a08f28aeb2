"""Neighbor sampling (reference ``python/dgl/sampling/neighbor.py:222``
``sample_neighbors`` -> C++ ``src/graph/sampling/neighbor/neighbor.cc:858``
-> ``src/array/cpu/rowwise_pick.h:27-50``).

Two APIs:

- ``sample_neighbors``: reference-compatible, returns an edge-induced
  subgraph over the original node space (ragged, host-side) — used by the
  BlockSampler path before ``to_block`` padding.
- ``sample_neighbors_fixed``: TPU-native fast path returning **dense padded
  (num_seeds, fanout) arrays** directly (no ragged intermediate), the shape
  the fixed-shape MFG pipeline consumes.
"""
from __future__ import annotations

from typing import Dict, Mapping, Optional, Union

import numpy as np

from ..base import DGLError, EID
from ..graph import Graph

__all__ = ["sample_neighbors", "sample_neighbors_fixed", "in_subgraph_sample", "temporal_sample_neighbors"]


def _np(x):
    return np.asarray(x)


def _host_prob(g: Graph, cet, name: str) -> Optional[np.ndarray]:
    """Edge-weight array as host float64, converted once per underlying
    array (keyed by id) — per-call conversion of an E-sized frame entry
    would dominate sampling time on large graphs."""
    frame = g._edge_frames.get(cet, {})
    if name not in frame:
        return None
    arr = frame[name]
    cache = g.__dict__.setdefault("_host_prob_cache", {})
    key = (cet, name, id(arr))
    if key not in cache:
        cache[key] = np.ascontiguousarray(_np(arr), dtype=np.float64)
    return cache[key]


def _pick(
    rng: np.random.Generator,
    indptr: np.ndarray,
    eids: np.ndarray,
    seeds: np.ndarray,
    fanout: int,
    replace: bool,
    prob: Optional[np.ndarray],
):
    """Per-seed neighbor pick; returns flat edge-id array (ragged).

    Mirrors the reference PickFn semantics (``rowwise_pick.h:27-50``,
    ``rowwise_sampling.cc:33-73``): fanout -1 = all neighbors; with a prob
    array only positive-weight edges are candidates and !replace picks
    ``min(fanout, #positive)``. Weighted picks run in native OpenMP code
    (``csrc/host_ops.cpp sample_neighbors_prob``) when available.
    """
    if fanout >= 0 and seeds.size:
        from .. import _native

        indices_dummy = eids  # only eids are consumed downstream
        if prob is not None:
            res = _native.sample_neighbors_prob(
                indptr, indices_dummy, eids, prob, seeds, int(fanout),
                replace, int(rng.integers(2**63)),
            )
        else:
            res = _native.sample_neighbors_fixed(
                indptr, indices_dummy, eids, seeds, int(fanout),
                replace, int(rng.integers(2**63)),
            )
        if res is not None:
            _, eid, mask = res
            return eid[mask]
    if fanout < 0 and prob is None and seeds.size:
        # keep-all: one vectorized ragged range gather instead of a
        # per-seed loop (the MultiLayerFullNeighborSampler hot path)
        starts = indptr[seeds]
        lens = indptr[seeds + 1] - starts
        total = int(lens.sum())
        if total == 0:
            return np.zeros(0, dtype=eids.dtype)
        reps = np.repeat(
            starts - np.concatenate([[0], np.cumsum(lens)[:-1]]), lens
        )
        return eids[np.arange(total) + reps]
    out = []
    for s in seeds:
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        deg = hi - lo
        if deg == 0:
            continue
        row_eids = eids[lo:hi]
        if prob is not None:
            p = prob[row_eids].astype(np.float64)
            pos = np.nonzero(p > 0)[0]
            if pos.size == 0:
                continue
            if fanout < 0 or (pos.size <= fanout and not replace):
                out.append(row_eids[pos])
                continue
            pp = p[pos] / p[pos].sum()
            idx = pos[rng.choice(pos.size, size=fanout, replace=replace,
                                 p=pp)]
        elif fanout < 0 or (deg <= fanout and not replace):
            out.append(row_eids)
            continue
        else:
            idx = (
                rng.integers(0, deg, fanout)
                if replace
                else rng.choice(deg, size=fanout, replace=False)
            )
        out.append(row_eids[idx])
    if not out:
        return np.zeros(0, dtype=eids.dtype)
    return np.concatenate(out)


def sample_neighbors(
    g: Graph,
    nodes,
    fanout: Union[int, Dict],
    edge_dir: str = "in",
    prob: Optional[str] = None,
    replace: bool = False,
    copy_ndata: bool = True,
    copy_edata: bool = True,
    exclude_edges=None,
    seed: Optional[int] = None,
) -> Graph:
    """Sample in/out-neighbors per seed; returns the sampled edge subgraph
    over the original node space (reference ``neighbor.py:222``)."""
    from ..subgraph import edge_subgraph

    rng = np.random.default_rng(seed)
    if not isinstance(nodes, Mapping):
        if len(g.ntypes) != 1:
            raise DGLError("node dict required for heterographs")
        nodes = {g.ntypes[0]: nodes}
    nodes = {nt: np.atleast_1d(_np(v)).astype(np.int64) for nt, v in nodes.items()}

    excl = {}
    if exclude_edges is not None:
        if not isinstance(exclude_edges, Mapping):
            excl = {g.canonical_etypes[0]: _np(exclude_edges)}
        else:
            excl = {g.to_canonical_etype(k): _np(v) for k, v in exclude_edges.items()}

    edges = {}
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        f = fanout[cet] if isinstance(fanout, Mapping) else (
            fanout.get(cet[1]) if isinstance(fanout, Mapping) else fanout
        )
        if isinstance(fanout, Mapping):
            f = fanout.get(cet, fanout.get(cet[1], 0))
        if edge_dir == "in":
            seeds = nodes.get(dt, np.zeros(0, np.int64))
            indptr, eids = rel.host_arrays("csc_indptr", "csc_eids")
        elif edge_dir == "out":
            seeds = nodes.get(st, np.zeros(0, np.int64))
            indptr, eids = rel.host_arrays("csr_indptr", "csr_eids")
        else:
            raise DGLError(f"edge_dir must be 'in' or 'out', got {edge_dir!r}")
        p = _host_prob(g, cet, prob) if prob is not None else None
        picked = _pick(rng, indptr, eids, seeds, int(f), replace, p)
        if cet in excl and picked.size:
            picked = np.setdiff1d(picked, excl[cet])
        edges[cet] = picked
    sub = edge_subgraph(g, edges, relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        for nt in sub.ntypes:
            sub._node_frames[nt] = {}
    if not copy_edata:
        for cet in sub.canonical_etypes:
            keep = {EID: sub._edge_frames[cet][EID]}
            sub._edge_frames[cet] = keep
    return sub


def sample_neighbors_fixed(
    g: Graph,
    seeds,
    fanout: int,
    edge_dir: str = "in",
    replace: bool = False,
    prob: Optional[str] = None,
    etype=None,
    seed: Optional[int] = None,
):
    """TPU-native fixed-shape sampler.

    Returns ``(nbr, eid, mask)`` dense arrays of shape (num_seeds, fanout):
    neighbor ids, edge ids, and validity mask (False = padding). This is the
    layout the padded-MFG pipeline consumes directly; no ragged intermediate.
    """
    rng = np.random.default_rng(seed)
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    seeds = np.atleast_1d(_np(seeds)).astype(np.int64)
    if edge_dir == "in":
        indptr, indices, eids = rel.host_arrays(
            "csc_indptr", "csc_indices", "csc_eids"
        )
    else:
        indptr, indices, eids = rel.host_arrays(
            "csr_indptr", "csr_indices", "csr_eids"
        )
    from .. import _native

    if prob is None:
        # native OpenMP rowwise pick (csrc/host_ops.cpp); numpy fallback below
        res = _native.sample_neighbors_fixed(
            indptr, indices, eids, seeds, fanout, replace,
            rng.integers(2**63),
        )
        if res is not None:
            return res
    else:
        p_host = _host_prob(g, cet, prob)
        if p_host is not None:
            res = _native.sample_neighbors_prob(
                indptr, indices, eids, p_host, seeds, fanout,
                replace, rng.integers(2**63),
            )
            if res is not None:
                return res
    n = seeds.shape[0]
    nbr = np.zeros((n, fanout), dtype=np.int64)
    eid = np.zeros((n, fanout), dtype=np.int64)
    mask = np.zeros((n, fanout), dtype=bool)
    p_all = _host_prob(g, cet, prob) if prob is not None else None
    for i, s in enumerate(seeds):
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        deg = hi - lo
        if deg == 0:
            continue
        if p_all is not None:
            # reference semantics: only positive-weight edges are candidates
            p = p_all[eids[lo:hi]].astype(np.float64)
            pos = np.nonzero(p > 0)[0]
            if pos.size == 0:
                continue
            if pos.size <= fanout and not replace:
                k, sel = pos.size, pos
            else:
                k = fanout
                sel = pos[rng.choice(pos.size, size=k, replace=replace,
                                     p=p[pos] / p[pos].sum())]
        elif deg <= fanout and not replace:
            k = deg
            sel = np.arange(deg)
        else:
            k = fanout
            if replace:
                sel = rng.integers(0, deg, k)
            else:
                sel = rng.choice(deg, size=k, replace=False)
        nbr[i, :k] = indices[lo:hi][sel]
        eid[i, :k] = eids[lo:hi][sel]
        mask[i, :k] = True
    return nbr, eid, mask


def in_subgraph_sample(g: Graph, nodes) -> Graph:
    """All in-edges of the seeds (reference ``dgl.in_subgraph``)."""
    from ..subgraph import in_subgraph

    return in_subgraph(g, nodes)


def temporal_sample_neighbors(
    g: Graph,
    nodes,
    fanout: int,
    node_timestamp: str = "timestamp",
    edge_timestamp: Optional[str] = None,
    seed_timestamps=None,
    replace: bool = False,
    etype=None,
    seed: Optional[int] = None,
):
    """Temporal neighbor sampling (reference GraphBolt
    ``temporal_sample_neighbors``, ``fused_csc_sampling_graph.cc``
    TemporalPick): only neighbors/edges strictly older than the seed's
    timestamp are eligible.

    Returns dense padded ``(nbr, eid, mask)`` like ``sample_neighbors_fixed``.
    ``seed_timestamps`` overrides per-seed times (else read from
    ``ndata[node_timestamp]``).
    """
    rng = np.random.default_rng(seed)
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    seeds = np.atleast_1d(_np(nodes)).astype(np.int64)
    indptr, indices, eids = rel.host_arrays(
        "csc_indptr", "csc_indices", "csc_eids"
    )
    if seed_timestamps is not None:
        seed_ts = np.atleast_1d(_np(seed_timestamps))
    else:
        nt_all = _np(g._node_frames[cet[2]][node_timestamp])
        seed_ts = nt_all[seeds]
    nbr_ts_all = None
    if edge_timestamp is not None:
        e_ts = _np(g._edge_frames[cet][edge_timestamp])
    else:
        e_ts = None
        nbr_ts_all = _np(g._node_frames[cet[0]][node_timestamp])
    n = seeds.shape[0]
    nbr = np.zeros((n, fanout), np.int64)
    eid = np.zeros((n, fanout), np.int64)
    mask = np.zeros((n, fanout), bool)
    for i, (s, t) in enumerate(zip(seeds, seed_ts)):
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        row_nbr = indices[lo:hi]
        row_eid = eids[lo:hi]
        if e_ts is not None:
            ok = e_ts[row_eid] < t
        else:
            ok = nbr_ts_all[row_nbr] < t
        cand = np.nonzero(ok)[0]
        if cand.size == 0:
            continue
        if cand.size <= fanout and not replace:
            sel = cand
        elif replace:
            sel = cand[rng.integers(0, cand.size, fanout)]
        else:
            sel = cand[rng.choice(cand.size, fanout, replace=False)]
        k = sel.shape[0]
        nbr[i, :k] = row_nbr[sel]
        eid[i, :k] = row_eid[sel]
        mask[i, :k] = True
    return nbr, eid, mask


def select_topk(g: Graph, k, weight: str, nodes=None, edge_dir: str = "in",
                ascending: bool = False, copy_ndata: bool = True,
                copy_edata: bool = True) -> Graph:
    """Per-node top-k in/out-edges by edge weight (reference
    ``sampling/neighbor.py:880``): deterministic pick of the k largest
    (or smallest with ``ascending``) weighted edges per seed."""
    from ..subgraph import edge_subgraph

    if nodes is None:
        nodes = {nt: np.arange(g.num_nodes(nt), dtype=np.int64)
                 for nt in g.ntypes}
    elif not isinstance(nodes, Mapping):
        if len(g.ntypes) != 1:
            raise DGLError("node dict required for heterographs")
        nodes = {g.ntypes[0]: nodes}
    nodes = {nt: np.atleast_1d(_np(v)).astype(np.int64)
             for nt, v in nodes.items()}
    edges = {}
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        kk = k[cet] if isinstance(k, Mapping) else k
        if edge_dir == "in":
            seeds = nodes.get(dt, np.zeros(0, np.int64))
            indptr, eids = rel.host_arrays("csc_indptr", "csc_eids")
        elif edge_dir == "out":
            seeds = nodes.get(st, np.zeros(0, np.int64))
            indptr, eids = rel.host_arrays("csr_indptr", "csr_eids")
        else:
            raise DGLError(f"edge_dir must be 'in' or 'out', got {edge_dir!r}")
        frame = g._edge_frames.get(cet, {})
        if weight not in frame:
            raise DGLError(f"edge weight {weight!r} not found for {cet}")
        w = _np(frame[weight]).astype(np.float64)
        # native OpenMP rowwise top-k (csrc/host_ops.cpp select_topk_rows)
        from .. import _native

        res = (
            _native.select_topk_rows(
                indptr, eids, eids, w, seeds, int(kk), not ascending
            )
            if seeds.size and int(kk) > 0 else None
        )
        if res is not None:
            _, eid_pick, mask = res
            edges[cet] = eid_pick[mask]
            continue
        out = []
        for s in seeds:
            row_eids = eids[indptr[s] : indptr[s + 1]]
            if row_eids.size == 0:
                continue
            rw = w[row_eids]
            order = np.argsort(rw if ascending else -rw, kind="stable")
            out.append(row_eids[order[: min(int(kk), row_eids.size)]])
        edges[cet] = (np.concatenate(out) if out
                      else np.zeros(0, np.int64))
    sub = edge_subgraph(g, edges, relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        for nt in sub.ntypes:
            sub._node_frames[nt] = {}
    if not copy_edata:
        for cet in sub.canonical_etypes:
            sub._edge_frames[cet] = {EID: sub._edge_frames[cet][EID]}
    return sub


def sample_neighbors_biased(g: Graph, nodes, fanout, bias,
                            edge_dir: str = "in",
                            tag_offset_name: str = "_TAG_OFFSET",
                            replace: bool = False, copy_ndata: bool = True,
                            copy_edata: bool = True,
                            seed: Optional[int] = None) -> Graph:
    """Tag-biased neighbor sampling (reference
    ``sampling/neighbor.py:690`` / C++ ``CSRRowWiseSamplingBiased``):
    neighbors are grouped by node tag (see
    ``transforms.sort_csc_by_tag``) and tag ``t`` is picked with
    probability proportional to ``bias[t]`` times its block size."""
    from ..subgraph import edge_subgraph

    if len(g.ntypes) != 1:
        raise DGLError("biased sampling supports homogeneous graphs")
    nt = g.ntypes[0]
    cet = g.canonical_etypes[0]
    offs_frame = g._node_frames.get(nt, {})
    if tag_offset_name not in offs_frame:
        raise DGLError(
            f"{tag_offset_name!r} missing: run sort_csc_by_tag (edge_dir="
            "'in') or sort_csr_by_tag ('out') first"
        )
    offsets = _np(offs_frame[tag_offset_name])
    bias = _np(bias).astype(np.float64)
    rel = g._relations[cet]
    if edge_dir == "in":
        indptr, eids = rel.host_arrays("csc_indptr", "csc_eids")
    elif edge_dir == "out":
        indptr, eids = rel.host_arrays("csr_indptr", "csr_eids")
    else:
        raise DGLError(f"edge_dir must be 'in' or 'out', got {edge_dir!r}")
    rng = np.random.default_rng(seed)
    seeds = np.atleast_1d(_np(nodes)).astype(np.int64)
    # native path: expand the tag bias to a per-edge weight once (vectorized
    # over the whole graph) and run the weighted OpenMP pick
    from .. import _native

    if seeds.size and _native.available():
        blocks = np.diff(offsets, axis=1).astype(np.int64)      # (N, T)
        n_rows = offsets.shape[0]
        prob_pos = np.repeat(np.tile(bias, n_rows), blocks.ravel())
        if eids.size and prob_pos.shape[0] == indptr[n_rows]:
            prob_eid = np.zeros(eids.max() + 1, np.float64)
            prob_eid[eids[: indptr[n_rows]]] = prob_pos
            res = _native.sample_neighbors_prob(
                indptr, eids, eids, prob_eid, seeds, int(fanout),
                replace, int(rng.integers(2**63)),
            )
            if res is not None:
                _, eid_pick, mask = res
                edges = {cet: eid_pick[mask]}
                sub = edge_subgraph(g, edges, relabel_nodes=False,
                                    store_ids=True)
                if not copy_ndata:
                    sub._node_frames[nt] = {}
                if not copy_edata:
                    sub._edge_frames[cet] = {
                        EID: sub._edge_frames[cet][EID]
                    }
                return sub
    out = []
    for s in seeds:
        row_eids = eids[indptr[s] : indptr[s + 1]]
        deg = row_eids.size
        if deg == 0:
            continue
        block = np.diff(offsets[s])  # per-tag neighbor counts
        p = np.repeat(bias, block.astype(np.int64))
        if p.shape[0] != deg:
            raise DGLError(
                "tag offsets disagree with degree; re-run the tag sort"
            )
        tot = p.sum()
        if tot <= 0:
            continue
        p = p / tot
        take = int(fanout)
        if not replace:
            # zero-bias tags leave fewer eligible candidates than deg
            take = min(take, int(np.count_nonzero(p)))
        idx = rng.choice(deg, size=take, replace=replace, p=p)
        out.append(row_eids[idx])
    edges = {cet: np.concatenate(out) if out else np.zeros(0, np.int64)}
    sub = edge_subgraph(g, edges, relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        sub._node_frames[nt] = {}
    if not copy_edata:
        sub._edge_frames[cet] = {EID: sub._edge_frames[cet][EID]}
    return sub


__all__ += ["select_topk", "sample_neighbors_biased"]


def sample_etype_neighbors(
    g: Graph,
    nodes,
    etype_offset,
    fanout,
    edge_dir: str = "in",
    prob=None,
    exclude_edges=None,
    replace: bool = False,
    copy_ndata: bool = True,
    copy_edata: bool = True,
    etype_sorted: bool = False,
    seed: Optional[int] = None,
) -> Graph:
    """Per-edge-type fanout sampling on an etype-grouped homogeneous graph
    (reference ``python/dgl/sampling/neighbor.py:69`` — DistDGL samples the
    homogenized partition this way; edge IDs are grouped by etype and
    ``etype_offset[t]`` is the first edge ID of type ``t``).

    ``fanout`` is a per-etype vector (-1 = keep all); ``prob`` an optional
    list of per-etype weight arrays indexed by local (within-type) edge ID.
    """
    from ..subgraph import edge_subgraph

    if len(g.ntypes) != 1 or len(g.canonical_etypes) != 1:
        raise DGLError(
            "sample_etype_neighbors operates on the homogenized graph "
            "(one ntype/etype); use sample_neighbors for heterographs"
        )
    rng = np.random.default_rng(seed)
    cet = g.canonical_etypes[0]
    rel = g._relations[cet]
    seeds = np.atleast_1d(_np(nodes)).astype(np.int64)
    if edge_dir == "in":
        indptr, eids = rel.host_arrays("csc_indptr", "csc_eids")
    elif edge_dir == "out":
        indptr, eids = rel.host_arrays("csr_indptr", "csr_eids")
    else:
        raise DGLError(f"edge_dir must be 'in' or 'out', got {edge_dir!r}")
    offsets = np.asarray(etype_offset, dtype=np.int64)
    if offsets[-1] != g.num_edges():
        offsets = np.append(offsets, g.num_edges())
    fan = np.atleast_1d(_np(fanout)).astype(np.int64)
    num_et = offsets.shape[0] - 1
    if fan.shape[0] != num_et:
        raise DGLError(
            f"fanout has {fan.shape[0]} entries but etype_offset implies "
            f"{num_et} edge types"
        )
    excl = (
        np.atleast_1d(_np(exclude_edges)).astype(np.int64)
        if exclude_edges is not None else None
    )
    # native fast path: fixed per-etype fanouts, no prob, no exclusions
    # (the OpenMP pick in csrc/host_ops.cpp::sample_neighbors_etype)
    if (
        prob is None and excl is None and (fan >= 0).all()
        and seeds.size
    ):
        from .. import _native

        # per-edge type id from the offset buckets, indexed by EDGE ID
        # (edge ids are grouped by type, so this is one repeat)
        type_per_edge = np.repeat(
            np.arange(offsets.shape[0] - 1, dtype=np.int64),
            np.diff(offsets),
        )
        res = _native.sample_neighbors_etype(
            indptr,
            eids,  # indices unused downstream; eids drive the subgraph
            eids, type_per_edge, fan, seeds, replace,
            int(rng.integers(2**63)),
        )
        if res is not None:
            _, eid_mat, mask = res
            picked = eid_mat[mask]
            sub = edge_subgraph(
                g, {cet: picked}, relabel_nodes=False, store_ids=True
            )
            if not copy_ndata:
                for nt in sub.ntypes:
                    sub._node_frames[nt] = {}
            if not copy_edata:
                for c in sub.canonical_etypes:
                    sub._edge_frames[c] = {EID: sub._edge_frames[c][EID]}
            return sub

    picked_all = []
    for s in seeds:
        lo, hi = int(indptr[s]), int(indptr[s + 1])
        row = eids[lo:hi]
        if excl is not None and row.size:
            row = row[~np.isin(row, excl)]
        if row.size == 0:
            continue
        # edge IDs are grouped by etype, so the type of an edge is the
        # offset bucket its global ID falls into
        et = np.searchsorted(offsets, row, side="right") - 1
        for t in range(num_et):
            cand = row[et == t]
            f = int(fan[t])
            if cand.size == 0 or f == 0:
                continue
            p = None
            if prob is not None and prob[t] is not None:
                p = np.asarray(prob[t], dtype=np.float64)[cand - offsets[t]]
                keepmask = p > 0
                cand, p = cand[keepmask], p[keepmask]
                if cand.size == 0:
                    continue
                p = p / p.sum()
            if f < 0 or (not replace and cand.size <= f):
                picked_all.append(cand)
                continue
            if replace:
                idx = rng.choice(cand.size, size=f, replace=True, p=p)
            else:
                idx = rng.choice(cand.size, size=f, replace=False, p=p)
            picked_all.append(cand[idx])
    picked = (
        np.concatenate(picked_all) if picked_all
        else np.zeros(0, dtype=np.int64)
    )
    sub = edge_subgraph(g, {cet: picked}, relabel_nodes=False, store_ids=True)
    if not copy_ndata:
        for nt in sub.ntypes:
            sub._node_frames[nt] = {}
    if not copy_edata:
        for c in sub.canonical_etypes:
            sub._edge_frames[c] = {EID: sub._edge_frames[c][EID]}
    return sub


def sample_neighbors_fused(
    g: Graph,
    nodes,
    fanout: Union[int, Dict],
    edge_dir: str = "in",
    prob: Optional[str] = None,
    replace: bool = False,
    copy_ndata: bool = True,
    copy_edata: bool = True,
    exclude_edges=None,
    mapping: Optional[dict] = None,
    seed: Optional[int] = None,
) -> Graph:
    """``sample_neighbors`` fused with node renumbering (reference
    ``python/dgl/sampling/neighbor.py:399``): the result is relabeled so the
    seed nodes take IDs ``0..len(seeds)-1`` and sampled neighbors follow in
    order of appearance. Original IDs are stored as ``ndata[NID]`` /
    ``edata[EID]``; ``mapping`` (if a dict) receives per-ntype
    original->new id arrays, mirroring the reference's reusable buffer.
    """
    from ..base import NID
    from ..graph import Relation

    sub = sample_neighbors(
        g, nodes, fanout, edge_dir=edge_dir, prob=prob, replace=replace,
        copy_ndata=True, copy_edata=True, exclude_edges=exclude_edges,
        seed=seed,
    )
    if not isinstance(nodes, Mapping):
        nodes = {g.ntypes[0]: nodes}
    seeds = {
        nt: np.atleast_1d(_np(v)).astype(np.int64) for nt, v in nodes.items()
    }
    # per-ntype order: seeds first, then other endpoints by appearance
    order: Dict[str, np.ndarray] = {}
    for nt in g.ntypes:
        parts = [seeds.get(nt, np.zeros(0, np.int64))]
        for cet in g.canonical_etypes:
            st, _, dt = cet
            rel = sub._relations[cet]
            if st == nt:
                parts.append(_np(rel.src)[: rel.num_edges])
            if dt == nt:
                parts.append(_np(rel.dst)[: rel.num_edges])
        cat = np.concatenate(parts) if parts else np.zeros(0, np.int64)
        uniq, first = np.unique(cat, return_index=True)
        order[nt] = cat[np.sort(first)]
    remap = {}
    for nt, ids in order.items():
        m = np.full(g.num_nodes(nt), -1, dtype=np.int64)
        m[ids] = np.arange(ids.shape[0], dtype=np.int64)
        remap[nt] = m
        if isinstance(mapping, dict):
            mapping[nt] = m
    rels = {}
    import jax.numpy as jnp

    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = sub._relations[cet]
        rels[cet] = Relation.from_coo(
            remap[st][_np(rel.src)[: rel.num_edges]],
            remap[dt][_np(rel.dst)[: rel.num_edges]],
            order[st].shape[0],
            order[dt].shape[0],
            idtype=g.idtype,
        )
    out = Graph(rels, {nt: order[nt].shape[0] for nt in g.ntypes})
    for nt in g.ntypes:
        frame = {}
        if copy_ndata:
            for k, v in g._node_frames.get(nt, {}).items():
                frame[k] = jnp.asarray(v)[jnp.asarray(order[nt])]
        frame[NID] = jnp.asarray(order[nt])
        out._node_frames[nt] = frame
    for cet in g.canonical_etypes:
        frame = dict(sub._edge_frames.get(cet, {})) if copy_edata else {}
        if EID in sub._edge_frames.get(cet, {}):
            frame[EID] = sub._edge_frames[cet][EID]
        out._edge_frames[cet] = frame
    return out


__all__ += ["sample_etype_neighbors", "sample_neighbors_fused"]
