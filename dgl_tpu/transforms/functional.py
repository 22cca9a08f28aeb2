"""Functional graph transforms (reference ``python/dgl/transforms/functional.py``).

Structure-changing transforms run on host numpy and return new immutable
Graphs (the reference crosses into C++ at the same boundary:
``src/graph/transform/``).
"""
from __future__ import annotations

from typing import Dict, List, Mapping, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError, EID, NID
from ..graph import Graph, Relation

__all__ = [
    "add_self_loop",
    "remove_self_loop",
    "add_reverse_edges",
    "add_edges",
    "remove_edges",
    "add_nodes",
    "to_bidirected",
    "to_simple",
    "khop_graph",
    "khop_adj",
    "knn_graph",
    "laplacian_lambda_max",
    "metapath_reachable_graph",
    "compact_graphs",
    "to_block",
    "reverse",
    "line_graph",
    "random_walk_pe",
    "lap_pe",
    "shortest_dist",
    "reorder_graph",
    "ppr",
    "heat_kernel",
    "sign_diffusion",
    "to_levi",
    "double_radius_node_labeling",
    "svd_pe",
]


def _np(x):
    return np.asarray(x)


def _rebuild(
    g: Graph,
    cet,
    new_src,
    new_dst,
    *,
    num_src=None,
    num_dst=None,
    edge_map: Optional[np.ndarray] = None,
    edge_defaults: Optional[Dict] = None,
) -> Graph:
    """Replace one relation's edges; carry node frames; map edge frames.

    ``edge_map[i]`` = old eid for new edge i, or -1 for a fresh edge (its
    features take zeros, matching the reference's zero-init of new edges in
    ``dgl.add_edges``/``add_self_loop``).
    """
    st, _, dt = cet
    ns = g.num_src_nodes(st) if num_src is None else num_src
    nd = g.num_dst_nodes(dt) if num_dst is None else num_dst
    rels = dict(g._relations)
    rels[cet] = Relation.from_coo(new_src, new_dst, ns, nd, idtype=g.idtype)
    nsrc = dict(g._num_src_nodes)
    ndst = dict(g._num_dst_nodes)
    nsrc[st] = ns
    ndst[dt] = nd
    if not g.is_block:
        nsrc[dt] = nd
        ndst[st] = ns if st in ndst else ndst.get(st, ns)
        if st == dt:
            nsrc[st] = ns
    out = Graph(rels, nsrc, ndst, is_block=g.is_block)
    for nt, f in g._node_frames.items():
        out._node_frames[nt] = dict(f)
    if g.is_block:
        for nt, f in g._dst_frames.items():
            out._dst_frames[nt] = dict(f)
    for c, f in g._edge_frames.items():
        if c != cet:
            out._edge_frames[c] = dict(f)
    if edge_map is not None:
        old = g._edge_frames.get(cet, {})
        newf = {}
        fresh = edge_map < 0
        safe = np.where(fresh, 0, edge_map)
        for k, v in old.items():
            v = jnp.asarray(v)
            nv = v[jnp.asarray(safe)]
            if fresh.any():
                mask = jnp.asarray(fresh).reshape((-1,) + (1,) * (nv.ndim - 1))
                fill = jnp.zeros_like(nv)
                if edge_defaults and k in edge_defaults:
                    fill = jnp.broadcast_to(jnp.asarray(edge_defaults[k]), nv.shape).astype(nv.dtype)
                nv = jnp.where(mask, fill, nv)
            newf[k] = nv
        out._edge_frames[cet] = newf
    return out


def add_self_loop(g: Graph, edge_feat_names=None, fill_data=1.0, etype=None) -> Graph:
    """Add a self-loop per node (reference ``functional.py`` ``add_self_loop``).

    Like the reference, existing self-loops are kept (callers usually do
    ``remove_self_loop`` first).
    """
    cet = g.to_canonical_etype(etype)
    if cet[0] != cet[2]:
        raise DGLError("add_self_loop requires src and dst type to match")
    rel = g._relations[cet]
    n = g.num_nodes(cet[0])
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    loops = np.arange(n, dtype=src.dtype)
    new_src = np.concatenate([src, loops])
    new_dst = np.concatenate([dst, loops])
    edge_map = np.concatenate(
        [np.arange(rel.num_edges, dtype=np.int64), np.full(n, -1, np.int64)]
    )
    defaults = None
    if fill_data is not None:
        keys = edge_feat_names
        if keys is None:
            keys = list(g._edge_frames.get(cet, {}).keys())
        defaults = {k: fill_data for k in keys}
    return _rebuild(g, cet, new_src, new_dst, edge_map=edge_map, edge_defaults=defaults)


def remove_self_loop(g: Graph, etype=None) -> Graph:
    """Remove self-loop edges (reference ``functional.py`` ``remove_self_loop``)."""
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    keep = np.nonzero(src != dst)[0]
    return _rebuild(g, cet, src[keep], dst[keep], edge_map=keep.astype(np.int64))


def add_reverse_edges(g: Graph, readonly=None, copy_ndata=True, copy_edata=False, etype=None) -> Graph:
    """Append reversed edges (reference ``functional.py`` ``add_reverse_edges``)."""
    cet = g.to_canonical_etype(etype)
    if cet[0] != cet[2]:
        raise DGLError("add_reverse_edges requires a homogeneous relation")
    rel = g._relations[cet]
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    new_src = np.concatenate([src, dst])
    new_dst = np.concatenate([dst, src])
    e = np.arange(rel.num_edges, dtype=np.int64)
    edge_map = np.concatenate([e, e]) if copy_edata else np.concatenate(
        [e, np.full(rel.num_edges, -1, np.int64)]
    )
    return _rebuild(g, cet, new_src, new_dst, edge_map=edge_map)


def add_edges(g: Graph, u, v, data=None, etype=None) -> Graph:
    """Return a new graph with edges (u, v) appended (reference
    ``heterograph.py`` ``add_edges`` — mutation becomes functional here)."""
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    u = np.atleast_1d(_np(u)).astype(np.int64)
    v = np.atleast_1d(_np(v)).astype(np.int64)
    src = np.concatenate([_np(rel.src)[: rel.num_edges], u])
    dst = np.concatenate([_np(rel.dst)[: rel.num_edges], v])
    ns = max(g.num_src_nodes(cet[0]), int(u.max()) + 1 if u.size else 0)
    nd = max(g.num_dst_nodes(cet[2]), int(v.max()) + 1 if v.size else 0)
    if cet[0] == cet[2]:
        ns = nd = max(ns, nd)
    edge_map = np.concatenate(
        [np.arange(rel.num_edges, dtype=np.int64), np.full(u.size, -1, np.int64)]
    )
    out = _rebuild(g, cet, src, dst, num_src=ns, num_dst=nd, edge_map=edge_map)
    if data:
        f = out._edge_frames.setdefault(cet, {})
        for k, val in data.items():
            val = jnp.asarray(val)
            if k in f:
                f[k] = jnp.concatenate([f[k][: rel.num_edges], val])
            else:
                base = jnp.zeros((rel.num_edges,) + val.shape[1:], val.dtype)
                f[k] = jnp.concatenate([base, val])
    return out


def remove_edges(g: Graph, eids, etype=None, store_ids: bool = False) -> Graph:
    """Return a new graph without edges ``eids`` (reference ``remove_edges``)."""
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    eids = np.atleast_1d(_np(eids)).astype(np.int64)
    keep = np.setdiff1d(np.arange(rel.num_edges, dtype=np.int64), eids)
    src = _np(rel.src)[keep]
    dst = _np(rel.dst)[keep]
    out = _rebuild(g, cet, src, dst, edge_map=keep)
    if store_ids:
        out._edge_frames.setdefault(cet, {})[EID] = jnp.asarray(keep)
    return out


def add_nodes(g: Graph, num: int, data=None, ntype=None) -> Graph:
    """Return a new graph with ``num`` extra nodes (reference ``add_nodes``)."""
    nt = ntype or (g.ntypes[0] if len(g.ntypes) == 1 else None)
    if nt is None:
        raise DGLError("ntype required")
    rels = dict(g._relations)
    nsrc = dict(g._num_src_nodes)
    ndst = dict(g._num_dst_nodes)
    old_n = nsrc[nt]
    nsrc[nt] = old_n + num
    if nt in ndst:
        ndst[nt] = ndst[nt] + num
    # rebuild relations touching nt so indptr arrays get the new length
    for cet, rel in g._relations.items():
        if cet[0] == nt or cet[2] == nt:
            rels[cet] = Relation.from_coo(
                _np(rel.src)[: rel.num_edges],
                _np(rel.dst)[: rel.num_edges],
                nsrc[cet[0]],
                ndst[cet[2]],
                idtype=g.idtype,
            )
    out = Graph(rels, nsrc, ndst, is_block=g.is_block)
    for t, f in g._node_frames.items():
        if t == nt:
            newf = {}
            for k, v in f.items():
                v = jnp.asarray(v)
                init = g._get_initializer("node", k, nt)
                if init is not None:
                    pad = jnp.asarray(
                        init((num,) + v.shape[1:], v.dtype)
                    )
                else:
                    pad = jnp.zeros((num,) + v.shape[1:], v.dtype)
                if data and k in data:
                    pad = jnp.asarray(data[k]).astype(v.dtype)
                newf[k] = jnp.concatenate([v, pad])
            out._node_frames[t] = newf
        else:
            out._node_frames[t] = dict(f)
    if data:
        f = out._node_frames.setdefault(nt, {})
        for k, v in data.items():
            if k not in f:
                v = jnp.asarray(v)
                base = jnp.zeros((old_n,) + v.shape[1:], v.dtype)
                f[k] = jnp.concatenate([base, v])
    for c, f in g._edge_frames.items():
        out._edge_frames[c] = dict(f)
    return out


def to_bidirected(g: Graph, copy_ndata: bool = False) -> Graph:
    """Undirected simple graph: edge (u,v) implies (v,u), dedup (reference
    ``functional.py`` ``to_bidirected``)."""
    cet = g.to_canonical_etype(None)
    rel = g._relations[cet]
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    allsrc = np.concatenate([src, dst])
    alldst = np.concatenate([dst, src])
    pairs = np.unique(np.stack([allsrc, alldst], axis=1), axis=0)
    out = _rebuild(g, cet, pairs[:, 0], pairs[:, 1])
    if not copy_ndata:
        out._node_frames = {}
    out._edge_frames = {}
    return out


def to_simple(
    g: Graph,
    return_counts: Optional[str] = "count",
    writeback_mapping: bool = False,
    copy_ndata: bool = True,
    copy_edata: bool = False,
):
    """Deduplicate parallel edges (reference ``functional.py`` ``to_simple``,
    C++ ``src/graph/transform/to_simple.cc``)."""
    out_rels = {}
    counts = {}
    wb = {}
    for cet in g.canonical_etypes:
        rel = g._relations[cet]
        src = _np(rel.src)[: rel.num_edges]
        dst = _np(rel.dst)[: rel.num_edges]
        pairs = np.stack([src, dst], axis=1)
        uniq, inverse, cnt = np.unique(
            pairs, axis=0, return_inverse=True, return_counts=True
        )
        out_rels[cet] = Relation.from_coo(
            uniq[:, 0], uniq[:, 1],
            g.num_src_nodes(cet[0]), g.num_dst_nodes(cet[2]), idtype=g.idtype,
        )
        counts[cet] = jnp.asarray(cnt.astype(np.int64))
        wb[cet] = jnp.asarray(inverse.astype(np.int64))
    out = Graph(out_rels, dict(g._num_src_nodes), dict(g._num_dst_nodes))
    if copy_ndata:
        for nt, f in g._node_frames.items():
            out._node_frames[nt] = dict(f)
    if return_counts:
        for cet in g.canonical_etypes:
            out._edge_frames.setdefault(cet, {})[return_counts] = counts[cet]
    if writeback_mapping:
        if len(g.canonical_etypes) == 1:
            return out, wb[g.canonical_etypes[0]]
        return out, wb
    return out


def reverse(g: Graph, copy_ndata=True, copy_edata=True) -> Graph:
    """Reverse all edges (reference ``functional.py`` ``reverse``)."""
    return g.reverse(copy_ndata=copy_ndata, copy_edata=copy_edata)


def khop_graph(g: Graph, k: int) -> Graph:
    """Graph whose edges connect k-hop pairs, with multiplicity = #paths
    (reference ``functional.py`` ``khop_graph``)."""
    import scipy.sparse as sp

    cet = g.to_canonical_etype(None)
    rel = g._relations[cet]
    n = g.num_nodes()
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    adj = sp.csr_matrix((np.ones(src.size), (src, dst)), shape=(n, n))
    ak = adj ** k
    coo = ak.tocoo()
    # expand multiplicity into parallel edges like the reference
    reps = coo.data.astype(np.int64)
    new_src = np.repeat(coo.row, reps)
    new_dst = np.repeat(coo.col, reps)
    return _rebuild(g, cet, new_src, new_dst)


def khop_adj(g: Graph, k: int):
    """Dense k-hop adjacency (reference ``functional.py`` ``khop_adj``)."""
    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    a = np.zeros((n, n), np.float32)
    np.add.at(a, (src, dst), 1.0)
    return jnp.asarray(np.linalg.matrix_power(a, k))


def knn_graph(x, k: int, algorithm: str = "bruteforce", dist: str = "euclidean") -> Graph:
    """kNN graph over point features (reference ``transforms/functional.py``
    ``knn_graph`` / C++ ``src/graph/transform/knn.cc``): edge from each of the
    k nearest neighbors to the query point."""
    from .. import convert

    x = jnp.asarray(x)
    n = x.shape[0]
    k = min(k, n)
    if dist == "cosine":
        xn = x / (jnp.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        d = -(xn @ xn.T)
    else:
        sq = jnp.sum(x * x, axis=1)
        d = sq[:, None] - 2 * (x @ x.T) + sq[None, :]
    _, idx = jax.lax.top_k(-d, k)  # (n, k) nearest (incl. self)
    src = np.asarray(idx).reshape(-1)
    dst = np.repeat(np.arange(n), k)
    return convert.graph((src, dst), num_nodes=n)


def laplacian_lambda_max(g: Graph) -> List[float]:
    """Largest eigenvalue of the normalized Laplacian per batch graph
    (reference ``functional.py`` ``laplacian_lambda_max``)."""
    import scipy.sparse as sp
    from scipy.sparse import linalg as spla

    from ..batch import unbatch

    graphs = unbatch(g) if g.batch_size > 1 else [g]
    out = []
    for gg in graphs:
        n = gg.num_nodes()
        rel = gg._relation(None)
        src = _np(rel.src)[: rel.num_edges]
        dst = _np(rel.dst)[: rel.num_edges]
        adj = sp.csr_matrix((np.ones(src.size), (src, dst)), shape=(n, n))
        deg = np.asarray(adj.sum(axis=1)).ravel()
        dinv = sp.diags(1.0 / np.sqrt(np.maximum(deg, 1e-12)))
        lap = sp.eye(n) - dinv @ adj @ dinv
        if n <= 2:
            out.append(float(np.linalg.eigvals(lap.toarray()).real.max()))
        else:
            out.append(
                float(
                    spla.eigsh(lap, 1, which="LM", return_eigenvectors=False)[0]
                )
            )
    return out


def metapath_reachable_graph(g: Graph, metapath: Sequence) -> Graph:
    """Compose relations along a metapath (reference ``functional.py``
    ``metapath_reachable_graph``)."""
    import scipy.sparse as sp

    cets = [g.to_canonical_etype(et) for et in metapath]
    mat = None
    for cet in cets:
        rel = g._relations[cet]
        src = _np(rel.src)[: rel.num_edges]
        dst = _np(rel.dst)[: rel.num_edges]
        m = sp.csr_matrix(
            (np.ones(src.size), (src, dst)),
            shape=(g.num_nodes(cet[0]), g.num_nodes(cet[2])),
        )
        mat = m if mat is None else mat @ m
    mat = (mat > 0).tocoo()
    st, dt = cets[0][0], cets[-1][2]
    from .. import convert

    if st == dt:
        out = convert.graph((mat.row, mat.col), num_nodes=g.num_nodes(st))
        for k, v in g._node_frames.get(st, {}).items():
            out._node_frames["_N"][k] = v
        return out
    out = convert.heterograph(
        {(st, "_E", dt): (mat.row, mat.col)},
        {st: g.num_nodes(st), dt: g.num_nodes(dt)},
    )
    for nt in (st, dt):
        for k, v in g._node_frames.get(nt, {}).items():
            out._node_frames.setdefault(nt, {})[k] = v
    return out


def compact_graphs(graphs, always_preserve=None):
    """Drop nodes with no edges across all given graphs, relabeling
    consistently (reference ``transforms/functional.py`` ``compact_graphs``,
    C++ ``src/graph/transform/compact.cc``)."""
    single = isinstance(graphs, Graph)
    if single:
        graphs = [graphs]
    g0 = graphs[0]
    used = {nt: np.zeros(g0.num_nodes(nt), dtype=bool) for nt in g0.ntypes}
    if always_preserve is not None:
        if not isinstance(always_preserve, Mapping):
            always_preserve = {g0.ntypes[0]: always_preserve}
        for nt, ids in always_preserve.items():
            used[nt][_np(ids)] = True
    for g in graphs:
        for cet in g.canonical_etypes:
            rel = g._relations[cet]
            used[cet[0]][_np(rel.src)[: rel.num_edges]] = True
            used[cet[2]][_np(rel.dst)[: rel.num_edges]] = True
    keep = {nt: np.nonzero(m)[0] for nt, m in used.items()}
    from ..subgraph import node_subgraph

    outs = [node_subgraph(g, keep) for g in graphs]
    return outs[0] if single else outs


def to_block(g: Graph, dst_nodes=None, include_dst_in_src: bool = True, src_nodes=None) -> Graph:
    """Convert a frontier graph to a bipartite MFG block (reference
    ``python/dgl/transforms/to_block.py`` / C++ ``to_block.cc:136``).

    DST nodes come first in the SRC space (``include_dst_in_src``), matching
    the reference layout that lets layers slice ``h[:num_dst]``.
    """
    from .. import convert

    if dst_nodes is None:
        dst_nodes = {}
        for cet in g.canonical_etypes:
            rel = g._relations[cet]
            d = np.unique(_np(rel.dst)[: rel.num_edges])
            prev = dst_nodes.get(cet[2])
            dst_nodes[cet[2]] = (
                d if prev is None else np.union1d(prev, d)
            )
    elif not isinstance(dst_nodes, Mapping):
        dst_nodes = {g.ntypes[0]: _np(dst_nodes)}
    dst_nodes = {nt: _np(v).astype(np.int64) for nt, v in dst_nodes.items()}

    # vectorized relabel (the reference does this in C++, to_block.cc:136):
    # dst positions via stable searchsorted against the (seed-ordered) dst
    # arrays; src slots via ONE first-occurrence unique per ntype over
    # [dst_nodes (when include_dst_in_src), kept srcs in etype order]
    kept = {}
    for cet in g.canonical_etypes:
        st, _, dt = cet
        rel = g._relations[cet]
        s = _np(rel.src)[: rel.num_edges]
        d = _np(rel.dst)[: rel.num_edges]
        dst_arr = dst_nodes.get(dt, np.zeros(0, np.int64))
        order = np.argsort(dst_arr, kind="stable")
        sorted_d = dst_arr[order]
        pos = np.searchsorted(sorted_d, d)
        safe = np.minimum(pos, max(sorted_d.shape[0] - 1, 0))
        keep = (
            (sorted_d[safe] == d) if sorted_d.size else np.zeros(d.shape, bool)
        )
        eids = np.nonzero(keep)[0]
        new_d = order[pos[keep]] if sorted_d.size else np.zeros(0, np.int64)
        kept[cet] = (s[keep], new_d, eids)

    from ..graphbolt.base import _unique_first_occurrence_inverse

    src_ids_of: Dict[str, np.ndarray] = {}
    seg_of = {}
    for nt in g.ntypes:
        prefix = (
            dst_nodes.get(nt, np.zeros(0, np.int64))
            if include_dst_in_src else np.zeros(0, np.int64)
        )
        parts = [prefix]
        spans = {}
        at = prefix.shape[0]
        for cet in g.canonical_etypes:
            if cet[0] != nt:
                continue
            s_kept = kept[cet][0]
            spans[cet] = (at, at + s_kept.shape[0])
            parts.append(s_kept)
            at += s_kept.shape[0]
        stream = np.concatenate(parts)
        uniq, inv = _unique_first_occurrence_inverse(stream)
        # dst_nodes must be unique (same contract as the reference's
        # to_block) so the prefix occupies the first slots verbatim
        if prefix.size and not np.array_equal(
            uniq[: prefix.shape[0]], prefix
        ):
            raise DGLError("to_block requires unique dst_nodes per type")
        src_ids_of[nt] = uniq
        seg_of[nt] = {cet: inv[a:b] for cet, (a, b) in spans.items()}

    rel_edges = {
        cet: (seg_of[cet[0]][cet], new_d, eids)
        for cet, (s_kept, new_d, eids) in kept.items()
    }
    src_list = {nt: src_ids_of[nt] for nt in g.ntypes}
    data_dict = {cet: (s, d) for cet, (s, d, _) in rel_edges.items()}
    nsrc = {nt: len(src_list[nt]) for nt in g.ntypes}
    ndst = {nt: int(dst_nodes.get(nt, np.zeros(0)).shape[0]) for nt in g.ntypes}
    block = convert.create_block(
        data_dict, num_src_nodes=nsrc, num_dst_nodes=ndst, idtype=g.idtype
    )
    for nt in g.ntypes:
        sids = np.array(src_list[nt], dtype=np.int64)
        dids = dst_nodes.get(nt, np.zeros(0, np.int64))
        block._node_frames.setdefault(nt, {})[NID] = jnp.asarray(sids)
        block._dst_frames.setdefault(nt, {})[NID] = jnp.asarray(dids)
        for k, v in g._node_frames.get(nt, {}).items():
            block._node_frames[nt][k] = jnp.asarray(v)[jnp.asarray(sids)]
            block._dst_frames[nt][k] = jnp.asarray(v)[jnp.asarray(dids)]
    for cet, (_, _, eids) in rel_edges.items():
        block._edge_frames.setdefault(cet, {})[EID] = jnp.asarray(eids)
        for k, v in g._edge_frames.get(cet, {}).items():
            block._edge_frames[cet][k] = jnp.asarray(v)[jnp.asarray(eids)]
    return block


def line_graph(g: Graph, backtracking: bool = True, shared: bool = False) -> Graph:
    """Line graph: nodes = edges of g (reference ``functional.py``
    ``line_graph`` / C++ ``src/graph/transform/line_graph.cc``)."""
    from .. import convert

    rel = g._relation(None)
    E = rel.num_edges
    src = _np(rel.src)[:E]
    dst = _np(rel.dst)[:E]
    # edge i -> edge j iff dst[i] == src[j] (and j is not i's reverse when
    # backtracking=False)
    indptr = _np(rel.csr_indptr)
    eids = _np(rel.csr_eids)
    ls, ld = [], []
    for i in range(E):
        v = dst[i]
        for off in range(indptr[v], indptr[v + 1]):
            j = int(eids[off])
            if not backtracking and dst[j] == src[i] and src[j] == dst[i]:
                continue
            ls.append(i)
            ld.append(j)
    return convert.graph(
        (np.array(ls, np.int64), np.array(ld, np.int64)), num_nodes=E
    )


def random_walk_pe(g: Graph, k: int, eweight_name: Optional[str] = None):
    """Random-walk positional encoding: diagonals of RW^i, i=1..k
    (reference ``functional.py`` ``random_walk_pe``)."""
    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    a = np.zeros((n, n), np.float64)
    w = (
        _np(g._edge_frames[g.canonical_etypes[0]][eweight_name])[: rel.num_edges]
        if eweight_name
        else np.ones(src.size)
    )
    np.add.at(a, (src, dst), w)
    deg = a.sum(axis=1, keepdims=True)
    rw = a / np.maximum(deg, 1e-12)
    pe = []
    m = rw.copy()
    for _ in range(k):
        pe.append(np.diagonal(m).copy())
        m = m @ rw
    return jnp.asarray(np.stack(pe, axis=1), dtype=jnp.float32)


def lap_pe(g: Graph, k: int, padding: bool = False, return_eigval: bool = False):
    """Laplacian positional encoding: k smallest non-trivial eigenvectors
    (reference ``functional.py`` ``lap_pe``)."""
    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    a = np.zeros((n, n), np.float64)
    np.add.at(a, (src, dst), 1.0)
    deg = a.sum(axis=1)
    dinv = 1.0 / np.sqrt(np.maximum(deg, 1e-12))
    lap = np.eye(n) - (dinv[:, None] * a * dinv[None, :])
    if not padding and n <= k:
        raise DGLError(
            f"need num_nodes > k ({n} <= {k}); use padding=True"
        )
    vals, vecs = np.linalg.eig(lap)
    order = np.argsort(vals.real)
    vals, vecs = vals.real[order], vecs.real[:, order]
    kk = min(k, max(n - 1, 0))
    pe = vecs[:, 1 : kk + 1]
    ev = vals[1 : kk + 1]
    if pe.shape[1] < k:
        pe = np.pad(pe, ((0, 0), (0, k - pe.shape[1])))
        ev = np.pad(ev, (0, k - ev.shape[0]))
    pe = jnp.asarray(pe, jnp.float32)
    if return_eigval:
        return pe, jnp.asarray(ev, jnp.float32)
    return pe


def shortest_dist(g: Graph, root=None, return_paths: bool = False):
    """All-pairs / single-source shortest path distance via BFS (unweighted;
    reference ``functional.py`` ``shortest_dist``). -1 = unreachable."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import shortest_path

    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    adj = sp.csr_matrix((np.ones(src.size), (src, dst)), shape=(n, n))
    if return_paths:
        dmat, pred = shortest_path(
            adj, method="D", unweighted=True, return_predecessors=True,
            indices=root,
        )
        dmat = np.where(np.isinf(dmat), -1, dmat).astype(np.int64)
        # reconstruct edge-id paths (padded with -1), reference semantics
        max_len = max(int(dmat.max()), 1)
        eid_lookup = {}
        for i, (s, d) in enumerate(zip(src, dst)):
            eid_lookup.setdefault((int(s), int(d)), i)
        if root is None:
            raise NotImplementedError("return_paths requires a root")
        paths = np.full((n, max_len), -1, np.int64)
        for t in range(n):
            if dmat[t] <= 0:
                continue
            seq = []
            cur = t
            while cur != root and pred[cur] >= 0:
                p = int(pred[cur])
                seq.append(eid_lookup[(p, cur)])
                cur = p
            paths[t, : len(seq)] = seq[::-1]
        return jnp.asarray(dmat), jnp.asarray(paths)
    dmat = shortest_path(adj, method="D", unweighted=True, indices=root)
    dmat = np.where(np.isinf(dmat), -1, dmat).astype(np.int64)
    return jnp.asarray(dmat)


def reorder_graph(g: Graph, node_permute_algo: str = "rcmk",
                  edge_permute_algo: str = "src", store_ids: bool = True,
                  permute_config=None) -> Graph:
    """Relabel nodes for locality (reference ``functional.py``
    ``reorder_graph``): 'rcmk' (reverse Cuthill-McKee), 'metis'
    (partition-major order via the native partitioner), or 'custom'
    (permute_config['nodes_perm'])."""
    import scipy.sparse as sp

    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    if node_permute_algo == "rcmk":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        adj = sp.csr_matrix((np.ones(src.size), (src, dst)), shape=(n, n))
        perm = np.asarray(reverse_cuthill_mckee(adj + adj.T))
    elif node_permute_algo == "metis":
        from ..distributed.partition import metis_partition_assignment

        k = (permute_config or {}).get("k", 8)
        parts = metis_partition_assignment(g, k)
        perm = np.argsort(parts, kind="stable")
    elif node_permute_algo == "custom":
        perm = _np((permute_config or {})["nodes_perm"])
    else:
        raise DGLError(f"Unknown node_permute_algo {node_permute_algo!r}")
    new_of_old = np.empty(n, dtype=np.int64)
    new_of_old[perm] = np.arange(n)
    new_src = new_of_old[src]
    new_dst = new_of_old[dst]
    out = _rebuild(g, g.to_canonical_etype(None), new_src, new_dst,
                   edge_map=np.arange(rel.num_edges, dtype=np.int64))
    # permute node features into the new order
    for nt, f in list(out._node_frames.items()):
        out._node_frames[nt] = {k: jnp.asarray(_np(v)[perm]) for k, v in f.items()}
    if store_ids:
        out._node_frames.setdefault(g.ntypes[0], {})[NID] = jnp.asarray(perm)
        out._edge_frames.setdefault(g.to_canonical_etype(None), {})[EID] = (
            jnp.asarray(np.arange(rel.num_edges))
        )
    return out


def _transition_matrix(g: Graph, eweight_name=None):
    import scipy.sparse as sp

    n = g.num_nodes()
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    w = (
        _np(g._edge_frames[g.canonical_etypes[0]][eweight_name])[: rel.num_edges]
        if eweight_name
        else np.ones(src.size)
    )
    a = sp.csr_matrix((w, (dst, src)), shape=(n, n))  # column-stochastic-ish
    deg = np.asarray(a.sum(axis=0)).ravel()
    dinv = sp.diags(1.0 / np.maximum(deg, 1e-12))
    return a @ dinv, n


def ppr(g: Graph, alpha: float = 0.15, eweight_name=None, eps=None,
        avg_degree: int = 5) -> Graph:
    """Personalized PageRank diffusion (reference ``GDC``/``PPR`` transform,
    ``transforms/module.py:1411``): dense solve of
    S = alpha (I - (1-alpha) T)^-1, sparsified to top avg_degree*n entries."""
    t_mat, n = _transition_matrix(g, eweight_name)
    s = alpha * np.linalg.inv(
        np.eye(n) - (1 - alpha) * t_mat.toarray()
    )
    return _sparsify_diffusion(g, s, eps, avg_degree)


def heat_kernel(g: Graph, t: float = 5.0, eweight_name=None, eps=None,
                avg_degree: int = 5, k: int = 10) -> Graph:
    """Heat-kernel diffusion exp(t(T - I)) via truncated Taylor series
    (reference HeatKernel transform)."""
    t_mat, n = _transition_matrix(g, eweight_name)
    m = np.asarray(t_mat.todense())  # T
    acc = np.eye(n)
    term = np.eye(n)
    import math

    for i in range(1, k + 1):
        term = (t / i) * (term @ (m - np.eye(n)))
        term = np.asarray(term)
        acc = acc + term
    return _sparsify_diffusion(g, acc, eps, avg_degree)


def _sparsify_diffusion(g: Graph, s: np.ndarray, eps, avg_degree: int):
    n = s.shape[0]
    if eps is None:
        k = min(avg_degree * n, s.size - 1)
        eps = np.sort(s.ravel())[-k] if k > 0 else 0.0
    s = np.where(s >= max(eps, 1e-12), s, 0.0)
    dstn, srcn = np.nonzero(s)  # s[d, u] = weight of edge u->d
    w = s[dstn, srcn]
    out = _rebuild(g, g.to_canonical_etype(None), srcn, dstn)
    out._edge_frames[out.canonical_etypes[0]] = {
        "w": jnp.asarray(w.astype(np.float32))
    }
    return out


def sign_diffusion(g: Graph, k: int, in_feat_name: str = "feat",
                   out_feat_name: str = "out_feat", eweight_name=None,
                   diffuse_op: str = "gcn", alpha: float = 0.2):
    """SIGN preprocessing (reference ``SIGNDiffusion``, ``module.py:1692``):
    stores k diffused copies of the features (out_feat_name_1..k)."""
    from .. import function as fn
    from ..nn.utils_nn import EdgeWeightNorm

    h = g.ndata[in_feat_name]
    rel = g._relation(None)
    if diffuse_op in ("gcn", "ppr"):
        deg_in = jnp.maximum(rel.in_degrees().astype(h.dtype), 1)
        deg_out = jnp.maximum(rel.out_degrees().astype(h.dtype), 1)
        ni = jax.lax.rsqrt(deg_in)[:, None]
        no = jax.lax.rsqrt(deg_out)[:, None]
    for i in range(1, k + 1):
        with g.local_scope() as gg:
            if diffuse_op in ("gcn", "ppr"):
                gg.srcdata["h"] = h * no
                gg.update_all(fn.copy_u("h", "m"), fn.sum("m", "h"))
                nxt = gg.dstdata["h"] * ni
            elif diffuse_op in ("raw", "rw"):
                gg.srcdata["h"] = h
                gg.update_all(fn.copy_u("h", "m"), fn.mean("m", "h"))
                nxt = gg.dstdata["h"]
            else:
                raise DGLError(f"Unknown diffuse_op {diffuse_op!r}")
        if diffuse_op == "ppr":
            nxt = (1 - alpha) * nxt + alpha * g.ndata[in_feat_name]
        h = nxt
        g.ndata[f"{out_feat_name}_{i}"] = h
    return g


def to_levi(g: Graph) -> Graph:
    """Levi graph: edges become nodes (reference ``functional.py``
    ``ToLevi`` transform): heterograph with 'node' and 'edge' ntypes and
    relations node->edge ('belongs'), edge->node ('points')."""
    from .. import convert

    rel = g._relation(None)
    E = rel.num_edges
    src = _np(rel.src)[:E]
    dst = _np(rel.dst)[:E]
    eids = np.arange(E, dtype=np.int64)
    out = convert.heterograph(
        {
            ("node", "belongs", "edge"): (src, eids),
            ("edge", "points", "node"): (eids, dst),
        },
        num_nodes_dict={"node": g.num_nodes(), "edge": E},
    )
    for k, v in g._node_frames.get(g.ntypes[0], {}).items():
        out._node_frames.setdefault("node", {})[k] = v
    for k, v in g._edge_frames.get(g.canonical_etypes[0], {}).items():
        out._node_frames.setdefault("edge", {})[k] = v
    return out


def double_radius_node_labeling(g: Graph, src: int, dst: int):
    """DRNL labels for SEAL-style link prediction (reference
    ``functional.py`` ``double_radius_node_labeling``):
    z = 1 + min(d_src, d_dst) + (d//2)(d//2 + d%2 - 1) with d = d_src+d_dst;
    z(src)=z(dst)=1; unreachable nodes get 0."""
    d_all = np.asarray(shortest_dist(g))
    ds = d_all[src].astype(np.float64)
    dt = d_all[dst].astype(np.float64)
    ds[ds < 0] = np.inf
    dt[dt < 0] = np.inf
    d = ds + dt
    with np.errstate(invalid="ignore"):
        z = 1 + np.minimum(ds, dt) + (d // 2) * ((d // 2) + (d % 2) - 1)
    z[src] = 1.0
    z[dst] = 1.0
    z[~np.isfinite(z)] = 0.0
    return jnp.asarray(z.astype(np.int64))


def svd_pe(g: Graph, k: int, padding: bool = False, random_flip: bool = True,
           seed: int = 0):
    """SVD-based positional encoding (reference ``functional.py``
    ``svd_pe``): concat of top-k left/right singular vectors scaled by
    sqrt of singular values."""
    n = g.num_nodes()
    if not padding and n < k:
        raise DGLError(f"need num_nodes >= k ({n} < {k}); use padding=True")
    rel = g._relation(None)
    src = _np(rel.src)[: rel.num_edges]
    dst = _np(rel.dst)[: rel.num_edges]
    a = np.zeros((n, n), np.float64)
    a[src, dst] = 1.0
    u, s, vt = np.linalg.svd(a)
    kk = min(k, n)
    sq = np.sqrt(s[:kk])
    pu = u[:, :kk] * sq
    pv = vt[:kk].T * sq
    if random_flip:
        rng = np.random.default_rng(seed)
        signs = np.where(rng.random(kk) < 0.5, -1.0, 1.0)
        pu = pu * signs
        pv = pv * signs
    pe = np.concatenate([pu, pv], axis=1)
    if kk < k:
        pe = np.pad(pe, ((0, 0), (0, 2 * (k - kk))))
    return jnp.asarray(pe.astype(np.float32))


# ---------------------------------------------------------------------------
# tail of the reference functional surface (aliases + small constructors)
# ---------------------------------------------------------------------------


def remove_nodes(g: Graph, nids, ntype=None, store_ids: bool = False) -> Graph:
    """New graph without nodes ``nids`` and their incident edges (reference
    ``functional.py`` ``remove_nodes``)."""
    from ..subgraph import node_subgraph

    nt = ntype or (g.ntypes[0] if len(g.ntypes) == 1 else None)
    if nt is None:
        raise DGLError("ntype required for heterographs")
    keep = np.setdiff1d(
        np.arange(g.num_nodes(nt), dtype=np.int64),
        np.atleast_1d(_np(nids)).astype(np.int64),
    )
    nodes = {nt2: (keep if nt2 == nt
                   else np.arange(g.num_nodes(nt2), dtype=np.int64))
             for nt2 in g.ntypes}
    if len(g.ntypes) == 1:
        nodes = keep
    return node_subgraph(g, nodes, store_ids=store_ids)


def radius_graph(x, r: float, dist: str = "euclidean",
                 get_distances: bool = False):
    """Graph connecting points within radius ``r`` (reference
    ``functional.py`` ``radius_graph``): edge j->i when dist(i, j) <= r,
    excluding self-loops."""
    from .. import convert

    x = np.asarray(x)
    if dist == "cosine":
        xn = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-12)
        d = 1.0 - xn @ xn.T
    else:
        sq = np.sum(x * x, axis=1)
        d = np.sqrt(np.maximum(sq[:, None] - 2 * (x @ x.T) + sq[None, :], 0))
    np.fill_diagonal(d, np.inf)
    src, dst = np.nonzero(d <= r)
    g = convert.graph((src, dst), num_nodes=x.shape[0])
    if get_distances:
        return g, jnp.asarray(d[src, dst])[:, None]
    return g


def segmented_knn_graph(x, k: int, segs, dist: str = "euclidean") -> Graph:
    """kNN graphs built independently per point segment then batched in one
    graph (reference ``functional.py`` ``segmented_knn_graph``)."""
    from .. import convert

    x = np.asarray(x)
    offs = np.concatenate([[0], np.cumsum(np.asarray(segs))])
    srcs, dsts = [], []
    for lo, hi in zip(offs[:-1], offs[1:]):
        sub = knn_graph(x[lo:hi], min(k, hi - lo), dist=dist)
        rel = sub._relation(None)
        srcs.append(_np(rel.src)[: rel.num_edges] + lo)
        dsts.append(_np(rel.dst)[: rel.num_edges] + lo)
    return convert.graph(
        (np.concatenate(srcs), np.concatenate(dsts)), num_nodes=x.shape[0]
    )


def knn(x, k, algorithm="bruteforce", dist="euclidean"):
    """Alias of ``knn_graph`` (reference keeps both spellings)."""
    return knn_graph(x, k, algorithm=algorithm, dist=dist)


def laplacian_pe(g: Graph, k: int, padding: bool = False,
                 return_eigval: bool = False):
    """Deprecated reference alias of ``lap_pe``."""
    return lap_pe(g, k, padding=padding, return_eigval=return_eigval)


def to_simple_graph(g: Graph) -> Graph:
    """Deprecated reference alias of ``to_simple``."""
    return to_simple(g)


def norm_by_dst(g: Graph, etype=None):
    """1 / in-degree(dst) per edge (reference ``functional.py``
    ``norm_by_dst``)."""
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    deg = jnp.maximum(rel.in_degrees(), 1.0)
    return (1.0 / deg)[rel.dst]


def pairwise_squared_distance(x):
    """(N, N) squared euclidean distances (reference helper)."""
    x = jnp.asarray(x)
    sq = jnp.sum(x * x, axis=1)
    return sq[:, None] - 2 * (x @ x.T) + sq[None, :]


def _cast_frames(g: Graph, float_dtype):
    out = g.local_var()
    for frames in (out._node_frames, out._edge_frames, out._dst_frames):
        for frame in frames.values():
            for key, val in list(frame.items()):
                if hasattr(val, "dtype") and jnp.issubdtype(
                    val.dtype, jnp.floating
                ):
                    frame[key] = val.astype(float_dtype)
    return out


def to_float(g: Graph) -> Graph:
    """Cast float features to float32 (reference ``to_float``)."""
    return _cast_frames(g, jnp.float32)


def to_double(g: Graph) -> Graph:
    """Cast float features to float64 (needs jax x64; reference
    ``to_double``)."""
    return _cast_frames(g, jnp.float64)


def to_half(g: Graph) -> Graph:
    """Cast float features to float16 (reference ``to_half``)."""
    return _cast_frames(g, jnp.float16)


def to_bfloat16(g: Graph) -> Graph:
    """Cast float features to bfloat16 — the TPU MXU dtype (reference
    ``to_bfloat16``)."""
    return _cast_frames(g, jnp.bfloat16)


def rcmk_perm(g: Graph):
    """Reverse Cuthill-McKee node permutation (reference ``metis_perm`` /
    ``rcmk_perm`` helpers behind ``reorder_graph``)."""
    import scipy.sparse as sp
    from scipy.sparse.csgraph import reverse_cuthill_mckee

    rel = g._relation(None)
    E = rel.num_edges
    a = sp.coo_matrix(
        (np.ones(E), (_np(rel.src)[:E], _np(rel.dst)[:E])),
        shape=(g.num_nodes(), g.num_nodes()),
    ).tocsr()
    return np.asarray(reverse_cuthill_mckee(a + a.T))


def metis_perm(g: Graph, k: int):
    """Node permutation grouping the ``k`` partitions of the native
    multilevel partitioner contiguously (reference ``metis_perm``)."""
    from ..distributed.partition import metis_partition_assignment

    parts = metis_partition_assignment(g, k)
    return np.argsort(parts, kind="stable")


def adj_product_graph(A: Graph, B: Graph, weight_name: str) -> Graph:
    """SpGEMM on two graphs' weighted adjacencies (reference
    ``functional.py`` ``adj_product_graph`` / C++ ``CSRMM``)."""
    return _adj_combine(A, B, weight_name, "product")


def adj_sum_graph(graphs, weight_name: str) -> Graph:
    """Weighted adjacency sum of same-shape graphs (reference
    ``adj_sum_graph`` / C++ ``CSRSum``)."""
    out = graphs[0]
    for g in graphs[1:]:
        out = _adj_combine(out, g, weight_name, "sum")
    return out


def _adj_combine(A: Graph, B: Graph, weight_name: str, op: str) -> Graph:
    import scipy.sparse as sp
    from .. import convert

    def mat(g):
        rel = g._relation(None)
        E = rel.num_edges
        w = np.asarray(g.edata[weight_name])[:E]
        return sp.coo_matrix(
            (w, (_np(rel.src)[:E], _np(rel.dst)[:E])),
            shape=(rel.num_src, rel.num_dst),
        ).tocsr()

    c = (mat(A) @ mat(B)) if op == "product" else (mat(A) + mat(B)).tocsr()
    c.eliminate_zeros()
    coo = c.tocoo()
    g = convert.graph(
        (coo.row, coo.col), num_nodes=max(c.shape[0], c.shape[1])
    )
    g.edata[weight_name] = jnp.asarray(coo.data.astype(np.float32))
    return g


__all__ += [
    "remove_nodes",
    "radius_graph",
    "segmented_knn_graph",
    "knn",
    "laplacian_pe",
    "to_simple_graph",
    "norm_by_dst",
    "pairwise_squared_distance",
    "to_float",
    "to_double",
    "to_half",
    "to_bfloat16",
    "rcmk_perm",
    "metis_perm",
    "adj_product_graph",
    "adj_sum_graph",
]


def _sort_by_tag(g: Graph, tag, which: str, tag_offset_name: str):
    rel = g._relation(None)
    E = rel.num_edges
    src = _np(rel.src)[:E]
    dst = _np(rel.dst)[:E]
    t = _np(tag).astype(np.int64)
    num_tags = int(t.max()) + 1 if t.size else 1
    if which == "csr":
        row, nbr = src, dst
        n_rows = rel.num_src
    else:
        row, nbr = dst, src
        n_rows = rel.num_dst
    key = t[nbr]
    order = np.lexsort((key, row))
    from .. import convert

    out = convert.graph(
        (src[order], dst[order]), num_nodes=g.num_nodes(), idtype=g.idtype
    )
    for k, v in g._node_frames.get(g.ntypes[0], {}).items():
        out._node_frames.setdefault(g.ntypes[0], {})[k] = v
    for k, v in g._edge_frames.get(g.canonical_etypes[0], {}).items():
        out._edge_frames.setdefault(out.canonical_etypes[0], {})[k] = (
            jnp.asarray(v)[order] if getattr(v, "shape", None) is not None
            and v.shape[0] == E else v
        )
    out._edge_frames.setdefault(out.canonical_etypes[0], {})[EID] = (
        jnp.asarray(order)
    )
    # per-row tag offsets: offsets[v, j] = start of tag-j block in row v
    counts = np.zeros((n_rows, num_tags), np.int64)
    np.add.at(counts, (row, key), 1)
    offsets = np.zeros((n_rows, num_tags + 1), np.int64)
    offsets[:, 1:] = np.cumsum(counts, axis=1)
    out._node_frames.setdefault(out.ntypes[0], {})[tag_offset_name] = (
        jnp.asarray(offsets)
    )
    return out


def sort_csr_by_tag(g: Graph, tag, tag_offset_name: str = "_TAG_OFFSET"):
    """Reorder each node's OUT-neighbors so same-tag neighbors are
    contiguous; stores per-(node, tag) offsets in
    ``ndata[tag_offset_name]`` (reference ``functional.py``
    ``sort_csr_by_tag``, C++ ``CSRSortByTag`` — used for tiered/biased
    sampling). The new graph's edges are emitted in the sorted order, so
    the CSR rows (stable by construction) are tag-ordered."""
    return _sort_by_tag(g, tag, "csr", tag_offset_name)


def sort_csc_by_tag(g: Graph, tag, tag_offset_name: str = "_TAG_OFFSET"):
    """Like ``sort_csr_by_tag`` for IN-neighbors (CSC rows)."""
    return _sort_by_tag(g, tag, "csc", tag_offset_name)


__all__ += ["sort_csr_by_tag", "sort_csc_by_tag"]


def knn(k: int, x, x_segs, y=None, y_segs=None,
        algorithm: str = "bruteforce", dist: str = "euclidean"):
    """Segmented k-nearest-neighbor query (reference
    ``transforms/functional.py:641`` / C++ ``_CAPI_DGLKNN``): for each point
    in each segment of ``y``, the ``k`` nearest points in the SAME segment of
    ``x``. Returns an int array of shape (2, len(y)*k): row 0 = x indices
    (neighbors), row 1 = y indices (queries). ``y=None`` self-queries ``x``.
    """
    x = np.asarray(x, dtype=np.float64)
    x_segs = np.asarray(x_segs, dtype=np.int64)
    if y is None:
        y, y_segs = x, x_segs
    else:
        y = np.asarray(y, dtype=np.float64)
        y_segs = np.asarray(y_segs, dtype=np.int64)
    if x_segs.shape != y_segs.shape:
        raise DGLError("x_segs and y_segs must have the same length")
    if dist == "cosine":
        x = x / (np.linalg.norm(x, axis=1, keepdims=True) + 1e-5)
        y = y / (np.linalg.norm(y, axis=1, keepdims=True) + 1e-5)
    elif dist != "euclidean":
        raise DGLError(f"unknown dist {dist!r}")
    x_off = np.concatenate([[0], np.cumsum(x_segs)])
    y_off = np.concatenate([[0], np.cumsum(y_segs)])
    src = np.empty(y.shape[0] * k, dtype=np.int64)
    dst = np.empty(y.shape[0] * k, dtype=np.int64)
    for s in range(x_segs.shape[0]):
        xs = x[x_off[s]: x_off[s + 1]]
        ys = y[y_off[s]: y_off[s + 1]]
        if xs.shape[0] < k:
            raise DGLError(
                f"segment {s} has {xs.shape[0]} x-points < k={k}"
            )
        d = ((ys[:, None, :] - xs[None, :, :]) ** 2).sum(-1)
        nn = np.argsort(d, axis=1, kind="stable")[:, :k] + x_off[s]
        lo = y_off[s] * k
        hi = y_off[s + 1] * k
        src[lo:hi] = nn.reshape(-1)
        dst[lo:hi] = np.repeat(
            np.arange(y_off[s], y_off[s + 1], dtype=np.int64), k
        )
    return np.stack([src, dst])


def is_bidirected(g: Graph) -> bool:
    """True iff for every edge (u, v) there is a matching (v, u), with
    multiplicity (reference ``transforms/module.py:1294``)."""
    src, dst = (np.asarray(a) for a in g.edges())
    n = g.num_nodes()
    fwd = np.sort(src.astype(np.int64) * n + dst)
    bwd = np.sort(dst.astype(np.int64) * n + src)
    return bool(np.array_equal(fwd, bwd))


def update_graph_structure(g: Graph, data_dict, copy_edata: bool = True) -> Graph:
    """Rebuild the graph with new structure, carrying node (and optionally
    edge) features over (reference ``transforms/module.py:60``)."""
    from .. import convert

    num_nodes_dict = {nt: g.num_nodes(nt) for nt in g.ntypes}
    new_g = convert.heterograph(
        data_dict, num_nodes_dict=num_nodes_dict, idtype=g.idtype
    )
    for nt in g.ntypes:
        for key, feat in g._node_frames.get(nt, {}).items():
            new_g._node_frames.setdefault(nt, {})[key] = feat
    if copy_edata:
        for cet in g.canonical_etypes:
            if cet in new_g._relations:
                for key, feat in g._edge_frames.get(cet, {}).items():
                    new_g._edge_frames.setdefault(cet, {})[key] = feat
    return new_g


__all__ += ["knn", "is_bidirected", "update_graph_structure"]


def reorder_for_spmm(g: Graph, num_hubs=2048, precision: str = "int8",
                     weighted: bool = False, gather_dtype: str = "bf16"):
    """Relabel nodes into the SpMM plan's dst-rank order and attach plans.

    The shell decomposition accumulates in RANK space and pays one final
    (N, F) unrank gather per SpMM to restore id order — 1.5 ms of the
    5.2 ms arxiv-scale headline SpMM (benchmarks/probe_r3c 'unrank').
    Relabeling the graph so rank order IS id order makes that gather the
    identity, which the plan builder detects and elides. This is the
    plan-aware analog of :func:`reorder_graph`'s locality modes (the
    reference reorders for cache locality, ``functional.py reorder_graph``;
    on TPU locality doesn't matter — probe-measured — but rank alignment
    does).

    Returns ``(g2, perm)``: ``perm[i]`` is the ORIGINAL id of new node i;
    node features are carried over already permuted. Homogeneous graphs
    only (the headline copy_u path).
    """
    from ..ops.hub_spmm import build_hub_plan

    rel = g._relation(None)
    h = g._auto_num_hubs(rel) if num_hubs == "auto" else int(num_hubs)
    plan = build_hub_plan(rel, h, precision)
    if plan.unrank_dst is None:  # already rank-ordered
        perm = np.arange(g.num_nodes(), dtype=np.int64)
        g2 = g
        hubs_new = None
    else:
        perm = np.argsort(np.asarray(plan.unrank_dst),
                          kind="stable").astype(np.int64)
        g2 = reorder_graph(g, "custom", store_ids=False,
                           permute_config={"nodes_perm": perm})
        # map the ORIGINAL hub set through the relabel and pin it: a
        # freshly-selected hub set can differ on degree ties, perturbing
        # cold degrees enough to break the identity ranking
        new_of_old = np.empty(perm.shape[0], np.int64)
        new_of_old[perm] = np.arange(perm.shape[0])
        hubs_new = new_of_old[np.asarray(plan.hub_ids)[: plan.num_hubs]]
    g2 = g2.with_spmm_plans(num_hubs=h, precision=precision,
                            weighted=weighted, gather_dtype=gather_dtype)
    if hubs_new is not None:
        rel2 = g2._relation(None)
        plan2 = build_hub_plan(rel2, h, precision,
                               hub_ids_override=hubs_new)
        key = next(iter(g2._relations))
        g2._relations = dict(g2._relations)
        g2._relations[key] = rel2.with_hub_plan(plan2)
    return g2, perm
