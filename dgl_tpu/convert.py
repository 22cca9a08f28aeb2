"""Graph construction (reference ``python/dgl/convert.py``).

- ``graph()`` — homogeneous graph from (src, dst) (reference ``convert.py:32``).
- ``heterograph()`` — from a dict of canonical etype -> edge list
  (reference ``convert.py:208``).
- ``create_block()`` — message-flow-graph block (reference ``convert.py:389``).
- ``from_scipy`` / ``from_networkx`` (reference ``convert.py:1149, 1387``).
- ``to_homogeneous`` / ``to_heterogeneous`` (reference ``convert.py:672,892``).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from .base import NTYPE, ETYPE, NID, EID
from .graph import Graph, Relation, CanonicalEtype, _asnumpy

__all__ = [
    "graph",
    "heterograph",
    "create_block",
    "from_scipy",
    "from_networkx",
    "to_homogeneous",
    "to_heterogeneous",
    "rand_graph",
    "rand_bipartite",
]


def _infer_num_nodes(src, dst) -> int:
    src = _asnumpy(src)
    dst = _asnumpy(dst)
    if src.size == 0:
        return 0
    return int(max(src.max(), dst.max())) + 1


def graph(
    data,
    *,
    num_nodes: Optional[int] = None,
    idtype=jnp.int32,
    num_edges: Optional[int] = None,
) -> Graph:
    """Create a homogeneous graph from an edge tuple ``(src, dst)``.

    Mirrors ``dgl.graph`` (reference ``python/dgl/convert.py:32``). ``data``
    may be a ``(src, dst)`` tuple of int arrays. ``num_edges`` < len(src)
    marks trailing edges as padding (TPU static-shape support; no reference
    analog — the reference tolerates dynamic shapes).
    """
    src, dst = data
    n = num_nodes if num_nodes is not None else _infer_num_nodes(src, dst)
    rel = Relation.from_coo(
        src, dst, n, n, idtype=idtype, num_edges=num_edges
    )
    return Graph({("_N", "_E", "_N"): rel}, {"_N": n})


def heterograph(
    data_dict: Dict[CanonicalEtype, Tuple],
    num_nodes_dict: Optional[Dict[str, int]] = None,
    idtype=jnp.int32,
) -> Graph:
    """Create a heterogeneous graph (reference ``convert.py:208``)."""
    if num_nodes_dict is None:
        num_nodes_dict = {}
        for (st, _, dt), (src, dst) in data_dict.items():
            src = _asnumpy(src)
            dst = _asnumpy(dst)
            if src.size:
                num_nodes_dict[st] = max(
                    num_nodes_dict.get(st, 0), int(src.max()) + 1
                )
                num_nodes_dict[dt] = max(
                    num_nodes_dict.get(dt, 0), int(dst.max()) + 1
                )
            else:
                num_nodes_dict.setdefault(st, 0)
                num_nodes_dict.setdefault(dt, 0)
    rels = {}
    for cet, (src, dst) in data_dict.items():
        st, _, dt = cet
        rels[tuple(cet)] = Relation.from_coo(
            src,
            dst,
            num_nodes_dict[st],
            num_nodes_dict[dt],
            idtype=idtype,
        )
    return Graph(rels, dict(num_nodes_dict))


def create_block(
    data_dict,
    num_src_nodes=None,
    num_dst_nodes=None,
    idtype=jnp.int32,
    num_edges=None,
    to_device: bool = True,
) -> Graph:
    """Create a message-flow-graph block (reference ``convert.py:389``).

    ``data_dict`` is either a ``(src, dst)`` pair (homogeneous block) or a
    dict of canonical etype -> pair. ``num_src_nodes``/``num_dst_nodes`` are
    ints (homogeneous) or dicts.
    """
    if not isinstance(data_dict, dict):
        data_dict = {("_N", "_E", "_N"): data_dict}
        if num_src_nodes is not None and not isinstance(num_src_nodes, dict):
            num_src_nodes = {"_N": int(num_src_nodes)}
        if num_dst_nodes is not None and not isinstance(num_dst_nodes, dict):
            num_dst_nodes = {"_N": int(num_dst_nodes)}
        if num_edges is not None and not isinstance(num_edges, dict):
            num_edges = {("_N", "_E", "_N"): int(num_edges)}
    if num_src_nodes is None:
        num_src_nodes = {}
        for (st, _, dt), (src, dst) in data_dict.items():
            src = _asnumpy(src)
            num_src_nodes[st] = max(
                num_src_nodes.get(st, 0), int(src.max()) + 1 if src.size else 0
            )
    if num_dst_nodes is None:
        num_dst_nodes = {}
        for (st, _, dt), (src, dst) in data_dict.items():
            dst = _asnumpy(dst)
            num_dst_nodes[dt] = max(
                num_dst_nodes.get(dt, 0), int(dst.max()) + 1 if dst.size else 0
            )
    rels = {}
    for cet, (src, dst) in data_dict.items():
        st, _, dt = cet
        ne = None if num_edges is None else num_edges.get(tuple(cet))
        rels[tuple(cet)] = Relation.from_coo(
            src,
            dst,
            num_src_nodes[st],
            num_dst_nodes[dt],
            idtype=idtype,
            num_edges=ne,
            to_device=to_device,
        )
    return Graph(
        rels,
        num_src_nodes=dict(num_src_nodes),
        num_dst_nodes=dict(num_dst_nodes),
        is_block=True,
    )


def from_scipy(sp_mat, idtype=jnp.int32, eweight_name=None) -> Graph:
    """Create from a scipy sparse matrix (reference ``convert.py:1149``)."""
    coo = sp_mat.tocoo()
    g = graph(
        (coo.row.astype(np.int64), coo.col.astype(np.int64)),
        num_nodes=max(coo.shape[0], coo.shape[1]),
        idtype=idtype,
    )
    if eweight_name is not None:
        g.edata[eweight_name] = jnp.asarray(coo.data)
    return g


def from_networkx(nx_graph, node_attrs=None, edge_attrs=None, idtype=jnp.int32) -> Graph:
    """Create from a networkx graph (reference ``convert.py:1387``)."""
    import networkx as nx  # local import; networkx is optional

    if not nx_graph.is_directed():
        nx_graph = nx_graph.to_directed()
    nodes = list(nx_graph.nodes())
    relabel = {n: i for i, n in enumerate(nodes)}
    src = np.array([relabel[u] for u, _ in nx_graph.edges()], dtype=np.int64)
    dst = np.array([relabel[v] for _, v in nx_graph.edges()], dtype=np.int64)
    g = graph((src, dst), num_nodes=len(nodes), idtype=idtype)
    if node_attrs:
        for attr in node_attrs:
            vals = [nx_graph.nodes[n][attr] for n in nodes]
            g.ndata[attr] = jnp.asarray(np.stack([np.asarray(v) for v in vals]))
    if edge_attrs:
        for attr in edge_attrs:
            vals = [nx_graph.edges[e][attr] for e in nx_graph.edges()]
            g.edata[attr] = jnp.asarray(np.stack([np.asarray(v) for v in vals]))
    return g


def to_homogeneous(g: Graph, ndata=None, edata=None) -> Graph:
    """Flatten a heterograph into one node/edge space (ref ``convert.py:672``).

    Adds ``dgl.NTYPE``/``dgl.ETYPE`` (type ids) and ``dgl.NID``/``dgl.EID``
    (per-type original ids) like the reference.
    """
    ntypes = g.ntypes
    offsets = {}
    total = 0
    for nt in ntypes:
        offsets[nt] = total
        total += g.num_nodes(nt)
    srcs, dsts, etype_ids, eids = [], [], [], []
    for i, cet in enumerate(g.canonical_etypes):
        st, _, dt = cet
        rel = g._relations[cet]
        s = _asnumpy(rel.src)[: rel.num_edges] + offsets[st]
        d = _asnumpy(rel.dst)[: rel.num_edges] + offsets[dt]
        srcs.append(s)
        dsts.append(d)
        etype_ids.append(np.full(s.shape, i, dtype=np.int64))
        eids.append(np.arange(rel.num_edges, dtype=np.int64))
    src = np.concatenate(srcs) if srcs else np.zeros(0, np.int64)
    dst = np.concatenate(dsts) if dsts else np.zeros(0, np.int64)
    homo = graph((src, dst), num_nodes=total, idtype=g.idtype)
    ntype_ids = np.concatenate(
        [np.full(g.num_nodes(nt), i, dtype=np.int64) for i, nt in enumerate(ntypes)]
    ) if ntypes else np.zeros(0, np.int64)
    nids = np.concatenate(
        [np.arange(g.num_nodes(nt), dtype=np.int64) for nt in ntypes]
    ) if ntypes else np.zeros(0, np.int64)
    homo.ndata[NTYPE] = jnp.asarray(ntype_ids)
    homo.ndata[NID] = jnp.asarray(nids)
    homo.edata[ETYPE] = jnp.asarray(np.concatenate(etype_ids) if etype_ids else np.zeros(0, np.int64))
    homo.edata[EID] = jnp.asarray(np.concatenate(eids) if eids else np.zeros(0, np.int64))
    if ndata:
        for key in ndata:
            vals = [g._node_frames[nt][key] for nt in ntypes]
            homo.ndata[key] = jnp.concatenate([jnp.asarray(v) for v in vals], axis=0)
    if edata:
        for key in edata:
            vals = [g._edge_frames[cet][key] for cet in g.canonical_etypes]
            homo.edata[key] = jnp.concatenate([jnp.asarray(v) for v in vals], axis=0)
    return homo


def to_heterogeneous(g: Graph, ntypes, etypes, ntype_field=NTYPE, etype_field=ETYPE) -> Graph:
    """Split a homogeneous graph back into types (reference ``convert.py:892``)."""
    ntype_ids = _asnumpy(g.ndata[ntype_field])
    etype_ids = _asnumpy(g.edata[etype_field])
    src, dst = g.edges()
    src = _asnumpy(src)[: g.num_edges()]
    dst = _asnumpy(dst)[: g.num_edges()]
    # per-type local ids
    local_ids = np.zeros(g.num_nodes(), dtype=np.int64)
    num_nodes_dict = {}
    for i, nt in enumerate(ntypes):
        mask = ntype_ids == i
        local_ids[mask] = np.arange(mask.sum())
        num_nodes_dict[nt] = int(mask.sum())
    data_dict = {}
    for j, et in enumerate(etypes):
        mask = etype_ids == j
        if not mask.any():
            continue
        s, d = src[mask], dst[mask]
        st = ntypes[int(ntype_ids[s[0]])]
        dt = ntypes[int(ntype_ids[d[0]])]
        data_dict[(st, et, dt)] = (local_ids[s], local_ids[d])
    return heterograph(data_dict, num_nodes_dict, idtype=g.idtype)


def rand_graph(num_nodes: int, num_edges: int, idtype=jnp.int32, seed=None) -> Graph:
    """Uniform random graph (reference ``python/dgl/random.py`` rand_graph)."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_nodes, size=num_edges)
    dst = rng.integers(0, num_nodes, size=num_edges)
    return graph((src, dst), num_nodes=num_nodes, idtype=idtype)


def rand_bipartite(
    utype, etype, vtype, num_src, num_dst, num_edges, idtype=jnp.int32, seed=None
) -> Graph:
    rng = np.random.default_rng(seed)
    src = rng.integers(0, num_src, size=num_edges)
    dst = rng.integers(0, num_dst, size=num_edges)
    return heterograph(
        {(utype, etype, vtype): (src, dst)},
        {utype: num_src, vtype: num_dst},
        idtype=idtype,
    )


def to_networkx(g: Graph, node_attrs=None, edge_attrs=None):
    """Module-level form of ``Graph.to_networkx`` (reference
    ``convert.py`` ``to_networkx``)."""
    return g.to_networkx(node_attrs=node_attrs, edge_attrs=edge_attrs)


def bipartite_from_scipy(sp_mat, utype, etype, vtype, eweight_name=None,
                         idtype=jnp.int32) -> Graph:
    """Bipartite graph from a scipy sparse matrix (reference
    ``convert.py`` ``bipartite_from_scipy``)."""
    coo = sp_mat.tocoo()
    g = heterograph(
        {(utype, etype, vtype): (np.asarray(coo.row), np.asarray(coo.col))},
        {utype: coo.shape[0], vtype: coo.shape[1]},
        idtype=idtype,
    )
    if eweight_name is not None:
        cet = (utype, etype, vtype)
        E = g._relations[cet].num_edges_padded
        w = np.zeros(E, coo.data.dtype)
        w[: coo.data.shape[0]] = coo.data
        g._edge_frames.setdefault(cet, {})[eweight_name] = jnp.asarray(w)
    return g


def bipartite_from_networkx(nx_graph, utype, etype, vtype,
                            idtype=jnp.int32) -> Graph:
    """Bipartite graph from a networkx bipartite graph (reference
    ``convert.py`` ``bipartite_from_networkx``): nodes with
    ``bipartite == 0`` become ``utype`` rows."""
    top = sorted(
        n for n, d in nx_graph.nodes(data=True) if d.get("bipartite") == 0
    )
    bottom = sorted(
        n for n, d in nx_graph.nodes(data=True) if d.get("bipartite") == 1
    )
    uid = {n: i for i, n in enumerate(top)}
    vid = {n: i for i, n in enumerate(bottom)}
    src, dst = [], []
    for a, b in nx_graph.edges():
        if a in uid and b in vid:
            src.append(uid[a]); dst.append(vid[b])
        elif b in uid and a in vid:
            src.append(uid[b]); dst.append(vid[a])
    return heterograph(
        {(utype, etype, vtype): (np.asarray(src, np.int64),
                                 np.asarray(dst, np.int64))},
        {utype: len(top), vtype: len(bottom)},
        idtype=idtype,
    )


def block_to_graph(block: Graph) -> Graph:
    """Turn an MFG block into a plain bipartite graph whose src/dst types
    get ``_src``/``_dst`` suffixes (reference ``convert.py``
    ``block_to_graph``)."""
    data_dict = {}
    nn = {}
    for cet in block.canonical_etypes:
        st, et, dt = cet
        rel = block._relations[cet]
        E = rel.num_edges
        data_dict[(f"{st}_src", et, f"{dt}_dst")] = (
            np.asarray(rel.src)[:E], np.asarray(rel.dst)[:E]
        )
        nn[f"{st}_src"] = rel.num_src
        nn[f"{dt}_dst"] = rel.num_dst
    g = heterograph(data_dict, nn, idtype=block.idtype)
    for nt, frame in block._node_frames.items():
        for k, v in frame.items():
            g._node_frames.setdefault(f"{nt}_src", {})[k] = v
    for nt, frame in block._dst_frames.items():
        for k, v in frame.items():
            g._node_frames.setdefault(f"{nt}_dst", {})[k] = v
    return g


__all__ += [
    "to_networkx",
    "bipartite_from_scipy",
    "bipartite_from_networkx",
    "block_to_graph",
]


def hetero_from_shared_memory(name: str) -> Graph:
    """Attach a (hetero)graph published with :meth:`Graph.shared_memory`
    (reference ``convert.py`` hetero_from_shared_memory /
    ``heterograph.py:6267``): the npz-serialized pytree lives in one POSIX
    shared-memory block, so co-located sampler processes share the
    structure without copies over pipes."""
    import io
    import json as _json
    from multiprocessing import shared_memory

    from .data.serialize import _unflatten_graph

    shm = shared_memory.SharedMemory(name=name)
    try:
        size = int.from_bytes(bytes(shm.buf[:8]), "little")
        raw = bytes(shm.buf[8:8 + size])
    finally:
        shm.close()
    with np.load(io.BytesIO(raw), allow_pickle=True) as z:
        meta = _json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
        arrays = {k: z[k] for k in z.files}
    return _unflatten_graph(meta["graphs"][0], arrays)


def _graph_shared_memory(self, name: str, formats=None):
    """Publish this graph into POSIX shared memory under ``name``
    (reference ``heterograph.py:6267`` ``DGLGraph.shared_memory``;
    ``formats`` accepted for parity — all layouts are rebuilt on attach).
    The block stays alive until unlinked; returns self."""
    import io
    import json as _json
    from multiprocessing import shared_memory

    from .data.serialize import _flatten_graph

    arrays = {}
    meta = [_flatten_graph(self, 0, arrays)]
    arrays["__meta__"] = np.frombuffer(
        _json.dumps({"graphs": meta, "labels": []}).encode("utf-8"),
        dtype=np.uint8,
    )
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    raw = buf.getvalue()
    try:
        shm = shared_memory.SharedMemory(
            name=name, create=True, size=len(raw) + 8
        )
    except FileExistsError:
        old = shared_memory.SharedMemory(name=name)
        old.close()
        old.unlink()
        shm = shared_memory.SharedMemory(
            name=name, create=True, size=len(raw) + 8
        )
    shm.buf[:8] = len(raw).to_bytes(8, "little")
    shm.buf[8:8 + len(raw)] = raw
    self._shm_handle = shm
    return self


Graph.shared_memory = _graph_shared_memory

__all__ += ["hetero_from_shared_memory"]
