"""Batching multiple graphs into one disjoint union.

Reference: ``python/dgl/batch.py:13`` (``batch``) and ``:256`` (``unbatch``).
TPU note: batching happens on the host (numpy) at data-prep time; the result
is a single static-shape Graph whose per-graph boundaries live in
``batch_num_nodes``/``batch_num_edges`` arrays, which readout ops consume as
segment lengths.
"""
from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp
import numpy as np

from .base import DGLError
from .graph import Graph, _asnumpy
from .convert import heterograph

__all__ = ["batch", "unbatch", "stack_graphs", "pad_batch"]


def batch(graphs: Sequence[Graph]) -> Graph:
    """Disjoint union of graphs (reference ``batch.py:13``)."""
    if len(graphs) == 0:
        raise DGLError("batch() needs at least one graph")
    g0 = graphs[0]
    cets = g0.canonical_etypes
    ntypes = g0.ntypes
    for g in graphs:
        if g.canonical_etypes != cets:
            raise DGLError("All graphs must share the same canonical etypes")

    node_offsets = {nt: 0 for nt in ntypes}
    data_dict = {cet: ([], []) for cet in cets}
    num_nodes_dict = {nt: 0 for nt in ntypes}
    bnn = {nt: [] for nt in ntypes}
    bne = {cet: [] for cet in cets}
    for g in graphs:
        for cet in cets:
            st, _, dt = cet
            rel = g._relations[cet]
            src = _asnumpy(rel.src)[: rel.num_edges] + num_nodes_dict[st]
            dst = _asnumpy(rel.dst)[: rel.num_edges] + num_nodes_dict[dt]
            data_dict[cet][0].append(src)
            data_dict[cet][1].append(dst)
            bne[cet].append(rel.num_edges)
        for nt in ntypes:
            bnn[nt].append(g.num_nodes(nt))
        for nt in ntypes:
            num_nodes_dict[nt] += g.num_nodes(nt)

    merged = {
        cet: (
            np.concatenate(s) if s else np.zeros(0, np.int64),
            np.concatenate(d) if d else np.zeros(0, np.int64),
        )
        for cet, (s, d) in data_dict.items()
    }
    bg = heterograph(merged, num_nodes_dict, idtype=g0.idtype)
    bg.set_batch_num_nodes({nt: jnp.asarray(np.array(v)) for nt, v in bnn.items()})
    bg.set_batch_num_edges({cet: jnp.asarray(np.array(v)) for cet, v in bne.items()})

    # concatenate features
    for nt in ntypes:
        keys = set(graphs[0]._node_frames.get(nt, {}).keys())
        for key in keys:
            if all(key in g._node_frames.get(nt, {}) for g in graphs):
                bg._node_frames.setdefault(nt, {})[key] = jnp.concatenate(
                    [jnp.asarray(g._node_frames[nt][key]) for g in graphs], axis=0
                )
    for cet in cets:
        keys = set(graphs[0]._edge_frames.get(cet, {}).keys())
        for key in keys:
            if all(key in g._edge_frames.get(cet, {}) for g in graphs):
                vals = []
                for g in graphs:
                    rel = g._relations[cet]
                    vals.append(jnp.asarray(g._edge_frames[cet][key])[: rel.num_edges])
                bg._edge_frames.setdefault(cet, {})[key] = jnp.concatenate(vals, axis=0)
    return bg


def pad_batch(graphs: Sequence[Graph], batch_size: int, num_nodes: int,
              num_edges: int):
    """Batch to a STATIC shape: exactly ``batch_size`` graphs, ``num_nodes``
    total nodes and ``num_edges`` total edges, absorbing the slack into
    ghost graphs so every minibatch shares one treedef (one jit compile).

    Ghost nodes/edges belong to their own ghost segments, so readouts of
    real graphs are untouched; mask the returned rows with ``gmask``.
    Homogeneous graphs only (one ntype/etype). Returns ``(bg, gmask)`` with
    ``gmask`` a (batch_size,) bool marking real graphs.

    No reference analog: the reference relies on dynamic shapes per batch
    (``python/dgl/batch.py:13``); on TPU static shapes are what keeps the
    step in one compiled executable.
    """
    graphs = list(graphs)
    B = len(graphs)
    if B >= batch_size:
        raise DGLError(
            f"need batch_size > len(graphs) (got {batch_size} vs {B}); "
            "at least one ghost graph absorbs the node/edge slack"
        )
    g0 = graphs[0]
    if len(g0.ntypes) != 1 or len(g0.canonical_etypes) != 1:
        raise DGLError("pad_batch supports homogeneous graphs only")
    nt = g0.ntypes[0]
    cet = g0.canonical_etypes[0]
    total_n = sum(g.num_nodes() for g in graphs)
    total_e = sum(g.num_edges() for g in graphs)
    n_ghost = batch_size - B
    spare_n = num_nodes - total_n
    spare_e = num_edges - total_e
    if spare_n < n_ghost:
        raise DGLError(
            f"num_nodes={num_nodes} too small: {total_n} real nodes + "
            f"{n_ghost} ghost graphs (1 node min each)"
        )
    if spare_e < 0:
        raise DGLError(f"num_edges={num_edges} too small for {total_e} edges")

    node_schema = {
        k: (v.shape[1:], v.dtype)
        for k, v in g0._node_frames.get(nt, {}).items()
    }
    edge_schema = {
        k: (v.shape[1:], v.dtype)
        for k, v in g0._edge_frames.get(cet, {}).items()
    }

    def ghost(n, e):
        src = np.zeros(e, np.int64)  # self-loops on the ghost's node 0
        dst = np.zeros(e, np.int64)
        g = heterograph({cet: (src, dst)}, {nt: n}, idtype=g0.idtype)
        for k, (shape, dtype) in node_schema.items():
            g._node_frames.setdefault(nt, {})[k] = jnp.zeros(
                (n,) + shape, dtype
            )
        Ep = g._relations[cet].num_edges_padded
        for k, (shape, dtype) in edge_schema.items():
            g._edge_frames.setdefault(cet, {})[k] = jnp.zeros(
                (Ep,) + shape, dtype
            )
        return g

    # minimal ghosts first, last ghost takes the remaining slack
    ghosts = [ghost(1, 0) for _ in range(n_ghost - 1)]
    ghosts.append(ghost(spare_n - (n_ghost - 1), spare_e))
    bg = batch(graphs + ghosts)
    # degree bounds are static treedef fields and data-dependent; clamp to
    # the worst case so every padded batch shares ONE treedef (UDF-reduce
    # mailboxes become worst-case wide; builtin reducers are unaffected)
    for r in bg._relations.values():
        r.max_in_degree = r.num_edges_padded
        r.max_out_degree = r.num_edges_padded
    gmask = np.zeros(batch_size, bool)
    gmask[:B] = True
    return bg, jnp.asarray(gmask)


def unbatch(bg: Graph) -> List[Graph]:
    """Split a batched graph back (reference ``batch.py:256``)."""
    B = bg.batch_size
    cets = bg.canonical_etypes
    ntypes = bg.ntypes
    bnn = {nt: _asnumpy(bg.batch_num_nodes(nt)) for nt in ntypes}
    bne = {cet: _asnumpy(bg.batch_num_edges(cet)) for cet in cets}
    node_off = {nt: np.concatenate([[0], np.cumsum(bnn[nt])]) for nt in ntypes}
    edge_off = {cet: np.concatenate([[0], np.cumsum(bne[cet])]) for cet in cets}
    out = []
    for i in range(B):
        data_dict = {}
        nn = {nt: int(bnn[nt][i]) for nt in ntypes}
        for cet in cets:
            st, _, dt = cet
            rel = bg._relations[cet]
            lo, hi = edge_off[cet][i], edge_off[cet][i + 1]
            src = _asnumpy(rel.src)[lo:hi] - node_off[st][i]
            dst = _asnumpy(rel.dst)[lo:hi] - node_off[dt][i]
            data_dict[cet] = (src, dst)
        g = heterograph(data_dict, nn, idtype=bg.idtype)
        for nt in ntypes:
            for key, v in bg._node_frames.get(nt, {}).items():
                g._node_frames.setdefault(nt, {})[key] = v[
                    node_off[nt][i] : node_off[nt][i + 1]
                ]
        for cet in cets:
            for key, v in bg._edge_frames.get(cet, {}).items():
                g._edge_frames.setdefault(cet, {})[key] = v[
                    edge_off[cet][i] : edge_off[cet][i + 1]
                ]
        out.append(g)
    return out


def stack_graphs(graphs: Sequence[Graph]) -> Graph:
    """Stack same-shape graphs along a new leading batch axis for ``vmap``.

    The dp-sharded minibatch layout (see ``parallel.spmd``): all graphs must
    share static shapes; the data-dependent max-degree aux is normalized to
    the batch max so treedefs match. No reference analog (XLA-specific).
    """
    import jax

    graphs = list(graphs)
    mi = max(r.max_in_degree for g in graphs for r in g._relations.values())
    mo = max(r.max_out_degree for g in graphs for r in g._relations.values())
    for g in graphs:
        for r in g._relations.values():
            r.max_in_degree, r.max_out_degree = mi, mo
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *graphs)


def slice_batch(bg: Graph, gid: int, store_ids: bool = False) -> Graph:
    """Extract graph ``gid`` from a batch without unbatching the rest
    (reference ``batch.py:446``)."""
    B = bg.batch_size
    if not 0 <= gid < B:
        raise DGLError(f"gid {gid} out of range for batch of {B}")
    from .base import EID, NID

    cets = bg.canonical_etypes
    ntypes = bg.ntypes
    bnn = {nt: _asnumpy(bg.batch_num_nodes(nt)) for nt in ntypes}
    bne = {cet: _asnumpy(bg.batch_num_edges(cet)) for cet in cets}
    node_off = {nt: int(bnn[nt][:gid].sum()) for nt in ntypes}
    edge_off = {cet: int(bne[cet][:gid].sum()) for cet in cets}
    data_dict = {}
    nn = {nt: int(bnn[nt][gid]) for nt in ntypes}
    for cet in cets:
        st, _, dt = cet
        rel = bg._relations[cet]
        lo = edge_off[cet]
        hi = lo + int(bne[cet][gid])
        data_dict[cet] = (
            _asnumpy(rel.src)[lo:hi] - node_off[st],
            _asnumpy(rel.dst)[lo:hi] - node_off[dt],
        )
    g = heterograph(data_dict, nn, idtype=bg.idtype)
    for nt in ntypes:
        lo = node_off[nt]
        hi = lo + nn[nt]
        for key, v in bg._node_frames.get(nt, {}).items():
            g._node_frames.setdefault(nt, {})[key] = v[lo:hi]
        if store_ids:
            g._node_frames.setdefault(nt, {})[NID] = jnp.arange(lo, hi)
    for cet in cets:
        lo = edge_off[cet]
        hi = lo + int(bne[cet][gid])
        for key, v in bg._edge_frames.get(cet, {}).items():
            g._edge_frames.setdefault(cet, {})[key] = v[lo:hi]
        if store_ids:
            g._edge_frames.setdefault(cet, {})[EID] = jnp.arange(lo, hi)
    return g


__all__.append("slice_batch")
