"""Message-passing engine (reference ``python/dgl/core.py``).

``message_passing`` dispatch mirrors the reference (``core.py:372``):

1. builtin message x builtin reduce with a fused op -> ``invoke_gspmm``
   (``core.py:311``) lowering to the g-SpMM kernel;
2. builtin message alone (``apply_edges``) -> ``invoke_gsddmm``
   (``core.py:273``) lowering to g-SDDMM;
3. UDF message and/or UDF reduce -> messages materialized per edge, then a
   **padded dense mailbox** reduce replaces the reference's degree bucketing
   (``core.py:99-174`` + ``src/scheduler/scheduler.cc:15``) — bucketing by
   exact degree is a dynamic-shape pattern XLA cannot compile, so we pad all
   nodes to the static max in-degree and mask.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import ops
from .base import ALL, DGLError, is_all
from .function.base import MessageFunction, ReduceFunction
from .graph import Graph
from .udf import EdgeBatch, NodeBatch

__all__ = [
    "message_passing",
    "invoke_gspmm",
    "invoke_gsddmm",
    "invoke_edge_udf",
    "invoke_udf_reduce",
]


def _src_frame(g: Graph, cet):
    return g._node_frames.setdefault(cet[0], {})

def _dst_frame(g: Graph, cet):
    frames = g._dst_frames if g.is_block else g._node_frames
    return frames.setdefault(cet[2], {})

def _edge_frame(g: Graph, cet):
    return g._edge_frames.setdefault(cet, {})


def _fetch(g: Graph, cet, target: str, field: str):
    if target == "u":
        frame = _src_frame(g, cet)
    elif target == "v":
        frame = _dst_frame(g, cet)
    elif target == "e":
        frame = _edge_frame(g, cet)
    else:
        raise DGLError(f"Unknown target {target!r}")
    if field not in frame:
        raise DGLError(f"Field {field!r} not found in {target}-frame of {cet}")
    return frame[field]


def invoke_gsddmm(g: Graph, cet, mfunc: MessageFunction):
    """Materialize per-edge messages with g-SDDMM (reference ``core.py:273``)."""
    rel = g._relations[cet]
    if mfunc.binary_op == "copy_lhs":
        lhs = _fetch(g, cet, mfunc.lhs, mfunc.lhs_field)
        out = ops.gsddmm(rel, "copy_lhs", lhs, None, lhs_target=mfunc.lhs)
    else:
        lhs = _fetch(g, cet, mfunc.lhs, mfunc.lhs_field)
        rhs = _fetch(g, cet, mfunc.rhs, mfunc.rhs_field)
        out = ops.gsddmm(
            rel, mfunc.binary_op, lhs, rhs,
            lhs_target=mfunc.lhs, rhs_target=mfunc.rhs,
        )
    return {mfunc.out_field: out}


def invoke_gspmm(g: Graph, cet, mfunc: MessageFunction, rfunc: ReduceFunction):
    """Fused message+reduce (reference ``core.py:311``)."""
    rel = g._relations[cet]
    reduce_op = rfunc.name
    if mfunc.binary_op == "copy_lhs":
        if mfunc.lhs == "u":
            x = _fetch(g, cet, "u", mfunc.lhs_field)
            out = ops.gspmm(rel, "copy_lhs", reduce_op, x, None)
        elif mfunc.lhs == "e":
            x = _fetch(g, cet, "e", mfunc.lhs_field)
            out = ops.gspmm(rel, "copy_rhs", reduce_op, None, x)
        else:
            raise DGLError("copy_v message is not meaningful for update_all")
        return {rfunc.out_field: out}
    targets = {mfunc.lhs, mfunc.rhs}
    if targets == {"u", "e"}:
        u = _fetch(g, cet, "u", mfunc.lhs_field if mfunc.lhs == "u" else mfunc.rhs_field)
        e = _fetch(g, cet, "e", mfunc.lhs_field if mfunc.lhs == "e" else mfunc.rhs_field)
        op = mfunc.binary_op
        if mfunc.lhs == "e" and op in ("sub", "div"):
            # e op u: rewrite since gspmm takes (u, e) operand order
            msg = invoke_gsddmm(g, cet, mfunc)[mfunc.out_field]
            out = ops.gspmm(rel, "copy_rhs", reduce_op, None, msg)
            return {rfunc.out_field: out}
        if op == "dot":
            msg = invoke_gsddmm(g, cet, mfunc)[mfunc.out_field]
            out = ops.gspmm(rel, "copy_rhs", reduce_op, None, msg)
            return {rfunc.out_field: out}
        out = ops.gspmm(rel, op, reduce_op, u, e)
        return {rfunc.out_field: out}
    # messages involving v (dst) or u-v pairs: materialize then reduce copy_e
    msg = invoke_gsddmm(g, cet, mfunc)[mfunc.out_field]
    out = ops.gspmm(rel, "copy_rhs", reduce_op, None, msg)
    return {rfunc.out_field: out}


def invoke_edge_udf(g: Graph, cet, func: Callable, eids=ALL):
    """Run an edge UDF over all edges (reference ``core.py:52``)."""
    rel = g._relations[cet]
    srcf = _src_frame(g, cet)
    dstf = _dst_frame(g, cet)
    edgef = _edge_frame(g, cet)
    src_data = {k: v[rel.src] for k, v in srcf.items()}
    dst_data = {k: v[rel.dst] for k, v in dstf.items()}
    edge_data = dict(edgef)
    ebatch = EdgeBatch(src_data, edge_data, dst_data, edges=(rel.src, rel.dst))
    out = func(ebatch)
    if not isinstance(out, dict):
        raise DGLError("Edge UDF must return a dict of edge fields")
    return out


def invoke_node_udf(g: Graph, func: Callable, ntype: str, orig=None):
    frame = (
        g._dst_frames.setdefault(ntype, {})
        if g.is_block
        else g._node_frames.setdefault(ntype, {})
    )
    data = dict(frame)
    if orig:
        data.update(orig)
    nbatch = NodeBatch(data)
    out = func(nbatch)
    if not isinstance(out, dict):
        raise DGLError("Node UDF must return a dict of node fields")
    return out


def invoke_udf_reduce(g: Graph, cet, rfunc: Callable, msgdata: Dict):
    """Padded-mailbox UDF reduce (replaces reference degree bucketing).

    Builds a dense (num_dst, max_in_degree, feat) mailbox: slot ``r`` of node
    ``d`` holds the r-th incoming message in CSC order, zero-padded. The UDF
    receives a ``NodeBatch`` whose mailbox and ``mailbox_mask`` cover all dst
    nodes at once (one compiled kernel instead of per-degree buckets).
    """
    rel = g._relations[cet]
    maxdeg = max(rel.max_in_degree, 1)
    n = rel.num_dst
    indptr = rel.csc_indptr
    epad = rel.num_edges_padded
    # rank of each sorted edge within its dst segment
    pos = jnp.arange(epad, dtype=indptr.dtype)
    rank = pos - indptr[rel.csc_dst]
    # flat slot index; padded edges (csc_dst == n) go to a trash slot
    slot = jnp.where(
        rel.csc_dst < n, rel.csc_dst * maxdeg + rank, n * maxdeg
    )
    mailbox = {}
    for k, v in msgdata.items():
        vs = v[rel.csc_eids]
        buf = jnp.zeros((n * maxdeg + 1,) + vs.shape[1:], dtype=vs.dtype)
        buf = buf.at[slot].set(vs, indices_are_sorted=True)
        mailbox[k] = buf[:-1].reshape((n, maxdeg) + vs.shape[1:])
    deg = rel.in_degrees()
    mask = jnp.arange(maxdeg)[None, :] < deg[:, None]
    dstf = _dst_frame(g, cet)
    nbatch = NodeBatch(dict(dstf), mailbox, mask)
    out = rfunc(nbatch)
    if not isinstance(out, dict):
        raise DGLError("Reduce UDF must return a dict of node fields")
    return out


def message_passing(g: Graph, mfunc, rfunc, afunc=None, etype=None):
    """Core dispatch (reference ``python/dgl/core.py:372``). Returns the new
    dst-node fields as a dict."""
    cet = g.to_canonical_etype(etype)
    if isinstance(mfunc, MessageFunction) and isinstance(rfunc, ReduceFunction):
        ndata = invoke_gspmm(g, cet, mfunc, rfunc)
    else:
        # materialize messages
        if isinstance(mfunc, MessageFunction):
            msgdata = invoke_gsddmm(g, cet, mfunc)
        else:
            msgdata = invoke_edge_udf(g, cet, mfunc)
        if isinstance(rfunc, ReduceFunction):
            rel = g._relations[cet]
            key = rfunc.msg_field
            out = ops.gspmm(rel, "copy_rhs", rfunc.name, None, msgdata[key])
            ndata = {rfunc.out_field: out}
        else:
            ndata = invoke_udf_reduce(g, cet, rfunc, msgdata)
    if afunc is not None:
        dstf = _dst_frame(g, cet)
        data = dict(dstf)
        data.update(ndata)
        nbatch = NodeBatch(data)
        upd = afunc(nbatch)
        ndata.update(upd)
    return ndata


# ---------------------------------------------------------------------------
# Graph-method implementations (bound in graph.py)
# ---------------------------------------------------------------------------


def update_all_(g: Graph, message_func, reduce_func, apply_node_func=None, etype=None):
    """``DGLGraph.update_all`` (reference ``heterograph.py:5018``)."""
    cet = g.to_canonical_etype(etype)
    ndata = message_passing(g, message_func, reduce_func, apply_node_func, etype=cet)
    dstf = _dst_frame(g, cet)
    dstf.update(ndata)
    return ndata


def apply_edges_(g: Graph, func, edges=ALL, etype=None):
    """``DGLGraph.apply_edges`` (reference ``heterograph.py:4597``).

    Subset semantics use the fixed-shape strategy: compute over ALL edges
    (one fused kernel) and scatter the requested rows into the frame.
    """
    cet = g.to_canonical_etype(etype)
    if isinstance(func, MessageFunction):
        edata = invoke_gsddmm(g, cet, func)
    else:
        edata = invoke_edge_udf(g, cet, func)
    frame = _edge_frame(g, cet)
    if is_all(edges):
        frame.update(edata)
        return edata
    # jnp conversion keeps this traceable: a traced eids array works under
    # jit (compute full-width, scatter the requested rows — static shapes)
    eids = jnp.atleast_1d(jnp.asarray(edges))
    for k, val in edata.items():
        if k in frame and frame[k].shape == val.shape:
            frame[k] = frame[k].at[eids].set(val[eids])
        else:
            base = jnp.zeros_like(val)
            frame[k] = base.at[eids].set(val[eids])
    return {k: v[eids] for k, v in edata.items()}


def apply_nodes(g: Graph, func, v=ALL, ntype=None):
    """``DGLGraph.apply_nodes`` (reference ``heterograph.py:4495``); node
    subsets computed full-width then scattered (fixed-shape strategy)."""
    if ntype is None:
        if len(g.ntypes) != 1:
            raise DGLError("ntype required for graphs with multiple node types")
        ntype = g.ntypes[0]
    ndata = invoke_node_udf(g, func, ntype)
    frame = (
        g._dst_frames.setdefault(ntype, {})
        if g.is_block
        else g._node_frames.setdefault(ntype, {})
    )
    if is_all(v):
        frame.update(ndata)
        return ndata
    vids = jnp.atleast_1d(jnp.asarray(v))
    for k, val in ndata.items():
        if k in frame and frame[k].shape == val.shape:
            frame[k] = frame[k].at[vids].set(val[vids])
        else:
            frame[k] = jnp.zeros_like(val).at[vids].set(val[vids])
    return {k: val[vids] for k, val in ndata.items()}


def multi_update_all_(g: Graph, etype_dict, cross_reducer, apply_node_func=None):
    """``DGLGraph.multi_update_all`` (reference ``heterograph.py:5161``).

    ``etype_dict``: etype -> (msg_fn, reduce_fn[, apply_fn]). Per-dsttype
    results are combined with ``cross_reducer`` in {sum, max, min, mean,
    stack}.
    """
    per_dst: Dict[str, Dict[str, list]] = {}
    for etype, spec in etype_dict.items():
        cet = g.to_canonical_etype(etype)
        mfunc, rfunc = spec[0], spec[1]
        afunc = spec[2] if len(spec) > 2 else None
        ndata = message_passing(g, mfunc, rfunc, afunc, etype=cet)
        store = per_dst.setdefault(cet[2], {})
        for k, v in ndata.items():
            store.setdefault(k, []).append(v)
    for dsttype, fields in per_dst.items():
        frame = (
            g._dst_frames.setdefault(dsttype, {})
            if g.is_block
            else g._node_frames.setdefault(dsttype, {})
        )
        for k, vals in fields.items():
            if len(vals) == 1 and cross_reducer != "stack":
                out = vals[0]
            elif cross_reducer == "sum":
                out = sum(vals)
            elif cross_reducer == "max":
                out = jnp.stack(vals).max(axis=0)
            elif cross_reducer == "min":
                out = jnp.stack(vals).min(axis=0)
            elif cross_reducer == "mean":
                out = jnp.stack(vals).mean(axis=0)
            elif cross_reducer == "stack":
                out = jnp.stack(vals, axis=1)
            else:
                raise DGLError(f"Unknown cross reducer {cross_reducer!r}")
            frame[k] = out
    if apply_node_func is not None:
        for dsttype in per_dst:
            apply_nodes(g, apply_node_func, ntype=dsttype)
    return per_dst


# ---------------------------------------------------------------------------
# Subset propagation: pull / push / send_and_recv
# (reference ``heterograph.py`` ``pull``:5400, ``push``:5330,
# ``send_and_recv``:5230 — used by prop_nodes/prop_edges schedules)
# ---------------------------------------------------------------------------


def pull(g: Graph, v, message_func, reduce_func, apply_node_func=None, etype=None):
    """Compute messages into nodes ``v`` and update only those rows.

    Fixed-shape strategy: run the full fused reduce (one g-SpMM over the
    whole graph) and scatter the ``v`` rows into the dst frame — on TPU one
    dense kernel beats a dynamic-shape gather path, and ``v`` is host data.
    """
    cet = g.to_canonical_etype(etype)
    ndata = message_passing(g, message_func, reduce_func, None, etype=cet)
    v = jnp.asarray(v)
    dstf = _dst_frame(g, cet)
    for k, val in ndata.items():
        if k in dstf and dstf[k].shape == val.shape:
            dstf[k] = dstf[k].at[v].set(val[v])
        else:
            dstf[k] = val
    if apply_node_func is not None:
        data = dict(dstf)
        nbatch = NodeBatch(data)
        upd = apply_node_func(nbatch)
        for k, val in upd.items():
            if k in dstf and dstf[k].shape == val.shape:
                dstf[k] = dstf[k].at[v].set(val[v])
            else:
                dstf[k] = val
    return ndata


def send_and_recv(g: Graph, edges, message_func, reduce_func, apply_node_func=None, etype=None):
    """Message passing along an edge subset (reference ``heterograph.py:5230``).

    Messages are materialized per-edge, subset to ``edges`` (host data), and
    reduced by destination with a sorted segment reduce.
    """
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    eids = jnp.asarray(edges)
    if isinstance(message_func, MessageFunction):
        msgdata = invoke_gsddmm(g, cet, message_func)
    else:
        msgdata = invoke_edge_udf(g, cet, message_func)
    if not isinstance(reduce_func, ReduceFunction):
        # UDF reduce over the edge subset: build a padded mailbox from the
        # subset only (same design as invoke_udf_reduce, subset edges
        # sorted by dst on the host so the scatter stays static-shape)
        eids_np = np.atleast_1d(np.asarray(edges)).astype(np.int64)
        dst_np = np.asarray(rel.dst)[eids_np]
        order = np.argsort(dst_np, kind="stable")
        eids_sorted = eids_np[order]
        dst_sorted = dst_np[order]
        n = rel.num_dst
        deg = np.bincount(dst_sorted, minlength=n)
        maxdeg = max(int(deg.max()) if deg.size else 0, 1)
        cum = np.concatenate([[0], np.cumsum(deg)])
        rank = np.arange(eids_np.shape[0]) - cum[dst_sorted]
        slot = jnp.asarray(dst_sorted * maxdeg + rank)
        mailbox = {}
        for mk, v in msgdata.items():
            vs = jnp.asarray(v)[jnp.asarray(eids_sorted)]
            buf = jnp.zeros((n * maxdeg,) + vs.shape[1:], vs.dtype)
            mailbox[mk] = buf.at[slot].set(
                vs, indices_are_sorted=True
            ).reshape((n, maxdeg) + vs.shape[1:])
        mask = jnp.arange(maxdeg)[None, :] < jnp.asarray(deg)[:, None]
        dstf = _dst_frame(g, cet)
        upd = reduce_func(NodeBatch(dict(dstf), mailbox, mask))
        if not isinstance(upd, dict):
            raise DGLError("Reduce UDF must return a dict of node fields")
        touched = jnp.asarray(np.unique(dst_sorted))
        for kk, val in upd.items():
            if kk in dstf and dstf[kk].shape == val.shape:
                dstf[kk] = dstf[kk].at[touched].set(val[touched])
            else:
                dstf[kk] = val
        if apply_node_func is not None:
            upd2 = apply_node_func(NodeBatch(dict(dstf)))
            for kk, val in upd2.items():
                if kk in dstf and dstf[kk].shape == val.shape:
                    dstf[kk] = dstf[kk].at[touched].set(val[touched])
                else:
                    dstf[kk] = val
        return upd
    key = reduce_func.msg_field
    sub_msg = msgdata[key][eids]
    sub_dst = rel.dst[eids]
    n = rel.num_dst
    if reduce_func.name in ("sum", "mean"):
        out = jax.ops.segment_sum(sub_msg, sub_dst, num_segments=n)
        if reduce_func.name == "mean":
            cnt = jax.ops.segment_sum(
                jnp.ones_like(sub_dst, dtype=sub_msg.dtype), sub_dst, num_segments=n
            )
            out = out / jnp.maximum(cnt, 1).reshape((-1,) + (1,) * (out.ndim - 1))
    elif reduce_func.name == "max":
        out = jax.ops.segment_max(sub_msg, sub_dst, num_segments=n)
        out = jnp.where(jnp.isfinite(out), out, 0)
    elif reduce_func.name == "min":
        out = jax.ops.segment_min(sub_msg, sub_dst, num_segments=n)
        out = jnp.where(jnp.isfinite(out), out, 0)
    else:
        raise DGLError(f"Unknown reduce {reduce_func.name!r}")
    touched = jnp.asarray(np.unique(np.asarray(sub_dst)))
    dstf = _dst_frame(g, cet)
    k = reduce_func.out_field
    if k in dstf and dstf[k].shape == out.shape:
        dstf[k] = dstf[k].at[touched].set(out[touched])
    else:
        dstf[k] = out
    if apply_node_func is not None:
        data = dict(dstf)
        upd = apply_node_func(NodeBatch(data))
        for kk, val in upd.items():
            if kk in dstf and dstf[kk].shape == val.shape:
                dstf[kk] = dstf[kk].at[touched].set(val[touched])
            else:
                dstf[kk] = val
    return {k: out}


def push(g: Graph, u, message_func, reduce_func, apply_node_func=None, etype=None):
    """Send messages along out-edges of ``u`` (reference ``heterograph.py:5330``)."""
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    u_np = np.atleast_1d(np.asarray(u))
    indptr = np.asarray(rel.csr_indptr)
    eids = np.concatenate(
        [np.asarray(rel.csr_eids)[indptr[i] : indptr[i + 1]] for i in u_np]
    ) if u_np.size else np.zeros((0,), dtype=np.int64)
    return send_and_recv(
        g, eids, message_func, reduce_func, apply_node_func, etype=etype
    )


__all__ += ["pull", "push", "send_and_recv"]
