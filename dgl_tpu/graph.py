"""TPU-native heterogeneous graph object.

Design: the reference's mutable, lazily-formatted C++ ``UnitGraph`` /
``HeteroGraph`` (reference ``src/graph/unit_graph.h:41-47``,
``src/graph/heterograph.h``) becomes an **immutable struct-of-arrays pytree**.
Every relation stores COO + CSR + CSC eagerly (built on host at construction,
mirroring ``UnitGraph::GetInCSR/GetOutCSR/GetCOO`` at
``src/graph/unit_graph.h:260-279`` but without lazy mutation), so the whole
graph can flow through ``jax.jit`` / ``pjit`` with static treedef.

Feature storage: the reference's ``Frame``/``Column`` store
(``python/dgl/frame.py:571,167``) becomes plain dicts of arrays; the
``ndata``/``edata`` views mirror ``python/dgl/view.py:15-182``.

The Python API surface mirrors ``DGLGraph``
(``python/dgl/heterograph.py:40``): ``num_nodes``, ``num_edges``, ``edges()``,
``in_degrees``, ``out_degrees``, ``update_all`` (:5018), ``apply_edges``
(:4597), ``multi_update_all`` (:5161), ``local_scope``, blocks (MFGs), etc.
"""
from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .base import DGLError, ALL, is_all

CanonicalEtype = Tuple[str, str, str]


def _asnumpy(x) -> np.ndarray:
    if isinstance(x, np.ndarray):
        return x
    return np.asarray(x)


# ---------------------------------------------------------------------------
# Relation structure (one canonical edge type)
# ---------------------------------------------------------------------------


class Relation:
    """Adjacency of a single canonical edge type in COO + CSR + CSC.

    Equivalent of the reference's ``UnitGraph`` (``src/graph/unit_graph.h``)
    with all formats materialized (TPU-first: no lazy mutation, all arrays are
    device-resident ``jax.Array`` leaves of the Graph pytree).

    - ``src``, ``dst``: COO endpoints in edge-ID order.
    - ``csr_*``: out-edges grouped by source row (src -> dst).
    - ``csc_*``: in-edges grouped by destination row (dst -> src); this is the
      layout g-SpMM consumes (``SelectFormat(CSC)`` in the reference,
      ``src/array/kernel.cc:23``). ``csc_dst`` is the expanded per-edge
      destination id (sorted ascending) used for segment reductions.

    ``num_src``/``num_dst``/``num_edges`` are static Python ints (part of the
    pytree treedef) so shapes stay static under jit. Arrays may be padded
    beyond ``num_edges``; padded entries have ``src == num_src`` and
    ``dst == num_dst`` (one virtual padding row per side).
    """

    ARRAY_FIELDS = (
        "src",
        "dst",
        "csr_indptr",
        "csr_indices",
        "csr_eids",
        "csr_src",
        "csc_indptr",
        "csc_indices",
        "csc_eids",
        "csc_dst",
    )

    # optional dense-hub SpMM plan (ops/hub_spmm.py), full-edge shell
    # plan for weighted ops (ops/shell_spmm.py), and dense adjacency for
    # small-graph masked attention (ops/dense_attn.py); class-level
    # defaults so Relations built via __new__ (astype, tree_unflatten)
    # stay consistent
    hub_plan = None
    shell_plan = None
    dense_adj = None
    bitmap_plan = None
    # static uniform-stride edge layout (fixed-shape MFG blocks): edge
    # position d*stride+j belongs to dst d (or the padding sink), so
    # segment reductions lower to reshape+reduce (ops/spmm.py)
    uniform_stride = 0

    def __init__(
        self,
        src,
        dst,
        csr_indptr,
        csr_indices,
        csr_eids,
        csr_src,
        csc_indptr,
        csc_indices,
        csc_eids,
        csc_dst,
        *,
        num_src: int,
        num_dst: int,
        num_edges: int,
        max_in_degree: int = -1,
        max_out_degree: int = -1,
        hub_plan=None,
        shell_plan=None,
        uniform_stride: int = 0,
    ):
        self.src = src
        self.dst = dst
        self.csr_indptr = csr_indptr
        self.csr_indices = csr_indices
        self.csr_eids = csr_eids
        self.csr_src = csr_src
        self.csc_indptr = csc_indptr
        self.csc_indices = csc_indices
        self.csc_eids = csc_eids
        self.csc_dst = csc_dst
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self.num_edges = int(num_edges)
        # static max degrees (for padded-mailbox UDF reduce); -1 = unknown
        self.max_in_degree = int(max_in_degree)
        self.max_out_degree = int(max_out_degree)
        self.hub_plan = hub_plan
        self.shell_plan = shell_plan
        self.uniform_stride = int(uniform_stride)

    # -- construction -------------------------------------------------------

    @staticmethod
    def from_coo(
        src,
        dst,
        num_src: int,
        num_dst: int,
        *,
        idtype=jnp.int32,
        num_edges: Optional[int] = None,
        formats: Sequence[str] = ("coo", "csr", "csc"),
        to_device: bool = True,
    ) -> "Relation":
        """Build all formats from a COO edge list on the host.

        Mirrors ``UnitGraph::CreateFromCOO`` + the COO->CSR sorts at
        ``src/array/cpu/coo_sort.cc`` (reference), done once eagerly in numpy.

        ``num_edges`` < len(src) marks the tail as padding (padded edges must
        already point at the virtual rows ``num_src``/``num_dst``).
        """
        src = _asnumpy(src)
        dst = _asnumpy(dst)
        if src.shape != dst.shape or src.ndim != 1:
            raise DGLError(
                f"src/dst must be equal-length 1D arrays, got {src.shape} vs {dst.shape}"
            )
        E_arr = src.shape[0]
        E = E_arr if num_edges is None else int(num_edges)
        np_id = np.dtype(np.int32) if idtype == jnp.int32 else np.dtype(np.int64)
        if np_id == np.int64 and to_device and not jax.config.jax_enable_x64:
            raise DGLError(
                "int64 idtype requires JAX x64 mode: wrap in "
                "`with jax.enable_x64(True):` or set jax_enable_x64 "
                "(otherwise ids silently truncate to int32)"
            )
        src = src.astype(np_id)
        dst = dst.astype(np_id)
        if E > 0:
            real_src = src[:E]
            real_dst = dst[:E]
            if real_src.size and (
                real_src.min() < 0 or real_src.max() >= num_src
            ):
                raise DGLError(
                    f"src ids out of range [0, {num_src}): "
                    f"min={real_src.min()}, max={real_src.max()}"
                )
            if real_dst.size and (
                real_dst.min() < 0 or real_dst.max() >= num_dst
            ):
                raise DGLError(
                    f"dst ids out of range [0, {num_dst}): "
                    f"min={real_dst.min()}, max={real_dst.max()}"
                )

        eids = np.arange(E_arr, dtype=np_id)

        def build_index(major, nrows):
            # Sort edges by `major` (stable, so ties keep eid order like the
            # reference's stable COO sort). Native counting sort when built
            # (csrc/host_ops.cpp coo_to_csr); numpy fallback otherwise.
            from . import _native

            res = _native.coo_to_csr(major, nrows + 1)  # +1: padding row
            if res is not None:
                indptr64, order64 = res
                order = order64.astype(np_id)
                return (
                    indptr64[: nrows + 1].astype(np_id),
                    order,
                    major[order],
                )
            order = np.argsort(major, kind="stable").astype(np_id)
            sorted_major = major[order]
            indptr = np.zeros(nrows + 2, dtype=np_id)
            np.add.at(indptr, sorted_major + 1, 1)
            indptr = np.cumsum(indptr, dtype=np_id)[: nrows + 1]
            return indptr, order, sorted_major

        def maxdeg(indptr, nrows):
            if nrows == 0:
                return 0
            return int(np.max(indptr[1 : nrows + 1] - indptr[:nrows]))

        dev = jnp.asarray if to_device else (lambda a: a)
        # honor `formats` (reference keeps lazy formats for exactly the
        # giant-graph memory reason — ``unit_graph.h:41-47``; here the
        # restriction is explicit: build only what's requested, access to
        # a missing format raises with a pointer to ``Graph.formats``)
        csr = {"csr_indptr": None, "csr_indices": None, "csr_eids": None,
               "csr_src": None}
        max_out = -1
        if "csr" in formats:
            # CSR: group by src. Padding edges (src == num_src) sort to
            # the end and are excluded by indptr[num_src].
            csr_indptr, csr_order, csr_src = build_index(src, num_src)
            csr = {"csr_indptr": dev(csr_indptr),
                   "csr_indices": dev(dst[csr_order]),
                   "csr_eids": dev(csr_order),
                   "csr_src": dev(csr_src)}
            max_out = maxdeg(csr_indptr, num_src)
        csc = {"csc_indptr": None, "csc_indices": None, "csc_eids": None,
               "csc_dst": None}
        max_in = -1
        if "csc" in formats:
            # CSC: group by dst.
            csc_indptr, csc_order, csc_dst = build_index(dst, num_dst)
            csc = {"csc_indptr": dev(csc_indptr),
                   "csc_indices": dev(src[csc_order]),
                   "csc_eids": dev(csc_order),
                   "csc_dst": dev(csc_dst)}
            max_in = maxdeg(csc_indptr, num_dst)
        return Relation(
            src=dev(src),
            dst=dev(dst),
            **csr,
            **csc,
            num_src=num_src,
            num_dst=num_dst,
            num_edges=E,
            max_in_degree=max_in,
            max_out_degree=max_out,
        )

    # -- pytree --------------------------------------------------------------

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in Relation.ARRAY_FIELDS)
        if self.hub_plan is not None:
            children = children + (self.hub_plan,)
        if self.shell_plan is not None:
            children = children + (self.shell_plan,)
        if self.dense_adj is not None:
            children = children + (self.dense_adj,)
        if self.bitmap_plan is not None:
            children = children + (self.bitmap_plan,)
        aux = (
            self.num_src,
            self.num_dst,
            self.num_edges,
            self.max_in_degree,
            self.max_out_degree,
            self.hub_plan is not None,
            self.shell_plan is not None,
            self.uniform_stride,
            self.dense_adj is not None,
            self.bitmap_plan is not None,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, c in zip(cls.ARRAY_FIELDS, children):
            setattr(obj, f, c)
        (
            obj.num_src,
            obj.num_dst,
            obj.num_edges,
            obj.max_in_degree,
            obj.max_out_degree,
            has_plan,
            has_shell,
            obj.uniform_stride,
            has_dense,
            has_bitmap,
        ) = aux
        i = len(cls.ARRAY_FIELDS)
        obj.hub_plan = children[i] if has_plan else None
        obj.shell_plan = children[i + int(has_plan)] if has_shell else None
        obj.dense_adj = (
            children[i + int(has_plan) + int(has_shell)] if has_dense
            else None
        )
        obj.bitmap_plan = (
            children[i + int(has_plan) + int(has_shell) + int(has_dense)]
            if has_bitmap else None
        )
        return obj

    def _copy_with(self, **overrides) -> "Relation":
        new = Relation.__new__(Relation)
        for f in Relation.ARRAY_FIELDS:
            setattr(new, f, getattr(self, f))
        for f in ("num_src", "num_dst", "num_edges", "max_in_degree",
                  "max_out_degree", "hub_plan", "shell_plan", "dense_adj",
                  "bitmap_plan", "uniform_stride"):
            setattr(new, f, overrides.get(f, getattr(self, f)))
        return new

    def with_hub_plan(self, plan) -> "Relation":
        """Return a copy carrying a dense-hub SpMM plan (ops/hub_spmm.py);
        ``gspmm`` auto-dispatches supported ops through it."""
        return self._copy_with(hub_plan=plan)

    def with_shell_plan(self, plan) -> "Relation":
        """Return a copy carrying a full-edge shell plan
        (ops/shell_spmm.py); ``gspmm`` dispatches weighted sum/mean ops
        through it."""
        return self._copy_with(shell_plan=plan)

    def with_dense_adj(self, plan) -> "Relation":
        """Return a copy carrying a dense adjacency mask
        (ops/dense_attn.py); attention layers (GATConv) dispatch the
        fused masked-attention path through it."""
        return self._copy_with(dense_adj=plan)

    def with_bitmap_plan(self, plan) -> "Relation":
        """Return a copy carrying a packed-bitmap dense SpMM plan
        (ops/bitmap_spmm.py); ``gspmm`` dispatches ``copy_u + sum/mean``
        through the MXU bitmap kernel — the high-degree (Reddit-class)
        fast path."""
        return self._copy_with(bitmap_plan=plan)

    # -- queries -------------------------------------------------------------

    @property
    def num_edges_padded(self) -> int:
        return self.src.shape[0]

    def edge_mask(self):
        """Boolean (E_padded,) mask of real (non-padding) edges."""
        if self.num_edges == self.num_edges_padded:
            return jnp.ones((self.num_edges_padded,), dtype=bool)
        return jnp.arange(self.num_edges_padded) < self.num_edges

    def host_arrays(self, *fields) -> tuple:
        """Cached numpy copies of index arrays for host-side samplers.

        Device->host transfers (expensive over the remote-TPU tunnel) happen
        once per Relation instance; Relations are immutable so the cache
        never invalidates. Integer arrays are stored as C-contiguous int64
        so the native (ctypes) samplers take them zero-copy. Usage:
        ``indptr, indices, eids =
        rel.host_arrays("csc_indptr", "csc_indices", "csc_eids")``.
        """
        cache = self.__dict__.setdefault("_host_cache", {})
        out = []
        for f in fields:
            if f not in cache:
                a = np.asarray(getattr(self, f))
                if np.issubdtype(a.dtype, np.integer):
                    a = np.ascontiguousarray(a, dtype=np.int64)
                cache[f] = a
            out.append(cache[f])
        return tuple(out)

    def in_degrees(self):
        if self.csc_indptr is None:
            raise DGLError(
                "CSC format not materialized on this graph; request it "
                "with g.formats(['csc', ...]) (format-restricted build)")
        return self.csc_indptr[1:] - self.csc_indptr[:-1]

    def out_degrees(self):
        if self.csr_indptr is None:
            raise DGLError(
                "CSR format not materialized on this graph; request it "
                "with g.formats(['csr', ...]) (format-restricted build)")
        return self.csr_indptr[1:] - self.csr_indptr[:-1]

    def reverse(self) -> "Relation":
        """Swap src/dst; CSR<->CSC (reference ``UnitGraph`` reverse view)."""
        return Relation(
            src=self.dst,
            dst=self.src,
            csr_indptr=self.csc_indptr,
            csr_indices=self.csc_indices,
            csr_eids=self.csc_eids,
            csr_src=self.csc_dst,
            csc_indptr=self.csr_indptr,
            csc_indices=self.csr_indices,
            csc_eids=self.csr_eids,
            csc_dst=self.csr_src,
            num_src=self.num_dst,
            num_dst=self.num_src,
            num_edges=self.num_edges,
            max_in_degree=self.max_out_degree,
            max_out_degree=self.max_in_degree,
        )

    def __repr__(self):
        return (
            f"Relation(num_src={self.num_src}, num_dst={self.num_dst}, "
            f"num_edges={self.num_edges})"
        )


jax.tree_util.register_pytree_node(
    Relation,
    lambda r: r.tree_flatten(),
    Relation.tree_unflatten,
)


# ---------------------------------------------------------------------------
# Data views (ndata / edata / srcdata / dstdata) — mirror python/dgl/view.py
# ---------------------------------------------------------------------------


class HeteroNodeDataView(Mapping):
    """``g.ndata`` view (reference ``python/dgl/view.py:70-182``)."""

    __slots__ = ("_graph", "_ntype", "_role")

    def __init__(self, graph: "Graph", ntype: Optional[str], role: str):
        self._graph = graph
        self._ntype = ntype
        self._role = role  # 'node' | 'src' | 'dst'

    def _frames(self) -> Dict[str, Dict[str, Any]]:
        if self._role == "dst":
            return self._graph._dst_frames
        return self._graph._node_frames

    def _frame(self, ntype=None) -> Dict[str, Any]:
        g = self._graph
        nt = ntype if ntype is not None else self._ntype
        if nt is None:
            types = g.srctypes if self._role == "src" else (
                g.dsttypes if self._role == "dst" else g.ntypes
            )
            if len(types) != 1:
                raise DGLError(
                    "Graph has multiple node types; use g.nodes[ntype].data "
                    "or pass an explicit ntype."
                )
            nt = types[0]
        return self._frames().setdefault(nt, {})

    def __getitem__(self, key):
        if self._ntype is None and isinstance(key, str) and key in self._typekeys():
            # hetero: g.ndata['h'] may return per-type dict in reference;
            # here string keys index features of the unique type.
            pass
        frame = self._frame()
        if key not in frame:
            raise KeyError(key)
        return frame[key]

    def _typekeys(self):
        return ()

    def __setitem__(self, key, value):
        g = self._graph
        if self._ntype is None and len(self._types()) > 1:
            if not isinstance(value, Mapping):
                raise DGLError(
                    "Setting ndata on a graph with multiple node types "
                    "requires a dict of per-type values."
                )
            for nt, v in value.items():
                self._check_shape(nt, v)
                self._frame(nt)[key] = v
            return
        nt = self._ntype if self._ntype is not None else self._types()[0]
        self._check_shape(nt, value)
        self._frame(nt)[key] = value

    def _types(self):
        g = self._graph
        if self._role == "src":
            return g.srctypes
        if self._role == "dst":
            return g.dsttypes
        return g.ntypes

    def _check_shape(self, ntype, value):
        g = self._graph
        if self._role == "dst":
            n = g.num_dst_nodes(ntype)
        elif self._role == "src":
            n = g.num_src_nodes(ntype)
        else:
            n = g.num_nodes(ntype)
        if value.shape[0] != n:
            raise DGLError(
                f"Feature first dim {value.shape[0]} != number of "
                f"{self._role} nodes {n} for ntype {ntype!r}"
            )

    def __delitem__(self, key):
        del self._frame()[key]

    def __iter__(self):
        return iter(self._frame())

    def __len__(self):
        return len(self._frame())

    def __contains__(self, key):
        return key in self._frame()

    def keys(self):
        return self._frame().keys()

    def pop(self, key):
        return self._frame().pop(key)

    def update(self, other):
        for k, v in other.items():
            self[k] = v

    def __repr__(self):
        return repr(dict(self._frame()))


class HeteroEdgeDataView(Mapping):
    """``g.edata`` view (reference ``python/dgl/view.py:184-280``)."""

    __slots__ = ("_graph", "_etype")

    def __init__(self, graph: "Graph", etype=None):
        self._graph = graph
        self._etype = etype

    def _frame(self, etype=None) -> Dict[str, Any]:
        g = self._graph
        et = etype if etype is not None else self._etype
        cet = g.to_canonical_etype(et) if et is not None else None
        if cet is None:
            if len(g.canonical_etypes) != 1:
                raise DGLError(
                    "Graph has multiple edge types; use g.edges[etype].data."
                )
            cet = g.canonical_etypes[0]
        return g._edge_frames.setdefault(cet, {})

    def __getitem__(self, key):
        frame = self._frame()
        if key not in frame:
            raise KeyError(key)
        return frame[key]

    def __setitem__(self, key, value):
        g = self._graph
        if self._etype is None and len(g.canonical_etypes) > 1:
            if not isinstance(value, Mapping):
                raise DGLError(
                    "Setting edata on a graph with multiple edge types "
                    "requires a dict of per-etype values."
                )
            for et, v in value.items():
                self._frame(et)[key] = v
            return
        cet = (
            g.to_canonical_etype(self._etype)
            if self._etype is not None
            else g.canonical_etypes[0]
        )
        n = g.num_edges(cet)
        npad = g._relation(cet).num_edges_padded
        if value.shape[0] not in (n, npad):
            raise DGLError(
                f"Feature first dim {value.shape[0]} != number of edges {n} "
                f"for etype {cet!r}"
            )
        self._frame(self._etype)[key] = value

    def __delitem__(self, key):
        del self._frame()[key]

    def __iter__(self):
        return iter(self._frame())

    def __len__(self):
        return len(self._frame())

    def __contains__(self, key):
        return key in self._frame()

    def keys(self):
        return self._frame().keys()

    def pop(self, key):
        return self._frame().pop(key)

    def update(self, other):
        for k, v in other.items():
            self[k] = v

    def __repr__(self):
        return repr(dict(self._frame()))


class _TypedView:
    """``g.nodes[ntype].data`` / ``g.edges[etype].data`` accessor."""

    __slots__ = ("_graph", "_kind", "_role")

    def __init__(self, graph, kind, role="node"):
        self._graph = graph
        self._kind = kind
        self._role = role

    def __getitem__(self, key):
        if self._kind == "node":
            return _TypedDataHolder(
                HeteroNodeDataView(self._graph, key, self._role)
            )
        return _TypedDataHolder(HeteroEdgeDataView(self._graph, key))


class _TypedDataHolder:
    __slots__ = ("data",)

    def __init__(self, view):
        self.data = view


# ---------------------------------------------------------------------------
# Graph
# ---------------------------------------------------------------------------


class Graph:
    """Immutable-structure heterogeneous graph pytree.

    Equivalent of ``DGLGraph`` (reference ``python/dgl/heterograph.py:40``).
    Structure (relations, node counts, metagraph) is fixed at construction;
    feature frames are mutable Python dicts so the familiar
    ``g.ndata['h'] = x`` idiom works outside of traced code. The whole object
    is a registered pytree: structure arrays and features are leaves, the
    metagraph and counts are static treedef data, so a ``Graph`` can be passed
    straight into ``jax.jit``-compiled functions.

    Blocks (message-flow graphs, reference ``create_block``
    ``python/dgl/convert.py:389``) are Graphs with ``is_block=True`` and
    separate SRC/DST node spaces.
    """

    def __init__(
        self,
        relations: Dict[CanonicalEtype, Relation],
        num_src_nodes: Dict[str, int],
        num_dst_nodes: Optional[Dict[str, int]] = None,
        *,
        is_block: bool = False,
        node_frames: Optional[Dict[str, Dict[str, Any]]] = None,
        dst_frames: Optional[Dict[str, Dict[str, Any]]] = None,
        edge_frames: Optional[Dict[CanonicalEtype, Dict[str, Any]]] = None,
        batch_num_nodes: Optional[Dict[str, Any]] = None,
        batch_num_edges: Optional[Dict[CanonicalEtype, Any]] = None,
    ):
        self._relations = dict(relations)
        self._canonical_etypes: Tuple[CanonicalEtype, ...] = tuple(
            self._relations.keys()
        )
        self._num_src_nodes = dict(num_src_nodes)
        self._num_dst_nodes = (
            dict(num_dst_nodes) if num_dst_nodes is not None else dict(num_src_nodes)
        )
        self._is_block = bool(is_block)
        self._node_frames = node_frames if node_frames is not None else {}
        # dst frames only used for blocks (separate DST node space)
        self._dst_frames = dst_frames if dst_frames is not None else ({} if is_block else self._node_frames)
        if not is_block:
            self._dst_frames = self._node_frames
        self._edge_frames = edge_frames if edge_frames is not None else {}
        self._batch_num_nodes = batch_num_nodes  # dict ntype -> (B,) array
        self._batch_num_edges = batch_num_edges  # dict cetype -> (B,) array
        # validate relation shapes against node counts
        for (st, et, dt), rel in self._relations.items():
            if st not in self._num_src_nodes or dt not in self._num_dst_nodes:
                raise DGLError(f"Unknown node type in relation ({st},{et},{dt})")

    # -- basic schema --------------------------------------------------------

    @property
    def is_block(self) -> bool:
        return self._is_block

    @property
    def canonical_etypes(self) -> Tuple[CanonicalEtype, ...]:
        return self._canonical_etypes

    @property
    def etypes(self) -> List[str]:
        return [et for _, et, _ in self._canonical_etypes]

    @property
    def ntypes(self) -> List[str]:
        seen = dict.fromkeys(self._num_src_nodes)
        if self._is_block:
            seen.update(dict.fromkeys(self._num_dst_nodes))
        return list(seen)

    @property
    def srctypes(self) -> List[str]:
        return list(self._num_src_nodes)

    @property
    def dsttypes(self) -> List[str]:
        return list(self._num_dst_nodes)

    @property
    def is_homogeneous(self) -> bool:
        return len(self.ntypes) == 1 and len(self.canonical_etypes) == 1

    @property
    def idtype(self):
        rel = next(iter(self._relations.values()))
        return rel.src.dtype

    @property
    def device(self):
        rel = next(iter(self._relations.values()))
        arr = rel.src
        return arr.devices() if hasattr(arr, "devices") else None

    def to_canonical_etype(self, etype) -> CanonicalEtype:
        """Resolve etype name / triplet (reference ``heterograph.py:1121``)."""
        if etype is None:
            if len(self._canonical_etypes) != 1:
                raise DGLError(
                    "Edge type name must be specified for graphs with "
                    f"multiple edge types: {self._canonical_etypes}"
                )
            return self._canonical_etypes[0]
        if isinstance(etype, tuple):
            if tuple(etype) not in self._relations:
                raise DGLError(f"Unknown canonical etype {etype}")
            return tuple(etype)
        matches = [c for c in self._canonical_etypes if c[1] == etype]
        if not matches:
            raise DGLError(f"Unknown edge type {etype!r}")
        if len(matches) > 1:
            raise DGLError(
                f"Edge type {etype!r} is ambiguous; use a canonical triplet. "
                f"Candidates: {matches}"
            )
        return matches[0]

    def _relation(self, etype=None) -> Relation:
        return self._relations[self.to_canonical_etype(etype)]

    # -- counts --------------------------------------------------------------

    def _one_ntype(self, role: str) -> str:
        types = self.srctypes if role == "src" else self.dsttypes
        if len(types) != 1:
            raise DGLError("ntype must be given for graphs with multiple node types")
        return types[0]

    def num_nodes(self, ntype: Optional[str] = None) -> int:
        if self._is_block:
            # For blocks, num_nodes counts SRC nodes (supersets of DST).
            return self.num_src_nodes(ntype)
        if ntype is None:
            if len(self.ntypes) == 1:
                return self._num_src_nodes[self.ntypes[0]]
            return sum(self._num_src_nodes.values())
        if ntype not in self._num_src_nodes:
            raise DGLError(f"Unknown node type {ntype!r}")
        return self._num_src_nodes[ntype]

    number_of_nodes = num_nodes

    def num_src_nodes(self, ntype: Optional[str] = None) -> int:
        if ntype is None:
            if len(self.srctypes) == 1:
                return self._num_src_nodes[self.srctypes[0]]
            return sum(self._num_src_nodes.values())
        return self._num_src_nodes[ntype]

    def num_dst_nodes(self, ntype: Optional[str] = None) -> int:
        if ntype is None:
            if len(self.dsttypes) == 1:
                return self._num_dst_nodes[self.dsttypes[0]]
            return sum(self._num_dst_nodes.values())
        return self._num_dst_nodes[ntype]

    def num_edges(self, etype=None) -> int:
        if etype is None and len(self._canonical_etypes) > 1:
            return sum(r.num_edges for r in self._relations.values())
        return self._relation(etype).num_edges

    number_of_edges = num_edges

    # -- batch info (reference ``python/dgl/batch.py``) -----------------------

    @property
    def batch_size(self) -> int:
        if self._batch_num_nodes is None:
            return 1
        for v in self._batch_num_nodes.values():
            return int(v.shape[0])
        return 1

    def batch_num_nodes(self, ntype: Optional[str] = None):
        if self._batch_num_nodes is None:
            nt = ntype or self._one_ntype("src")
            return jnp.array([self.num_nodes(nt)])
        nt = ntype or self._one_ntype("src")
        return self._batch_num_nodes[nt]

    def batch_num_edges(self, etype=None):
        cet = self.to_canonical_etype(etype)
        if self._batch_num_edges is None:
            return jnp.array([self.num_edges(cet)])
        return self._batch_num_edges[cet]

    def set_batch_num_nodes(self, d):
        if not isinstance(d, dict):
            d = {self._one_ntype("src"): d}
        self._batch_num_nodes = {k: jnp.asarray(v) for k, v in d.items()}

    def set_batch_num_edges(self, d):
        if not isinstance(d, dict):
            d = {self.canonical_etypes[0]: d}
        self._batch_num_edges = {
            self.to_canonical_etype(k): jnp.asarray(v) for k, v in d.items()
        }

    # -- data views ----------------------------------------------------------

    @property
    def ndata(self):
        return HeteroNodeDataView(self, None, "node")

    @property
    def edata(self):
        return HeteroEdgeDataView(self, None)

    @property
    def srcdata(self):
        return HeteroNodeDataView(self, None, "src")

    @property
    def dstdata(self):
        return HeteroNodeDataView(self, None, "dst")

    @property
    def nodes(self):
        return _TypedView(self, "node")

    @property
    def edges_view(self):
        return _TypedView(self, "edge")

    def node_attr_schemes(self, ntype=None):
        nt = ntype or (self.ntypes[0] if len(self.ntypes) == 1 else None)
        frame = self._node_frames.get(nt, {})
        return {k: (v.shape[1:], v.dtype) for k, v in frame.items()}

    # -- structure queries ----------------------------------------------------

    def edges(self, form: str = "uv", order: str = "eid", etype=None):
        """Edge endpoints (reference ``heterograph.py`` ``all_edges``)."""
        rel = self._relation(etype)
        if order == "eid":
            u, v = rel.src, rel.dst
            e = jnp.arange(rel.num_edges_padded, dtype=u.dtype)
        elif order == "srcdst":
            u = jnp.repeat(
                jnp.arange(rel.num_src, dtype=rel.src.dtype),
                rel.out_degrees(),
                total_repeat_length=rel.num_edges_padded,
            )
            v = rel.csr_indices
            e = rel.csr_eids
        else:
            raise DGLError(f"Unknown edge order {order!r}")
        if form == "uv":
            return u, v
        if form == "all":
            return u, v, e
        if form == "eid":
            return e
        raise DGLError(f"Unknown form {form!r}")

    def find_edges(self, eid, etype=None):
        rel = self._relation(etype)
        eid = jnp.asarray(eid)
        return rel.src[eid], rel.dst[eid]

    def in_degrees(self, v=ALL, etype=None):
        rel = self._relation(etype)
        deg = rel.in_degrees()
        if is_all(v):
            return deg
        return deg[jnp.asarray(v)]

    def out_degrees(self, u=ALL, etype=None):
        rel = self._relation(etype)
        deg = rel.out_degrees()
        if is_all(u):
            return deg
        return deg[jnp.asarray(u)]

    def has_edges_between(self, u, v, etype=None):
        rel = self._relation(etype)
        u = np.atleast_1d(_asnumpy(u))
        v = np.atleast_1d(_asnumpy(v))
        indptr = _asnumpy(rel.csr_indptr)
        indices = _asnumpy(rel.csr_indices)
        out = np.zeros(u.shape, dtype=bool)
        for i, (uu, vv) in enumerate(zip(u, v)):
            row = indices[indptr[uu] : indptr[uu + 1]]
            out[i] = bool(np.isin(vv, row))
        res = jnp.asarray(out)
        return res if res.shape[0] > 1 else res[0]

    def edge_ids(self, u, v, etype=None):
        rel = self._relation(etype)
        u = np.atleast_1d(_asnumpy(u))
        v = np.atleast_1d(_asnumpy(v))
        indptr = _asnumpy(rel.csr_indptr)
        indices = _asnumpy(rel.csr_indices)
        eids = _asnumpy(rel.csr_eids)
        out = np.zeros(u.shape, dtype=indices.dtype)
        for i, (uu, vv) in enumerate(zip(u, v)):
            lo, hi = indptr[uu], indptr[uu + 1]
            hit = np.nonzero(indices[lo:hi] == vv)[0]
            if hit.size == 0:
                raise DGLError(f"Edge ({uu},{vv}) does not exist")
            out[i] = eids[lo + hit[0]]
        res = jnp.asarray(out)
        return res

    def successors(self, u, etype=None):
        rel = self._relation(etype)
        indptr = _asnumpy(rel.csr_indptr)
        indices = _asnumpy(rel.csr_indices)
        u = int(u)
        return jnp.asarray(indices[indptr[u] : indptr[u + 1]])

    def predecessors(self, v, etype=None):
        rel = self._relation(etype)
        indptr = _asnumpy(rel.csc_indptr)
        indices = _asnumpy(rel.csc_indices)
        v = int(v)
        return jnp.asarray(indices[indptr[v] : indptr[v + 1]])

    # -- message passing (implemented in core.py; bound late to avoid cycle) --

    def apply_nodes(self, func, v=ALL, ntype=None):
        from . import core

        return core.apply_nodes(self, func, v=v, ntype=ntype)

    def apply_edges(self, func, edges=ALL, etype=None):
        from . import core

        return core.apply_edges_(self, func, edges=edges, etype=etype)

    def update_all(self, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import core

        return core.update_all_(
            self, message_func, reduce_func, apply_node_func, etype=etype
        )

    def multi_update_all(self, etype_dict, cross_reducer, apply_node_func=None):
        from . import core

        return core.multi_update_all_(self, etype_dict, cross_reducer, apply_node_func)

    def pull(self, v, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import core

        return core.pull(self, v, message_func, reduce_func, apply_node_func, etype=etype)

    def push(self, u, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import core

        return core.push(self, u, message_func, reduce_func, apply_node_func, etype=etype)

    def send_and_recv(self, edges, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import core

        return core.send_and_recv(
            self, edges, message_func, reduce_func, apply_node_func, etype=etype
        )

    def prop_nodes(self, nodes_generator, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import propagate

        return propagate.prop_nodes(
            self, nodes_generator, message_func, reduce_func, apply_node_func, etype=etype
        )

    def prop_edges(self, edges_generator, message_func, reduce_func, apply_node_func=None, etype=None):
        from . import propagate

        return propagate.prop_edges(
            self, edges_generator, message_func, reduce_func, apply_node_func, etype=etype
        )

    # -- transforms ------------------------------------------------------------

    def reverse(self, copy_ndata=True, copy_edata=True) -> "Graph":
        """Reverse every relation (reference ``dgl.reverse``)."""
        rels = {
            (dt, et, st): rel.reverse()
            for (st, et, dt), rel in self._relations.items()
        }
        g = Graph(
            rels,
            num_src_nodes=dict(self._num_dst_nodes),
            num_dst_nodes=dict(self._num_src_nodes),
            is_block=False,
        )
        if copy_ndata:
            for nt, f in self._node_frames.items():
                g._node_frames[nt] = dict(f)
        if copy_edata:
            for (st, et, dt), f in self._edge_frames.items():
                g._edge_frames[(dt, et, st)] = dict(f)
        return g

    def local_scope(self):
        """Context manager isolating frame mutations (ref ``heterograph.py:5718``)."""
        return _LocalScope(self)

    def local_var(self) -> "Graph":
        g = self.structural_clone()
        g._node_frames = {nt: dict(f) for nt, f in self._node_frames.items()}
        if self._is_block:
            g._dst_frames = {nt: dict(f) for nt, f in self._dst_frames.items()}
        else:
            g._dst_frames = g._node_frames
        g._edge_frames = {et: dict(f) for et, f in self._edge_frames.items()}
        return g

    def structural_clone(self) -> "Graph":
        g = Graph.__new__(Graph)
        g._relations = self._relations
        g._canonical_etypes = self._canonical_etypes
        g._num_src_nodes = self._num_src_nodes
        g._num_dst_nodes = self._num_dst_nodes
        g._is_block = self._is_block
        g._node_frames = self._node_frames
        g._dst_frames = self._dst_frames
        g._edge_frames = self._edge_frames
        g._batch_num_nodes = self._batch_num_nodes
        g._batch_num_edges = self._batch_num_edges
        return g

    def to(self, device) -> "Graph":
        """Move all arrays to a device (reference ``heterograph.py:5658``)."""
        return jax.tree_util.tree_map(lambda x: jax.device_put(x, device), self)

    @staticmethod
    def _auto_num_hubs(rel) -> int:
        """Pick the hub-table size from the out-degree distribution:
        smallest power-of-two H (128..4096) whose top-H sources cover
        >= 50% of edges; below that, the coverage elbow (the measured v5e
        hub matmul cost moves little across this H range, so coverage is
        the operative variable — docs/performance.md)."""
        import numpy as np

        src = np.asarray(rel.csc_indices)
        dst = np.asarray(rel.csc_dst)
        real = (src < rel.num_src) & (dst < rel.num_dst)
        e = int(real.sum())
        if e == 0:
            return 128
        deg = np.bincount(src[real], minlength=rel.num_src)
        deg_sorted = np.sort(deg)[::-1]
        cum = np.cumsum(deg_sorted)
        candidates = [h for h in (128, 256, 512, 1024, 2048, 4096)
                      if h <= rel.num_src] or [rel.num_src]
        for h in candidates:
            if cum[min(h, cum.shape[0]) - 1] / e >= 0.5:
                return h
        # no candidate covers half the edges: take the diminishing-returns
        # elbow (stop doubling when the extra coverage is < 5%)
        best = candidates[0]
        for prev, h in zip(candidates, candidates[1:]):
            gain = (cum[min(h, cum.shape[0]) - 1]
                    - cum[min(prev, cum.shape[0]) - 1]) / e
            if gain < 0.05:
                break
            best = h
        return best

    def with_spmm_plans(self, num_hubs=2048,
                        precision: str = "int8",
                        weighted: bool = False,
                        gather_dtype: str = "bf16",
                        dense_attn: bool | str = "auto",
                        dense_attn_max_cells: int = 16_000_000,
                        bitmap: bool | str = "auto",
                        bitmap_max_bytes: int = 2 << 30,
                        bitmap_min_density: float = 5e-4) -> "Graph":
        """Return a copy whose relations carry dense-hub SpMM plans
        (:mod:`dgl_tpu.ops.hub_spmm`): supported g-SpMM calls then aggregate
        hub edges as one MXU matmul instead of a per-edge HBM gather. Build
        once per graph (host pass + one device scatter per relation).

        ``weighted=True`` additionally builds full-edge shell plans
        (:mod:`dgl_tpu.ops.shell_spmm`) so edge-weighted sum/mean ops
        (``u_mul_e_sum`` — the GAT/GCN-norm aggregation) skip the sorted
        segment-sum as well.

        ``num_hubs="auto"`` sizes the hub table per relation from the
        out-degree distribution (see :meth:`_auto_num_hubs`).

        ``dense_attn="auto"`` additionally attaches a dense adjacency mask
        (:mod:`dgl_tpu.ops.dense_attn`) to relations with at most
        ``dense_attn_max_cells`` ``N_src*N_dst`` cells and no multi-edges:
        attention layers then run as fused masked attention on the MXU
        instead of the per-edge SDDMM/edge-softmax/SpMM chain (measured
        5.0 -> ~1.5 ms/epoch for GAT Cora on v5e — op-count bound at that
        scale).

        ``bitmap="auto"`` attaches a packed-bitmap dense SpMM plan
        (:mod:`dgl_tpu.ops.bitmap_spmm`) to HIGH-DEGREE relations
        (density ``E/(N_src*N_dst) >= bitmap_min_density`` and bitmap
        bytes within ``bitmap_max_bytes``): ``copy_u + sum/mean`` then
        streams the adjacency as bits through the MXU at a cost
        independent of E and of degree skew — the Reddit-class path.
        ``bitmap=True`` forces the attempt regardless of density."""
        from .ops.bitmap_spmm import (
            bitmap_bytes, build_bitmap_plan)
        from .ops.dense_attn import build_dense_adj
        from .ops.hub_spmm import build_hub_plan
        from .ops.shell_spmm import build_shell_plan

        g = self.structural_clone()
        rels = {}
        for k, r in self._relations.items():
            h = (
                self._auto_num_hubs(r) if num_hubs == "auto"
                else int(num_hubs)
            )
            r = r.with_hub_plan(build_hub_plan(r, h, precision))
            if weighted:
                r = r.with_shell_plan(build_shell_plan(r, gather_dtype))
            if dense_attn is True or dense_attn == "auto":
                da = build_dense_adj(r, max_cells=dense_attn_max_cells)
                if da is not None:
                    r = r.with_dense_adj(da)
            want_bitmap = bitmap is True or (
                bitmap == "auto"
                and r.num_src * r.num_dst > 0
                and r.num_edges / (r.num_src * r.num_dst)
                >= bitmap_min_density
                and bitmap_bytes(r.num_src, r.num_dst, False)
                <= bitmap_max_bytes * 2
            )
            if want_bitmap:
                bp = build_bitmap_plan(r, max_bytes=bitmap_max_bytes)
                if bp is not None:
                    r = r.with_bitmap_plan(bp)
            rels[k] = r
        g._relations = rels
        return g

    # -- pytree ---------------------------------------------------------------

    def tree_flatten(self):
        rel_items = tuple(sorted(self._relations.items(), key=lambda kv: kv[0]))
        rel_keys = tuple(k for k, _ in rel_items)
        rel_vals = tuple(v for _, v in rel_items)

        def freeze_frames(frames):
            keys = tuple(
                (outer, tuple(sorted(frames[outer].keys())))
                for outer in sorted(frames.keys())
            )
            vals = tuple(
                frames[outer][inner]
                for outer, inners in keys
                for inner in inners
            )
            return keys, vals

        nf_keys, nf_vals = freeze_frames(self._node_frames)
        if self._is_block:
            df_keys, df_vals = freeze_frames(self._dst_frames)
        else:
            df_keys, df_vals = (), ()
        ef_keys, ef_vals = freeze_frames(self._edge_frames)

        def freeze_opt(d):
            if d is None:
                return None, ()
            keys = tuple(sorted(d.keys()))
            return keys, tuple(d[k] for k in keys)

        bn_keys, bn_vals = freeze_opt(self._batch_num_nodes)
        be_keys, be_vals = freeze_opt(self._batch_num_edges)
        children = (rel_vals, nf_vals, df_vals, ef_vals, bn_vals, be_vals)
        aux = (
            rel_keys,
            tuple(sorted(self._num_src_nodes.items())),
            tuple(sorted(self._num_dst_nodes.items())),
            self._is_block,
            nf_keys,
            df_keys,
            ef_keys,
            bn_keys,
            be_keys,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        (
            rel_keys,
            nsrc,
            ndst,
            is_block,
            nf_keys,
            df_keys,
            ef_keys,
            bn_keys,
            be_keys,
        ) = aux
        rel_vals, nf_vals, df_vals, ef_vals, bn_vals, be_vals = children

        def thaw(keys, vals):
            vals = list(vals)
            frames = {}
            for outer, inners in keys:
                frames[outer] = {}
                for inner in inners:
                    frames[outer][inner] = vals.pop(0)
            return frames

        g = cls.__new__(cls)
        g._relations = dict(zip(rel_keys, rel_vals))
        g._canonical_etypes = rel_keys
        g._num_src_nodes = dict(nsrc)
        g._num_dst_nodes = dict(ndst)
        g._is_block = is_block
        g._node_frames = thaw(nf_keys, nf_vals)
        g._edge_frames = thaw(ef_keys, ef_vals)
        g._dst_frames = thaw(df_keys, df_vals) if is_block else g._node_frames
        g._batch_num_nodes = (
            None if bn_keys is None else dict(zip(bn_keys, bn_vals))
        )
        g._batch_num_edges = (
            None if be_keys is None else dict(zip(be_keys, be_vals))
        )
        return g

    def __repr__(self):
        if self.is_homogeneous and not self._is_block:
            return (
                f"Graph(num_nodes={self.num_nodes()}, num_edges={self.num_edges()},\n"
                f"      ndata_schemes={self.node_attr_schemes()})"
            )
        kind = "Block" if self._is_block else "Graph"
        nn = {nt: self.num_src_nodes(nt) for nt in self.srctypes}
        if self._is_block:
            nn = {
                "src": nn,
                "dst": {nt: self.num_dst_nodes(nt) for nt in self.dsttypes},
            }
        ne = {et: self.num_edges(et) for et in self.canonical_etypes}
        return f"{kind}(num_nodes={nn}, num_edges={ne})"


class _LocalScope:
    def __init__(self, graph: Graph):
        self._graph = graph

    def __enter__(self):
        g = self._graph
        self._saved = (g._node_frames, g._dst_frames, g._edge_frames)
        g._node_frames = {nt: dict(f) for nt, f in g._node_frames.items()}
        if g._is_block:
            g._dst_frames = {nt: dict(f) for nt, f in g._dst_frames.items()}
        else:
            g._dst_frames = g._node_frames
        g._edge_frames = {et: dict(f) for et, f in g._edge_frames.items()}
        return g

    def __exit__(self, *exc):
        g = self._graph
        g._node_frames, g._dst_frames, g._edge_frames = self._saved
        return False


jax.tree_util.register_pytree_node(
    Graph,
    lambda g: g.tree_flatten(),
    Graph.tree_unflatten,
)


# ---------------------------------------------------------------------------
# Additional DGLGraph API surface (bound as methods)
# ---------------------------------------------------------------------------


def _graph_nodes(self, ntype: Optional[str] = None):
    """All node ids (reference ``heterograph.py`` ``nodes()``)."""
    n = self.num_nodes(ntype) if ntype else self.num_nodes(
        self.ntypes[0] if len(self.ntypes) == 1 else None
    )
    return jnp.arange(n, dtype=self.idtype)


def _graph_all_edges(self, form="uv", order="eid", etype=None):
    return self.edges(form=form, order=order, etype=etype)


def _graph_adj(self, etype=None, eweight_name=None):
    """Adjacency as a SparseMatrix (reference ``heterograph.py`` ``adj``:
    shape (num_src, num_dst), value 1 or eweight)."""
    from .sparse.sparse_matrix import SparseMatrix

    rel = self._relation(etype)
    cet = self.to_canonical_etype(etype)
    if eweight_name is not None:
        val = self._edge_frames[cet][eweight_name]
    else:
        val = jnp.ones((rel.num_edges_padded,), jnp.float32)
        if rel.num_edges != rel.num_edges_padded:
            val = val * rel.edge_mask()
    return SparseMatrix(rel, val)


def _graph_adjacency_matrix(self, transpose=False, etype=None):
    a = self.adj(etype=etype)
    return a.T if transpose else a


def _graph_inc(self, typestr="both", etype=None):
    """Incidence matrix (reference ``heterograph.py`` ``inc``/
    ``incidence_matrix``): 'in' | 'out' | 'both' (N, E)."""
    from .sparse.sparse_matrix import from_coo

    rel = self._relation(etype)
    E = rel.num_edges
    src = rel.src[:E]
    dst = rel.dst[:E]
    eid = jnp.arange(E, dtype=src.dtype)
    n = self.num_nodes()
    if typestr == "in":
        return from_coo(dst, eid, jnp.ones(E, jnp.float32), (n, E))
    if typestr == "out":
        return from_coo(src, eid, jnp.ones(E, jnp.float32), (n, E))
    # both: +1 at dst, -1 at src (self-loops excluded like the reference)
    import numpy as _np

    s = _np.asarray(src)
    d = _np.asarray(dst)
    keep = s != d
    rows = _np.concatenate([d[keep], s[keep]])
    cols = _np.concatenate([_np.nonzero(keep)[0]] * 2)
    vals = _np.concatenate(
        [_np.ones(keep.sum(), _np.float32), -_np.ones(keep.sum(), _np.float32)]
    )
    return from_coo(jnp.asarray(rows), jnp.asarray(cols),
                    jnp.asarray(vals), (n, E))


def _graph_astype(self, idtype):
    """Cast index arrays (reference ``DGLGraph.long/int/astype``)."""
    np_id = np.int64 if idtype == jnp.int64 else np.int32
    if np_id is np.int64 and not jax.config.jax_enable_x64:
        raise DGLError(
            "int64 idtype requires JAX x64 mode: wrap in "
            "`with jax.enable_x64(True):` or set jax_enable_x64 "
            "(otherwise ids silently truncate to int32)"
        )

    def conv(rel: Relation) -> Relation:
        new = Relation.__new__(Relation)
        for f in Relation.ARRAY_FIELDS:
            setattr(new, f, jnp.asarray(getattr(rel, f), dtype=idtype))
        new.num_src = rel.num_src
        new.num_dst = rel.num_dst
        new.num_edges = rel.num_edges
        new.max_in_degree = rel.max_in_degree
        new.max_out_degree = rel.max_out_degree
        # plans hold int32 index arrays; rebuild after a cast if needed
        new.uniform_stride = rel.uniform_stride
        return new

    g = self.structural_clone()
    g._relations = {k: conv(r) for k, r in self._relations.items()}
    return g


def _graph_long(self):
    return self.astype(jnp.int64)


def _graph_int(self):
    return self.astype(jnp.int32)


def _graph_to_networkx(self, node_attrs=None, edge_attrs=None):
    """Export to networkx MultiDiGraph (reference ``heterograph.py``
    ``to_networkx``)."""
    import networkx as nx

    nxg = nx.MultiDiGraph()
    nxg.add_nodes_from(range(self.num_nodes()))
    rel = self._relation(None)
    src = np.asarray(rel.src)[: rel.num_edges]
    dst = np.asarray(rel.dst)[: rel.num_edges]
    cet = self.canonical_etypes[0]
    for i, (u, v) in enumerate(zip(src, dst)):
        attrs = {"id": i}
        if edge_attrs:
            for k in edge_attrs:
                attrs[k] = np.asarray(self._edge_frames[cet][k][i])
        nxg.add_edge(int(u), int(v), **attrs)
    if node_attrs:
        nt = self.ntypes[0]
        for k in node_attrs:
            vals = np.asarray(self._node_frames[nt][k])
            for i in range(self.num_nodes()):
                nxg.nodes[i][k] = vals[i]
    return nxg


Graph.nodes_ids = _graph_nodes
Graph.all_edges = _graph_all_edges
Graph.adj = _graph_adj
Graph.adjacency_matrix = _graph_adjacency_matrix
Graph.inc = _graph_inc
Graph.incidence_matrix = _graph_inc
Graph.astype = _graph_astype
Graph.long = _graph_long
Graph.int = _graph_int
Graph.to_networkx = _graph_to_networkx


def _graph_set_n_initializer(self, initializer, field=None, ntype=None):
    """Register a default initializer for new node rows (reference
    ``heterograph.py`` ``set_n_initializer`` / ``frame.py`` initializers);
    consumed by ``dgl.add_nodes``/``add_edges`` instead of zero fill."""
    if not hasattr(self, "_n_initializers"):
        self._n_initializers = {}
    self._n_initializers[(ntype, field)] = initializer


def _graph_set_e_initializer(self, initializer, field=None, etype=None):
    if not hasattr(self, "_e_initializers"):
        self._e_initializers = {}
    self._e_initializers[(etype, field)] = initializer


def _graph_get_initializer(self, kind, field, type_key):
    store = getattr(
        self, "_n_initializers" if kind == "node" else "_e_initializers", {}
    )
    for key in ((type_key, field), (None, field), (type_key, None), (None, None)):
        if key in store:
            return store[key]
    return None


Graph.set_n_initializer = _graph_set_n_initializer
Graph.set_e_initializer = _graph_set_e_initializer
Graph._get_initializer = _graph_get_initializer


def _graph_formats(self, formats=None):
    """Query or RESTRICT sparse formats (reference ``heterograph.py:6090``).

    Without arguments: report which formats each relation materializes.
    With a format list: return a NEW graph whose relations hold exactly
    those formats (rebuilt from COO on host) — the giant-graph memory
    control the reference gets from lazy formats (``unit_graph.h:41-47``);
    storing CSC only cuts index memory ~3x for sampling-oriented workloads
    (the on-device sampler and the MFG pipeline read CSC exclusively).
    Ops that need a missing format raise pointing back here.
    """
    if formats is None:
        created = ["coo"]
        rel = self._relation(None) if len(self._relations) == 1 else None
        rels = ([rel] if rel is not None else
                list(self._relations.values()))
        if all(r.csr_indptr is not None for r in rels):
            created.append("csr")
        if all(r.csc_indptr is not None for r in rels):
            created.append("csc")
        return {"created": created,
                "not created": [f for f in ("coo", "csr", "csc")
                                if f not in created]}
    if isinstance(formats, str):
        formats = [formats]
    if "coo" not in formats:
        formats = list(formats) + ["coo"]  # COO is the source of truth
    g = self.structural_clone()
    rels = {}
    for k, r in self._relations.items():
        src = np.asarray(r.src)
        dst = np.asarray(r.dst)
        rels[k] = Relation.from_coo(
            src, dst, r.num_src, r.num_dst,
            idtype=jnp.int64 if src.dtype == np.int64 else jnp.int32,
            num_edges=r.num_edges, formats=tuple(formats),
        )
    g._relations = rels
    return g


Graph.formats = _graph_formats


# ---------------------------------------------------------------------------
# Method-surface tail (reference ``heterograph.py`` methods): delegations to
# the module functions plus small host queries.
# ---------------------------------------------------------------------------


def _g_subgraph(self, nodes, *, relabel_nodes=True, store_ids=True):
    """(reference ``heterograph.py`` ``subgraph``)."""
    from .subgraph import node_subgraph

    return node_subgraph(
        self, nodes, relabel_nodes=relabel_nodes, store_ids=store_ids
    )


def _g_edge_subgraph(self, edges, *, relabel_nodes=True, store_ids=True):
    from .subgraph import edge_subgraph

    return edge_subgraph(
        self, edges, relabel_nodes=relabel_nodes, store_ids=store_ids
    )


def _g_node_type_subgraph(self, ntypes):
    from .subgraph import node_type_subgraph

    return node_type_subgraph(self, ntypes)


def _g_edge_type_subgraph(self, etypes):
    from .subgraph import edge_type_subgraph

    return edge_type_subgraph(self, etypes)


def _g_in_edges(self, v, form: str = "uv", etype=None):
    """In-edges of nodes ``v`` (reference ``heterograph.py`` ``in_edges``)."""
    rel = self._relation(etype)
    v_np = np.atleast_1d(_asnumpy(v))
    indptr = _asnumpy(rel.csc_indptr)
    eids = np.concatenate(
        [_asnumpy(rel.csc_eids)[indptr[i] : indptr[i + 1]] for i in v_np]
    ) if v_np.size else np.zeros(0, np.int64)
    src = _asnumpy(rel.src)[eids]
    dst = _asnumpy(rel.dst)[eids]
    if form == "eid":
        return jnp.asarray(eids)
    if form == "uv":
        return jnp.asarray(src), jnp.asarray(dst)
    if form == "all":
        return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(eids)
    raise DGLError(f"Unknown form {form!r}")


def _g_out_edges(self, u, form: str = "uv", etype=None):
    rel = self._relation(etype)
    u_np = np.atleast_1d(_asnumpy(u))
    indptr = _asnumpy(rel.csr_indptr)
    eids = np.concatenate(
        [_asnumpy(rel.csr_eids)[indptr[i] : indptr[i + 1]] for i in u_np]
    ) if u_np.size else np.zeros(0, np.int64)
    src = _asnumpy(rel.src)[eids]
    dst = _asnumpy(rel.dst)[eids]
    if form == "eid":
        return jnp.asarray(eids)
    if form == "uv":
        return jnp.asarray(src), jnp.asarray(dst)
    if form == "all":
        return jnp.asarray(src), jnp.asarray(dst), jnp.asarray(eids)
    raise DGLError(f"Unknown form {form!r}")


def _g_filter_nodes(self, predicate, ntype=None):
    """Node ids where ``predicate(NodeBatch) -> bool mask`` holds
    (reference ``heterograph.py`` ``filter_nodes``)."""
    from .udf import NodeBatch

    nt = ntype or (self.ntypes[0] if len(self.ntypes) == 1 else None)
    if nt is None:
        raise DGLError("ntype required")
    mask = predicate(NodeBatch(dict(self._node_frames.get(nt, {}))))
    return jnp.nonzero(jnp.asarray(mask))[0]


def _g_filter_edges(self, predicate, etype=None):
    from .udf import EdgeBatch

    cet = self.to_canonical_etype(etype)
    rel = self._relations[cet]
    srcf = self._node_frames.get(cet[0], {})
    dstframes = self._dst_frames if self.is_block else self._node_frames
    dstf = dstframes.get(cet[2], {})
    batch = EdgeBatch(
        {k: v[rel.src] for k, v in srcf.items()},
        dict(self._edge_frames.get(cet, {})),
        {k: v[rel.dst] for k, v in dstf.items()},
        edges=(rel.src, rel.dst),
    )
    mask = jnp.asarray(predicate(batch))
    if rel.num_edges != rel.num_edges_padded:
        mask = mask & rel.edge_mask()
    return jnp.nonzero(mask)[0]


def _g_has_nodes(self, vids, ntype=None):
    nt = ntype or (self.ntypes[0] if len(self.ntypes) == 1 else None)
    v = jnp.atleast_1d(jnp.asarray(vids))
    out = (v >= 0) & (v < self.num_nodes(nt))
    return out if np.ndim(vids) else out[0]


def _g_clone(self):
    """Shallow-copy frames over the shared immutable structure (reference
    ``heterograph.py`` ``clone``; arrays are immutable in JAX, so sharing
    them is safe)."""
    return self.local_var()


def _g_cpu(self):
    """Move all feature arrays to host CPU (reference ``cpu``)."""
    import jax

    dev = jax.devices("cpu")[0]
    return self.to(dev)


def _g_is_multigraph(self):
    rel = self._relation(None) if len(self.canonical_etypes) == 1 else None
    rels = [rel] if rel is not None else list(self._relations.values())
    for r in rels:
        E = r.num_edges
        pairs = np.stack(
            [_asnumpy(r.src)[:E], _asnumpy(r.dst)[:E]], axis=1
        )
        if np.unique(pairs, axis=0).shape[0] < E:
            return True
    return False


def _g_metagraph(self):
    """networkx MultiDiGraph over node types (reference ``metagraph``)."""
    import networkx as nx

    mg = nx.MultiDiGraph()
    mg.add_nodes_from(self.ntypes)
    for st, et, dt in self.canonical_etypes:
        mg.add_edge(st, dt, key=et)
    return mg


Graph.subgraph = _g_subgraph
Graph.edge_subgraph = _g_edge_subgraph
Graph.node_type_subgraph = _g_node_type_subgraph
Graph.edge_type_subgraph = _g_edge_type_subgraph
Graph.in_edges = _g_in_edges
Graph.out_edges = _g_out_edges
Graph.filter_nodes = _g_filter_nodes
Graph.filter_edges = _g_filter_edges
Graph.has_nodes = _g_has_nodes
Graph.clone = _g_clone
Graph.cpu = _g_cpu
Graph.is_multigraph = property(_g_is_multigraph)
Graph.metagraph = _g_metagraph


def _delegate_transform(name, module_path):
    def method(self, *args, **kwargs):
        import importlib

        mod = importlib.import_module(module_path, package=__package__)
        return getattr(mod, name)(self, *args, **kwargs)

    method.__name__ = name
    method.__doc__ = f"Method form of ``{module_path}.{name}`` (reference ``heterograph.py``)."
    return method


for _name in ("add_edges", "remove_edges", "add_nodes", "remove_nodes",
              "line_graph", "to_simple", "add_self_loop",
              "remove_self_loop", "khop_graph"):
    setattr(Graph, _name, _delegate_transform(_name, ".transforms.functional"))

Graph.sample_neighbors = _delegate_transform("sample_neighbors",
                                             ".sampling.neighbor")
Graph.global_uniform_negative_sampling = _delegate_transform(
    "global_uniform_negative_sampling", ".sampling.negative"
)


def _g_get_ntype_id(self, ntype):
    if ntype is None:
        if len(self.ntypes) != 1:
            raise DGLError("ntype required")
        return 0
    try:
        return self.ntypes.index(ntype)
    except ValueError:
        raise DGLError(f"Unknown node type {ntype!r}")


def _g_get_etype_id(self, etype):
    cet = self.to_canonical_etype(etype)
    return self.canonical_etypes.index(cet)


def _g_is_unibipartite(self):
    """True when src and dst node types are disjoint (reference
    ``is_unibipartite``)."""
    srcs = {cet[0] for cet in self.canonical_etypes}
    dsts = {cet[2] for cet in self.canonical_etypes}
    return len(srcs & dsts) == 0


Graph.get_ntype_id = _g_get_ntype_id
Graph.get_etype_id = _g_get_etype_id
Graph.number_of_src_nodes = lambda self, ntype=None: self.num_src_nodes(ntype)
Graph.number_of_dst_nodes = lambda self, ntype=None: self.num_dst_nodes(ntype)
Graph.is_unibipartite = property(_g_is_unibipartite)
