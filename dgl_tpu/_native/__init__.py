"""ctypes bindings for the native host library (csrc/host_ops.cpp).

Replaces the reference's FFI bridge (``python/dgl/_ffi/``) with a minimal
ctypes layer — the only C++ surface left in this architecture is the host
sampler/builder hot loops (device kernels are XLA/Pallas). Auto-builds from
source on first import when a toolchain exists; every entry point has a
pure-numpy fallback so the package works without a compiler.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

import numpy as np

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libdgl_tpu_host.so")
_SRC = os.path.normpath(os.path.join(_HERE, "..", "..", "csrc"))


def _build() -> bool:
    try:
        subprocess.run(
            ["make", "-s"], cwd=_SRC, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL, timeout=120,
        )
        return os.path.exists(_SO)
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    """The loaded native library, building it on demand; None if unavailable."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("DGL_TPU_NO_NATIVE"):
        return None
    if not os.path.exists(_SO) and os.path.isdir(_SRC):
        _build()
    if not os.path.exists(_SO):
        return None
    try:
        lib = ctypes.CDLL(_SO)
    except OSError:
        return None
    i64p = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
    u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
    lib.coo_to_csr.argtypes = [i64p, ctypes.c_int64, ctypes.c_int64, i64p, i64p]
    lib.sample_neighbors_fixed.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, i64p, i64p, u8p,
    ]
    f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
    lib.sample_neighbors_prob.argtypes = [
        i64p, i64p, i64p, f64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, i64p, i64p, u8p,
    ]
    lib.select_topk_rows.argtypes = [
        i64p, i64p, i64p, f64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, i64p, i64p, u8p,
    ]
    lib.unique_and_compact.argtypes = [i64p, ctypes.c_int64, i64p, i64p]
    lib.unique_and_compact.restype = ctypes.c_int64
    lib.random_walk_uniform.argtypes = [
        i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_uint64, i64p,
    ]
    lib.build_padded_block.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_uint64, i64p, i64p, i64p, i64p, u8p,
    ]
    i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
    lib.hem_match.argtypes = [i32p, i32p, ctypes.c_int64, ctypes.c_int64, i64p]
    lib.sample_neighbors_etype.argtypes = [
        i64p, i64p, i64p, i64p, ctypes.c_int64, i64p, i64p,
        ctypes.c_int64, ctypes.c_int, ctypes.c_uint64, i64p, i64p, u8p,
    ]
    f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
    lib.aggregate_csr.argtypes = [
        i32p, i32p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int, ctypes.c_int64, i64p, i32p, f32p,
    ]
    lib.aggregate_csr.restype = ctypes.c_int64
    lib.kway_gains.argtypes = [
        i64p, i32p, ctypes.c_void_p, i64p, ctypes.c_int64,
        ctypes.c_int64, i32p, f32p,
    ]
    lib.kway_gains.restype = None
    u8p_w = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS,WRITEABLE")
    lib.batched_pread.argtypes = [
        ctypes.c_int, ctypes.c_int64, i64p, ctypes.c_int64,
        ctypes.c_int64, u8p_w,
    ]
    lib.batched_pread.restype = ctypes.c_int64
    _LIB = lib
    return _LIB


def available() -> bool:
    return get_lib() is not None


# -- wrappers ---------------------------------------------------------------


def coo_to_csr(rows: np.ndarray, num_rows: int):
    """Returns (indptr, order) or None when native is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, dtype=np.int64)
    E = rows.shape[0]
    indptr = np.empty(num_rows + 1, np.int64)
    order = np.empty(E, np.int64)
    lib.coo_to_csr(rows, E, num_rows, indptr, order)
    return indptr, order


def sample_neighbors_fixed(indptr, indices, eids, seeds, fanout, replace, seed):
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    eids = np.ascontiguousarray(eids, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    nbr = np.empty((n, fanout), np.int64)
    eid = np.empty((n, fanout), np.int64)
    mask = np.empty((n, fanout), np.uint8)
    lib.sample_neighbors_fixed(
        indptr, indices, eids, seeds, n, fanout, int(replace),
        np.uint64(seed).item(), nbr.reshape(-1), eid.reshape(-1),
        mask.reshape(-1),
    )
    return nbr, eid, mask.astype(bool)


def sample_neighbors_prob(indptr, indices, eids, prob, seeds, fanout,
                          replace, seed):
    """Weighted rowwise pick (prob indexed by edge id); None if no native."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    eids = np.ascontiguousarray(eids, np.int64)
    prob = np.ascontiguousarray(prob, np.float64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    nbr = np.empty((n, fanout), np.int64)
    eid = np.empty((n, fanout), np.int64)
    mask = np.empty((n, fanout), np.uint8)
    lib.sample_neighbors_prob(
        indptr, indices, eids, prob, seeds, n, fanout, int(replace),
        np.uint64(seed).item(), nbr.reshape(-1), eid.reshape(-1),
        mask.reshape(-1),
    )
    return nbr, eid, mask.astype(bool)


def select_topk_rows(indptr, indices, eids, weight, seeds, k, descending):
    """Rowwise top-k by edge weight; None if no native."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    eids = np.ascontiguousarray(eids, np.int64)
    weight = np.ascontiguousarray(weight, np.float64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    nbr = np.empty((n, k), np.int64)
    eid = np.empty((n, k), np.int64)
    mask = np.empty((n, k), np.uint8)
    lib.select_topk_rows(
        indptr, indices, eids, weight, seeds, n, k, int(descending),
        nbr.reshape(-1), eid.reshape(-1), mask.reshape(-1),
    )
    return nbr, eid, mask.astype(bool)


def unique_and_compact(ids):
    lib = get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int64)
    uniq = np.empty_like(ids)
    relabel = np.empty_like(ids)
    k = lib.unique_and_compact(ids, ids.shape[0], uniq, relabel)
    return uniq[:k], relabel


def random_walk_uniform(indptr, indices, seeds, length, seed):
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    traces = np.empty((seeds.shape[0], length + 1), np.int64)
    lib.random_walk_uniform(
        indptr, indices, seeds, seeds.shape[0], length,
        np.uint64(seed).item(), traces.reshape(-1),
    )
    return traces


def build_padded_block(indptr, indices, eids, seed_ids, fanout, replace, seed):
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    eids = np.ascontiguousarray(eids, np.int64)
    seed_ids = np.ascontiguousarray(seed_ids, np.int64)
    cap_dst = seed_ids.shape[0]
    cap_src = cap_dst * (1 + fanout)
    Ecap = cap_dst * fanout
    src_ids = np.full(cap_src, -1, np.int64)
    esrc = np.empty(Ecap, np.int64)
    edst = np.empty(Ecap, np.int64)
    eids_out = np.empty(Ecap, np.int64)
    emask = np.empty(Ecap, np.uint8)
    lib.build_padded_block(
        indptr, indices, eids, seed_ids, cap_dst, fanout, int(replace),
        np.uint64(seed).item(), src_ids, esrc, edst, eids_out, emask,
    )
    return src_ids, esrc, edst, eids_out, emask.astype(bool)


def hem_match(rows, cols, num_nodes):
    """Greedy heavy-edge matching over edges pre-sorted by descending
    weight. Returns (N,) int64 representative ids, or None when native is
    unavailable (caller falls back to the vectorized numpy rounds)."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    matched = np.empty(num_nodes, np.int64)
    lib.hem_match(rows, cols, rows.shape[0], num_nodes, matched)
    return matched


def kway_gains(indptr, indices, data, parts, k):
    """Parallel k-way refinement gains over a CSR adjacency: per node
    the best other part and the move gain. Returns (best i32, gain f32)
    or None when native is unavailable (caller keeps the numpy
    bincount path)."""
    lib = get_lib()
    if lib is None or k < 2:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    parts = np.ascontiguousarray(parts, np.int64)
    n = indptr.shape[0] - 1
    dptr = None
    if data is not None:
        data = np.ascontiguousarray(data, np.float32)
        dptr = data.ctypes.data_as(ctypes.c_void_p)
    best = np.empty(n, np.int32)
    gain = np.empty(n, np.float32)
    lib.kway_gains(indptr, indices, dptr, parts, n, int(k), best, gain)
    return best, gain


def aggregate_csr(rows, cols, weights, n, skip_diag=True, row_cap=0):
    """Parallel grouped-CSR aggregation: sum weights over (row, col)
    groups, canonical CSR out (sorted unique cols/row). ``weights`` may
    be None (unit). ``row_cap`` > 0 keeps only each row's heaviest
    ``row_cap`` entries (structure-aware coarse prune). Returns
    (indptr i64, cols i32, weights f32) or None when native is
    unavailable (caller falls back to scipy)."""
    lib = get_lib()
    if lib is None:
        return None
    rows = np.ascontiguousarray(rows, np.int32)
    cols = np.ascontiguousarray(cols, np.int32)
    m = rows.shape[0]
    wptr = None
    if weights is not None:
        weights = np.ascontiguousarray(weights, np.float32)
        wptr = weights.ctypes.data_as(ctypes.c_void_p)
    indptr = np.empty(n + 1, np.int64)
    out_cols = np.empty(m, np.int32)
    out_w = np.empty(m, np.float32)
    nnz = lib.aggregate_csr(rows, cols, wptr, m, n,
                            1 if skip_diag else 0, int(row_cap),
                            indptr, out_cols, out_w)
    return indptr, out_cols[:nnz].copy(), out_w[:nnz].copy()


def sample_neighbors_etype(indptr, indices, eids, type_per_edge, fanouts,
                           seeds, replace, seed):
    """Per-etype fixed-fanout pick: (num_seeds, F_total) nbr/eid/mask with
    the static [offs[t]+j] slot layout, or None when native is
    unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int64)
    eids = np.ascontiguousarray(eids, np.int64)
    type_per_edge = np.ascontiguousarray(type_per_edge, np.int64)
    fanouts = np.ascontiguousarray(fanouts, np.int64)
    seeds = np.ascontiguousarray(seeds, np.int64)
    n = seeds.shape[0]
    F_total = int(fanouts.sum())
    nbr = np.zeros((n, F_total), np.int64)
    eid = np.zeros((n, F_total), np.int64)
    mask = np.zeros((n, F_total), np.uint8)
    lib.sample_neighbors_etype(
        indptr, indices, eids, type_per_edge, fanouts.shape[0], fanouts,
        seeds, n, int(replace), seed, nbr.reshape(-1), eid.reshape(-1),
        mask.reshape(-1),
    )
    return nbr, eid, mask.astype(bool)


def batched_pread(fd: int, offset0: int, ids, row_bytes: int,
                  out: "np.ndarray"):
    """Parallel random row reads from an open fd into ``out`` (flat uint8
    view, n*row_bytes). Returns rows fully read, or None when native is
    unavailable. The io_uring-analog path of DiskBasedFeature
    (reference graphbolt/src/cnumpy.h:9)."""
    lib = get_lib()
    if lib is None:
        return None
    ids = np.ascontiguousarray(ids, np.int64)
    return int(lib.batched_pread(fd, offset0, ids, ids.shape[0],
                                 row_bytes, out))
