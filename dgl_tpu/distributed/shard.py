"""Fixed-shape graph shards with halo routing tables.

Replaces the reference's per-partition DGLGraph + remote feature pulls
(``dist_graph.py:648``, ``kvstore.py:1445``): every part gets identical
static shapes (node cap, edge cap, halo cap), and the per-pair halo routing
is a precomputed index table consumed by one ``all_to_all`` on device
(SURVEY.md §2.3 "graph partition parallelism").
"""
from __future__ import annotations

from dataclasses import dataclass

import jax.numpy as jnp
import numpy as np

from ..graph import Graph

__all__ = ["GraphShards", "build_shards"]


@dataclass
class GraphShards:
    """Static-shape SPMD shards of one homogeneous graph.

    Node ids are relabeled part-major (part p owns global [ranges[p],
    ranges[p+1])); each part's local ids are 0..n_owned[p]-1. Edge arrays are
    CSC-style per part (grouped by local dst) in the *extended* feature
    space: index < n_max refers to a local row, n_max + q*h_max + j refers to
    halo slot j received from part q.
    """

    num_parts: int
    n_max: int           # node cap per part
    e_max: int           # edge cap per part
    h_max: int           # halo rows cap per (src_part, dst_part) pair
    n_owned: np.ndarray  # (P,)
    ranges: np.ndarray   # (P+1,) global id ranges
    order: np.ndarray    # (N,) new-id -> old-id permutation
    new_of_old: np.ndarray  # (N,) old-id -> new-id
    # device-ready arrays
    src_ext: jnp.ndarray    # (P, e_max) int32 into extended space
    dst_local: jnp.ndarray  # (P, e_max) int32, n_max = padding
    edge_mask: jnp.ndarray  # (P, e_max) bool
    send_idx: jnp.ndarray   # (P, P, h_max) int32 local rows to send
    send_mask: jnp.ndarray  # (P, P, h_max) bool
    in_deg: jnp.ndarray     # (P, n_max) float32 true in-degrees

    def shard_features(self, x_global) -> jnp.ndarray:
        """(N, F) global features (old ids) -> (P, n_max, F) padded/part-major."""
        x_global = np.asarray(x_global)
        F = x_global.shape[1:]
        out = np.zeros((self.num_parts, self.n_max) + F, x_global.dtype)
        for p in range(self.num_parts):
            ids_old = self.order[self.ranges[p] : self.ranges[p + 1]]
            out[p, : ids_old.shape[0]] = x_global[ids_old]
        return jnp.asarray(out)

    def unshard(self, x_sharded) -> jnp.ndarray:
        """(P, n_max, F) -> (N, F) in OLD id order."""
        x_sharded = np.asarray(x_sharded)
        N = self.ranges[-1]
        out = np.zeros((N,) + x_sharded.shape[2:], x_sharded.dtype)
        for p in range(self.num_parts):
            ids_old = self.order[self.ranges[p] : self.ranges[p + 1]]
            out[ids_old] = x_sharded[p, : ids_old.shape[0]]
        return jnp.asarray(out)


def build_shards(
    g: Graph,
    parts: np.ndarray,
    num_parts: int,
    *,
    pad_multiple: int = 8,
) -> GraphShards:
    """Partition-assignment -> static shards + halo routing (host, one-time)."""
    rel = g._relation(None)
    n = g.num_nodes()
    E = rel.num_edges
    src = np.asarray(rel.src)[:E].astype(np.int64)
    dst = np.asarray(rel.dst)[:E].astype(np.int64)
    parts = np.asarray(parts, dtype=np.int64)

    order = np.argsort(parts, kind="stable")
    new_of_old = np.empty(n, dtype=np.int64)
    new_of_old[order] = np.arange(n)
    counts = np.bincount(parts, minlength=num_parts)
    ranges = np.concatenate([[0], np.cumsum(counts)])

    def rup(x):
        return int(-(-x // pad_multiple) * pad_multiple)

    n_max = rup(int(counts.max()))

    # edges by dst part; srcs referenced as (part, local)
    src_new = new_of_old[src]
    dst_new = new_of_old[dst]
    src_part = np.searchsorted(ranges, src_new, side="right") - 1
    dst_part = np.searchsorted(ranges, dst_new, side="right") - 1
    src_local = src_new - ranges[src_part]
    dst_local_all = dst_new - ranges[dst_part]

    # halo sets per (q -> p)
    halo_rows = [[None] * num_parts for _ in range(num_parts)]
    h_max = 0
    halo_pos = {}  # (q, p) -> {local_row: slot}
    for p in range(num_parts):
        for q in range(num_parts):
            if q == p:
                continue
            mask = (dst_part == p) & (src_part == q)
            uniq = np.unique(src_local[mask])
            halo_rows[q][p] = uniq
            halo_pos[(q, p)] = {int(r): i for i, r in enumerate(uniq)}
            h_max = max(h_max, uniq.shape[0])
    h_max = max(rup(h_max), pad_multiple)

    e_counts = np.bincount(dst_part, minlength=num_parts)
    e_max = max(rup(int(e_counts.max())), pad_multiple)

    src_ext = np.zeros((num_parts, e_max), np.int32)
    dst_loc = np.full((num_parts, e_max), n_max, np.int32)
    emask = np.zeros((num_parts, e_max), bool)
    send_idx = np.zeros((num_parts, num_parts, h_max), np.int32)
    send_mask = np.zeros((num_parts, num_parts, h_max), bool)
    for q in range(num_parts):
        for p in range(num_parts):
            if q == p:
                continue
            rows = halo_rows[q][p]
            send_idx[q, p, : rows.shape[0]] = rows
            send_mask[q, p, : rows.shape[0]] = True

    in_deg = np.zeros((num_parts, n_max), np.float32)
    for p in range(num_parts):
        sel = np.nonzero(dst_part == p)[0]
        # sort by local dst for a sorted segment reduce
        o = np.argsort(dst_local_all[sel], kind="stable")
        sel = sel[o]
        k = sel.shape[0]
        dl = dst_local_all[sel]
        dst_loc[p, :k] = dl
        emask[p, :k] = True
        np.add.at(in_deg[p], dl, 1.0)
        sp_arr = src_part[sel]
        sl_arr = src_local[sel]
        ext = np.empty(k, np.int64)
        local = sp_arr == p
        ext[local] = sl_arr[local]
        rem = ~local
        if rem.any():
            qs = sp_arr[rem]
            rows = sl_arr[rem]
            slots = np.array(
                [halo_pos[(int(qq), p)][int(rr)] for qq, rr in zip(qs, rows)],
                dtype=np.int64,
            )
            ext[rem] = n_max + qs * h_max + slots
        src_ext[p, :k] = ext

    return GraphShards(
        num_parts=num_parts,
        n_max=n_max,
        e_max=e_max,
        h_max=h_max,
        n_owned=counts,
        ranges=ranges,
        order=order,
        new_of_old=new_of_old,
        src_ext=jnp.asarray(src_ext),
        dst_local=jnp.asarray(dst_loc),
        edge_mask=jnp.asarray(emask),
        send_idx=jnp.asarray(send_idx),
        send_mask=jnp.asarray(send_mask),
        in_deg=jnp.asarray(in_deg),
    )
