#!/usr/bin/env python
"""Chunked-graph dispatch: the memory-bounded partition pipeline.

The reference preprocesses giant graphs (ogbn-papers100M, 1.6B edges) into
a CHUNKED on-disk layout (``tools/chunk_graph.py``: metadata.json + edge
CSV chunks + node-feature .npy chunks) and then shuffles chunks into
per-partition shards across machines (``tools/distpartitioning/
data_shuffle.py``, ``tools/dispatch_data.py`` — 8.6k LoC of
torch.distributed plumbing). This module is the TPU-native equivalent:

- :func:`write_chunked` emits the reference-compatible chunked layout
  from an in-memory graph (for tests / small graphs; giant graphs arrive
  already chunked by upstream ETL).
- :func:`dispatch` streams edge chunks one at a time, routing every edge
  to its DESTINATION OWNER's shard file (append-only raw binaries), then
  builds each part's graph one part at a time. Peak memory =
  max(chunk size, largest part) — never the whole graph, which is what
  makes a 1.6B-edge dispatch feasible on one host.

Output layout matches ``distributed.partition.partition_graph``
(``part{p}.npz`` + ``{name}.json`` book + ``assignment.npy``), so
``load_partition`` / ``DistGraph`` consume it unchanged.

Usage:
    python tools/chunked_dispatch.py --meta chunked/metadata.json \
        --assignment parts.npy --num-parts 8 --out shards/
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def write_chunked(g, name: str, out_dir: str, num_chunks: int = 4):
    """Write the reference's chunked layout (``tools/chunk_graph.py``
    schema: metadata.json + per-etype edge CSV chunks + per-ntype feature
    npy chunks)."""
    os.makedirs(out_dir, exist_ok=True)
    rel = g._relation(None)
    src = np.asarray(rel.src)[: rel.num_edges]
    dst = np.asarray(rel.dst)[: rel.num_edges]
    n, e = g.num_nodes(), src.shape[0]
    meta = {
        "graph_name": name,
        "node_type": ["_N"],
        "num_nodes_per_chunk": [
            [n // num_chunks + (i < n % num_chunks)
             for i in range(num_chunks)]
        ],
        "edge_type": ["_N:_E:_N"],
        "num_edges_per_chunk": [
            [e // num_chunks + (i < e % num_chunks)
             for i in range(num_chunks)]
        ],
        "edges": {"_N:_E:_N": {
            "format": {"name": "csv", "delimiter": " "},
            "data": [],
        }},
        "node_data": {"_N": {}},
    }
    lo = 0
    for i, cnt in enumerate(meta["num_edges_per_chunk"][0]):
        path = os.path.join(out_dir, f"edges-{i}.txt")
        np.savetxt(path, np.stack([src[lo:lo + cnt], dst[lo:lo + cnt]], 1),
                   fmt="%d")
        meta["edges"]["_N:_E:_N"]["data"].append(path)
        lo += cnt
    for key, arr in g.ndata.items():
        arr = np.asarray(arr)
        paths = []
        lo = 0
        for i, cnt in enumerate(meta["num_nodes_per_chunk"][0]):
            path = os.path.join(out_dir, f"node-{key}-{i}.npy")
            np.save(path, arr[lo:lo + cnt])
            paths.append(path)
            lo += cnt
        meta["node_data"]["_N"][key] = {
            "format": {"name": "numpy"}, "data": paths}
    with open(os.path.join(out_dir, "metadata.json"), "w") as f:
        json.dump(meta, f)
    return os.path.join(out_dir, "metadata.json")


def dispatch(meta_path: str, assignment: np.ndarray, num_parts: int,
             out_dir: str):
    """Stream the chunked layout into per-part shards (see module doc)."""
    import jax.numpy as jnp

    from dgl_tpu import convert
    from dgl_tpu.data.serialize import save_graphs

    with open(meta_path) as f:
        meta = json.load(f)
    os.makedirs(out_dir, exist_ok=True)
    name = meta["graph_name"]
    assignment = np.asarray(assignment).astype(np.int64)
    n = assignment.shape[0]
    # contiguous relabeling per part (RangePartitionBook convention)
    order = np.argsort(assignment, kind="stable")
    new_of_old = np.empty(n, np.int64)
    new_of_old[order] = np.arange(n)
    counts = np.bincount(assignment, minlength=num_parts)
    ranges = np.concatenate([[0], np.cumsum(counts)])

    # pass 1: stream edge chunks, append each edge to its dst-owner file
    tmp = [open(os.path.join(out_dir, f".edges-part{p}.bin"), "wb")
           for p in range(num_parts)]
    total_edges = 0
    for etype, espec in meta["edges"].items():
        for path in espec["data"]:
            chunk = np.loadtxt(
                path, dtype=np.int64,
                delimiter=None if espec["format"].get("delimiter",
                                                      " ") == " "
                else espec["format"]["delimiter"],
            ).reshape(-1, 2)
            total_edges += chunk.shape[0]
            owner = assignment[chunk[:, 1]]
            for p in range(num_parts):
                rows = chunk[owner == p]
                if rows.size:
                    rows.astype(np.int64).tofile(tmp[p])
    for f in tmp:
        f.close()

    # pass 2: stream node-feature chunks into per-part feature files
    feat_names = list(meta.get("node_data", {}).get("_N", {}))
    part_feats = {key: [[] for _ in range(num_parts)] for key in feat_names}
    for key in feat_names:
        lo = 0
        for path in meta["node_data"]["_N"][key]["data"]:
            arr = np.load(path)
            owner = assignment[lo:lo + arr.shape[0]]
            pos = new_of_old[lo:lo + arr.shape[0]]
            for p in range(num_parts):
                m = owner == p
                if m.any():
                    # keep (local position, rows) so parts assemble in
                    # relabeled order regardless of chunk interleaving
                    part_feats[key][p].append((pos[m] - ranges[p], arr[m]))
            lo += arr.shape[0]

    # pass 3: build each part's graph (one part in memory at a time)
    cut = 0
    for p in range(num_parts):
        epath = os.path.join(out_dir, f".edges-part{p}.bin")
        edges = np.fromfile(epath, dtype=np.int64).reshape(-1, 2)
        os.remove(epath)
        owned_old = order[ranges[p]:ranges[p + 1]]
        cut += int((assignment[edges[:, 0]] != p).sum())
        # local id space: owned first (in relabeled order), then halo srcs
        halo = np.unique(edges[:, 0][assignment[edges[:, 0]] != p])
        all_old = np.concatenate([owned_old, halo])
        local = np.full(n, -1, np.int64)
        local[all_old] = np.arange(all_old.shape[0])
        sub = convert.graph(
            (local[edges[:, 0]], local[edges[:, 1]]),
            num_nodes=all_old.shape[0],
        )
        sub.ndata["_new_id"] = jnp.asarray(new_of_old[all_old])
        inner = np.zeros(all_old.shape[0], bool)
        inner[: owned_old.shape[0]] = True
        sub.ndata["inner_node"] = jnp.asarray(inner)
        for key in feat_names:
            pieces = part_feats[key][p]
            if not pieces:
                continue
            width = pieces[0][1].shape[1:]
            owned_arr = np.zeros((owned_old.shape[0],) + width,
                                 pieces[0][1].dtype)
            for pos, rows in pieces:
                owned_arr[pos] = rows
            full = np.zeros((all_old.shape[0],) + width, owned_arr.dtype)
            full[: owned_old.shape[0]] = owned_arr
            sub.ndata[key] = jnp.asarray(full)
        save_graphs(os.path.join(out_dir, f"part{p}.npz"), [sub])

    book = {
        "graph_name": name,
        "num_parts": num_parts,
        "node_ranges": ranges.tolist(),
        "num_nodes": int(n),
        "num_edges": int(total_edges),
        "part_method": "chunked-dispatch",
        "edge_cut": cut,
    }
    with open(os.path.join(out_dir, f"{name}.json"), "w") as f:
        json.dump(book, f)
    np.save(os.path.join(out_dir, "assignment.npy"), assignment)
    return book


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--meta", required=True)
    p.add_argument("--assignment", required=True,
                   help=".npy part assignment (from partition_cli)")
    p.add_argument("--num-parts", type=int, required=True)
    p.add_argument("--out", required=True)
    args = p.parse_args()
    book = dispatch(args.meta, np.load(args.assignment), args.num_parts,
                    args.out)
    print(json.dumps(book))


if __name__ == "__main__":
    main()
