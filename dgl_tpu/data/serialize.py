"""Graph (de)serialization (reference ``python/dgl/data/graph_serialize.py:83,149``
``save_graphs``/``load_graphs``, C++ ``src/graph/serialize/``).

Format: one ``.npz`` per file — flat arrays keyed by a JSON structure
descriptor stored alongside — replacing the reference's dmlc binary streams
with a self-describing, numpy-native container (mmap-friendly for shard
loading).
"""
from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import jax.numpy as jnp
import numpy as np

from ..base import DGLError
from ..graph import Graph, Relation

__all__ = ["save_graphs", "load_graphs", "save_info", "load_info"]


def _np(x):
    return np.asarray(x)


def _flatten_graph(g: Graph, gid: int, arrays: Dict[str, np.ndarray]) -> dict:
    meta = {
        "is_block": g.is_block,
        "num_src_nodes": dict(g._num_src_nodes),
        "num_dst_nodes": dict(g._num_dst_nodes),
        "relations": [],
        "node_frames": {},
        "dst_frames": {},
        "edge_frames": {},
    }
    for i, (cet, rel) in enumerate(sorted(g._relations.items())):
        key = f"g{gid}_rel{i}"
        arrays[f"{key}_src"] = _np(rel.src)
        arrays[f"{key}_dst"] = _np(rel.dst)
        meta["relations"].append(
            {
                "etype": list(cet),
                "key": key,
                "num_src": rel.num_src,
                "num_dst": rel.num_dst,
                "num_edges": rel.num_edges,
            }
        )
    for nt, frame in g._node_frames.items():
        meta["node_frames"][nt] = {}
        for k, v in frame.items():
            akey = f"g{gid}_nf_{nt}_{k}"
            arrays[akey] = _np(v)
            meta["node_frames"][nt][k] = akey
    if g.is_block:
        for nt, frame in g._dst_frames.items():
            meta["dst_frames"][nt] = {}
            for k, v in frame.items():
                akey = f"g{gid}_df_{nt}_{k}"
                arrays[akey] = _np(v)
                meta["dst_frames"][nt][k] = akey
    for i, (cet, frame) in enumerate(sorted(g._edge_frames.items())):
        meta["edge_frames"][str(i)] = {"etype": list(cet), "fields": {}}
        for k, v in frame.items():
            akey = f"g{gid}_ef{i}_{k}"
            arrays[akey] = _np(v)
            meta["edge_frames"][str(i)]["fields"][k] = akey
    return meta


def _unflatten_graph(meta: dict, arrays) -> Graph:
    from .. import convert

    rels = {}
    for r in meta["relations"]:
        cet = tuple(r["etype"])
        rels[cet] = Relation.from_coo(
            arrays[r["key"] + "_src"],
            arrays[r["key"] + "_dst"],
            r["num_src"],
            r["num_dst"],
            num_edges=r["num_edges"],
        )
    g = Graph(
        rels,
        {k: int(v) for k, v in meta["num_src_nodes"].items()},
        {k: int(v) for k, v in meta["num_dst_nodes"].items()},
        is_block=meta["is_block"],
    )
    for nt, fields in meta["node_frames"].items():
        g._node_frames[nt] = {
            k: jnp.asarray(arrays[ak]) for k, ak in fields.items()
        }
    for nt, fields in meta.get("dst_frames", {}).items():
        g._dst_frames[nt] = {
            k: jnp.asarray(arrays[ak]) for k, ak in fields.items()
        }
    for ef in meta["edge_frames"].values():
        cet = tuple(ef["etype"])
        g._edge_frames[cet] = {
            k: jnp.asarray(arrays[ak]) for k, ak in ef["fields"].items()
        }
    return g


def save_graphs(filename: str, g_list, labels: Optional[Dict] = None):
    """(reference ``graph_serialize.py:83``)."""
    if isinstance(g_list, Graph):
        g_list = [g_list]
    arrays: Dict[str, np.ndarray] = {}
    metas = [_flatten_graph(g, i, arrays) for i, g in enumerate(g_list)]
    if labels:
        for k, v in labels.items():
            arrays[f"label_{k}"] = _np(v)
    arrays["__meta__"] = np.frombuffer(
        json.dumps(
            {"graphs": metas, "labels": list(labels.keys()) if labels else []}
        ).encode("utf-8"),
        dtype=np.uint8,
    )
    os.makedirs(os.path.dirname(os.path.abspath(filename)), exist_ok=True)
    np.savez_compressed(filename, **arrays)
    # np.savez appends .npz; normalize
    if not filename.endswith(".npz") and os.path.exists(filename + ".npz"):
        os.replace(filename + ".npz", filename)


def load_graphs(filename: str, idx_list: Optional[List[int]] = None):
    """(reference ``graph_serialize.py:149``). Returns (graphs, labels)."""
    if not os.path.exists(filename):
        raise DGLError(f"No such file: {filename}")
    with np.load(filename, allow_pickle=False) as z:
        meta = json.loads(bytes(z["__meta__"].tolist()).decode("utf-8"))
        arrays = {k: z[k] for k in z.files if k != "__meta__"}
    metas = meta["graphs"]
    if idx_list is not None:
        metas = [metas[i] for i in idx_list]
    graphs = [_unflatten_graph(m, arrays) for m in metas]
    labels = {
        k: jnp.asarray(arrays[f"label_{k}"]) for k in meta.get("labels", [])
    }
    return graphs, labels


def save_info(path: str, info: dict):
    """(reference ``data/utils.py`` ``save_info``) — JSON, not pickle."""
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "w") as f:
        json.dump(info, f)


def load_info(path: str) -> dict:
    with open(path) as f:
        return json.load(f)


# -- versioned-loader surface (reference ``data/graph_serialize.py:83-200``
#    load_graph_v1/v2 and ``tensor_serialize.py`` load_tensors) --------------


class StorageMetaData:
    """Metadata record of a serialized file (reference
    ``graph_serialize.py`` StorageMetaData): num_graphs + per-graph meta +
    optional labels."""

    def __init__(self, num_graphs: int, metadata: list, labels=None):
        self.num_graphs = num_graphs
        self.metadata = metadata
        self.labels = labels or {}

    def __repr__(self):
        return f"StorageMetaData(num_graphs={self.num_graphs})"


def load_graph_v2(filename: str, idx_list: Optional[List[int]] = None):
    """Current-format loader (reference ``graph_serialize.py:149``
    load_graph_v2): our npz container is the only on-disk version."""
    return load_graphs(filename, idx_list)


def load_graph_v1(filename: str, idx_list: Optional[List[int]] = None):
    """Legacy-format loader name (reference ``graph_serialize.py:83``).
    There is no legacy npz layout; delegates to the current reader so old
    call sites keep working."""
    return load_graphs(filename, idx_list)


def load_labels(filename: str) -> Dict:
    """Labels dict of a saved graph file (reference
    ``graph_serialize.py`` load_labels)."""
    with np.load(filename, allow_pickle=True) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
        out = {}
        for k in meta.get("labels", []):
            out[k] = jnp.asarray(z[f"label_{k}"])
        return out


def load_labels_v2(filename: str) -> Dict:
    """(reference ``graph_serialize.py`` load_labels_v2)."""
    return load_labels(filename)


def load_labels_v1(filename: str) -> Dict:
    """(reference ``graph_serialize.py`` load_labels_v1)."""
    return load_labels(filename)


def load_tensors(filename: str) -> Dict:
    """Load a dict of named tensors (reference ``tensor_serialize.py``
    load_tensors; counterpart of ``save_info``/npz)."""
    with np.load(filename, allow_pickle=False) as z:
        return {k: jnp.asarray(z[k]) for k in z.files
                if not k.startswith("__")}


def save_tensors(filename: str, tensors: Dict):
    """(reference ``tensor_serialize.py`` save_tensors)."""
    np.savez(filename, **{k: np.asarray(v) for k, v in tensors.items()})


def storage_metadata(filename: str) -> StorageMetaData:
    """Inspect a saved file without materializing graphs."""
    with np.load(filename, allow_pickle=True) as z:
        meta = json.loads(bytes(z["__meta__"].tobytes()).decode("utf-8"))
    return StorageMetaData(
        num_graphs=len(meta["graphs"]),
        metadata=meta["graphs"],
        labels={k: None for k in meta.get("labels", [])},
    )


__all__ += [
    "StorageMetaData", "load_graph_v1", "load_graph_v2",
    "load_labels", "load_labels_v1", "load_labels_v2",
    "load_tensors", "save_tensors", "storage_metadata",
]
