"""CSV dataset (reference ``python/dgl/data/csv_dataset.py``): load graphs
from ``nodes.csv`` / ``edges.csv`` (+ optional ``graphs.csv``) described by
``meta.yaml`` — here a ``meta.json`` with the same schema (yaml needs no
extra dependency this way)."""
from __future__ import annotations

import csv
import json
import os
from typing import Dict

import jax.numpy as jnp
import numpy as np

from ..base import DGLError
from .dgl_dataset import DGLDataset

__all__ = ["CSVDataset"]


def _parse_value(s: str):
    if "," in s:
        return np.array([float(x) for x in s.split(",")], dtype=np.float32)
    try:
        return int(s)
    except ValueError:
        try:
            return float(s)
        except ValueError:
            return s


def _read_csv(path: str) -> Dict[str, list]:
    with open(path) as f:
        reader = csv.DictReader(f)
        cols: Dict[str, list] = {k: [] for k in reader.fieldnames}
        for row in reader:
            for k, v in row.items():
                cols[k].append(_parse_value(v))
    return cols


class CSVDataset(DGLDataset):
    """Load one or more graphs from CSV files in ``data_path``.

    ``meta.json`` schema (mirrors the reference meta.yaml):
    ``{"dataset_name": ..., "node_data": [{"file_name": "nodes.csv",
    "ntype": "_N"}], "edge_data": [{"file_name": "edges.csv",
    "etype": ["_N", "_E", "_N"]}]}``
    """

    def __init__(self, data_path: str, force_reload=False, verbose=False, transform=None):
        self.data_path = data_path
        meta_path = os.path.join(data_path, "meta.json")
        if not os.path.exists(meta_path):
            raise DGLError(f"meta.json not found under {data_path}")
        with open(meta_path) as f:
            self.meta = json.load(f)
        super().__init__(
            name=self.meta.get("dataset_name", "csv_dataset"),
            raw_dir=data_path,
            force_reload=force_reload,
            verbose=verbose,
            transform=transform,
        )

    def process(self):
        from .. import convert

        node_specs = self.meta.get("node_data", [])
        edge_specs = self.meta.get("edge_data", [])
        node_cols = {}
        num_nodes = {}
        for spec in node_specs:
            nt = spec.get("ntype", "_N")
            cols = _read_csv(os.path.join(self.data_path, spec["file_name"]))
            node_cols[nt] = cols
            num_nodes[nt] = len(cols["node_id"])
        data_dict = {}
        edge_cols = {}
        for spec in edge_specs:
            et = spec.get("etype", ["_N", "_E", "_N"])
            cet = tuple(et)
            cols = _read_csv(os.path.join(self.data_path, spec["file_name"]))
            src = np.array(cols["src_id"], dtype=np.int64)
            dst = np.array(cols["dst_id"], dtype=np.int64)
            data_dict[cet] = (src, dst)
            edge_cols[cet] = cols
        if len(data_dict) == 1 and next(iter(data_dict)) == ("_N", "_E", "_N"):
            (src, dst) = next(iter(data_dict.values()))
            n = num_nodes.get("_N") or int(max(src.max(), dst.max())) + 1
            g = convert.graph((src, dst), num_nodes=n)
        else:
            g = convert.heterograph(data_dict, num_nodes_dict=num_nodes or None)
        for nt, cols in node_cols.items():
            for k, vals in cols.items():
                if k == "node_id":
                    continue
                arr = np.array(vals)
                if arr.dtype == object:
                    arr = np.stack(vals)
                order = np.argsort(np.array(cols["node_id"], dtype=np.int64))
                g._node_frames.setdefault(nt, {})[k] = jnp.asarray(arr[order])
        for cet, cols in edge_cols.items():
            for k, vals in cols.items():
                if k in ("src_id", "dst_id"):
                    continue
                arr = np.array(vals)
                if arr.dtype == object:
                    arr = np.stack(vals)
                g._edge_frames.setdefault(cet, {})[k] = jnp.asarray(arr)
        self._graphs = [g]

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)
