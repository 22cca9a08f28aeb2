"""OnDiskDataset (reference ``python/dgl/graphbolt/impl/ondisk_dataset.py:591``):
a dataset directory with ``metadata.json`` describing graph structure files,
feature .npy files (mmap-loaded), and train/val/test item sets.

metadata.json schema (JSON variant of the reference's YAML):
{
  "dataset_name": ...,
  "graph": {"nodes": N, "edges_src": "src.npy", "edges_dst": "dst.npy"},
  "feature_data": [
      {"domain": "node", "type": "_N", "name": "feat",
       "path": "feat.npy", "in_memory": false}
  ],
  "train_set": {"ids": "train_ids.npy", "labels": "labels.npy"},
  "validation_set": {...}, "test_set": {...}
}
"""
from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from ..base import DGLError
from .feature_store import DiskBasedFeature, FeatureStore, NumpyFeature
from .itemset import ItemSet

__all__ = ["OnDiskDataset"]


class OnDiskDataset:
    def __init__(self, path: str):
        self.path = path
        meta_path = os.path.join(path, "metadata.json")
        if not os.path.exists(meta_path):
            raise DGLError(f"metadata.json not found in {path}")
        with open(meta_path) as f:
            self.meta = json.load(f)
        self._graph = None
        self._features = None
        self._sets = {}

    @property
    def dataset_name(self):
        return self.meta.get("dataset_name", "ondisk")

    @property
    def graph(self):
        if self._graph is None:
            from .. import convert

            gspec = self.meta["graph"]
            src = np.load(os.path.join(self.path, gspec["edges_src"]),
                          mmap_mode="r")
            dst = np.load(os.path.join(self.path, gspec["edges_dst"]),
                          mmap_mode="r")
            self._graph = convert.graph(
                (np.asarray(src), np.asarray(dst)),
                num_nodes=int(gspec["nodes"]),
            )
        return self._graph

    @property
    def feature(self) -> FeatureStore:
        if self._features is None:
            store = FeatureStore()
            for spec in self.meta.get("feature_data", []):
                p = os.path.join(self.path, spec["path"])
                feat = (
                    NumpyFeature(np.load(p))
                    if spec.get("in_memory", True)
                    else DiskBasedFeature(p)
                )
                store[(spec["domain"], spec.get("type", "_N"), spec["name"])] = feat
            self._features = store
        return self._features

    def _itemset(self, key):
        if key not in self._sets:
            spec = self.meta.get(key)
            if spec is None:
                return None
            ids = np.load(os.path.join(self.path, spec["ids"]))
            if "labels" in spec:
                labels = np.load(os.path.join(self.path, spec["labels"]))
                self._sets[key] = ItemSet(
                    (ids, labels[ids]), names=("seeds", "labels")
                )
            else:
                self._sets[key] = ItemSet(ids, names="seeds")
        return self._sets[key]

    @property
    def train_set(self):
        return self._itemset("train_set")

    @property
    def validation_set(self):
        return self._itemset("validation_set")

    @property
    def test_set(self):
        return self._itemset("test_set")

    @staticmethod
    def write(path: str, *, name: str, src, dst, num_nodes: int,
              features: Optional[dict] = None, train_ids=None,
              val_ids=None, test_ids=None, labels=None,
              in_memory: bool = False):
        """Materialize a dataset directory (the reference's ``preprocess``
        step, ``impl/ondisk_dataset.py:321``)."""
        os.makedirs(path, exist_ok=True)
        np.save(os.path.join(path, "src.npy"), np.asarray(src))
        np.save(os.path.join(path, "dst.npy"), np.asarray(dst))
        meta = {
            "dataset_name": name,
            "graph": {
                "nodes": int(num_nodes),
                "edges_src": "src.npy",
                "edges_dst": "dst.npy",
            },
            "feature_data": [],
        }
        for fname, arr in (features or {}).items():
            np.save(os.path.join(path, f"{fname}.npy"), np.asarray(arr))
            meta["feature_data"].append(
                {
                    "domain": "node",
                    "type": "_N",
                    "name": fname,
                    "path": f"{fname}.npy",
                    "in_memory": in_memory,
                }
            )
        if labels is not None:
            np.save(os.path.join(path, "labels.npy"), np.asarray(labels))
        for key, ids in (
            ("train_set", train_ids),
            ("validation_set", val_ids),
            ("test_set", test_ids),
        ):
            if ids is None:
                continue
            np.save(os.path.join(path, f"{key}_ids.npy"), np.asarray(ids))
            spec = {"ids": f"{key}_ids.npy"}
            if labels is not None:
                spec["labels"] = "labels.npy"
            meta[key] = spec
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f)
        return OnDiskDataset(path)
