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
from .dataset import Dataset, Task
from .feature_store import DiskBasedFeature, FeatureStore, NumpyFeature
from .itemset import ItemSet

__all__ = ["OnDiskDataset", "OnDiskTask", "BuiltinDataset", "LegacyDataset", "preprocess_ondisk_dataset"]


class OnDiskDataset(Dataset):
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

    @property
    def tasks(self):
        """Dataset interface (reference ``dataset.py:50``): one task built
        from the metadata's TVT sets."""
        meta = {
            k: v for k, v in self.meta.items()
            if k in ("dataset_name", "num_classes", "name")
        }
        return [
            OnDiskTask(
                meta, self.train_set, self.validation_set, self.test_set
            )
        ]

    @property
    def all_nodes_set(self):
        return ItemSet(
            np.arange(int(self.meta["graph"]["nodes"])), names="seeds"
        )

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


class OnDiskTask(Task):
    """A named task over TVT item sets (reference
    ``impl/ondisk_dataset.py:518``)."""

    def __init__(self, metadata: dict, train_set, validation_set, test_set):
        self._metadata = dict(metadata or {})
        self._train_set = train_set
        self._validation_set = validation_set
        self._test_set = test_set

    @property
    def metadata(self):
        return self._metadata

    @property
    def train_set(self):
        return self._train_set

    @property
    def validation_set(self):
        return self._validation_set

    @property
    def test_set(self):
        return self._test_set

    def __repr__(self):
        return f"OnDiskTask(metadata={self._metadata})"


def preprocess_ondisk_dataset(dataset_dir: str,
                              include_original_edge_id: bool = False,
                              force_preprocess: bool = False,
                              auto_cast_to_optimal_dtype: bool = False) -> str:
    """Normalize a raw dataset dir into the processed layout (reference
    ``impl/ondisk_dataset.py:321``): verifies metadata, records the raw
    hash so a changed input forces re-preprocessing, and returns the
    metadata path. Our metadata is already the processed layout, so the
    step is validation + hash recording."""
    import json as _json

    from .internal_utils import calculate_dir_hash

    meta_path = os.path.join(dataset_dir, "metadata.json")
    if not os.path.exists(meta_path):
        raise DGLError(f"metadata.json not found in {dataset_dir}")
    with open(meta_path) as f:
        _json.load(f)  # must parse
    processed = os.path.join(dataset_dir, "preprocessed")
    os.makedirs(processed, exist_ok=True)
    record = os.path.join(processed, "dataset_hash.json")
    if force_preprocess or not os.path.exists(record):
        hashes = calculate_dir_hash(
            dataset_dir, ignore=["dataset_hash.json"]
        )
        hashes = {
            k: v for k, v in hashes.items()
            if not k.startswith("preprocessed")
        }
        with open(record, "w") as f:
            _json.dump(hashes, f)
    return meta_path


class BuiltinDataset(OnDiskDataset):
    """Named builtin datasets in GraphBolt form (reference
    ``impl/ondisk_dataset.py:915``, which downloads from the DGL S3
    bucket). Zero-egress build: the named dataset is materialized locally
    from the ``dgl_tpu.data`` zoo (real parsers when raw files are
    pre-populated, calibrated synthetic stand-ins otherwise), written
    through :meth:`OnDiskDataset.write`, then loaded the same way."""

    _ZOO = {
        "cora": "CoraGraphDataset",
        "citeseer": "CiteseerGraphDataset",
        "pubmed": "PubmedGraphDataset",
        "reddit": "RedditDataset",
        "ogbn-arxiv": "OgbnArxivDataset",
        "ogbn-products": "OgbnProductsDataset",
    }

    def __init__(self, name: str, root: str = "datasets"):
        key = name.replace("-seeds", "")
        if key not in self._ZOO:
            raise DGLError(
                f"unknown builtin dataset {name!r}; options "
                f"{sorted(self._ZOO)}"
            )
        path = os.path.join(root, key)
        if not os.path.exists(os.path.join(path, "metadata.json")):
            from .. import data as data_zoo

            ds = getattr(data_zoo, self._ZOO[key])()
            g = ds[0]
            src, dst = (np.asarray(x) for x in g.edges())
            masks = {
                k: np.nonzero(np.asarray(g.ndata[k]))[0]
                for k in ("train_mask", "val_mask", "test_mask")
                if k in g.ndata
            }
            OnDiskDataset.write(
                path,
                name=key,
                src=src,
                dst=dst,
                num_nodes=g.num_nodes(),
                features={"feat": np.asarray(g.ndata["feat"])},
                labels=(
                    np.asarray(g.ndata["label"])
                    if "label" in g.ndata else None
                ),
                train_ids=masks.get("train_mask"),
                val_ids=masks.get("val_mask"),
                test_ids=masks.get("test_mask"),
            )
            meta_path = os.path.join(path, "metadata.json")
            with open(meta_path) as f:
                meta = json.load(f)
            meta["num_classes"] = int(getattr(ds, "num_classes", 0))
            with open(meta_path, "w") as f:
                json.dump(meta, f)
        super().__init__(path)


class LegacyDataset(OnDiskDataset):
    """Wrap a legacy ``DGLDataset`` into the GraphBolt Dataset interface
    (reference ``impl/legacy_dataset.py:15``). The legacy graph is
    converted to a FusedCSCSamplingGraph lazily via ``fused_graph``."""

    def __init__(self, legacy_dataset, root: str = "datasets"):
        self._legacy = legacy_dataset
        g = legacy_dataset[0]
        if isinstance(g, tuple):
            g = g[0]
        self._g = g
        path = os.path.join(
            root, f"legacy_{getattr(legacy_dataset, 'name', 'dataset')}"
        )
        if not os.path.exists(os.path.join(path, "metadata.json")):
            src, dst = (np.asarray(x) for x in g.edges())
            feats = {}
            if "feat" in g.ndata:
                feats["feat"] = np.asarray(g.ndata["feat"])
            masks = {
                k: np.nonzero(np.asarray(g.ndata[k]))[0]
                for k in ("train_mask", "val_mask", "test_mask")
                if k in g.ndata
            }
            OnDiskDataset.write(
                path,
                name=getattr(legacy_dataset, "name", "legacy"),
                src=src,
                dst=dst,
                num_nodes=g.num_nodes(),
                features=feats,
                labels=(
                    np.asarray(g.ndata["label"])
                    if "label" in g.ndata else None
                ),
                train_ids=masks.get("train_mask"),
                val_ids=masks.get("val_mask"),
                test_ids=masks.get("test_mask"),
            )
        super().__init__(path)
