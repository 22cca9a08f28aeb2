"""Deterministic synthetic datasets for hermetic (zero-egress) runs.

Mirrors the statistical shape of the reference's citation/Reddit/PPI
datasets: homophilous SBM structure + class-informative features, so GNN
training curves behave like the real data (accuracy well above chance,
GCN > MLP). Used as the ``synthetic=True`` fallback of the real loaders and
as the default benchmark inputs.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np

from .dgl_dataset import DGLDataset

__all__ = [
    "synthetic_classification_graph",
    "SyntheticDataset",
    "RedditDataset",
    "PPIDataset",
]


def synthetic_classification_graph(
    num_nodes: int,
    num_edges: int,
    num_classes: int,
    feat_dim: int,
    *,
    homophily: float = 0.8,
    noise: float = 1.0,
    seed: int = 0,
):
    """SBM-style graph with planted classes.

    Returns a homogeneous Graph with ndata: feat, label, train/val/test_mask.
    """
    from .. import convert

    rng = np.random.default_rng(seed)
    labels = rng.integers(0, num_classes, num_nodes)
    # intra-class edges with prob `homophily`
    src = rng.integers(0, num_nodes, num_edges)
    intra = rng.random(num_edges) < homophily
    dst = np.empty(num_edges, dtype=np.int64)
    # pick dst from same class (cheap: permute nodes grouped by class)
    order = np.argsort(labels, kind="stable")
    class_start = np.searchsorted(labels[order], np.arange(num_classes + 1))
    for i in range(num_edges):
        if intra[i]:
            c = labels[src[i]]
            lo, hi = class_start[c], class_start[c + 1]
            dst[i] = order[rng.integers(lo, hi)]
        else:
            dst[i] = rng.integers(0, num_nodes)
    centroids = rng.normal(size=(num_classes, feat_dim)) * 2.0
    feat = centroids[labels] + rng.normal(size=(num_nodes, feat_dim)) * noise

    g = convert.graph((src, dst), num_nodes=num_nodes)
    g.ndata["feat"] = jnp.asarray(feat, dtype=jnp.float32)
    g.ndata["label"] = jnp.asarray(labels, dtype=jnp.int32)
    perm = rng.permutation(num_nodes)
    n_train = int(num_nodes * 0.6)
    n_val = int(num_nodes * 0.2)
    train_mask = np.zeros(num_nodes, bool)
    val_mask = np.zeros(num_nodes, bool)
    test_mask = np.zeros(num_nodes, bool)
    train_mask[perm[:n_train]] = True
    val_mask[perm[n_train : n_train + n_val]] = True
    test_mask[perm[n_train + n_val :]] = True
    g.ndata["train_mask"] = jnp.asarray(train_mask)
    g.ndata["val_mask"] = jnp.asarray(val_mask)
    g.ndata["test_mask"] = jnp.asarray(test_mask)
    return g


class SyntheticDataset(DGLDataset):
    """Single synthetic node-classification graph."""

    def __init__(
        self,
        name="synthetic",
        num_nodes=1000,
        num_edges=8000,
        num_classes=7,
        feat_dim=64,
        seed=0,
        transform=None,
        **kwargs,
    ):
        self._cfg = (num_nodes, num_edges, num_classes, feat_dim, seed)
        self._num_classes = num_classes
        super().__init__(name=name, transform=transform)

    def process(self):
        n, e, c, d, s = self._cfg
        self._g = synthetic_classification_graph(n, e, c, d, seed=s)

    def __getitem__(self, idx):
        assert idx == 0
        return self._apply_transform(self._g)

    def __len__(self):
        return 1

    @property
    def num_classes(self):
        return self._num_classes


class RedditDataset(SyntheticDataset):
    """Reddit-shaped stand-in (reference ``data/reddit.py``): 232,965 nodes
    in the real data; synthetic fallback is scaled down by default.

    Pass ``full_scale=True`` for reference-sized structure.
    """

    def __init__(self, full_scale=False, transform=None, **kwargs):
        n = 232_965 if full_scale else 20_000
        e = 114_615_892 if full_scale else 400_000
        super().__init__(
            name="reddit_synthetic",
            num_nodes=n,
            num_edges=e,
            num_classes=41,
            feat_dim=602,
            seed=41,
            transform=transform,
        )


class PPIDataset(DGLDataset):
    """PPI-shaped multi-graph multilabel dataset (reference ``data/ppi.py``:
    24 graphs, 121 labels). Synthetic: 6 small graphs per split."""

    def __init__(self, mode="train", transform=None, **kwargs):
        assert mode in ("train", "valid", "test")
        self.mode = mode
        super().__init__(name=f"ppi_synthetic_{mode}", transform=transform)

    def process(self):
        from .. import convert

        seed = {"train": 0, "valid": 100, "test": 200}[self.mode]
        count = {"train": 20, "valid": 2, "test": 2}[self.mode]
        rng = np.random.default_rng(seed)
        self._graphs = []
        for i in range(count):
            n = int(rng.integers(500, 800))
            e = n * 10
            g = synthetic_classification_graph(
                n, e, 10, 50, seed=seed + i
            )
            labels01 = rng.random((n, 121)) < 0.1
            g.ndata["label"] = jnp.asarray(labels01, dtype=jnp.float32)
            self._graphs.append(g)

    def __getitem__(self, idx):
        return self._apply_transform(self._graphs[idx])

    def __len__(self):
        return len(self._graphs)

    @property
    def num_labels(self):
        return 121
