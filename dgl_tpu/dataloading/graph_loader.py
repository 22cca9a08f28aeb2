"""Graph-classification dataloader (reference ``GraphDataLoader``,
``python/dgl/dataloading/dataloader.py:1376``).

TPU-first: instead of the reference's dynamic-shape collate, every batch is
padded to one static (batch_size+1 graphs, node budget, edge budget) shape
via ``pad_batch`` — ghost graphs absorb the slack — so the training step
compiles exactly once. Yields ``(batched_graph, labels, graph_mask)``.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..base import DGLError
from ..batch import batch as batch_graphs, pad_batch

__all__ = ["GraphDataLoader"]


class GraphDataLoader:
    """Iterate a graph(+label) dataset in minibatches.

    ``dataset``: a sequence of graphs or of ``(graph, label)`` pairs (e.g.
    ``MiniGCDataset``). With ``pad=True`` (default) batches share ONE static
    shape; node/edge budgets default to the dataset maxima.
    """

    def __init__(self, dataset, batch_size=1, shuffle=False, drop_last=False,
                 pad=True, num_nodes_budget=None, num_edges_budget=None,
                 seed=None):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.pad = pad
        self._rng = np.random.default_rng(seed)
        if self.batch_size < 1:
            raise DGLError("batch_size must be >= 1")
        self._has_labels = self._peek_has_labels()
        if pad:
            if num_nodes_budget is None or num_edges_budget is None:
                max_n = max_e = 0
                for item in dataset:
                    g = item[0] if self._has_labels else item
                    max_n = max(max_n, g.num_nodes())
                    max_e = max(max_e, g.num_edges())
                if num_nodes_budget is None:
                    # +batch_size+1: one node minimum per ghost graph
                    num_nodes_budget = self.batch_size * max_n + self.batch_size + 1
                if num_edges_budget is None:
                    num_edges_budget = self.batch_size * max_e
            self.num_nodes_budget = int(num_nodes_budget)
            self.num_edges_budget = int(num_edges_budget)

    def _peek_has_labels(self):
        item = self.dataset[0]
        return isinstance(item, (tuple, list)) and len(item) == 2

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def __iter__(self):
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        bs = self.batch_size
        for lo in range(0, n, bs):
            idx = order[lo : lo + bs]
            if idx.shape[0] < bs and self.drop_last:
                return
            items = [self.dataset[int(i)] for i in idx]
            if self._has_labels:
                graphs = [g for g, _ in items]
                labels = np.asarray([l for _, l in items])
            else:
                graphs = list(items)
                labels = None
            if self.pad:
                bg, gmask = pad_batch(
                    graphs, bs + 1, self.num_nodes_budget,
                    self.num_edges_budget,
                )
                if labels is not None:
                    lab = np.zeros((bs + 1,) + labels.shape[1:], labels.dtype)
                    lab[: labels.shape[0]] = labels
                    labels = lab
            else:
                bg = batch_graphs(graphs)
                gmask = np.ones(len(graphs), bool)
            if labels is None:
                yield bg, jnp.asarray(gmask)
            else:
                yield bg, jnp.asarray(labels), jnp.asarray(gmask)
