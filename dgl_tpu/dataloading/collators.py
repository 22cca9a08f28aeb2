"""Collator/tensorized-dataset API (reference
``python/dgl/dataloading/dataloader.py:191,255,757,1279`` and
``python/dgl/distributed/dist_dataloader.py:337,434``).

The reference pairs these with ``torch.utils.data.DataLoader``; here they
are plain host-side iterables — the prefetching ``DataLoader`` in
``dataloader.py`` already covers pipelined iteration, so collators exist
for API parity and for users composing their own loops.
"""
from __future__ import annotations

from typing import Mapping, Optional

import numpy as np

__all__ = [
    "TensorizedDataset",
    "DDPTensorizedDataset",
    "create_tensorized_dataset",
    "NodeCollator",
    "EdgeCollator",
    "GraphCollator",
]


class TensorizedDataset:
    """Batches of an ID array (reference ``dataloader.py:191``): iterating
    yields host arrays of ``batch_size`` IDs (the last batch may be short
    unless ``drop_last``)."""

    def __init__(self, indices, batch_size: int, drop_last: bool = False,
                 shuffle: bool = False, seed: Optional[int] = None):
        if isinstance(indices, Mapping):
            # hetero: flatten to (ntype, id) pairs like the reference
            self._items = [
                (nt, int(i)) for nt, ids in indices.items()
                for i in np.asarray(ids)
            ]
            self._array = None
        else:
            self._array = np.asarray(indices)
            self._items = None
        self.batch_size = int(batch_size)
        self.drop_last = drop_last
        self.shuffle = shuffle
        self._rng = np.random.default_rng(seed)

    def _ordered(self):
        n = len(self._array) if self._array is not None else len(self._items)
        order = np.arange(n)
        if self.shuffle:
            self._rng.shuffle(order)
        return order

    def __iter__(self):
        order = self._ordered()
        n = order.shape[0]
        stop = (n // self.batch_size) * self.batch_size if self.drop_last else n
        for lo in range(0, stop, self.batch_size):
            sel = order[lo: lo + self.batch_size]
            if self._array is not None:
                yield self._array[sel]
            else:
                yield [self._items[i] for i in sel]

    def __len__(self):
        n = len(self._array) if self._array is not None else len(self._items)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


class DDPTensorizedDataset(TensorizedDataset):
    """Rank-sharded batches (reference ``dataloader.py:255``): each process
    iterates its own contiguous shard; when ``drop_last`` is off, shards are
    padded by wrap-around so every rank sees the same number of batches
    (matching the reference's equal-step guarantee for collective sync)."""

    def __init__(self, indices, batch_size: int, drop_last: bool = False,
                 shuffle: bool = False, seed: Optional[int] = None,
                 rank: Optional[int] = None, world_size: Optional[int] = None):
        super().__init__(indices, batch_size, drop_last, shuffle, seed)
        if rank is None or world_size is None:
            import jax

            rank = jax.process_index() if rank is None else rank
            world_size = jax.process_count() if world_size is None else world_size
        self.rank = int(rank)
        self.world_size = int(world_size)

    def _ordered(self):
        order = super()._ordered()
        n = order.shape[0]
        per = n // self.world_size
        if self.drop_last or n % self.world_size == 0:
            return order[self.rank * per: (self.rank + 1) * per]
        per = -(-n // self.world_size)  # ceil: pad by wrap-around
        padded = np.concatenate([order, order[: per * self.world_size - n]])
        return padded[self.rank * per: (self.rank + 1) * per]

    def __len__(self):
        n = len(self._array) if self._array is not None else len(self._items)
        per = (n // self.world_size) if self.drop_last else -(-n // self.world_size)
        if self.drop_last:
            return per // self.batch_size
        return (per + self.batch_size - 1) // self.batch_size


def create_tensorized_dataset(indices, batch_size, drop_last=False,
                              use_ddp=False, ddp_seed=0, shuffle=False,
                              **kwargs):
    """Reference ``dataloader.py:757``."""
    if use_ddp:
        return DDPTensorizedDataset(
            indices, batch_size, drop_last, shuffle, seed=ddp_seed, **kwargs
        )
    return TensorizedDataset(indices, batch_size, drop_last, shuffle, **kwargs)


class NodeCollator:
    """(input_nodes, output_nodes, blocks) collation for node prediction
    (reference ``distributed/dist_dataloader.py:337``; legacy alias
    ``dataloading/dataloader.py:1477``)."""

    def __init__(self, g, nids, graph_sampler):
        self.g = g
        self.nids = nids
        self.graph_sampler = graph_sampler

    @property
    def dataset(self):
        return np.asarray(self.nids) if not isinstance(self.nids, Mapping) \
            else self.nids

    def collate(self, items):
        if items and isinstance(items[0], tuple):
            grouped = {}
            for nt, i in items:
                grouped.setdefault(nt, []).append(i)
            items = {nt: np.asarray(v) for nt, v in grouped.items()}
        else:
            items = np.asarray(items)
        return self.graph_sampler.sample_blocks(self.g, items)


class EdgeCollator:
    """(input_nodes, pair_graph[, neg_pair_graph], blocks) collation for
    edge prediction (reference ``distributed/dist_dataloader.py:434``)."""

    def __init__(self, g, eids, graph_sampler, exclude=None,
                 reverse_eids=None, reverse_etypes=None,
                 negative_sampler=None):
        from .base import EdgePredictionSampler

        self.g = g
        self.eids = eids
        self._sampler = EdgePredictionSampler(
            graph_sampler, exclude, reverse_eids, reverse_etypes,
            negative_sampler,
        )

    @property
    def dataset(self):
        return np.asarray(self.eids)

    def collate(self, items):
        return self._sampler.sample(self.g, np.asarray(items))


class GraphCollator:
    """Batch whole graphs, descending into (graph, label) tuples
    (reference ``dataloader.py:1279``)."""

    def collate(self, items):
        from ..batch import batch as batch_graphs
        from ..graph import Graph

        elem = items[0]
        if isinstance(elem, Graph):
            return batch_graphs(items)
        if isinstance(elem, (tuple, list)):
            return tuple(
                self.collate([it[i] for it in items]) for i in range(len(elem))
            )
        import jax.numpy as jnp

        arr = np.asarray(items)
        return jnp.asarray(arr)


class Collator:
    """Abstract collator (reference
    ``distributed/dist_dataloader.py:276``): ``dataset`` + ``collate``."""

    @property
    def dataset(self):
        raise NotImplementedError

    def collate(self, items):
        raise NotImplementedError

    @staticmethod
    def add_edge_attribute_to_graph(g, prob, padding=1):
        """Reference hook that materializes prob/mask edge attributes on
        GraphBolt partitions; our graphs carry edata directly, so this is
        a no-op kept for API parity."""
        return g


__all__.append("Collator")
