"""ItemSampler (reference ``python/dgl/graphbolt/item_sampler.py``): yields
seed MiniBatches from an ItemSet."""
from __future__ import annotations

from typing import Iterator, Optional

import numpy as np

from .itemset import ItemSet
from .minibatch import MiniBatch

__all__ = ["ItemSampler"]


class ItemSampler:
    def __init__(self, item_set: ItemSet, batch_size: int,
                 shuffle: bool = False, drop_last: bool = False,
                 seed: Optional[int] = None):
        self.item_set = item_set
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self._rng = np.random.default_rng(seed)

    def __iter__(self) -> Iterator[MiniBatch]:
        n = len(self.item_set)
        idx = np.arange(n)
        if self.shuffle:
            idx = self._rng.permutation(n)
        for lo in range(0, n, self.batch_size):
            sel = idx[lo : lo + self.batch_size]
            if self.drop_last and sel.shape[0] < self.batch_size:
                return
            items = self.item_set[sel]
            mb = MiniBatch()
            names = self.item_set.names
            if isinstance(items, tuple):
                for name, arr in zip(names, items):
                    if name in ("seeds", "seed_nodes"):
                        mb.seeds = arr
                    elif name in ("labels", "label"):
                        mb.labels = arr
                    else:
                        setattr(mb, "indexes", arr)
            else:
                mb.seeds = items
            yield mb

    def __len__(self):
        n = len(self.item_set)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size
