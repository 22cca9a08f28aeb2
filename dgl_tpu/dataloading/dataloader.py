"""DataLoader: seed batching + sampler + prefetch pipeline.

Reference: legacy ``python/dgl/dataloading/dataloader.py`` (prefetching,
DDP split) and GraphBolt's pipeline rewrite
(``python/dgl/graphbolt/dataloader.py:108-191``). TPU version: a background
thread pipelines host sampling + feature slicing ahead of device compute
(double-buffered), and ``device_put`` moves finished minibatches.
"""
from __future__ import annotations

import queue
import threading
from typing import Optional

import numpy as np


__all__ = ["DataLoader", "NodeDataLoader", "EdgeDataLoader"]


class DataLoader:
    """Iterate minibatches of (input_nodes, output_nodes, blocks).

    ``indices``: seed node (or edge) ids. ``drop_last`` defaults True when a
    fixed-shape sampler is used (partial batches are padded by the sampler
    itself; keeping them is fine too).
    """

    def __init__(
        self,
        graph,
        indices,
        graph_sampler,
        *,
        batch_size: int = 1024,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: Optional[int] = None,
        num_prefetch: int = 2,
        num_workers: int = 1,
        use_prefetch_thread: bool = True,
        device=None,
        ddp_rank: int = 0,
        ddp_world_size: int = 1,
    ):
        self.graph = graph
        self.indices = np.asarray(indices)
        self.sampler = graph_sampler
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.device = device
        self.num_prefetch = num_prefetch
        self.num_workers = num_workers
        self.use_prefetch_thread = use_prefetch_thread
        self._rng = np.random.default_rng(seed)
        # DDP-style split (reference ``DDPTensorizedDataset``,
        # ``dataloading/dataloader.py:255``): contiguous shard per rank.
        if ddp_world_size > 1:
            shard = self.indices.shape[0] // ddp_world_size
            lo = ddp_rank * shard
            hi = lo + shard
            self.indices = self.indices[lo:hi]

    def _batches(self):
        idx = self.indices
        if self.shuffle:
            idx = idx[self._rng.permutation(idx.shape[0])]
        n = idx.shape[0]
        for lo in range(0, n, self.batch_size):
            batch = idx[lo : lo + self.batch_size]
            if self.drop_last and batch.shape[0] < self.batch_size:
                return
            yield batch

    def _produce(self, batch):
        out = self.sampler.sample(self.graph, batch)
        if self.device is not None:
            import jax

            out = jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self.device)
                if hasattr(x, "shape")
                else x,
                out,
            )
        return out

    def __iter__(self):
        if not self.use_prefetch_thread:
            for batch in self._batches():
                yield self._produce(batch)
            return
        if self.num_workers > 1:
            # thread-pool sampling: the native sampler releases the GIL, so
            # batches sample in parallel; results yielded in order
            # (reference: GraphBolt's multiprocess pre-fetch segment,
            # ``graphbolt/dataloader.py:108-191`` — threads suffice here
            # because the hot loops are in C)
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(self.num_workers) as pool:
                futures = []
                batches = self._batches()
                for batch in batches:
                    futures.append(pool.submit(self._produce, batch))
                    if len(futures) >= self.num_workers + self.num_prefetch:
                        yield futures.pop(0).result()
                for f in futures:
                    yield f.result()
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.num_prefetch)
        _END = object()
        err = []

        def worker():
            try:
                for batch in self._batches():
                    q.put(self._produce(batch))
            except BaseException as e:  # propagate to consumer
                err.append(e)
            finally:
                q.put(_END)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
        t.join()
        if err:
            raise err[0]

    def __len__(self):
        n = self.indices.shape[0]
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


# Legacy aliases (reference dgl.dataloading.NodeDataLoader/EdgeDataLoader)
NodeDataLoader = DataLoader
EdgeDataLoader = DataLoader
