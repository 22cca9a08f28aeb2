"""GraphBolt DataLoader (reference ``python/dgl/graphbolt/dataloader.py:78``):
drives a stage chain with a background prefetch thread (the reference
rewrites the datapipe graph to insert multiprocessing + prefetch before
CopyTo; one prefetch thread covers the same overlap on TPU hosts)."""
from __future__ import annotations

import queue
import threading
from typing import Iterable

__all__ = ["DataLoader"]


class DataLoader:
    def __init__(self, datapipe: Iterable, num_prefetch: int = 2,
                 use_prefetch_thread: bool = True):
        self.datapipe = datapipe
        self.num_prefetch = num_prefetch
        self.use_prefetch_thread = use_prefetch_thread

    def __iter__(self):
        if not self.use_prefetch_thread:
            yield from self.datapipe
            return
        q: "queue.Queue" = queue.Queue(maxsize=self.num_prefetch)
        _END = object()
        err = []

        def worker():
            try:
                for item in self.datapipe:
                    q.put(item)
            except BaseException as e:
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
        return len(self.datapipe)
