"""HBM-resident hot-feature cache (the TPU analog of the reference's
GPUCache: ``python/dgl/cuda/gpu_cache.py:24``,
``graphbolt/src/cuda/extension/gpu_cache.cu``).

For minibatch training whose feature table does NOT fit in HBM (papers100M
scale), keep the hottest rows (by degree — the hub machinery's insight:
top-degree rows serve most lookups on power-law graphs) device-resident;
each batch's input ids split into

  hits   -> one device gather from the resident table (no host traffic)
  misses -> host feature read (mmap / batched-pread) + one device_put of
            just those rows

This is the static-top-K design rather than an LRU: the hot set is chosen
once from the degree distribution, so the device table never churns and
the split is a single ``searchsorted`` — on TPU a dynamic cache would cost
a scatter per update (measured 14 ns/edge, ops/spmm.py) while the static
set already captures the skew (H=2048 covers 65% of edges on an
arxiv-scale zipf graph, BENCH_r02). Host-RAM caching below this tier is
:class:`~dgl_tpu.graphbolt.CachedFeature`.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from ...base import DGLError

__all__ = ["HBMFeatureCache"]

_BUCKET = 256


def _pad_bucket(arr: np.ndarray, fill) -> np.ndarray:
    """Pad a 1-D int array up to the next _BUCKET multiple with ``fill``
    (an out-of-range position for scatter ``mode='drop'``)."""
    n = arr.shape[0]
    m = max(_BUCKET, -(-n // _BUCKET) * _BUCKET)
    out = np.full(m, fill, np.int64)
    out[:n] = arr
    return out


def _assemble(out_len, table, hit_pos, hit_slots, miss_pos, miss_rows):
    import jax

    return _init_jit()(out_len, table, jax.numpy.asarray(hit_pos),
                       jax.numpy.asarray(hit_slots),
                       jax.numpy.asarray(miss_pos),
                       jax.numpy.asarray(miss_rows))


def _assemble_impl(out_len, table, hit_pos, hit_slots, miss_pos,
                   miss_rows):
    import jax.numpy as jnp

    out = jnp.zeros((out_len,) + table.shape[1:], table.dtype)
    out = out.at[hit_pos].set(
        jnp.take(table, jnp.clip(hit_slots, 0, table.shape[0] - 1),
                 axis=0), mode="drop")
    out = out.at[miss_pos].set(miss_rows.astype(table.dtype),
                               mode="drop")
    return out


_assemble_jit = None


def _init_jit():
    global _assemble_jit
    if _assemble_jit is None:
        import jax

        _assemble_jit = jax.jit(_assemble_impl, static_argnums=(0,))
    return _assemble_jit


class HBMFeatureCache:
    """Two-tier feature fetch: device-resident hot rows + host fallback.

    ``fallback``: any host Feature (NumpyFeature / DiskBasedFeature / ...).
    ``hot_ids``: node ids to pin in HBM (e.g. top-degree; see
    :meth:`from_degrees`).
    """

    def __init__(self, fallback, hot_ids: np.ndarray):
        import jax.numpy as jnp

        self._fb = fallback
        hot = np.unique(np.asarray(hot_ids).astype(np.int64))
        self._hot_sorted = hot
        self._table = jnp.asarray(fallback.read(hot))  # (H, F) in HBM
        self.hits = 0
        self.misses = 0

    @classmethod
    def from_degrees(cls, fallback, degrees: np.ndarray, capacity: int):
        """Pin the ``capacity`` highest-degree rows (GPUCache's admission
        by access frequency, computed statically from the graph)."""
        hot = np.argpartition(-np.asarray(degrees), capacity - 1)[:capacity]
        return cls(fallback, hot)

    @property
    def capacity(self) -> int:
        return self._hot_sorted.shape[0]

    def hit_rate(self) -> float:
        t = self.hits + self.misses
        return self.hits / t if t else 0.0

    def split(self, ids: np.ndarray):
        """Host-side split of a batch: (hit_pos, hit_slots, miss_pos,
        miss_ids). ``hit_slots`` index the device table."""
        ids = np.asarray(ids)
        slot = np.searchsorted(self._hot_sorted, ids)
        slot_c = np.clip(slot, 0, self._hot_sorted.shape[0] - 1)
        hit = self._hot_sorted[slot_c] == ids
        self.hits += int(hit.sum())
        self.misses += int(ids.size - hit.sum())
        return (np.nonzero(hit)[0], slot_c[hit],
                np.nonzero(~hit)[0], ids[~hit])

    def read_batch(self, ids: np.ndarray):
        """Assemble (len(ids), F) rows on device: hot rows gathered from
        the HBM table, misses read on host (only those rows cross the
        host->device link) and scattered into place.

        Shapes are BUCKETED (hit/miss counts round up to 256-multiples,
        padding dropped via OOB scatter indices): the round-4 giant-tier
        bench let every step's unique hit count cut a fresh XLA program
        — continuous recompilation that inflated the 'train' stage share
        and would hit the remote compile service per step on real TPU."""
        ids = np.asarray(ids)
        hit_pos, hit_slots, miss_pos, miss_ids = self.split(ids)
        n = ids.shape[0]
        hp, hs = _pad_bucket(hit_pos, n), _pad_bucket(hit_slots, 0)
        mp = _pad_bucket(miss_pos, n)
        rows = (np.asarray(self._fb.read(miss_ids)) if miss_ids.size
                else np.zeros((0,) + self._table.shape[1:], np.float32))
        mr = np.zeros((mp.shape[0],) + rows.shape[1:], rows.dtype)
        mr[: rows.shape[0]] = rows
        return _assemble(n, self._table, hp, hs, mp, mr)

    # Feature API passthroughs so the cache drops into FeatureStore slots
    def read(self, ids=None):
        if ids is None:
            return self._fb.read()
        return self.read_batch(ids)

    def size(self):
        return self._fb.size()

    def count(self):
        return self._fb.count()
