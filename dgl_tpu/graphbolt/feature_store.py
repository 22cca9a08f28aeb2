"""Feature stores (reference ``python/dgl/graphbolt/feature_store.py:139``,
``impl/torch_based_feature_store.py``, C++ ``graphbolt/src/cnumpy.cc``
io_uring OnDiskNpyArray, ``cache_policy.h`` caches).

- ``NumpyFeature``: in-RAM array.
- ``DiskBasedFeature``: np.memmap over an .npy file (the io_uring
  out-of-core role; mmap+readahead is the portable host equivalent).
- ``CachedFeature``: host-RAM cache in front of any feature, with
  S3FIFO/SIEVE/LRU/Clock policies.
"""
from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import numpy as np

from ..base import DGLError
from .impl.cache_policy import (
    CachePolicy,
    ClockPolicy,
    LRUPolicy,
    S3FifoPolicy,
    SievePolicy,
)

__all__ = [
    "Feature",
    "NumpyFeature",
    "DiskBasedFeature",
    "CachedFeature",
    "FeatureStore",
    "cache_policies",
]

cache_policies = {
    "s3-fifo": S3FifoPolicy,
    "sieve": SievePolicy,
    "lru": LRUPolicy,
    "clock": ClockPolicy,
}


class Feature:
    """Abstract feature (reference ``feature_store.py:38``)."""

    def read(self, ids=None):
        raise NotImplementedError

    def size(self) -> Tuple[int, ...]:
        raise NotImplementedError

    def count(self) -> int:
        raise NotImplementedError

    def update(self, value, ids=None):
        raise DGLError("read-only feature")


class NumpyFeature(Feature):
    """(reference TorchBasedFeature, ``impl/torch_based_feature_store.py``)."""

    def __init__(self, array):
        self._a = np.asarray(array)

    def read(self, ids=None):
        if ids is None:
            return self._a
        return self._a[np.asarray(ids)]

    def size(self):
        return tuple(self._a.shape[1:])

    def count(self):
        return self._a.shape[0]

    def update(self, value, ids=None):
        if ids is None:
            self._a = np.asarray(value)
        else:
            self._a[np.asarray(ids)] = value


class DiskBasedFeature(Feature):
    """Out-of-core .npy feature (reference ``impl/ondisk_dataset`` +
    ``cnumpy.h`` io_uring OnDiskNpyArray).

    Two read paths:

    - ``io="pread"`` (default when the native lib is present): OpenMP
      batched ``pread`` straight from the fd (``csrc/host_ops.cpp
      batched_pread``) — the io_uring analog. The file is never mapped,
      so process RSS stays bounded by the output buffers no matter how
      far past RAM the table grows (the features-larger-than-RAM
      contract; proven by ``tests/test_out_of_core.py``).
    - ``io="mmap"``: np.memmap fancy-indexing (no-toolchain fallback).

    ``read_async(ids)`` returns a ``concurrent.futures.Future`` so the
    DataLoader can overlap feature I/O with sampling/compute (reference
    ``feature_fetcher.py:49`` read_async).
    """

    def __init__(self, path: str, io: Optional[str] = None,
                 num_async_workers: int = 2):
        from .. import _native

        self._a = np.load(path, mmap_mode="r")
        if self._a.ndim < 1 or not self._a.flags["C_CONTIGUOUS"]:
            raise DGLError("DiskBasedFeature needs a C-contiguous .npy")
        if io is None:
            io = "pread" if _native.available() else "mmap"
        self._io = io
        self._pool = None
        self._nworkers = num_async_workers
        if io == "pread":
            # header offset: the memmap's data pointer minus file start
            self._fd = os.open(path, os.O_RDONLY)
            self._offset0 = self._a.offset
            self._row_bytes = int(np.prod(self._a.shape[1:])
                                  * self._a.dtype.itemsize)

    def read(self, ids=None):
        if ids is None:
            return np.asarray(self._a)
        ids = np.asarray(ids)
        if self._io == "pread":
            from .. import _native

            out = np.empty((ids.shape[0],) + tuple(self._a.shape[1:]),
                           self._a.dtype)
            got = _native.batched_pread(
                self._fd, self._offset0, ids.astype(np.int64),
                self._row_bytes,
                out.reshape(-1).view(np.uint8),
            )
            if got != ids.shape[0]:
                raise DGLError(
                    f"batched_pread read {got}/{ids.shape[0]} rows")
            return out
        # fancy-index a memmap -> materialized copy of just those rows
        return np.asarray(self._a[ids])

    def read_async(self, ids):
        """Submit the row fetch to a thread pool; returns a Future whose
        ``.result()`` is the (n, *feat) array. The GIL is released inside
        the native pread loop, so async reads overlap Python-side work."""
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(self._nworkers)
        return self._pool.submit(self.read, np.asarray(ids))

    def size(self):
        return tuple(self._a.shape[1:])

    def count(self):
        return self._a.shape[0]

    def __del__(self):
        # interpreter teardown may have cleared module globals (os=None)
        if getattr(self, "_io", None) == "pread" and os is not None:
            try:
                os.close(self._fd)
            except (OSError, TypeError):
                pass
        pool = getattr(self, "_pool", None)
        if pool is not None:
            try:
                pool.shutdown(wait=False)
            except Exception:
                pass


class CachedFeature(Feature):
    """Cache wrapper (reference ``impl/cpu_cached_feature.py`` +
    ``partitioned_cache_policy.cc``)."""

    def __init__(self, fallback: Feature, capacity: int, policy: str = "sieve"):
        if policy not in cache_policies:
            raise DGLError(
                f"unknown policy {policy!r}; options {list(cache_policies)}"
            )
        self._fb = fallback
        self._policy: CachePolicy = cache_policies[policy](capacity)
        self._buf = np.zeros((capacity,) + tuple(fallback.size()),
                             dtype=np.asarray(fallback.read([0])).dtype)
        self.hits = 0
        self.misses = 0

    def read(self, ids=None):
        if ids is None:
            return self._fb.read()
        ids = np.asarray(ids)
        out = np.empty((ids.shape[0],) + tuple(self._fb.size()),
                       self._buf.dtype)
        hit_pos, hit_slot = [], []
        miss_ids = []          # unique missing keys, in first-seen order
        miss_slots = []        # reserved slot per missing key
        pending = {}           # key -> index into miss_ids
        miss_pos = []          # (row in out, index into miss_ids)
        for i, key in enumerate(ids.tolist()):
            j = pending.get(key)
            if j is not None:  # dup of an in-flight miss: hit-after-fill
                self.hits += 1
                miss_pos.append((i, j))
                continue
            slot = self._policy.lookup(key)
            if slot is not None:
                hit_pos.append(i)
                hit_slot.append(slot)
                self.hits += 1
            else:
                self.misses += 1
                slot, _ = self._policy.insert(key)  # reserve slot now
                pending[key] = len(miss_ids)
                miss_pos.append((i, len(miss_ids)))
                miss_ids.append(key)
                miss_slots.append(slot)
        if hit_pos:
            out[np.asarray(hit_pos)] = self._buf[np.asarray(hit_slot)]
        if miss_ids:
            fetched = self._fb.read(np.asarray(miss_ids))
            self._buf[np.asarray(miss_slots)] = fetched
            for i, j in miss_pos:
                out[i] = fetched[j]
        return out

    def size(self):
        return self._fb.size()

    def count(self):
        return self._fb.count()

    @property
    def hit_rate(self):
        total = self.hits + self.misses
        return self.hits / total if total else 0.0


class FeatureStore:
    """Keyed collection of features (reference ``feature_store.py:139``):
    keys are (domain, type_name, feature_name)."""

    def __init__(self, features: Optional[Dict] = None):
        self._features: Dict[Tuple[str, str, str], Feature] = {}
        if features:
            for k, v in features.items():
                self._features[k] = v if isinstance(v, Feature) else NumpyFeature(v)

    def read(self, domain, type_name, feature_name, ids=None):
        return self._features[(domain, type_name, feature_name)].read(ids)

    def size(self, domain, type_name, feature_name):
        return self._features[(domain, type_name, feature_name)].size()

    def __setitem__(self, key, feature):
        self._features[key] = (
            feature if isinstance(feature, Feature) else NumpyFeature(feature)
        )

    def __getitem__(self, key) -> Feature:
        return self._features[key]

    def __contains__(self, key):
        return key in self._features

    def keys(self):
        return self._features.keys()
