"""Multiprocessing helpers (reference ``python/dgl/multiprocessing/``:
fork-safe spawn wrappers).

JAX processes must not fork after backend init; sampler workers therefore
use the ``spawn`` context, and graphs are shared by re-loading shard files
(mmap) rather than fork-inherited memory.
"""
from __future__ import annotations

import multiprocessing as _mp

__all__ = ["get_context", "Process", "Queue", "call_once_and_share"]


def get_context():
    """Spawn context (safe with initialized JAX backends)."""
    return _mp.get_context("spawn")


def Process(*args, **kwargs):
    return get_context().Process(*args, **kwargs)


def Queue(*args, **kwargs):
    return get_context().Queue(*args, **kwargs)


def call_once_and_share(fn, shape, dtype):
    """Run ``fn`` once and share the resulting array via shared memory
    (reference ``multiprocessing/pytorch.py`` semantics)."""
    import numpy as np
    from multiprocessing import shared_memory

    arr = np.asarray(fn(), dtype=dtype).reshape(shape)
    shm = shared_memory.SharedMemory(create=True, size=arr.nbytes)
    out = np.ndarray(shape, dtype=dtype, buffer=shm.buf)
    out[:] = arr
    return out, shm
