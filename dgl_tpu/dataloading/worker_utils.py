"""Worker-side serialization helpers (reference
``python/dgl/dataloading/dataloader.py:576-760``): the reference strips
feature columns shared with the parent graph before IPC from DataLoader
workers and restores them on the consumer side. Our pipeline is
thread-based (no pickling), but the same helpers matter when users spawn
sampler processes via ``dgl_tpu.multiprocessing_mod`` — shared columns
must not be copied per batch.
"""
from __future__ import annotations

import numpy as np

from ..graph import Graph

__all__ = [
    "remove_parent_storage_columns",
    "restore_parent_storage_columns",
    "CollateWrapper",
    "WorkerInitWrapper",
]

_REMOVED = "__parent_storage__"


def remove_parent_storage_columns(item, g: Graph):
    """Replace subgraph feature columns that ARE the parent graph's columns
    (same array object) with a marker so they are not serialized
    (reference ``dataloader.py:576``)."""
    if not isinstance(item, Graph) or not isinstance(g, Graph):
        return item
    for frames, parent_frames in (
        (item._node_frames, g._node_frames),
        (item._edge_frames, g._edge_frames),
    ):
        for t, subframe in frames.items():
            parent = parent_frames.get(t, {})
            for key in list(subframe.keys()):
                if subframe[key] is parent.get(key):
                    subframe[key] = (_REMOVED, key)
    return item


def restore_parent_storage_columns(item, g: Graph):
    """Reattach columns stripped by
    :func:`remove_parent_storage_columns` (reference
    ``dataloader.py:600``)."""
    if not isinstance(item, Graph) or not isinstance(g, Graph):
        return item
    for frames, parent_frames in (
        (item._node_frames, g._node_frames),
        (item._edge_frames, g._edge_frames),
    ):
        for t, subframe in frames.items():
            parent = parent_frames.get(t, {})
            for key, val in list(subframe.items()):
                if (
                    isinstance(val, tuple) and len(val) == 2
                    and val[0] == _REMOVED
                ):
                    subframe[key] = parent[val[1]]
    return item


class CollateWrapper:
    """Run a sample function against a pinned graph and strip
    parent-shared columns from the result (reference
    ``dataloader.py:722``). ``use_uva``/``device`` are accepted for API
    parity (transfers happen in the CopyTo stage here)."""

    def __init__(self, sample_func, g, use_uva: bool = False, device=None):
        self.sample_func = sample_func
        self.g = g
        self.use_uva = use_uva
        self.device = device

    def __call__(self, items):
        batch = self.sample_func(self.g, items)

        def strip(x):
            return remove_parent_storage_columns(x, self.g)

        if isinstance(batch, tuple):
            return tuple(
                strip(b) if isinstance(b, Graph)
                else [strip(bb) for bb in b] if isinstance(b, list)
                else b
                for b in batch
            )
        return strip(batch)


class WorkerInitWrapper:
    """Per-worker init hook wrapper (reference ``dataloader.py:746``):
    seeds numpy per worker then calls the user's init function."""

    def __init__(self, func=None):
        self.func = func

    def __call__(self, worker_id: int):
        np.random.seed((np.random.SeedSequence(worker_id).entropy or 0)
                       % (2**32 - 1) + worker_id)
        if self.func is not None:
            self.func(worker_id)
