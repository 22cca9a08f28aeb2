"""Internal index helpers (reference ``python/dgl/utils/internal.py``)."""
from __future__ import annotations

import numpy as np

__all__ = ["toindex", "relabel"]


def toindex(x, dtype=np.int64):
    """Normalize any id-like input to a 1-D numpy int array."""
    return np.atleast_1d(np.asarray(x)).astype(dtype)


def relabel(ids):
    """Unique + relabel map (reference ``utils.relabel``): returns
    (unique_ids, mapping old->new as dict-free arrays)."""
    from .. import _native

    ids = toindex(ids)
    res = _native.unique_and_compact(ids)
    if res is not None:
        return res
    uniq, inv = np.unique(ids, return_inverse=True)
    return uniq, inv
