"""Small helpers (reference ``python/dgl/sparse/utils.py``)."""
from __future__ import annotations

import numbers

import jax.numpy as jnp
import numpy as np

__all__ = ["is_scalar"]


def is_scalar(x) -> bool:
    """True for Python numbers and 0-dim arrays
    (reference ``python/dgl/sparse/utils.py:8``)."""
    if isinstance(x, numbers.Number):
        return True
    if isinstance(x, (np.ndarray, jnp.ndarray)):
        return x.ndim == 0
    return False
