"""Set-membership filter (reference ``python/dgl/utils/filter.py:7``,
C++ ``src/array/filter.cc`` cuco-based GPU filter -> ``jnp.isin`` on TPU)."""
from __future__ import annotations

import jax.numpy as jnp

__all__ = ["Filter"]


class Filter:
    """Immutable id set supporting find_included/excluded_indices."""

    def __init__(self, ids):
        self._set = jnp.unique(jnp.asarray(ids))

    def find_included_indices(self, test):
        test = jnp.asarray(test)
        mask = jnp.isin(test, self._set)
        return jnp.nonzero(mask)[0]

    def find_excluded_indices(self, test):
        test = jnp.asarray(test)
        mask = jnp.isin(test, self._set)
        return jnp.nonzero(~mask)[0]
