"""Global RNG seeding (reference ``python/dgl/random.py`` ``dgl.seed``).

Host samplers draw from this stream when no explicit seed is given; device
randomness uses ``jax.random`` keys derived from the same seed.
"""
from __future__ import annotations

import numpy as np

__all__ = ["seed", "get_rng", "next_seed"]

_rng = np.random.default_rng(0)


def seed(val: int):
    """Set the global host RNG seed (reference ``random.py`` ``seed``)."""
    global _rng
    _rng = np.random.default_rng(val)


def get_rng() -> np.random.Generator:
    return _rng


def next_seed() -> int:
    """Draw a fresh sampler seed from the global stream."""
    return int(_rng.integers(2**63))
