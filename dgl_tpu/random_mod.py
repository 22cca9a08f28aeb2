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


def choice(a, size, replace=True, prob=None):
    """``numpy.random.choice`` over the framework RNG (reference
    ``python/dgl/random.py:21``)."""
    p = None if prob is None else np.asarray(prob)
    if p is not None:
        s = p.sum()
        if s <= 0:
            raise ValueError("prob must have positive mass")
        p = p / s
    return get_rng().choice(a, size=size, replace=replace, p=p)


__all__.append("choice")
