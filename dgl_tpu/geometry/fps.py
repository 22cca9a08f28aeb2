"""Farthest point sampling (reference ``python/dgl/geometry/fps.py:11``,
C++ ``src/geometry/``).

TPU-native: the iterative argmax loop is a ``lax.fori_loop`` over fixed
``npoints`` steps — fully jittable, batched."""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["farthest_point_sampler"]


def farthest_point_sampler(pos, npoints: int, start_idx=None):
    """pos (B, N, C) -> (B, npoints) int32 indices."""
    pos = jnp.asarray(pos)
    if pos.ndim == 2:
        pos = pos[None]
        squeeze = True
    else:
        squeeze = False
    B, N, C = pos.shape
    start = jnp.zeros((B,), jnp.int32) if start_idx is None else jnp.full(
        (B,), start_idx, jnp.int32
    )

    def one(p, s0):
        def body(i, state):
            dists, out = state
            cur = out[i - 1]
            d = jnp.sum((p - p[cur]) ** 2, axis=-1)
            dists = jnp.minimum(dists, d)
            nxt = jnp.argmax(dists).astype(jnp.int32)
            out = out.at[i].set(nxt)
            return dists, out

        out0 = jnp.zeros((npoints,), jnp.int32).at[0].set(s0)
        dists0 = jnp.full((N,), jnp.inf)
        _, out = jax.lax.fori_loop(1, npoints, body, (dists0, out0))
        return out

    res = jax.vmap(one)(pos, start)
    return res[0] if squeeze else res
