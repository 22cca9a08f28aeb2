"""Grouped reversible residual connections (reference
``python/dgl/nn/pytorch/conv/grouprevres.py``, RevGNN).

Algorithm (reference ``grouprevres.py:185-202``): split x into G groups;
``y_in = sum(xs[1:])``; for each group i: ``y_in = xs[i] + f_i(g, y_in)``.
The reference's memory saving (recompute inputs from outputs via the
inverse in backward, ``InvertibleCheckpoint``) maps TPU-natively to
``jax.checkpoint`` rematerialization: same FLOPs-for-memory trade, no
custom autograd.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
from flax import linen as nn


class GroupRevRes(nn.Module):
    """(reference ``grouprevres.py:101``).

    ``gnn_module``: a factory ``lambda i: flax_module`` (one per group, like
    the reference's deep-copied modules) or a single shared module.
    """

    gnn_module: Callable
    groups: int = 2
    remat: bool = False  # True wraps each group in nn.remat (RevGNN memory)

    @nn.compact
    def __call__(self, g, x, *args):
        modules = []
        for i in range(self.groups):
            try:
                m = self.gnn_module(i)  # factory form
            except TypeError:
                m = self.gnn_module
            modules.append(m)
        xs = jnp.split(x, self.groups, axis=-1)
        args_chunks = (
            [()] * self.groups
            if not args
            else list(
                zip(*(jnp.split(a, self.groups, axis=-1) for a in args))
            )
        )
        y_in = sum(xs[1:])
        ys = []
        for i in range(self.groups):
            f = modules[i]
            if self.remat:
                apply = nn.remat(type(f), static_argnums=())
                # rebind the module instance under remat
                y_new = apply(
                    **{k: getattr(f, k) for k in f.__dataclass_fields__
                       if k not in ("parent", "name")},
                    name=f"rev{i}",
                )(g, y_in, *args_chunks[i])
            else:
                y_new = f(g, y_in, *args_chunks[i])
            y_in = xs[i] + y_new
            ys.append(y_in)
        return jnp.concatenate(ys, axis=-1)


def InvertibleCheckpoint(fn):
    """Rematerialization wrapper (reference ``grouprevres.py:10``
    InvertibleCheckpoint, a torch.autograd.Function that recomputes the
    forward inputs in backward). XLA-native equivalent: ``jax.checkpoint``
    — identical FLOPs-for-memory trade, derived automatically instead of a
    hand-written inverse."""
    import jax

    return jax.checkpoint(fn)
