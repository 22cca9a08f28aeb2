"""Heterogeneous graph module wrappers.

Reference: ``python/dgl/nn/pytorch/hetero.py:12`` (HeteroGraphConv).
"""
from __future__ import annotations

from typing import Dict, Any

import jax.numpy as jnp
from flax import linen as nn

from ..base import DGLError


_AGG_FNS = {
    "sum": lambda xs: sum(xs),
    "max": lambda xs: jnp.stack(xs).max(0),
    "min": lambda xs: jnp.stack(xs).min(0),
    "mean": lambda xs: jnp.stack(xs).mean(0),
    "stack": lambda xs: jnp.stack(xs, 1),
}


class HeteroGraphConv(nn.Module):
    """Apply per-relation modules and aggregate per dst type.

    Reference ``hetero.py:12``: ``mods`` maps etype name -> module; outputs
    for the same destination node type are combined with ``aggregate``.
    """

    mods: Dict[str, Any]
    aggregate: str = "sum"

    @nn.compact
    def __call__(self, graph, inputs, mod_args=None, mod_kwargs=None):
        if self.aggregate not in _AGG_FNS:
            raise DGLError(f"Unknown aggregate {self.aggregate!r}")
        mod_args = mod_args or {}
        mod_kwargs = mod_kwargs or {}
        outputs: Dict[str, list] = {}
        for cet in graph.canonical_etypes:
            st, et, dt = cet
            if et not in self.mods:
                continue
            if st not in inputs:
                continue
            rel_graph = _relation_view(graph, cet)
            dst_in = inputs.get(dt)
            res = self.mods[et](
                rel_graph,
                (inputs[st], dst_in),
                *mod_args.get(et, ()),
                **mod_kwargs.get(et, {}),
            )
            outputs.setdefault(dt, []).append(res)
        return {
            dt: _AGG_FNS[self.aggregate](vals) for dt, vals in outputs.items()
        }


def _relation_view(graph, cet):
    """A single-relation bipartite view of one canonical etype."""
    from ..graph import Graph

    st, et, dt = cet
    rel = graph._relations[cet]
    return Graph(
        {cet: rel},
        num_src_nodes={st: rel.num_src},
        num_dst_nodes={dt: rel.num_dst},
        is_block=True,
    )
