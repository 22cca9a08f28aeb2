"""SpotTarget degree-thresholded edge exclusion (reference
``python/dgl/dataloading/spot_target.py:7``, arXiv:2306.00899): exclude a
training target edge only when BOTH endpoints are low-degree, which
measurably improves link-prediction training."""
from __future__ import annotations

import numpy as np

from .base import find_exclude_eids

__all__ = ["SpotTarget"]


class SpotTarget:
    """Callable excluder for ``as_edge_prediction_sampler(exclude=...)``.

    An edge is excluded iff ``min(in_deg(src), in_deg(dst)) <
    degree_threshold``; the surviving exclusion set is then expanded by the
    usual ``exclude`` policy ('self' | 'reverse_id' | 'reverse_types').
    """

    def __init__(self, g, exclude="self", degree_threshold: int = 10,
                 reverse_eids=None, reverse_etypes=None):
        self.g = g
        self.exclude = exclude
        self.degree_threshold = degree_threshold
        self.reverse_eids = reverse_eids
        self.reverse_etypes = reverse_etypes

    def __call__(self, seed_edges):
        g = self.g
        seed_edges = np.asarray(seed_edges)
        src, dst = g.find_edges(seed_edges)
        head = np.asarray(g.in_degrees(src))
        tail = np.asarray(g.in_degrees(dst))
        degree = np.minimum(head, tail)
        edges_to_exclude = seed_edges[degree < self.degree_threshold]
        return find_exclude_eids(
            g, edges_to_exclude, self.exclude,
            self.reverse_eids, self.reverse_etypes,
        )
