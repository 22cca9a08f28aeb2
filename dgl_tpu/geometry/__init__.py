"""Geometry utilities (reference ``python/dgl/geometry/``)."""
from .fps import farthest_point_sampler
from .edge_coarsening import neighbor_matching

__all__ = ["farthest_point_sampler", "neighbor_matching"]
