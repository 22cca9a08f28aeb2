"""Graph-factory layers (reference ``python/dgl/nn/pytorch/factory.py``):
KNNGraph / SegmentedKNNGraph / RadiusGraph build graphs from point features."""
from __future__ import annotations

import numpy as np

from ..transforms.functional import knn_graph

__all__ = ["KNNGraph", "SegmentedKNNGraph", "RadiusGraph"]


class KNNGraph:
    """(reference ``factory.py:16``)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x, algorithm="bruteforce", dist="euclidean"):
        import jax.numpy as jnp

        x = jnp.asarray(x)
        if x.ndim == 3:
            # batched point sets -> disjoint union with batch offsets
            from ..batch import batch as batch_graphs

            return batch_graphs(
                [knn_graph(x[i], self.k, dist=dist) for i in range(x.shape[0])]
            )
        return knn_graph(x, self.k, dist=dist)


class SegmentedKNNGraph:
    """kNN within segments of a point set (reference ``factory.py:109``)."""

    def __init__(self, k: int):
        self.k = k

    def __call__(self, x, segs, dist="euclidean"):
        from ..batch import batch as batch_graphs

        import jax.numpy as jnp

        x = jnp.asarray(x)
        offs = np.concatenate([[0], np.cumsum(np.asarray(segs))])
        graphs = [
            knn_graph(x[offs[i] : offs[i + 1]], self.k, dist=dist)
            for i in range(len(segs))
        ]
        return batch_graphs(graphs)


class RadiusGraph:
    """Edges between points within distance r (reference ``factory.py:198``)."""

    def __init__(self, r: float, p: float = 2.0, self_loop: bool = False):
        self.r = r
        self.p = p
        self.self_loop = self_loop

    def __call__(self, x, get_distances: bool = False):
        from .. import convert

        import jax.numpy as jnp

        x = np.asarray(x)
        n = x.shape[0]
        if self.p == 2:
            d = np.sqrt(((x[:, None, :] - x[None, :, :]) ** 2).sum(-1))
        else:
            d = np.abs(x[:, None, :] - x[None, :, :]).sum(-1)
        mask = d <= self.r
        if not self.self_loop:
            np.fill_diagonal(mask, False)
        src, dst = np.nonzero(mask)
        g = convert.graph((src, dst), num_nodes=n)
        if get_distances:
            return g, jnp.asarray(d[src, dst][:, None])
        return g
