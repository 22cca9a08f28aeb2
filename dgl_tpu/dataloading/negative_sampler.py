"""Negative samplers for edge prediction (reference
``python/dgl/dataloading/negative_sampler.py``)."""
from __future__ import annotations

import numpy as np

__all__ = ["Uniform", "GlobalUniform", "PerSourceUniform"]


class _BaseNegativeSampler:
    def __call__(self, g, eids):
        return self._generate(g, np.asarray(eids))


class Uniform(_BaseNegativeSampler):
    """Per-edge k negatives: corrupt dst uniformly (reference
    ``negative_sampler.py`` ``Uniform``)."""

    def __init__(self, k: int, seed=None):
        self.k = k
        self._rng = np.random.default_rng(seed)

    def _generate(self, g, eids):
        rel = g._relation(None)
        src = np.asarray(rel.src)[eids]
        src = np.repeat(src, self.k)
        dst = self._rng.integers(0, g.num_nodes(), src.shape[0])
        return src, dst


PerSourceUniform = Uniform


class GlobalUniform(_BaseNegativeSampler):
    """Globally uniform non-edges with rejection (reference
    ``negative_sampler.py`` ``GlobalUniform``)."""

    def __init__(self, k: int, exclude_self_loops=True, replace=False,
                 redundancy=1.3, seed=None):
        self.k = k
        self.exclude_self_loops = exclude_self_loops
        self.replace = replace
        self.redundancy = redundancy
        self._seed = seed

    def _generate(self, g, eids):
        from ..sampling import global_uniform_negative_sampling

        return global_uniform_negative_sampling(
            g, self.k * eids.shape[0],
            exclude_self_loops=self.exclude_self_loops,
            replace=self.replace, redundancy=self.redundancy,
            seed=self._seed,
        )
