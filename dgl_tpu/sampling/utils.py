"""Sampling helpers (reference ``python/dgl/sampling/utils.py``)."""
from __future__ import annotations

from typing import Mapping

import numpy as np

from ..base import EID
from ..graph import Graph

__all__ = ["EidExcluder"]


class EidExcluder:
    """Removes edges whose PARENT edge IDs appear in ``exclude_eids`` from a
    sampled frontier (reference ``python/dgl/sampling/utils.py:26``; used by
    the edge-prediction dataloaders to drop target/reverse edges).

    The frontier must carry parent IDs in ``edata[EID]`` (as produced by
    ``sample_neighbors(store_ids=True)``); the parent IDs of surviving edges
    are preserved.
    """

    def __init__(self, exclude_eids):
        if isinstance(exclude_eids, Mapping):
            self._exclude = {
                k: np.asarray(v).astype(np.int64)
                for k, v in exclude_eids.items()
            }
        else:
            self._exclude = np.asarray(exclude_eids).astype(np.int64)

    def _excl_for(self, g: Graph, cet):
        if isinstance(self._exclude, dict):
            for k, v in self._exclude.items():
                if g.to_canonical_etype(k) == cet:
                    return v
            return None
        return self._exclude

    def __call__(self, frontier: Graph) -> Graph:
        from ..transforms.functional import remove_edges

        for cet in frontier.canonical_etypes:
            excl = self._excl_for(frontier, cet)
            if excl is None or excl.size == 0:
                continue
            parent = frontier._edge_frames.get(cet, {}).get(EID)
            if parent is None:
                raise ValueError(
                    "frontier has no edata[EID]; sample with store_ids"
                )
            located = np.nonzero(np.isin(np.asarray(parent), excl))[0]
            if located.size:
                etype = cet if len(frontier.canonical_etypes) > 1 else None
                # store_ids=False: the gathered parent EID column survives
                frontier = remove_edges(frontier, located, etype)
        return frontier
