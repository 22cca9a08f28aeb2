"""MiniBatch (reference ``python/dgl/graphbolt/minibatch.py:26``): the
unified record flowing through the pipeline."""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional

__all__ = ["MiniBatch"]


@dataclass
class MiniBatch:
    seeds: Any = None                 # seed node ids (or (src, dst) pairs)
    labels: Any = None
    indexes: Any = None
    input_nodes: Any = None           # ids whose features must be fetched
    blocks: Optional[List] = None     # MFG blocks (outermost first)
    sampled_subgraphs: Optional[List] = None  # SampledSubgraphImpl per layer
    node_features: Dict[str, Any] = field(default_factory=dict)
    edge_features: List[Dict[str, Any]] = field(default_factory=list)
    negative_srcs: Any = None
    negative_dsts: Any = None
    timestamp: Any = None             # per-seed timestamps (temporal sampling)

    def num_seeds(self):
        return None if self.seeds is None else len(self.seeds)

    def __repr__(self):
        parts = []
        for k in ("seeds", "labels", "input_nodes"):
            v = getattr(self, k)
            if v is not None:
                parts.append(f"{k}={getattr(v, 'shape', len(v))}")
        if self.blocks:
            parts.append(f"blocks={len(self.blocks)}")
        if self.node_features:
            parts.append(f"node_features={list(self.node_features)}")
        return f"MiniBatch({', '.join(parts)})"
