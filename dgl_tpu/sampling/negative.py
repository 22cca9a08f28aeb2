"""Negative sampling (reference ``python/dgl/sampling/negative.py:39``,
CUDA ``src/array/cuda/negative_sampling.cu``): uniform global negatives
with rejection of existing edges."""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..graph import Graph

__all__ = ["global_uniform_negative_sampling"]


def global_uniform_negative_sampling(
    g: Graph,
    num_samples: int,
    exclude_self_loops: bool = True,
    replace: bool = False,
    etype=None,
    redundancy: float = 1.3,
    seed: Optional[int] = None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Sample (src, dst) pairs that are NOT edges (reference
    ``negative.py:39``). May return fewer than requested, like the
    reference, if the graph is dense."""
    rng = np.random.default_rng(seed)
    cet = g.to_canonical_etype(etype)
    rel = g._relations[cet]
    ns, nd = rel.num_src, rel.num_dst
    src = np.asarray(rel.src)[: rel.num_edges].astype(np.int64)
    dst = np.asarray(rel.dst)[: rel.num_edges].astype(np.int64)
    existing = set(zip(src.tolist(), dst.tolist()))
    out_s, out_d = [], []
    seen = set()
    tries = 0
    want = num_samples
    while len(out_s) < num_samples and tries < 10:
        k = int(want * redundancy) + 1
        cs = rng.integers(0, ns, k)
        cd = rng.integers(0, nd, k)
        for a, b in zip(cs.tolist(), cd.tolist()):
            if len(out_s) >= num_samples:
                break
            if exclude_self_loops and a == b:
                continue
            if (a, b) in existing:
                continue
            if not replace:
                if (a, b) in seen:
                    continue
                seen.add((a, b))
            out_s.append(a)
            out_d.append(b)
        tries += 1
        want = num_samples - len(out_s)
    return (
        np.array(out_s, dtype=np.int64),
        np.array(out_d, dtype=np.int64),
    )
