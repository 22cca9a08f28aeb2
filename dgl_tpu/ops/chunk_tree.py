"""Padded chunk-tree segmented reduction (TPU-native segment_sum).

The reference reduces sorted edge runs with per-row CPU loops / CUDA
scatters (``src/array/cpu/segment_reduce.h``, ``segment_reduce.cu``). On
TPU, XLA lowers a sorted ``segment_sum`` to a scatter at ~14 ns/edge
(measured v5e, docs/performance.md) — 5x the row-gather floor. The shell
decomposition (``ops/shell_spmm.py``) avoids it for the first SHELL_CAP
in-edges of every node, but dense graphs (Reddit-class, avg degree ~500)
push nearly every edge past the cap into the residual scatter.

This module removes the scatter for ANY degree profile:

  pad each segment's sorted run to a multiple of W  ->  gather rows
  (out-of-bounds slots fill 0)  ->  reshape (M/W, W, F), sum axis=1 (a
  contiguous, full-bandwidth reduction)  ->  recurse on the per-chunk
  sums until every segment is a single row.

Per-edge cost beyond the mandatory level-0 row gather: the level-k
gathers issue M/W^k rows (a ~2.9/W ns/edge geometric series) plus one
streaming pass over the gathered rows. Padding waste is bounded by
n_out * W rows at level 0 and shrinks W-fold per level. The reduction is
a balanced tree, so f32 summation error is O(log E) — tighter than the
sequential scatter.

Output lands in natural segment order: no rank relabel, no unrank gather
(both required by the shell path).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


def build_tree_levels(
    seg_counts: np.ndarray,
    W: int = 16,
    level0_values: np.ndarray | None = None,
    level0_oob: int | None = None,
) -> Tuple[Tuple[np.ndarray, ...], int]:
    """Host build: per-level gather index arrays for a chunk tree.

    ``seg_counts``: (n_out,) run length of each segment (data sorted by
    segment id). Level-0 slots index into the data array unless
    ``level0_values`` is given, in which case slot values are composed
    through it (e.g. the cold-edge source ids, fusing the tree's level-0
    gather with the SpMM's feature-table gather). Out-of-bounds slots get
    ``len(data)`` (or ``level0_oob``) so ``jnp.take(mode='fill')`` zeroes
    them inside the gather op.

    Returns (levels, W); each level is an int32 array whose length is a
    multiple of W.
    """
    n_out = seg_counts.shape[0]
    levels = []
    cur = seg_counts.astype(np.int64)
    cur_len = int(cur.sum())
    first = True
    while True:
        padded = np.maximum(-(-cur // W), 1) * W
        m = int(padded.sum())
        start = np.concatenate(([0], np.cumsum(cur)))[:-1]
        pstart = np.concatenate(([0], np.cumsum(padded)))[:-1]
        oob = cur_len if not (first and level0_oob is not None) else level0_oob
        idx = np.full(m, oob, np.int32)
        seg_of = np.repeat(np.arange(n_out, dtype=np.int64), cur)
        off = np.arange(cur_len, dtype=np.int64) - start[seg_of]
        vals = np.arange(cur_len, dtype=np.int32)
        if first and level0_values is not None:
            vals = level0_values.astype(np.int32)
        idx[pstart[seg_of] + off] = vals
        levels.append(idx)
        cur = padded // W
        cur_len = m // W
        first = False
        if int(cur.max() if cur.size else 0) <= 1:
            break
    return tuple(levels), W


def tree_segment_sum(
    levels: Sequence[jnp.ndarray], W: int, rows: jnp.ndarray, n_out: int
) -> jnp.ndarray:
    """Reduce ``rows`` (level-0 table; level-0 indices may point into it
    directly or via a fused composition — see ``build_tree_levels``) to
    (n_out, F) segment sums."""
    x = rows
    for k, idx in enumerate(levels):
        g = jnp.take(x, idx, axis=0, mode="fill", fill_value=0)
        if k == 0 and g.dtype != jnp.float32:
            # bf16 table gathers accumulate in f32 (hub cold convention)
            g = g.astype(jnp.float32)
        x = g.reshape(-1, W, *x.shape[1:]).sum(axis=1)
    return x[:n_out]
