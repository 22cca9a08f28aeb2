"""Pallas shell-prefix accumulation: kill the prefix-accumulator stream.

`probe_r4e` decomposed the arxiv-scale headline SpMM's cold tail
(3.72 ms) into a 1.87 ms raw-gather floor plus ~1.85 ms of
prefix-accumulator traffic: ``shell_spmm.prefix_reduce`` re-reads and
re-writes the running f32 accumulator once per shell level
(``sum_k m_k`` rows), because each XLA combine is its own HBM-roundtrip
kernel.

This module replaces that accumulation with ONE Pallas kernel that holds
each output block in VMEM across its shell-level revisits:

  - the shell gathers become ONE flat ``jnp.take`` producing a
    level-concatenated piece stream (each level padded to a multiple of
    the block height with out-of-bounds indices -> exact zero rows via
    ``mode="fill"``);
  - a scalar-prefetched flat grid walks (out_block, level) pairs,
    out-block-major, so Pallas keeps the f32 accumulator block resident
    in VMEM while the bf16 piece blocks stream through double-buffered;
  - pieces are read once, the output is written once. Traffic drops from
    ``E*(2 + 8)`` to ``E*2`` bytes/feature on the accumulation side.

The layout work (which piece block feeds which output block) depends
only on the STATIC level sizes, so the grid vectors are trace-time
constants — no plan-structure changes, callers opt in per call.

Reference counterpart: the blocked CPU SpMM of
``src/array/cpu/spmm_blocking_libxsmm.h`` (same idea — keep the output
panel hot while streaming edge blocks); redesigned here around the TPU
VMEM/BlockSpec pipeline instead of cache blocking.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["shell_prefix_sum_pallas", "pallas_shell_ok"]

# CI hook (tests/test_shell_pallas.py): force the kernel through the
# interpreter on CPU so the kernel itself is regression-locked.
_FORCE_PALLAS_INTERPRET = False

_BR = 512   # accumulator block rows (f32 sublane multiple; big blocks
#             amortize per-grid-step overhead — measured round 1 that
#             ~2.3k tiny steps cost ~ms; 1024 re-measured on-chip round
#             5: 3.95 vs 3.89 ms — no win, padding waste cancels the
#             step-count saving, keep 512)
_FC_MAX = 512  # feature columns per block (VMEM budget)


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


def pallas_shell_ok(feat_cols: int, n_out: int | None = None) -> bool:
    """The kernel wants lane-aligned features and enough output rows to
    fill its blocks; other shapes keep the XLA prefix_reduce path."""
    if _FORCE_PALLAS_INTERPRET:
        return feat_cols % 128 == 0
    return feat_cols % 128 == 0 and (n_out is None or n_out >= 2048)


def _grid_vectors(level_rows, n_out_blocks, block_rows):
    """Flat (out_block, level) walk, out-block-major.

    ``level_rows``: real row count of each level (non-increasing).
    Returns (out_blk, piece_blk, first, piece_rows) with ``piece_rows``
    the total rows of the BR-padded piece stream (+1 trailing zero block
    that uncovered output blocks read so every block is initialized).
    """
    nb = [int(-(-m // block_rows)) for m in level_rows]
    starts = np.concatenate(([0], np.cumsum(nb))).astype(np.int64)
    zero_blk = int(starts[-1])  # one trailing all-OOB block
    out_blk, piece_blk, first = [], [], []
    for i in range(n_out_blocks):
        fst = True
        for k, nbk in enumerate(nb):
            if i < nbk:
                out_blk.append(i)
                piece_blk.append(int(starts[k]) + i)
                first.append(1 if fst else 0)
                fst = False
        if fst:
            out_blk.append(i)
            piece_blk.append(zero_blk)
            first.append(1)
    return (np.asarray(out_blk, np.int32),
            np.asarray(piece_blk, np.int32),
            np.asarray(first, np.int32),
            (zero_blk + 1) * block_rows)


def _flat_indices(shell_indices, level_rows, piece_rows, block_rows,
                  oob_index):
    """Concatenate per-level gather indices, padding each level to a
    multiple of ``block_rows`` with ``oob_index`` (gathers exact zeros
    under ``jnp.take(mode='fill')``)."""
    segs = []
    for idx, m in zip(shell_indices, level_rows):
        pad = _rup(m, block_rows) - idx.shape[0]
        segs.append(idx if pad == 0 else jnp.pad(
            idx, (0, pad), constant_values=oob_index))
    total = sum(s.shape[0] for s in segs)
    if piece_rows > total:  # trailing zero block
        segs.append(jnp.full(piece_rows - total, oob_index, jnp.int32))
    return jnp.concatenate(segs) if len(segs) > 1 else segs[0]


def shell_prefix_sum_pallas(pieces_flat, level_rows, n_out, base=None,
                            block_rows=_BR):
    """``out[r] = base[r] + sum_k pieces_k[r]`` over nested-prefix levels.

    ``pieces_flat``: (P, F) level-concatenated piece stream, each level
    padded to a ``block_rows`` multiple (zero rows in padded slots) —
    build the matching gather indices with :func:`flat_shell_indices`.
    ``level_rows``: static real row count per level. ``base``: optional
    (>= n_out, F) f32 (the beyond-cap residual reduction). Returns
    (n_out_padded, F) f32 where n_out_padded = rup(n_out, block_rows).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    F = pieces_flat.shape[1]
    n8b = _rup(n_out, block_rows)
    ob, pb, fst, piece_rows = _grid_vectors(level_rows,
                                            n8b // block_rows, block_rows)
    assert pieces_flat.shape[0] == piece_rows, (
        pieces_flat.shape, piece_rows)
    G = ob.shape[0]
    FC = F if F <= _FC_MAX else (512 if F % 512 == 0 else
                                 (256 if F % 256 == 0 else 128))
    nf = F // FC
    ob, pb, fst = jnp.asarray(ob), jnp.asarray(pb), jnp.asarray(fst)

    if base is not None:
        if base.shape[0] < n8b:
            base = jnp.pad(base, ((0, n8b - base.shape[0]), (0, 0)))
        base = base.astype(jnp.float32)

        def kernel(ob_r, pb_r, fst_r, p_ref, b_ref, o_ref):
            g = pl.program_id(1)

            @pl.when(fst_r[g] == 1)
            def _():
                o_ref[:] = b_ref[:] + p_ref[:].astype(jnp.float32)

            @pl.when(fst_r[g] == 0)
            def _():
                o_ref[:] += p_ref[:].astype(jnp.float32)

        in_specs = [
            pl.BlockSpec((block_rows, FC),
                         lambda f, g, ob_r, pb_r, fst_r: (pb_r[g], f)),
            pl.BlockSpec((block_rows, FC),
                         lambda f, g, ob_r, pb_r, fst_r: (ob_r[g], f)),
        ]
        operands = (ob, pb, fst, pieces_flat, base)
    else:
        def kernel(ob_r, pb_r, fst_r, p_ref, o_ref):
            g = pl.program_id(1)

            @pl.when(fst_r[g] == 1)
            def _():
                o_ref[:] = p_ref[:].astype(jnp.float32)

            @pl.when(fst_r[g] == 0)
            def _():
                o_ref[:] += p_ref[:].astype(jnp.float32)

        in_specs = [
            pl.BlockSpec((block_rows, FC),
                         lambda f, g, ob_r, pb_r, fst_r: (pb_r[g], f)),
        ]
        operands = (ob, pb, fst, pieces_flat)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nf, G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (block_rows, FC),
            lambda f, g, ob_r, pb_r, fst_r: (ob_r[g], f)),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8b, F), jnp.float32),
        interpret=_FORCE_PALLAS_INTERPRET,
    )(*operands)


def flat_shell_indices(shell_indices, n_out, oob_index,
                       block_rows=_BR):
    """Gather-index companion of :func:`shell_prefix_sum_pallas`: the
    level-concatenated, block-padded index vector plus the static level
    row counts. ``shell_indices``: per-level (n_k8,) index arrays
    (non-increasing sizes, padded slots already ``oob_index``)."""
    level_rows = [int(idx.shape[0]) for idx in shell_indices]
    n8b = _rup(n_out, block_rows)
    _, _, _, piece_rows = _grid_vectors(level_rows, n8b // block_rows,
                                        block_rows)
    flat = _flat_indices(shell_indices, level_rows, piece_rows,
                         block_rows, oob_index)
    return flat, level_rows


def use_pallas_shells() -> bool:
    """Kernel path gate: on by default on TPU; tests force interpret."""
    import os

    if _FORCE_PALLAS_INTERPRET:
        return True
    if os.environ.get("DGL_TPU_NO_PALLAS_SHELLS") == "1":
        return False
    return jax.default_backend() == "tpu"
