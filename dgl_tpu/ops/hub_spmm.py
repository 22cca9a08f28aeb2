"""Dense-hub g-SpMM: MXU-matmul aggregation for high-degree sources.

TPU-first redesign of the fused SpMM kernels at reference
``src/array/cpu/spmm.h:47`` / ``src/array/cuda/spmm.cuh:30``. On TPU the
bottleneck of ``copy_u_sum`` is the per-edge HBM gather ``x[csc_indices]``
(~15 ns/row, issue-rate bound and insensitive to index locality — measured on
v5e, see ROADMAP.md). Rather than fight the gather, this module removes it for
the edges that dominate power-law graphs:

  Split sources into *hubs* (top-H by out-degree) and the cold tail. Hub edges
  are aggregated as ONE dense matmul on the MXU::

      out_hub = A_hub @ x[hub_ids]          # (N_dst, H) @ (H, F)

  where ``A_hub[d, h]`` counts edges ``hub_ids[h] -> d``. Density of a graph's
  hub columns is what makes this pay: streaming the (N_dst, H) bf16 count
  matrix costs ``N_dst*H*2`` bytes regardless of how many edges it encodes,
  so for sources with out-degree >> H*2/F/4 the matmul is strictly cheaper
  than gathering their edges row-by-row. Cold edges keep the sorted-segment
  path of :mod:`dgl_tpu.ops.spmm`.

The backward pass is the same decomposition transposed (``A_hub.T @ dz`` plus
the reverse cold segment-sum), mirroring the hand-derived rules of the
reference's ``GSpMM`` autograd (``python/dgl/backend/pytorch/sparse.py:162``).

Precision: ``"int8"`` (default for :func:`build_hub_plan` callers that pass
it) stores ``A_hub`` as int8 counts — HALF the HBM stream of bf16, which is
what bounds the matmul — converted to bfloat16 on the fly for the MXU (XLA
fuses the convert into the dot's operand read; small-integer counts are exact
in bf16, so accuracy equals ``"bf16"``). Falls back to bf16 storage if any
edge multiplicity exceeds 127. ``"bf16"`` stores A_hub in bfloat16.
``"f32"`` keeps everything float32 (exact, ~2-3x the matmul cost).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError

__all__ = ["HubSpMMPlan", "build_hub_plan", "hub_copy_u_sum"]

_LANE = 128  # MXU lane width: pad H to a multiple


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


class HubSpMMPlan:
    """Precomputed hub/cold split for one relation (pytree).

    Children: ``hub_ids (H,)``, ``a_hub (N_dst, H)``, cold edges in CSC order
    (``cold_src``, ``cold_dst`` — dst-sorted, padded with ``num_dst``) and in
    CSR order for the backward pass (``rev_src`` sorted, ``rev_dst``, padded
    with ``num_src``). Static aux: sizes, coverage, precision.

    ``cold='shell'`` adds the shell-decomposition arrays (``shells``,
    ``unrank_dst``, ``rev_shells``, ``unrank_src`` — see
    :func:`_build_shells`): the measured bottleneck of the sorted-segment
    cold path on TPU v5e is the segment-sum itself (~14 ns/edge; the bf16
    gather is ~8 ns/edge), and shells eliminate it entirely.
    """

    ARRAY_FIELDS = (
        "hub_ids",
        "a_hub",
        "cold_src",
        "cold_dst",
        "rev_src",
        "rev_dst",
        "shells",
        "res_dst",
        "unrank_dst",
        "rev_shells",
        "res_src",
        "unrank_src",
    )

    def __init__(
        self,
        hub_ids,
        a_hub,
        cold_src,
        cold_dst,
        rev_src,
        rev_dst,
        shells=(),
        res_dst=None,
        unrank_dst=None,
        rev_shells=(),
        res_src=None,
        unrank_src=None,
        *,
        num_src: int,
        num_dst: int,
        num_hubs: int,
        coverage: float,
        precision: str,
        cold: str = "f32",
    ):
        self.hub_ids = hub_ids
        self.a_hub = a_hub
        self.cold_src = cold_src
        self.cold_dst = cold_dst
        self.rev_src = rev_src
        self.rev_dst = rev_dst
        self.shells = shells
        self.res_dst = res_dst
        self.unrank_dst = unrank_dst
        self.rev_shells = rev_shells
        self.res_src = res_src
        self.unrank_src = unrank_src
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self.num_hubs = int(num_hubs)
        self.coverage = float(coverage)
        self.precision = str(precision)
        self.cold = str(cold)

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self.ARRAY_FIELDS)
        aux = (
            self.num_src,
            self.num_dst,
            self.num_hubs,
            self.coverage,
            self.precision,
            self.cold,
        )
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, c in zip(cls.ARRAY_FIELDS, children):
            setattr(obj, f, c)
        (
            obj.num_src,
            obj.num_dst,
            obj.num_hubs,
            obj.coverage,
            obj.precision,
            obj.cold,
        ) = aux
        return obj

    def __repr__(self):
        return (
            f"HubSpMMPlan(H={self.num_hubs}, coverage={self.coverage:.3f}, "
            f"precision={self.precision}, cold={self.cold})"
        )


jax.tree_util.register_pytree_node(
    HubSpMMPlan,
    lambda p: p.tree_flatten(),
    HubSpMMPlan.tree_unflatten,
)


def _build_shells(e_from: np.ndarray, e_to: np.ndarray, n_to: int,
                  n_from=None):
    """Shell decomposition of one edge direction (host-side).

    Relabel the ``e_to`` side by descending degree; then the nodes with
    degree >= k form the PREFIX [0, N_k) of the rank order, so "the k-th
    incident edge of every node" becomes one flat gather added to a prefix
    slice — no scatter, no segment-sum for levels under the cap. Measured
    on v5e: XLA's sorted segment-sum costs ~14 ns/edge (the scatter
    lowering) while a row gather costs ~8 ns/edge.

    Delegates to :func:`dgl_tpu.ops.shell_spmm._build_dir` (the capped
    single-pass builder — one shell per level would explode on power-law
    degree tails); levels beyond the cap come back as a residual
    ``(idx, rank_pos)`` pair reduced with one sorted segment-sum.

    Returns (shells, residual, unrank) with shells a tuple of
    (idx_k, mask_k).
    """
    from .shell_spmm import _build_dir

    shells3, res3, unrank, _rank = _build_dir(
        e_from, e_to, np.zeros_like(e_from), n_to, n_from=n_from
    )
    shells = tuple((nidx, mask) for nidx, _eidx, mask in shells3)
    # blocked residual: (idx, pos_full, block_pos, mask) — see
    # shell_spmm.residual_reduce
    res = (None if res3 is None
           else (res3[0], res3[2], res3[3], res3[4]))
    return shells, res, unrank


def build_hub_plan(rel, num_hubs: int = 2048, precision: str = "bf16",
                   cold: str | None = None, hub_ids_override=None):
    """Build a :class:`HubSpMMPlan` for a relation (host-side, once per graph).

    ``A_hub`` is constructed ON DEVICE with a scalar scatter-add from small
    index transfers — the dense (N_dst, H) matrix never crosses the host link
    (single transfers over ~200 MB can wedge the remote runtime).
    """
    if precision not in ("int8", "bf16", "f32"):
        raise DGLError(
            f"hub plan precision must be int8|bf16|f32, got {precision}"
        )
    if cold is None:
        cold = "f32" if precision == "f32" else "shell"
    if cold not in ("shell", "shell-f32", "bf16", "f32"):
        raise DGLError(
            f"hub plan cold must be shell|shell-f32|bf16|f32, got {cold}"
        )
    src_csc = np.asarray(rel.csc_indices)
    dst_csc = np.asarray(rel.csc_dst)
    n_src, n_dst = rel.num_src, rel.num_dst
    real = (dst_csc < n_dst) & (src_csc < n_src)
    deg = np.bincount(src_csc[real], minlength=n_src)
    H = _rup(min(num_hubs, n_src), _LANE)
    n_top = min(num_hubs, n_src)
    if hub_ids_override is not None:
        # pinned hub set (transforms.reorder_for_spmm: keep the hub set
        # stable across the rank relabel so the rebuilt ranking is the
        # identity and the unrank gather is elided)
        top = np.asarray(hub_ids_override, np.int64)[:n_top]
    else:
        top = np.argsort(-deg, kind="stable")[:n_top]
    hub_ids = np.zeros(H, np.int32)
    hub_ids[:n_top] = top
    # +1 slot: padding edges carry src == n_src
    slot_of = np.full(n_src + 1, -1, np.int32)
    slot_of[top] = np.arange(n_top, dtype=np.int32)
    slots = np.where(real, slot_of[np.minimum(src_csc, n_src)], np.int32(-1))

    is_hub = slots >= 0
    hub_pos = np.nonzero(is_hub)[0]
    cold_mask = real & ~is_hub
    cold_idx = np.nonzero(cold_mask)[0]
    Ec = _rup(cold_idx.shape[0], 8) if cold_idx.size else 8
    cold_src = np.zeros(Ec, np.int32)
    cold_dst = np.full(Ec, n_dst, np.int32)
    cold_src[: cold_idx.shape[0]] = src_csc[cold_idx]
    cold_dst[: cold_idx.shape[0]] = dst_csc[cold_idx]
    # backward: the same cold edges grouped by source (sorted -> sorted
    # segment sum over num_src in the VJP)
    order = np.argsort(cold_src[: cold_idx.shape[0]], kind="stable")
    rev_src = np.full(Ec, n_src, np.int32)
    rev_dst = np.zeros(Ec, np.int32)
    rev_src[: cold_idx.shape[0]] = cold_src[order]
    rev_dst[: cold_idx.shape[0]] = cold_dst[order]

    if precision == "int8" and hub_pos.size:
        # int8 storage is only exact up to multiplicity 127; check the max
        # edge multiplicity per (dst, hub) cell on the host (cheap: E ints)
        pair = dst_csc[hub_pos].astype(np.int64) * H + slots[hub_pos]
        if np.unique(pair, return_counts=True)[1].max() > 127:
            precision = "bf16"
    if precision == "int8":
        dtype = jnp.int8
    elif precision == "bf16":
        dtype = jnp.bfloat16
    else:
        dtype = jnp.float32
    dst_h = jnp.asarray(dst_csc[hub_pos].astype(np.int32))
    slot_h = jnp.asarray(slots[hub_pos])
    a_hub = (
        jnp.zeros((n_dst, H), dtype).at[dst_h, slot_h].add(jnp.asarray(1, dtype))
    )
    n_real = max(int(real.sum()), 1)
    if cold in ("shell", "shell-f32"):
        cs = src_csc[cold_idx]
        cd = dst_csc[cold_idx]
        # n_from: padded slots point at the consumer's appended zero row
        # (one past the table) — no mask select in _shell_sum
        shells, res_dst, unrank_dst = _build_shells(cs, cd, n_dst,
                                                    n_from=n_src)
        rev_shells, res_src, unrank_src = _build_shells(cd, cs, n_src,
                                                        n_from=n_dst)
    else:
        shells, res_dst, unrank_dst = (), None, None
        rev_shells, res_src, unrank_src = (), None, None
    return HubSpMMPlan(
        hub_ids=jnp.asarray(hub_ids),
        a_hub=a_hub,
        cold_src=jnp.asarray(cold_src),
        cold_dst=jnp.asarray(cold_dst),
        rev_src=jnp.asarray(rev_src),
        rev_dst=jnp.asarray(rev_dst),
        shells=shells,
        res_dst=res_dst,
        unrank_dst=unrank_dst,
        rev_shells=rev_shells,
        res_src=res_src,
        unrank_src=unrank_src,
        num_src=n_src,
        num_dst=n_dst,
        num_hubs=H,
        coverage=float(is_hub.sum() / n_real),
        precision=precision,
        cold=cold,
    )


def _mm(a, b, precision):
    if precision in ("int8", "bf16"):
        # int8-stored counts convert to bf16 on the fly (fused by XLA into
        # the dot's operand read — halves the A_hub HBM stream)
        return jnp.dot(
            a.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _cold_gather(x, idx, cold):
    """Gather rows for the cold segment sum. ``cold='bf16'`` converts the
    table to bfloat16 first — the gather is what dominates the cold tail, and
    halving its bytes measured 2.74x vs the 2.30x f32 path on v5e
    (benchmarks/probe_r2c.py); rows convert back to f32 inside the same XLA
    fusion so the accumulate stays exact."""
    if cold == "bf16":
        return x.astype(jnp.bfloat16)[idx].astype(jnp.float32)
    return x[idx]


def _shell_sum(x, shells, residual, unrank, n_out, cold):
    """``out[v] = sum_{k} x[idx_k[unrank[v]]]`` — the shell accumulation.

    Each shell is one flat row gather added to a prefix slice of the
    rank-ordered accumulator (no scatter/segment-sum; see
    :func:`_build_shells`); beyond-cap edges reduce with one sorted
    segment-sum keyed by rank position; a single final gather restores
    standard order.
    """
    from .shell_spmm import prefix_reduce

    # Padded shell slots carry an OOB index (one past the table, set at
    # plan build): mode="fill" zeroes them inside the gather op itself.
    # Alternatives measured on the v5e headline: zero-row-padded table
    # 5.47 ms (the full-table concat costs more than it saves), explicit
    # where(mask) select 5.21 ms, take-fill shipping default.
    from .shell_spmm import residual_reduce

    xg = x.astype(jnp.bfloat16) if cold == "shell" else x
    n8 = _rup(n_out, 8)
    base = None
    if residual is not None and int(residual[1].shape[0]) > 0:
        r_idx, _pos, _bpos, r_mask = residual
        rows = xg[r_idx].astype(jnp.float32) * r_mask
        base = residual_reduce(rows, (None, None, _pos, _bpos, r_mask),
                               n8, "sum")
    # pieces stay in the gather dtype (bf16): converting to f32 first
    # only doubled the piece-stream traffic (probe_r4e: cold 3.72 ms vs
    # a 1.87 ms raw-gather floor); prefix_reduce accumulates in f32
    from .shell_pallas import (flat_shell_indices, pallas_shell_ok,
                               shell_prefix_sum_pallas, use_pallas_shells)

    if (shells and use_pallas_shells()
            and pallas_shell_ok(int(x.shape[1]), n_out)):
        # Pallas accumulation (round-5): one flat gather feeds a kernel
        # that keeps each output block in VMEM across its level visits —
        # pieces read once, output written once (the XLA prefix_reduce
        # streams the running accumulator once per level, ~1.85 ms of
        # the arxiv headline's 3.72 ms cold tail, probe_r4e)
        flat_idx, level_rows = flat_shell_indices(
            [idx for idx, _mask in shells], n_out,
            oob_index=int(xg.shape[0]))
        pieces_flat = jnp.take(xg, flat_idx, axis=0, mode="fill",
                               fill_value=0)
        acc = shell_prefix_sum_pallas(pieces_flat, level_rows, n_out,
                                      base=base)
    else:
        pieces = [jnp.take(xg, idx, axis=0, mode="fill", fill_value=0)
                  for idx, _mask in shells]
        acc = prefix_reduce(pieces, n8, kind="sum", base=base)
    if acc is None:
        acc = jnp.zeros((n8, x.shape[1]), jnp.float32)
    return acc[:n_out] if unrank is None else acc[unrank]


@jax.custom_vjp
def _hub_copy_u_sum2d(plan: HubSpMMPlan, x):
    """copy_u + sum for 2-D x via the dense-hub decomposition."""
    out_hub = _mm(plan.a_hub, x[plan.hub_ids], plan.precision)
    if plan.cold in ("shell", "shell-f32"):
        out_cold = _shell_sum(
            x, plan.shells, plan.res_dst, plan.unrank_dst, plan.num_dst,
            plan.cold,
        )
    else:
        out_cold = jax.ops.segment_sum(
            _cold_gather(x, plan.cold_src, plan.cold),
            plan.cold_dst,
            num_segments=plan.num_dst,
            indices_are_sorted=True,
        )
    return (out_hub + out_cold).astype(x.dtype)


def _fwd(plan, x):
    return _hub_copy_u_sum2d(plan, x), plan


def _bwd(plan, dz):
    # hub rows: dX[hub] = A_hub^T @ dz (dense, MXU); cold rows via the
    # reverse shell accumulation (or the reverse sorted segment sum for the
    # legacy modes). Hub and cold sources are disjoint by construction, so
    # scatter-add composes exactly.
    d_hub = _mm(plan.a_hub.T, dz, plan.precision)
    if plan.cold in ("shell", "shell-f32"):
        dx = _shell_sum(
            dz, plan.rev_shells, plan.res_src, plan.unrank_src,
            plan.num_src, plan.cold,
        )
    else:
        dx = jax.ops.segment_sum(
            _cold_gather(dz, plan.rev_dst, plan.cold),
            plan.rev_src,
            num_segments=plan.num_src,
            indices_are_sorted=True,
        )
    dx = dx.at[plan.hub_ids].add(d_hub)
    return (None, dx.astype(dz.dtype))


_hub_copy_u_sum2d.defvjp(_fwd, _bwd)


def hub_copy_u_sum(plan: HubSpMMPlan, x):
    """``out[d] = sum_{(s->d) in E} x[s]`` using the plan's hub/cold split.

    Matches ``ops.copy_u_sum`` (exactly for ``precision='f32'``; to ~1e-3
    relative for ``'bf16'``). Accepts any feature rank >= 1 (flattened for
    the matmul).
    """
    shape = x.shape
    if x.ndim == 1:
        x2 = x[:, None]
    elif x.ndim == 2:
        x2 = x
    else:
        x2 = x.reshape(shape[0], -1)
    out = _hub_copy_u_sum2d(plan, x2)
    return out.reshape((plan.num_dst,) + shape[1:])
