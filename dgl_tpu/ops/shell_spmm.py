"""Shell-decomposition g-SpMM for WEIGHTED message ops (u_mul_e_sum etc.).

The dense-hub fast path (:mod:`dgl_tpu.ops.hub_spmm`) only covers
``copy_u + sum`` — runtime edge weights cannot be folded into the
precomputed ``A_hub`` counts. This module generalizes the shell
decomposition measured there (on TPU v5e the sorted segment-sum's scatter
lowering costs ~14 ns/edge while row gathers cost ~8 ns/edge) to every
binary op of the g-SpMM family with the sum/mean reducer:

  Rank destinations by in-degree (host, once per graph). The dsts with
  >= k in-edges form a contiguous prefix of the rank order, so "the k-th
  in-edge of every dst" becomes flat gathers of the source row and the
  edge value added into a prefix slice — zero scatters/segment-sums.
  One final unrank gather restores standard order. The VJP for dU runs
  the same structure transposed (sources ranked by out-degree); dE is
  pure gathers as in the classic path.

Reference counterpart: the fused weighted SpMM kernels
(``src/array/cpu/spmm.h:47``, ``src/array/cuda/spmm.cuh:30``) and the
``GSpMM`` autograd rules (``python/dgl/backend/pytorch/sparse.py:162``).
Attach via ``Graph.with_spmm_plans(weighted=True)``.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..base import DGLError

__all__ = ["ShellSpMMPlan", "build_shell_plan", "shell_gspmm_sum"]


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


SHELL_CAP = 32  # max shell levels; deeper edges take the blocked residual
RES_BLOCK = 32  # residual rows per reduce block (see residual_reduce)


def residual_reduce(rows, residual, n8, kind="sum"):
    """Reduce residual rows into the ranked accumulator.

    ``rows`` (R', *feat) must already hold the identity (0 / -inf) in
    padded slots. Residual runs are BLOCK-PADDED at plan build (each
    rank-position's run padded to a multiple of RES_BLOCK), so the
    reduction is a free reshape-reduce over blocks followed by ONE sorted
    segment op over R'/RES_BLOCK block partials — measured 62 -> ~3 ms at
    the arxiv-scale reverse residual (698k x 512 B rows, probe_r4d): the
    XLA sorted segment-sum lowers to ~89 ns/row scatters, the reshape
    path to a stream.
    """
    block_pos = residual[3]
    nb = block_pos.shape[0]
    r = rows.reshape(nb, RES_BLOCK, *rows.shape[1:])
    if kind == "sum":
        part = r.sum(axis=1)
        return jax.ops.segment_sum(part, block_pos, num_segments=n8,
                                   indices_are_sorted=True)
    part = r.max(axis=1)
    return jax.ops.segment_max(part, block_pos, num_segments=n8,
                               indices_are_sorted=True)


def prefix_reduce(pieces, n8, kind="sum", base=None):
    """Combine prefix-aligned contributions without accumulator copies.

    ``pieces``: (m_k, *feat) f32 arrays with NON-INCREASING m_k, each to be
    reduced into ``out[:m_k]``; ``base``: optional full (n8, *feat) array
    (the residual segment reduction). Rows no piece covers hold the
    identity (0 for sum, -inf for max).

    The naive ``acc.at[:m_k].add(rows)`` chain makes XLA copy the WHOLE
    accumulator once per shell (measured ~2.4 ms of the 7.1 ms arxiv-scale
    SpMM — probe_r3c ``dus``/``shells``). Shells are nested prefixes, so a
    running reduction over the shrinking prefix + emitting finalized tail
    segments + one final concat touches only O(sum m_k) rows.
    """
    ident = 0.0 if kind == "sum" else -jnp.inf
    comb = jnp.add if kind == "sum" else jnp.maximum
    segs = []
    R = base
    for rows in pieces:
        m = rows.shape[0]
        if R is None:
            if m < n8:
                segs.append(jnp.full((n8 - m,) + rows.shape[1:], ident,
                                     jnp.float32))
            # f32 running reduction regardless of piece dtype: callers
            # may pass bf16 pieces (halves the piece-stream traffic; the
            # values are already bf16-rounded so this changes no bits)
            R = rows.astype(jnp.float32)
        elif m < R.shape[0]:
            segs.append(R[m:])
            R = comb(R[:m], rows)
        else:
            R = comb(R, rows)
    if R is None:
        return None
    segs.append(R)
    if len(segs) == 1:
        return R
    return jnp.concatenate(segs[::-1], axis=0)


def _build_dir(e_node: np.ndarray, e_to: np.ndarray, e_eid: np.ndarray,
               n_to: int, cap: int = SHELL_CAP, n_from=None):
    """Shells of one direction: for each level k < ``cap``, the
    (gather-node, gather-eid, mask) triple of "the k-th incident edge of
    every ranked ``e_to`` node". ``e_node`` is the id gathered from the
    node array (src for forward, dst for backward), ``e_eid`` the id
    gathered from the edge array (caller's eid order).

    Levels >= ``cap`` (a power-law graph's max degree can be ~1e5 — one
    shell per level would explode both the host build and the XLA program)
    go to the RESIDUAL: edges sorted by rank position with each
    position's run padded to a multiple of RES_BLOCK, reduced by
    :func:`residual_reduce` (block reshape-reduce + one small sorted
    segment op). The residual tuple is
    ``(nidx, eidx, pos_full, block_pos, mask)``.

    Returns (shells, (res_nidx, res_eidx, res_pos), unrank, rank). The
    build is a single O(E log E) grouped pass (sort by level), not a
    per-level scan. ``rank``/``unrank`` are None when the graph is already
    rank-relabeled (identity).
    """
    deg = np.bincount(e_to, minlength=n_to)
    rank = np.argsort(-deg, kind="stable").astype(np.int32)
    unrank = np.empty(n_to, np.int32)
    unrank[rank] = np.arange(n_to, dtype=np.int32)
    # identity rank (graph already relabeled by transforms.reorder_for_spmm):
    # signal consumers to SKIP the final (n_to, F) unrank gather — 1.5 ms of
    # the arxiv headline SpMM (probe_r3c 'unrank')
    identity_unrank = bool(np.array_equal(unrank, np.arange(n_to)))
    order = np.argsort(e_to, kind="stable")
    en, et, ee = e_node[order], e_to[order], e_eid[order]
    starts = np.concatenate(([0], np.cumsum(np.bincount(et, minlength=n_to))))
    pos = np.arange(et.shape[0]) - starts[et]
    kmax = min(int(deg.max()) if et.size else 0, cap)
    h = np.bincount(np.minimum(deg, kmax), minlength=kmax + 1)
    n_ge = np.concatenate((np.cumsum(h[::-1])[::-1], [0]))
    rp = unrank[et]
    # group the capped levels contiguously: one sort, then per-level slices
    lo = pos < kmax
    lorder = np.lexsort((rp[lo], pos[lo]))
    en_l, ee_l, rp_l = en[lo][lorder], ee[lo][lorder], rp[lo][lorder]
    lstarts = np.concatenate(
        ([0], np.cumsum(np.bincount(pos[lo], minlength=kmax)))
    )
    shells = []
    for k in range(kmax):
        a, b = int(lstarts[k]), int(lstarts[k + 1])
        n_k = int(n_ge[k + 1])
        n_k8 = _rup(n_k, 8)
        # padded slots point ONE PAST the source table: a consumer that
        # appends a zero row gathers exact zeros with no mask pass (the
        # hub fast path); consumers that gather the raw table get the
        # jit clamp-to-last + their mask select (unchanged semantics)
        pad_id = np.int32(n_from if n_from is not None else 0)
        nidx = np.full(n_k8, pad_id, np.int32)
        eidx = np.zeros(n_k8, np.int32)
        nidx[rp_l[a:b]] = en_l[a:b]
        eidx[rp_l[a:b]] = ee_l[a:b]
        mask = np.zeros((n_k8, 1), np.float32)
        mask[:n_k, 0] = 1.0
        shells.append((jnp.asarray(nidx), jnp.asarray(eidx),
                       jnp.asarray(mask)))
    hi = ~lo
    R = int(hi.sum())
    un_out = None if identity_unrank else jnp.asarray(unrank)
    rk_out = None if identity_unrank else jnp.asarray(rank)
    if R == 0:
        return tuple(shells), None, un_out, rk_out
    # block-padded residual: each rank position's run padded to a
    # multiple of RES_BLOCK so the reduction is reshape + a small
    # sorted segment op (residual_reduce)
    B = RES_BLOCK
    horder = np.argsort(rp[hi], kind="stable")
    rp_r = rp[hi][horder]
    en_r = en[hi][horder]
    ee_r = ee[hi][horder]
    cnt = np.bincount(rp_r, minlength=n_to)
    nb = -(-cnt // B)
    base = np.concatenate(([0], np.cumsum(nb * B)))[:-1]
    off = np.arange(R) - np.concatenate(([0], np.cumsum(cnt)))[rp_r]
    slot = base[rp_r] + off
    Rp = int(nb.sum()) * B
    res_nidx = np.zeros(Rp, np.int32)
    res_eidx = np.zeros(Rp, np.int32)
    mask = np.zeros((Rp, 1), np.float32)
    res_nidx[slot] = en_r
    res_eidx[slot] = ee_r
    mask[slot, 0] = 1.0
    block_pos = np.repeat(np.arange(n_to, dtype=np.int32), nb)
    pos_full = np.repeat(block_pos, B)
    residual = (jnp.asarray(res_nidx), jnp.asarray(res_eidx),
                jnp.asarray(pos_full), jnp.asarray(block_pos),
                jnp.asarray(mask))
    return tuple(shells), residual, un_out, rk_out


class ShellSpMMPlan:
    """Full-edge shell decomposition for one relation (pytree).

    ``src_eid``/``dst_eid``/``emask`` are the eid-order endpoint arrays
    (padding-masked) used by the dE gradient, which is pure gathers.
    """

    ARRAY_FIELDS = ("shells", "res_dst", "unrank_dst",
                    "rev_shells", "res_src", "unrank_src",
                    "src_eid", "dst_eid", "emask",
                    "dst_rank_eid", "src_rank_eid",
                    "rank_dst", "rank_src")

    def __init__(self, shells, res_dst, unrank_dst,
                 rev_shells, res_src, unrank_src,
                 src_eid, dst_eid, emask, dst_rank_eid, src_rank_eid,
                 rank_dst=None, rank_src=None, *,
                 num_src: int, num_dst: int, gather_dtype: str = "bf16"):
        self.shells = shells
        self.res_dst = res_dst
        self.unrank_dst = unrank_dst
        self.rev_shells = rev_shells
        self.res_src = res_src
        self.unrank_src = unrank_src
        self.src_eid = src_eid
        self.dst_eid = dst_eid
        self.emask = emask
        # rank-space position of each edge's endpoint (eid order): lets
        # per-edge reads of segment aggregates skip the unrank gather
        # (``agg_ranked[dst_rank_eid]`` instead of
        # ``agg_ranked[unrank][dst]``)
        self.dst_rank_eid = dst_rank_eid
        self.src_rank_eid = src_rank_eid
        # rank order of each direction (rank[i] = node at rank position i);
        # None when identity. Used by the fused attention op to move
        # node tables into shell (rank) space with one N-level gather.
        self.rank_dst = rank_dst
        self.rank_src = rank_src
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self.gather_dtype = str(gather_dtype)

    def tree_flatten(self):
        children = tuple(getattr(self, f) for f in self.ARRAY_FIELDS)
        return children, (self.num_src, self.num_dst, self.gather_dtype)

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        for f, c in zip(cls.ARRAY_FIELDS, children):
            setattr(obj, f, c)
        obj.num_src, obj.num_dst, obj.gather_dtype = aux
        return obj

    def __repr__(self):
        return (f"ShellSpMMPlan(shells={len(self.shells)}, "
                f"rev={len(self.rev_shells)}, gather={self.gather_dtype})")


jax.tree_util.register_pytree_node(
    ShellSpMMPlan, lambda p: p.tree_flatten(), ShellSpMMPlan.tree_unflatten
)


def build_shell_plan(rel, gather_dtype: str = "bf16") -> ShellSpMMPlan:
    """Build the full-edge shell plan (host-side, once per graph).

    ``gather_dtype='bf16'`` rounds gathered node rows to bfloat16 (f32
    accumulation, ~1e-3 relative error — halves gather bytes); ``'f32'``
    keeps everything exact.
    """
    if gather_dtype not in ("bf16", "f32"):
        raise DGLError(f"gather_dtype must be bf16|f32, got {gather_dtype}")
    src = np.asarray(rel.csc_indices)
    dst = np.asarray(rel.csc_dst)
    eid = np.asarray(rel.csc_eids)
    real = (dst < rel.num_dst) & (src < rel.num_src)
    src, dst, eid = src[real], dst[real], eid[real]
    shells, res_dst, unrank_dst, rank_dst = _build_dir(
        src, dst, eid, rel.num_dst)
    rev_shells, res_src, unrank_src, rank_src = _build_dir(
        dst, src, eid, rel.num_src)
    # eid-order endpoints for dE (clamped so padded slots gather row 0 and
    # are zeroed by emask)
    se = np.asarray(rel.src).astype(np.int64)
    de_ = np.asarray(rel.dst).astype(np.int64)
    emask = ((se < rel.num_src) & (de_ < rel.num_dst)).astype(np.float32)
    se_c = np.where(emask > 0, se, 0).astype(np.int64)
    de_c = np.where(emask > 0, de_, 0).astype(np.int64)
    return ShellSpMMPlan(
        shells, res_dst, unrank_dst, rev_shells, res_src, unrank_src,
        jnp.asarray(se_c.astype(np.int32)),
        jnp.asarray(de_c.astype(np.int32)),
        jnp.asarray(emask),
        jnp.asarray(de_c.astype(np.int32) if unrank_dst is None
                    else np.asarray(unrank_dst)[de_c]),
        jnp.asarray(se_c.astype(np.int32) if unrank_src is None
                    else np.asarray(unrank_src)[se_c]),
        rank_dst, rank_src,
        num_src=rel.num_src, num_dst=rel.num_dst, gather_dtype=gather_dtype,
    )


def _expand(x, ndim):
    while x.ndim < ndim:
        x = x[..., None]
    return x


def _mask_expand(mask, ndim):
    """Shape a (n, 1) (or (n,)) mask to exactly ``ndim`` dims."""
    mask = mask.reshape(mask.shape[0], *([1] * (ndim - 1)))
    return mask


def _shell_accumulate(shells, residual, unrank, n_out, msg_of):
    """``out[v] = sum_k msg_of(shell_k)[unrank[v]]`` with masked prefixes.

    ``msg_of((nidx, eidx)) -> (n_k8, ...)`` builds the per-level messages;
    the accumulator shape comes from the first level (all levels broadcast
    to the same feature shape). ``residual`` holds the beyond-cap edges
    (sorted by rank position) reduced with ONE sorted segment-sum — its
    padding rows carry an out-of-range position and are dropped.
    """
    n8 = _rup(n_out, 8)
    base = None
    if residual is not None and int(residual[2].shape[0]) > 0:
        r_nidx, r_eidx, _pos, _bpos, r_mask = residual
        rows = msg_of(r_nidx, r_eidx).astype(jnp.float32)
        rows = jnp.where(_mask_expand(r_mask, rows.ndim) > 0, rows, 0.0)
        base = residual_reduce(rows, residual, n8, "sum")
    if shells:
        from .shell_pallas import (flat_shell_indices, pallas_shell_ok,
                                   shell_prefix_sum_pallas,
                                   use_pallas_shells)

        if use_pallas_shells():
            # one flat masked message build feeds the Pallas accumulator
            # (output blocks stay in VMEM across level visits — see
            # ops/shell_pallas.py); falls through to the XLA path when
            # the flattened feature width isn't lane-aligned (the unused
            # flat gather is DCE'd under jit)
            nidx_f, level_rows = flat_shell_indices(
                [s[0] for s in shells], n_out, oob_index=0)
            eidx_f, _ = flat_shell_indices(
                [s[1] for s in shells], n_out, oob_index=0)
            mask_f, _ = flat_shell_indices(
                [s[2][:, 0].astype(jnp.int32) for s in shells], n_out,
                oob_index=0)
            rows = msg_of(nidx_f, eidx_f)
            feat_shape = rows.shape[1:]
            fc = 1
            for d in feat_shape:
                fc *= int(d)
            if pallas_shell_ok(fc, n_out):
                # keep the piece stream in the gather dtype (bf16 halves
                # HBM traffic; the kernel accumulates in f32)
                rows = jnp.where(
                    _mask_expand(mask_f.astype(jnp.float32), rows.ndim) > 0,
                    rows, jnp.zeros((), rows.dtype))
                acc = shell_prefix_sum_pallas(
                    rows.reshape(rows.shape[0], fc), level_rows, n_out,
                    base=None if base is None
                    else base.reshape(base.shape[0], fc))
                acc = acc.reshape((acc.shape[0],) + feat_shape)
                return acc[:n_out] if unrank is None else acc[unrank]
    pieces = []
    for nidx, eidx, mask in shells:
        rows = msg_of(nidx, eidx)
        m = _mask_expand(mask, rows.ndim)
        # where (not multiply): padded slots may hold inf/nan (e.g. div by
        # a zero edge value gathered from slot 0)
        pieces.append(jnp.where(m > 0, rows.astype(jnp.float32), 0.0))
    acc = prefix_reduce(pieces, n8, kind="sum", base=base)
    if acc is None:  # no edges
        return None
    return acc[:n_out] if unrank is None else acc[unrank]


def _g(x, dtype):
    return x.astype(jnp.bfloat16) if dtype == "bf16" else x


def _msg(op, ul, el):
    if op == "copy_lhs":
        return ul
    if op == "copy_rhs":
        return el
    if ul.ndim != el.ndim:
        nd = max(ul.ndim, el.ndim)
        ul, el = _expand(ul, nd), _expand(el, nd)
    if op == "add":
        return ul + el
    if op == "sub":
        return ul - el
    if op == "mul":
        return ul * el
    if op == "div":
        return ul / el
    raise DGLError(f"Unknown spmm binary op {op!r}")


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def shell_gspmm_sum(op, plan: ShellSpMMPlan, u, e):
    """g-SpMM with sum reducer via the shell decomposition; matches
    ``ops.gspmm(g, op, 'sum', u, e)`` (to ~1e-3 relative for bf16
    gathers; exactly for ``gather_dtype='f32'``)."""
    out = _fwd_impl(op, plan, u, e)
    return out


def _fwd_impl(op, plan, u, e):
    gd = plan.gather_dtype
    ub = _g(u, gd) if u is not None and op != "copy_rhs" else None
    eb = _g(e, gd) if e is not None and op != "copy_lhs" else None

    def msg_of(nidx, eidx):
        ul = ub[nidx] if ub is not None else None
        el = eb[eidx] if eb is not None else None
        return _msg(op, ul, el)

    ref = u if op != "copy_rhs" else e
    out = _shell_accumulate(plan.shells, plan.res_dst, plan.unrank_dst,
                            plan.num_dst, msg_of)
    if out is None:
        shape = (plan.num_dst,) + tuple(ref.shape[1:])
        return jnp.zeros(shape, ref.dtype)
    return out.astype(ref.dtype)


def _shell_fwd(op, plan, u, e):
    return shell_gspmm_sum(op, plan, u, e), (plan, u, e)


def _shell_bwd(op, res, dz):
    plan, u, e = res
    gd = plan.gather_dtype
    du = de = None
    dzb = _g(dz, gd)
    eb = _g(e, gd) if e is not None else None

    if op != "copy_rhs" and u is not None:
        # dU[s] = sum over out-edges of dZ[dst] (op' e): reverse shells
        def msg_of(nidx, eidx):
            dzl = dzb[nidx]
            if op in ("copy_lhs", "add", "sub"):
                return dzl
            el = eb[eidx]
            if dzl.ndim != el.ndim:
                nd = max(dzl.ndim, el.ndim)
                dzl, el = _expand(dzl, nd), _expand(el, nd)
            if op == "mul":
                return dzl * el
            if op == "div":
                return dzl / el
            raise DGLError(op)

        du = _shell_accumulate(plan.rev_shells, plan.res_src,
                               plan.unrank_src, plan.num_src, msg_of)
        if du is None:
            du = jnp.zeros((plan.num_src,) + dz.shape[1:], jnp.float32)
        from .spmm import _reduce_grad

        du = _reduce_grad(du, u.shape).astype(u.dtype)

    if op != "copy_lhs" and e is not None:
        # dE is pure gathers in eid order (no reduction): the reference's
        # rule (``backend/pytorch/sparse.py:205-230``) verbatim
        dz_d = dz[plan.dst_eid]
        if op in ("copy_rhs", "add"):
            de = dz_d
        elif op == "sub":
            de = -dz_d
        elif op == "mul":
            de = dz_d * _expand(u[plan.src_eid], dz_d.ndim)
        elif op == "div":
            eu = _expand(u[plan.src_eid], dz_d.ndim)
            ee = _expand(e, dz_d.ndim)
            de = -dz_d * eu / (ee * ee)
        else:
            raise DGLError(op)
        de = jnp.where(_mask_expand(plan.emask, de.ndim) > 0, de, 0.0)
        from .spmm import _reduce_grad

        de = _reduce_grad(de, e.shape).astype(e.dtype)

    return (None, du, de)


shell_gspmm_sum.defvjp(_shell_fwd, _shell_bwd)


# ---------------------------------------------------------------------------
# edge-value segment reductions in RANK space (edge_softmax building blocks)
# ---------------------------------------------------------------------------


def shell_edge_acc(shells, n_out, evals, kind="sum", transform=None,
                   residual=None):
    """Segment-reduce per-edge values keyed by the shells' ranked nodes.

    Returns the RANKED accumulator ``(rup(n_out, 8), *feat)`` — row i is the
    aggregate of the rank-i node. ``transform(rows, ranked_positions)``
    optionally maps gathered rows given their rank positions (used by
    edge-softmax to subtract the running max before exp); for the capped
    shells the positions are the prefix ``[0, n_k8)``, for the residual
    they are its explicit position array. ``kind`` in {"sum", "max"};
    empty segments hold the identity (0 / -inf).
    """
    n8 = _rup(n_out, 8)
    base = None
    if residual is not None and int(residual[2].shape[0]) > 0:
        _, r_eidx, r_pos, _bpos, r_mask = residual
        rows = evals[r_eidx].astype(jnp.float32)
        if transform is not None:
            rows = transform(rows, r_pos)
        rows = jnp.where(_mask_expand(r_mask, rows.ndim) > 0, rows,
                         0.0 if kind == "sum" else -jnp.inf)
        base = residual_reduce(rows, residual, n8, kind)
    pieces = []
    for nidx, eidx, mask in shells:
        rows = evals[eidx].astype(jnp.float32)
        if transform is not None:
            rows = transform(rows, None)
        m = _mask_expand(mask, rows.ndim)
        pieces.append(jnp.where(m > 0, rows,
                                0.0 if kind == "sum" else -jnp.inf))
    acc = prefix_reduce(pieces, n8, kind=kind, base=base)
    if acc is None:
        return jnp.zeros((n8,), jnp.float32)
    return acc


def shell_edge_softmax(plan: ShellSpMMPlan, logits, norm_by="dst"):
    """Numerically-stable edge softmax with zero segment-sums: the max and
    the exp-sum accumulate over shell prefixes in rank space; per-edge
    normalization reads them back with ONE gather each via the
    precomposed rank positions."""
    if norm_by == "dst":
        shells, res, n_out, rank_eid = (plan.shells, plan.res_dst,
                                        plan.num_dst, plan.dst_rank_eid)
    else:
        shells, res, n_out, rank_eid = (plan.rev_shells, plan.res_src,
                                        plan.num_src, plan.src_rank_eid)
    mx = shell_edge_acc(shells, n_out, logits, kind="max", residual=res)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    mx_pad = jnp.concatenate([mx, jnp.zeros((1,) + mx.shape[1:], mx.dtype)])

    def shift_exp(rows, pos):
        # pos None -> capped shell (prefix rows); else residual per-row
        # positions (always in range; padded slots are masked afterwards)
        m = mx[: rows.shape[0]] if pos is None else mx_pad[pos]
        if m.ndim < rows.ndim:
            m = m.reshape(m.shape + (1,) * (rows.ndim - m.ndim))
        return jnp.exp(rows - m)

    s = shell_edge_acc(shells, n_out, logits, kind="sum",
                       transform=shift_exp, residual=res)
    mx_e = mx[rank_eid]
    s_e = jnp.maximum(s, 1e-38)[rank_eid]
    while mx_e.ndim < logits.ndim:
        mx_e, s_e = mx_e[..., None], s_e[..., None]
    return (jnp.exp(logits - mx_e) / s_e).astype(logits.dtype)


def shell_gspmm_cmp(op, reduce_op, plan: ShellSpMMPlan, u, e, in_degrees):
    """g-SpMM with the max/min reducer via shells (plain JAX AD — gradients
    flow to the arg-extremum positions through the scatter-max/min rule,
    matching the reference's BwdSegmentCmp semantics). Zero-degree rows
    return 0 like the classic path."""
    gd = plan.gather_dtype
    ub = _g(u, gd) if u is not None and op != "copy_rhs" else None
    eb = _g(e, gd) if e is not None and op != "copy_lhs" else None
    sign = 1.0 if reduce_op == "max" else -1.0
    n8 = _rup(plan.num_dst, 8)
    base = None
    if plan.res_dst is not None and int(plan.res_dst[2].shape[0]) > 0:
        r_nidx, r_eidx, _pos, _bpos, r_mask = plan.res_dst
        ul = ub[r_nidx] if ub is not None else None
        el = eb[r_eidx] if eb is not None else None
        rows = _msg(op, ul, el).astype(jnp.float32) * sign
        rows = jnp.where(_mask_expand(r_mask, rows.ndim) > 0, rows,
                         -jnp.inf)
        base = residual_reduce(rows, plan.res_dst, n8, "max")
    pieces = []
    for nidx, eidx, mask in plan.shells:
        ul = ub[nidx] if ub is not None else None
        el = eb[eidx] if eb is not None else None
        rows = _msg(op, ul, el).astype(jnp.float32) * sign
        m = _mask_expand(mask, rows.ndim)
        pieces.append(jnp.where(m > 0, rows, -jnp.inf))
    acc = prefix_reduce(pieces, n8, kind="max", base=base)
    ref = u if op != "copy_rhs" else e
    if acc is None:
        shape = (plan.num_dst,) + tuple(ref.shape[1:])
        return jnp.zeros(shape, ref.dtype)
    accs = acc * sign
    out = (accs[: plan.num_dst] if plan.unrank_dst is None
           else accs[plan.unrank_dst])
    deg = _mask_expand(jnp.asarray(in_degrees > 0, jnp.float32), out.ndim)
    return jnp.where(deg > 0, out, 0.0).astype(ref.dtype)
