"""Fused GAT attention in shell (rank) space.

The reference runs graph attention as three separate kernels — SDDMM
``u_add_v`` logits, fused edge-softmax, ``u_mul_e`` SpMM
(``python/dgl/nn/pytorch/conv/gatconv.py:337-346``, edge-softmax
``src/array/kernel.cc:542-562``) — each materializing per-edge tensors
in eid order. On the TPU every eid-order materialization costs per-edge
row gathers at the ~2.9 ns issue floor, and autodiff through the shell
softmax multiplies them: the round-3 GAT layer spent 488 ms at arxiv
scale (probe_r2j).

This op never leaves shell space, and gathers each edge's source row
ONCE per direction by packing everything that travels src->dst into one
table (``[el | h]``, one ~264 B bf16 row per edge) and everything that
travels dst->src into another (``[er | mx | s | c | dz]``):

  logits  : ``leaky_relu(el[src] + er_rank_prefix)`` — er needs NO
            per-edge gather (prefix row read); el rides the packed row.
  softmax : running max then exp-sum over the shrinking prefixes
            (``prefix_reduce``) — zero scatters for capped levels; one
            sorted segment op for the residual.
  apply   : ``alpha * h[src]`` in the same walk — h is the rest of the
            packed row; alpha never exists in eid order.

The backward is hand-derived (softmax VJP): one pass in dst-rank space
(``c = sum_e alpha*dalpha`` and ``der``, reusing the forward's packed
gather structure) and one in src-rank space (``dh`` and ``del`` — both
keyed by src, accumulating into REVERSE-shell prefixes with el/h as
sequential prefix reads). No autodiff retraces the shell chains.
Measured full-layer fwd+bwd at arxiv scale: 488 -> 100.7 ms
(probe_r4c; the blocked residual of shell_spmm.residual_reduce is the
other half of that win).

Attach via ``Graph.with_spmm_plans(weighted=True)``; ``GATConv``
dispatches here for the no-edge-weight, no-get-attention case.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .shell_spmm import (ShellSpMMPlan, _rup, prefix_reduce,
                         residual_reduce)

__all__ = ["fused_gat_attention"]


def _leaky(x, slope):
    return jnp.where(x > 0, x, x * slope)


def _dleaky(x, slope):
    return jnp.where(x > 0, 1.0, slope)


def _ranked(x, rank):
    """Node-order table -> rank-order table (one N-level gather)."""
    return x if rank is None else x[rank]


def _unranked(x_ranked, unrank, n):
    return x_ranked[:n] if unrank is None else x_ranked[unrank]


def _pad_rows(x, n8):
    """Pad a ranked table to the accumulator height + one zero row that
    residual padding positions (== n8) read harmlessly."""
    pad = n8 + 1 - x.shape[0]
    return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1))


def _gd(plan):
    return jnp.bfloat16 if plan.gather_dtype == "bf16" else jnp.float32


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def fused_gat_attention(slope, plan: ShellSpMMPlan, el, er, h,
                        drop_mask=None):
    """``out[d] = sum_s softmax_{s in N(d)}(leaky_relu(el[s]+er[d])) h[s]``.

    el: (N_src, H); er: (N_dst, H); h: (N_src, H, O) -> (N_dst, H, O).
    Matches SDDMM+edge_softmax+u_mul_e_sum to f32 accuracy with
    ``gather_dtype='f32'`` plans (bf16-class with the default).

    ``drop_mask``: optional (E, H) multiplier in EID order applied to the
    normalized attention (the reference's ``attn_drop`` semantics,
    ``gatconv.py:344``: dropout AFTER softmax, no renormalization) —
    typically ``bernoulli(keep)/keep``. Keyed by edge id so the forward
    and both backward orderings (dst-shell and src-shell space) see the
    same mask through their own ``eidx`` gathers.
    """
    out, _, _ = _fwd_impl(slope, plan, el, er, h, drop_mask)
    return out


def _src_pack(plan, el, h):
    """One (N_src+?, H + H*O) table in gather dtype: [el | h.flat]."""
    gd = _gd(plan)
    H = el.shape[1]
    return (jnp.concatenate(
        [el.astype(gd), h.reshape(h.shape[0], -1).astype(gd)], axis=1),
        H)


def _src_rows(packed, H, HO_shape, nidx):
    rows = packed[nidx]
    el_g = rows[:, :H].astype(jnp.float32)
    h_g = rows[:, H:].reshape(rows.shape[0], *HO_shape)
    return el_g, h_g


def _fwd_impl(slope, plan, el, er, h, drop_mask=None):
    n8 = _rup(plan.num_dst, 8)
    er_rank = _pad_rows(_ranked(er, plan.rank_dst).astype(jnp.float32), n8)
    packed, H = _src_pack(plan, el, h)
    HO = h.shape[1:]
    res = plan.res_dst

    # one packed gather per shell, reused by all three passes
    gathered = [
        _src_rows(packed, H, HO, nidx) for nidx, _e, _m in plan.shells
    ]
    raws = [el_g + er_rank[: el_g.shape[0]] for el_g, _ in gathered]
    g_res = raw_res = None
    if res is not None and int(res[2].shape[0]) > 0:
        g_res = _src_rows(packed, H, HO, res[0])
        raw_res = g_res[0] + er_rank[res[2]]

    # ---- pass 1: running max -----------------------------------------
    pieces = [
        jnp.where(mask > 0, _leaky(raw, slope), -jnp.inf)
        for (_n, _e, mask), raw in zip(plan.shells, raws)
    ]
    base = None
    if raw_res is not None:
        rows = jnp.where(res[4] > 0, _leaky(raw_res, slope), -jnp.inf)
        base = residual_reduce(rows, res, n8, "max")
    mx = prefix_reduce(pieces, n8, kind="max", base=base)
    if mx is None:
        return (jnp.zeros((plan.num_dst,) + h.shape[1:], h.dtype),
                None, None)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    mx_pad = _pad_rows(mx, n8)

    # ---- pass 2: exp-sum ---------------------------------------------
    pieces = [
        jnp.where(mask > 0, jnp.exp(_leaky(raw, slope) - mx[: raw.shape[0]]),
                  0.0)
        for (_n, _e, mask), raw in zip(plan.shells, raws)
    ]
    base = None
    if raw_res is not None:
        rows = jnp.where(res[4] > 0,
                         jnp.exp(_leaky(raw_res, slope) - mx_pad[res[2]]),
                         0.0)
        base = residual_reduce(rows, res, n8, "sum")
    s = jnp.maximum(prefix_reduce(pieces, n8, kind="sum", base=base),
                    1e-38)
    s_pad = jnp.maximum(_pad_rows(s, n8), 1e-38)

    # ---- pass 3: alpha * h accumulated -------------------------------
    gd = _gd(plan)
    pieces = []
    for ((_n, eidx, mask), raw, (_el_g, h_g)) in zip(plan.shells, raws,
                                                     gathered):
        m = raw.shape[0]
        alpha = jnp.exp(_leaky(raw, slope) - mx[:m]) / s[:m]
        alpha = jnp.where(mask > 0, alpha, 0.0)
        if drop_mask is not None:
            alpha = alpha * drop_mask[eidx]
        pieces.append((alpha.astype(gd)[..., None] * h_g)
                      .astype(jnp.float32))
    base = None
    if raw_res is not None:
        r_pos = res[2]
        alpha = jnp.where(res[4] > 0,
                          jnp.exp(_leaky(raw_res, slope) - mx_pad[r_pos])
                          / s_pad[r_pos], 0.0)
        if drop_mask is not None:
            alpha = alpha * drop_mask[res[1]]
        base = residual_reduce(
            (alpha.astype(gd)[..., None] * g_res[1]).astype(jnp.float32),
            res, n8, "sum")
    acc = prefix_reduce(pieces, n8, kind="sum", base=base)
    out = _unranked(acc, plan.unrank_dst, plan.num_dst).astype(h.dtype)
    return out, mx, s


def _fused_fwd(slope, plan, el, er, h, drop_mask=None):
    out, mx, s = _fwd_impl(slope, plan, el, er, h, drop_mask)
    return out, (plan, el, er, h, mx, s, drop_mask)


def _fused_bwd(slope, residuals, dz):
    plan, el, er, h, mx, s, drop_mask = residuals
    if mx is None:  # graph had no edges
        return (None, jnp.zeros_like(el), jnp.zeros_like(er),
                jnp.zeros_like(h), None)
    gd = _gd(plan)
    n8d = _rup(plan.num_dst, 8)
    n8s = _rup(plan.num_src, 8)
    H = el.shape[1]
    HO = h.shape[1:]
    er_rank = _pad_rows(_ranked(er, plan.rank_dst).astype(jnp.float32), n8d)
    dz_rank = _pad_rows(_ranked(dz.astype(gd), plan.rank_dst), n8d)
    res = plan.res_dst
    mx_pad = _pad_rows(mx, n8d)
    s_pad = jnp.maximum(_pad_rows(s, n8d), 1e-38)
    packed, _ = _src_pack(plan, el, h)

    # ---- dst-space: one packed gather per shell, reused by A and B ----
    def alpha_dalpha(raw, mask, h_g, dz_rows):
        # guard like the forward: a padded/clamped gather row can overflow
        # exp to inf, and inf * 0-mask is NaN — select, don't multiply
        alpha = jnp.where(
            mask > 0,
            jnp.exp(_leaky(raw, slope) - dz_rows[0]) / dz_rows[1],
            0.0)
        dalpha = jnp.einsum("eho,eho->eh", dz_rows[2],
                            h_g).astype(jnp.float32)
        return alpha, dalpha

    # dropout-after-softmax VJP: with y = sum (a*m) h,
    # dlogit = (a*m)*dalpha - a*c where c = sum (a*m)*dalpha — the -a*c
    # term uses the UNdropped a, so both are carried
    shell_ad = []
    pieces = []
    for nidx, eidx, mask in plan.shells:
        m = nidx.shape[0]
        el_g, h_g = _src_rows(packed, H, HO, nidx)
        raw = el_g + er_rank[:m]
        alpha, dalpha = alpha_dalpha(raw, mask, h_g,
                                     (mx[:m], s[:m], dz_rank[:m]))
        alpha_m = (alpha if drop_mask is None
                   else alpha * drop_mask[eidx])
        shell_ad.append((raw, alpha, alpha_m, dalpha))
        pieces.append(alpha_m * dalpha)
    base = None
    res_ad = None
    if res is not None and int(res[2].shape[0]) > 0:
        r_pos = res[2]
        el_g, h_g = _src_rows(packed, H, HO, res[0])
        raw_r = el_g + er_rank[r_pos]
        maskf = res[4]
        alpha_r, dalpha_r = alpha_dalpha(
            raw_r, maskf, h_g, (mx_pad[r_pos], s_pad[r_pos],
                                dz_rank[r_pos]))
        alpha_rm = (alpha_r if drop_mask is None
                    else alpha_r * drop_mask[res[1]])
        res_ad = (raw_r, alpha_r, alpha_rm, dalpha_r)
        base = residual_reduce(alpha_rm * dalpha_r, res, n8d, "sum")
    c = prefix_reduce(pieces, n8d, kind="sum", base=base)
    c_pad = _pad_rows(c, n8d)

    pieces = [
        (alpha_m * dalpha - alpha * c[: raw.shape[0]])
        * _dleaky(raw, slope)
        for raw, alpha, alpha_m, dalpha in shell_ad
    ]
    base = None
    if res_ad is not None:
        raw_r, alpha_r, alpha_rm, dalpha_r = res_ad
        base = residual_reduce(
            (alpha_rm * dalpha_r - alpha_r * c_pad[res[2]])
            * _dleaky(raw_r, slope),
            res, n8d, "sum")
    der_rank = prefix_reduce(pieces, n8d, kind="sum", base=base)
    der = _unranked(der_rank, plan.unrank_dst, plan.num_dst
                    ).astype(er.dtype)

    # ---- src-space pass: dh[s] and del[s] -----------------------------
    # everything dst-side packed into ONE gather row:
    # [er | mx_n | s_n | c_n | dz.flat]  (4H + H*O)
    mx_n = _unranked(mx, plan.unrank_dst, plan.num_dst)
    s_n = _unranked(s, plan.unrank_dst, plan.num_dst)
    c_n = _unranked(c, plan.unrank_dst, plan.num_dst)
    packed_rev = jnp.concatenate(
        [er.astype(gd), mx_n.astype(gd), s_n.astype(gd), c_n.astype(gd),
         dz.reshape(dz.shape[0], -1).astype(gd)], axis=1)
    el_rank = _pad_rows(_ranked(el.astype(jnp.float32), plan.rank_src),
                        n8s)
    h_rank = _pad_rows(_ranked(h.astype(gd), plan.rank_src), n8s)

    def rev_rows(nidx, eidx, maskf, el_pre, h_pre):
        pk = packed_rev[nidx]
        er_g = pk[:, :H].astype(jnp.float32)
        mx_g = pk[:, H:2 * H].astype(jnp.float32)
        s_g = pk[:, 2 * H:3 * H].astype(jnp.float32)
        c_g = pk[:, 3 * H:4 * H].astype(jnp.float32)
        dz_g = pk[:, 4 * H:].reshape(pk.shape[0], *HO)
        raw = el_pre + er_g
        # same overflow guard as alpha_dalpha: where, not mask-multiply
        alpha = jnp.where(
            maskf > 0,
            jnp.exp(_leaky(raw, slope) - mx_g) / jnp.maximum(s_g, 1e-38),
            0.0)
        alpha_m = (alpha if drop_mask is None
                   else alpha * drop_mask[eidx])
        dalpha = jnp.einsum("eho,eho->eh", dz_g,
                            h_pre).astype(jnp.float32)
        dlogit = (alpha_m * dalpha - alpha * c_g) * _dleaky(raw, slope)
        dh_rows = (alpha_m.astype(gd)[..., None]
                   * dz_g).astype(jnp.float32)
        return dlogit, dh_rows

    pieces_del = []
    pieces_dh = []
    for nidx, eidx, mask in plan.rev_shells:
        m = nidx.shape[0]
        dlogit, dh_rows = rev_rows(nidx, eidx, mask, el_rank[:m],
                                   h_rank[:m])
        pieces_del.append(dlogit)
        pieces_dh.append(dh_rows)
    base_del = base_dh = None
    rres = plan.res_src
    if rres is not None and int(rres[2].shape[0]) > 0:
        r_nidx, r_eidx, r_pos = rres[0], rres[1], rres[2]
        maskf = rres[4]
        dlogit_r, dh_r = rev_rows(r_nidx, r_eidx, maskf, el_rank[r_pos],
                                  h_rank[r_pos])
        base_del = residual_reduce(dlogit_r, rres, n8s, "sum")
        base_dh = residual_reduce(dh_r, rres, n8s, "sum")
    del_rank = prefix_reduce(pieces_del, n8s, kind="sum", base=base_del)
    dh_rank = prefix_reduce(pieces_dh, n8s, kind="sum", base=base_dh)
    del_ = _unranked(del_rank, plan.unrank_src, plan.num_src
                     ).astype(el.dtype)
    dh = _unranked(dh_rank, plan.unrank_src, plan.num_src).astype(h.dtype)
    return (None, del_, der, dh, None)


fused_gat_attention.defvjp(_fused_fwd, _fused_bwd)
