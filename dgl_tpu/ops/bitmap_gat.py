"""Bitmap-flash GAT: full-graph attention with bitmap-SpMM economics.

The per-edge GAT paths (edge-softmax chain, fused shell GAT) all pay the
~2.9 ns/row gather issue floor — ~10 s/layer-class at Reddit's 114M
edges. At bitmap-eligible density the DENSE formulation wins the same
way :mod:`dgl_tpu.ops.bitmap_spmm` does for ``copy_u``:

  - logits are RANK-1: ``raw[d, s] = er[d] + el[s]`` — an outer sum
    built on the VPU from two (N, H) vectors, never an E-sized tensor;
  - the adjacency mask streams as the plane-packed bitmap (N^2/8 B);
  - softmax runs ONLINE (flash-attention style): one pass over src
    tiles carries the running max / exp-sum / unnormalized accumulator
    per dst row in VMEM — nothing E- or N^2-sized ever touches HBM;
  - the weighted aggregation is the MXU matmul ``P @ h``.

Cost ~ N^2 * H cells of VPU work + the bitmap stream, independent of E
and degree skew (the uniform worst case is byte-identical, like
bitmap_spmm). The backward is the standard flash decomposition with the
GAT twist (leaky-ReLU rank-1 logits):

  alpha     = exp(leaky(raw) - lse[d]) * mask        (recomputed)
  c[d]      = out[d] . dz[d]
  B         = alpha * dleaky(raw)
  der[d]    = dz[d] . (B @ h)[d]   - c[d] * rowsum(B)[d]   (dst-major)
  del[s]    = h[s]  . (B^T @ dz)[s] - (B^T @ c)[s]          (src-major)
  dh[s]     = (alpha^T @ dz)[s]                             (src-major)

Heads ride the INNERMOST grid dimension: consecutive steps share the
same bitmap/feature tiles (Pallas skips the re-fetch), VMEM holds one
head's (C, S) temporaries, and the per-dst running stats persist in
scratch across the src-tile sweep.

Reference counterpart: ``GATConv`` (``python/dgl/nn/pytorch/conv/
gatconv.py``) + the fused ``gather_mm``/edge-softmax CUDA kernels —
redesigned for the MXU instead of translated.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .bitmap_spmm import _S, BitmapPlan, _expand_bits, _rup

__all__ = ["bitmap_gat", "BitmapPlan"]

_CG = 128     # dst rows per tile (f32 (C, S) temporaries ~2 MB each)
_NEG = -1e30  # finite "-inf": masked logits stay NaN-free through exp

# CI hook: run the kernels through the interpreter on CPU (tests)
_FORCE_PALLAS_INTERPRET = False


def _leaky(x, slope):
    return jnp.where(x > 0, x, x * slope)


def _dleaky(x, slope):
    return jnp.where(x > 0, 1.0, slope)


# ---------------------------------------------------------------------------
# XLA reference (CPU path + parity oracle): exact softmax on the dense mask
# ---------------------------------------------------------------------------


def _gat_xla(bits, el, er, h, slope):
    """(Hp dst, Ws src) dense formulation; small-N / test path.

    el (Ws, H), er (Hp, H), h (Ws, H, O). Returns (out (Hp, H, O),
    lse (Hp, H))."""
    mask = _expand_bits(bits.astype(jnp.int32)).astype(jnp.float32)
    raw = _leaky(er[:, None, :] + el[None, :, :], slope)  # (Hp, Ws, H)
    rawm = jnp.where(mask[:, :, None] > 0, raw, _NEG)
    m = jnp.max(rawm, axis=1)  # (Hp, H)
    # zero-in-degree guard: with m == _NEG, exp(rawm - m) would be
    # exp(0) = 1 on every masked slot — shift by 0 instead so they
    # underflow to exact 0
    m_eff = jnp.where(m > _NEG / 2, m, 0.0)
    p = jnp.exp(rawm - m_eff[:, None, :])
    s = jnp.sum(p, axis=1)  # (Hp, H)
    out = jnp.einsum("dsh,sho->dho", p, h.astype(jnp.float32))
    out = out / jnp.maximum(s, 1e-30)[:, :, None]
    lse = m_eff + jnp.log(jnp.maximum(s, 1e-30))
    return out, lse


def _gat_xla_bwd(bits, bits_t, el, er, h, slope, lse, out, dz):
    mask = _expand_bits(bits.astype(jnp.int32)).astype(jnp.float32)
    raw_pre = er[:, None, :] + el[None, :, :]
    lse_g = jnp.where(lse > _NEG / 2, lse, -_NEG)
    alpha = jnp.where(mask[:, :, None] > 0,
                      jnp.exp(_leaky(raw_pre, slope)
                              - lse_g[:, None, :]), 0.0)
    ccoef = jnp.einsum("dho,dho->dh", out, dz.astype(jnp.float32))
    dalpha = jnp.einsum("sho,dho->dsh", h.astype(jnp.float32),
                        dz.astype(jnp.float32))
    dlogit = alpha * (dalpha - ccoef[:, None, :]) * _dleaky(raw_pre, slope)
    der = jnp.sum(dlogit, axis=1)
    dele = jnp.sum(dlogit, axis=0)
    dh = jnp.einsum("dsh,dho->sho", alpha, dz.astype(jnp.float32))
    return dele, der, dh


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------


def _expand_tile(b_i32):
    """(C, S/8) int32 plane-packed -> (C, S) 0/1 int32 (in-kernel)."""
    from jax.experimental.pallas import tpu as pltpu

    r = pltpu.repeat(b_i32, 8, axis=1)
    sh = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1) // (_S // 8)
    return (r >> sh) & 1


def _gat_fwd_pallas(bits, el, er, h, slope, nheads, odim):
    """Online-softmax forward. el/h transposed-free layouts:
    elT (H, Ws), er (Hp, H), h (Ws, H*O). Outputs (out (Hp, H*O),
    lse (Hp, H))."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hp, W = bits.shape
    Ws = W * 8
    HO = nheads * odim
    nd, ns = Hp // _CG, Ws // _S

    def kernel(b_ref, elT_ref, er_ref, h_ref, o_ref, lse_ref,
               base_sc, m_sc, s_sc):
        j = pl.program_id(1)
        hh = pl.program_id(2)

        @pl.when(jnp.logical_and(j == 0, hh == 0))
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)
            lse_ref[:] = jnp.zeros_like(lse_ref)
            m_sc[:] = jnp.full_like(m_sc, _NEG)
            s_sc[:] = jnp.zeros_like(s_sc)

        @pl.when(hh == 0)
        def _():
            # masked-base cache: 0 where an edge exists, else -1e30 —
            # shared by every head of this (dst block, src tile)
            mask = _expand_tile(b_ref[:].astype(jnp.int32))
            base_sc[:] = jnp.where(mask > 0, 0.0, _NEG)

        # Mosaic forbids dynamic lane/sublane indexing (x[:, hh]): every
        # per-head read is an iota-masked reduction over the full block,
        # every per-head write an iota-masked merge — all static shapes
        sel_h = jax.lax.broadcasted_iota(
            jnp.int32, (_CG, nheads), 1) == hh  # (C, nheads)
        sel_el = jax.lax.broadcasted_iota(
            jnp.int32, (nheads, _S), 0) == hh  # (nheads, S)
        sel_o = (jax.lax.broadcasted_iota(
            jnp.int32, (_CG, HO), 1) // odim) == hh  # (C, H*O)
        er_col = jnp.sum(jnp.where(sel_h, er_ref[:], 0.0), axis=1)
        el_row = jnp.sum(jnp.where(sel_el, elT_ref[:], 0.0), axis=0)

        raw = _leaky(er_col[:, None] + el_row[None, :],
                     slope) + base_sc[:]
        tm = jnp.max(raw, axis=1)
        m_old = jnp.sum(jnp.where(sel_h, m_sc[:], 0.0), axis=1)
        m_new = jnp.maximum(m_old, tm)
        # while a row has seen NO real entries m_new == _NEG: shift by 0
        # (exp of the _NEG-masked raw underflows to exact 0) and zero the
        # rescale factor (the accumulator is still 0 anyway)
        m_eff = jnp.where(m_new > _NEG / 2, m_new, 0.0)
        fac = jnp.where(m_old > _NEG / 2, jnp.exp(m_old - m_eff), 0.0)
        p = jnp.exp(raw - m_eff[:, None])
        s_old = jnp.sum(jnp.where(sel_h, s_sc[:], 0.0), axis=1)
        s_new = s_old * fac + jnp.sum(p, axis=1)
        m_sc[:] = jnp.where(sel_h, m_new[:, None], m_sc[:])
        s_sc[:] = jnp.where(sel_h, s_new[:, None], s_sc[:])
        # full (S, H*O) dot: head hh's columns equal p @ h[:, hh-slice];
        # the others are discarded by the sel_o merge (same MXU cost —
        # H*O < 128 lanes pads to one MXU tile either way)
        contrib = jax.lax.dot_general(
            p.astype(jnp.bfloat16), h_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:] = jnp.where(sel_o, o_ref[:] * fac[:, None] + contrib,
                             o_ref[:])

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            o_ref[:] = jnp.where(
                sel_o, o_ref[:] / jnp.maximum(s_new, 1e-30)[:, None],
                o_ref[:])
            lse_ref[:] = jnp.where(
                sel_h,
                (m_new + jnp.log(jnp.maximum(s_new, 1e-30)))[:, None],
                lse_ref[:])

    out, lse = pl.pallas_call(
        kernel,
        grid=(nd, ns, nheads),
        in_specs=[
            pl.BlockSpec((_CG, _S // 8), lambda i, j, hh: (i, j)),
            pl.BlockSpec((nheads, _S), lambda i, j, hh: (0, j)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_S, HO), lambda i, j, hh: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_CG, HO), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Hp, HO), jnp.float32),
            jax.ShapeDtypeStruct((Hp, nheads), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_CG, _S), jnp.float32),
            pltpu.VMEM((_CG, nheads), jnp.float32),
            pltpu.VMEM((_CG, nheads), jnp.float32),
        ],
        interpret=_FORCE_PALLAS_INTERPRET,
    )(bits, el, er, h)
    return out, lse


def _gat_bwd_dst_pallas(bits, el, er, h, slope, lse, ccoef, dz,
                        nheads, odim):
    """dst-major backward: der (Hp, H)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Hp, W = bits.shape
    Ws = W * 8
    HO = nheads * odim
    nd, ns = Hp // _CG, Ws // _S

    def kernel(b_ref, elT_ref, er_ref, h_ref, lse_ref, cc_ref, dz_ref,
               der_ref, base_sc):
        j = pl.program_id(1)
        hh = pl.program_id(2)

        @pl.when(jnp.logical_and(j == 0, hh == 0))
        def _():
            der_ref[:] = jnp.zeros_like(der_ref)

        @pl.when(hh == 0)
        def _():
            mask = _expand_tile(b_ref[:].astype(jnp.int32))
            base_sc[:] = jnp.where(mask > 0, 0.0, _NEG)

        sel_h = jax.lax.broadcasted_iota(
            jnp.int32, (_CG, nheads), 1) == hh
        sel_el = jax.lax.broadcasted_iota(
            jnp.int32, (nheads, _S), 0) == hh
        sel_o = (jax.lax.broadcasted_iota(
            jnp.int32, (_CG, HO), 1) // odim) == hh
        er_col = jnp.sum(jnp.where(sel_h, er_ref[:], 0.0), axis=1)
        el_row = jnp.sum(jnp.where(sel_el, elT_ref[:], 0.0), axis=0)
        raw_pre = er_col[:, None] + el_row[None, :]
        # zero-in-degree rows carry lse ~ _NEG; force their alpha to
        # underflow (a _NEG lse would CANCEL the _NEG mask base)
        lse_c = jnp.sum(jnp.where(sel_h, lse_ref[:], 0.0), axis=1)
        lse_h = jnp.where(lse_c > _NEG / 2, lse_c, -_NEG)
        alpha = jnp.exp(_leaky(raw_pre, slope) + base_sc[:]
                        - lse_h[:, None])
        bmat = alpha * _dleaky(raw_pre, slope)
        # full-width dot; only head hh's lanes are consumed (sel_o)
        bh = jax.lax.dot_general(
            bmat.astype(jnp.bfloat16), h_ref[:],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)  # (C, H*O)
        term1 = jnp.sum(
            jnp.where(sel_o, bh * dz_ref[:].astype(jnp.float32), 0.0),
            axis=1)
        cc_col = jnp.sum(jnp.where(sel_h, cc_ref[:], 0.0), axis=1)
        term2 = cc_col * jnp.sum(bmat, axis=1)
        der_ref[:] += jnp.where(sel_h, (term1 - term2)[:, None], 0.0)

    return pl.pallas_call(
        kernel,
        grid=(nd, ns, nheads),
        in_specs=[
            pl.BlockSpec((_CG, _S // 8), lambda i, j, hh: (i, j)),
            pl.BlockSpec((nheads, _S), lambda i, j, hh: (0, j)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_S, HO), lambda i, j, hh: (j, 0)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_CG, HO), lambda i, j, hh: (i, 0)),
        ],
        out_specs=pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((Hp, nheads), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_CG, _S), jnp.float32)],
        interpret=_FORCE_PALLAS_INTERPRET,
    )(bits, el, er, h, lse, ccoef, dz)


def _gat_bwd_src_pallas(bits_t, el, er, h, slope, lse, ccoef, dz,
                        nheads, odim):
    """src-major backward over the TRANSPOSED bitmap: del (Wsp, H),
    dh (Wsp, H*O). Here rows are sources (blocked _CG) and tiles are
    destinations (_S wide): el (Wsp, H) per-row, erT (H, Hp_t) per-tile,
    h_self (Wsp, H*O) per-row, lse/ccoef/dz per-dst-tile."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Sp, Wt = bits_t.shape  # rows: src, packed cols: dst
    Dt = Wt * 8
    HO = nheads * odim
    nsrc, ndt = Sp // _CG, Dt // _S

    def kernel(b_ref, el_ref, erT_ref, hs_ref, lseT_ref, ccT_ref, dz_ref,
               del_ref, dh_ref, base_sc):
        j = pl.program_id(1)
        hh = pl.program_id(2)

        @pl.when(jnp.logical_and(j == 0, hh == 0))
        def _():
            del_ref[:] = jnp.zeros_like(del_ref)
            dh_ref[:] = jnp.zeros_like(dh_ref)

        @pl.when(hh == 0)
        def _():
            mask = _expand_tile(b_ref[:].astype(jnp.int32))
            base_sc[:] = jnp.where(mask > 0, 0.0, _NEG)

        sel_h = jax.lax.broadcasted_iota(
            jnp.int32, (_CG, nheads), 1) == hh
        sel_row = jax.lax.broadcasted_iota(
            jnp.int32, (nheads, _S), 0) == hh
        sel_o = (jax.lax.broadcasted_iota(
            jnp.int32, (_CG, HO), 1) // odim) == hh
        # (src rows C, dst cols S)
        el_col = jnp.sum(jnp.where(sel_h, el_ref[:], 0.0), axis=1)
        er_row = jnp.sum(jnp.where(sel_row, erT_ref[:], 0.0), axis=0)
        raw_pre = el_col[:, None] + er_row[None, :]
        lse_r = jnp.sum(jnp.where(sel_row, lseT_ref[:], 0.0), axis=0)
        lse_row = jnp.where(lse_r > _NEG / 2, lse_r, -_NEG)
        alpha = jnp.exp(_leaky(raw_pre, slope) + base_sc[:]
                        - lse_row[None, :])
        bmat = alpha * _dleaky(raw_pre, slope)
        # full-width dots against dz (S, H*O): head hh's lanes carry
        # alpha @ dz[:, hh-slice]; other heads' lanes are merged away
        adz = jax.lax.dot_general(
            alpha.astype(jnp.bfloat16), dz_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dh_ref[:] += jnp.where(sel_o, adz, 0.0)
        bdz = jax.lax.dot_general(
            bmat.astype(jnp.bfloat16), dz_ref[:],
            (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        term1 = jnp.sum(
            jnp.where(sel_o, bdz * hs_ref[:].astype(jnp.float32), 0.0),
            axis=1)
        cc_row = jnp.sum(jnp.where(sel_row, ccT_ref[:], 0.0), axis=0)
        term2 = jnp.sum(bmat * cc_row[None, :], axis=1)
        del_ref[:] += jnp.where(sel_h, (term1 - term2)[:, None], 0.0)

    return pl.pallas_call(
        kernel,
        grid=(nsrc, ndt, nheads),
        in_specs=[
            pl.BlockSpec((_CG, _S // 8), lambda i, j, hh: (i, j)),
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((nheads, _S), lambda i, j, hh: (0, j)),
            pl.BlockSpec((_CG, HO), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((nheads, _S), lambda i, j, hh: (0, j)),
            pl.BlockSpec((nheads, _S), lambda i, j, hh: (0, j)),
            pl.BlockSpec((_S, HO), lambda i, j, hh: (j, 0)),
        ],
        out_specs=[
            pl.BlockSpec((_CG, nheads), lambda i, j, hh: (i, 0)),
            pl.BlockSpec((_CG, HO), lambda i, j, hh: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((Sp, nheads), jnp.float32),
            jax.ShapeDtypeStruct((Sp, HO), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((_CG, _S), jnp.float32)],
        interpret=_FORCE_PALLAS_INTERPRET,
    )(bits_t, el, er, h, lse, ccoef, dz)


# ---------------------------------------------------------------------------
# custom_vjp wrapper
# ---------------------------------------------------------------------------


def _use_pallas():
    return _FORCE_PALLAS_INTERPRET or jax.default_backend() == "tpu"


def _pad_rows(x, n):
    return x if x.shape[0] == n else jnp.pad(
        x, ((0, n - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def bitmap_gat(slope, plan: BitmapPlan, el, er, h):
    """Full-graph GAT aggregation over a bitmap plan.

    ``el`` (num_src, H): per-source logit halves (a_l . W h_s);
    ``er`` (num_dst, H): per-dst halves; ``h`` (num_src, H, O): projected
    features. Returns (num_dst, H, O) = sum_s alpha[s, d] h[s] with
    alpha the edge-softmax of ``leaky(el[s] + er[d])`` over each dst's
    in-neighbors. Matches the edge-softmax chain to bf16 class."""
    out, _lse = _fwd_impl(slope, plan, el, er, h)
    return out


def _prep(plan, el, er, h):
    Hp, W = plan.bits.shape
    Ws = W * 8
    nheads, odim = int(el.shape[1]), int(h.shape[2])
    elp = _pad_rows(el.astype(jnp.float32), Ws)
    erp = _pad_rows(er.astype(jnp.float32), Hp)
    hp = _pad_rows(h.astype(jnp.bfloat16).reshape(h.shape[0], -1), Ws)
    return elp, erp, hp, nheads, odim, Hp, Ws


def _fwd_impl(slope, plan, el, er, h):
    elp, erp, hp, nheads, odim, Hp, Ws = _prep(plan, el, er, h)
    if _use_pallas():
        out, lse = _gat_fwd_pallas(plan.bits, elp.T, erp, hp,
                                   slope, nheads, odim)
    else:
        out, lse = _gat_xla(plan.bits, elp, erp,
                            hp.astype(jnp.float32).reshape(Ws, nheads,
                                                           odim), slope)
        out = out.reshape(Hp, nheads * odim)
    nd = plan.num_dst
    return (out[:nd].reshape(nd, nheads, odim).astype(h.dtype),
            lse[:nd])


def _gat_fwd(slope, plan, el, er, h):
    out, lse = _fwd_impl(slope, plan, el, er, h)
    return out, (plan, el, er, h, lse, out)


def _gat_bwd(slope, res, dz):
    plan, el, er, h, lse, out = res
    elp, erp, hp, nheads, odim, Hp, Ws = _prep(plan, el, er, h)
    dzf = dz.astype(jnp.float32).reshape(dz.shape[0], -1)
    dzp = _pad_rows(dzf, Hp)
    outp = _pad_rows(out.astype(jnp.float32).reshape(out.shape[0], -1),
                     Hp)
    # c[d, h] = out[d, h] . dz[d, h]
    cc = jnp.einsum("dho,dho->dh",
                    outp.reshape(Hp, nheads, odim),
                    dzp.reshape(Hp, nheads, odim))
    lsep = _pad_rows(lse, Hp)
    if _use_pallas():
        der = _gat_bwd_dst_pallas(plan.bits, elp.T, erp,
                                  hp.astype(jnp.bfloat16), slope, lsep,
                                  cc, dzp.astype(jnp.bfloat16),
                                  nheads, odim)
        bits_t = plan.bits if plan.bits_rev is None else plan.bits_rev
        # the src-major sweep tiles DESTINATIONS in _S-wide blocks: its
        # dst-indexed operands pad to the transposed bitmap's column
        # count (rup(num_dst, _S)), beyond-Hp rows masked by zero bits
        Dt = bits_t.shape[1] * 8
        lse_t = _pad_rows(lsep, Dt)
        cc_t = _pad_rows(cc, Dt)
        dz_t = _pad_rows(dzp, Dt)
        er_t = _pad_rows(erp, Dt)
        dele, dh = _gat_bwd_src_pallas(
            bits_t, elp, er_t.T, hp, slope, lse_t.T, cc_t.T,
            dz_t.astype(jnp.bfloat16), nheads, odim)
    else:
        dele, der, dh = _gat_xla_bwd(
            plan.bits, None, elp, erp,
            hp.astype(jnp.float32).reshape(Ws, nheads, odim), slope,
            lsep, outp.reshape(Hp, nheads, odim),
            dzp.reshape(Hp, nheads, odim))
        dh = dh.reshape(Ws, nheads * odim)
    ns, nd = plan.num_src, plan.num_dst
    return (None, dele[:ns].astype(el.dtype), der[:nd].astype(er.dtype),
            dh[:ns].reshape(ns, nheads, odim).astype(h.dtype))


bitmap_gat.defvjp(_gat_fwd, _gat_bwd)
