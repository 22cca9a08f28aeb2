"""VMEM hub-cache g-SpMM (Pallas/TPU).

The measured bottleneck of ``copy_u_sum`` on TPU is the per-edge HBM gather
``x[csc_indices]`` — issue-rate bound, insensitive to index locality (see
ROADMAP.md round-2 notes). This kernel removes HBM traffic for edges whose
source is a *hub* (high-degree node): the top-H source rows are packed into
a compact table that stays resident in VMEM across grid steps, and per-edge
rows are pulled from it with a one-hot matmul on the MXU instead of an HBM
gather. On power-law graphs a few thousand hubs cover a large fraction of
edges (the same skew DistDGL exploits for halo caching); cold edges fall
back to the XLA gather.

Reference counterpart: the fused SpMM kernels at
``src/array/cpu/spmm.h:47`` / ``src/array/cuda/spmm.cuh:30`` — same math,
different memory strategy (this is a TPU-first redesign, not a port).

Opt-in: call ``hub_copy_u_sum`` directly (or pass a prebuilt ``HubPlan``).
The default ``ops.copy_u_sum`` path is unchanged.
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..graph import Relation

__all__ = ["HubPlan", "hub_gather", "hub_copy_u_sum"]

_CHUNK = 256     # hub-table rows per one-hot matmul (8-sublane aligned)
_BLOCK_E = 2048  # edges per grid step (amortizes per-step overhead)


def _rup(x: int, m: int) -> int:
    return max(int(-(-x // m) * m), m)


@dataclass
class HubPlan:
    """Host-side edge split for one relation: hub slots per CSC edge plus
    the cold-edge scatter tables. Build once per graph, reuse every step."""

    num_hubs: int              # H (multiple of _CHUNK)
    hub_ids: jnp.ndarray       # (H,) source rows cached in VMEM
    slots: jnp.ndarray         # (Ep_pad, 1) int32, H = no hub / padding
    cold_pos: jnp.ndarray      # (Ec_pad,) CSC positions of cold edges
    cold_src: jnp.ndarray      # (Ec_pad,) their source rows
    cold_dst: jnp.ndarray      # (Ec_pad,) their dst rows (sorted; pad=num_dst)
    num_edges_padded: int      # Ep (before block padding)
    coverage: float            # fraction of real edges served from VMEM

    @staticmethod
    def build(rel: Relation, num_hubs: int = 2048) -> "HubPlan":
        src_csc = np.asarray(rel.csc_indices)
        dst_csc = np.asarray(rel.csc_dst)
        Ep = src_csc.shape[0]
        real = dst_csc < rel.num_dst
        deg = np.bincount(src_csc[real], minlength=rel.num_src)
        H = _rup(min(num_hubs, rel.num_src), _CHUNK)
        top = np.argsort(-deg, kind="stable")[: min(num_hubs, rel.num_src)]
        hub_ids = np.zeros(H, np.int64)
        hub_ids[: top.shape[0]] = top
        slot_of = np.full(rel.num_src, H, np.int32)
        slot_of[top] = np.arange(top.shape[0], dtype=np.int32)
        slots = np.where(real, slot_of[src_csc], np.int32(H))
        cold = real & (slots == H)
        cold_idx = np.nonzero(cold)[0]
        Ec = _rup(cold_idx.shape[0], 8) if cold_idx.size else 8
        cold_pos = np.full(Ec, Ep, np.int32)       # Ep -> dropped scatter
        cold_src = np.zeros(Ec, np.int64)
        cold_dst = np.full(Ec, rel.num_dst, np.int64)  # pad -> dropped
        cold_pos[: cold_idx.shape[0]] = cold_idx
        cold_src[: cold_idx.shape[0]] = src_csc[cold_idx]
        cold_dst[: cold_idx.shape[0]] = dst_csc[cold_idx]
        Epad = _rup(Ep, _BLOCK_E)
        slots_pad = np.full((Epad, 1), H, np.int32)
        slots_pad[:Ep, 0] = slots
        n_real = max(int(real.sum()), 1)
        return HubPlan(
            num_hubs=H,
            hub_ids=jnp.asarray(hub_ids),
            slots=jnp.asarray(slots_pad),
            cold_pos=jnp.asarray(cold_pos),
            cold_src=jnp.asarray(cold_src),
            cold_dst=jnp.asarray(cold_dst),
            num_edges_padded=Ep,
            coverage=float((real & (slots < H)).sum() / n_real),
        )


def _make_hub_gather_kernel(mxu_dtype):
    def kernel(slots_ref, hub_ref, out_ref):
        s = slots_ref[...]                 # (B, 1) int32
        B = out_ref.shape[0]
        H, F = hub_ref.shape
        acc = jnp.zeros((B, F), jnp.float32)
        for base in range(0, H, _CHUNK):
            ids = base + jax.lax.broadcasted_iota(jnp.int32, (B, _CHUNK), 1)
            onehot = (s == ids).astype(mxu_dtype)
            acc = acc + jnp.dot(
                onehot,
                hub_ref[base : base + _CHUNK, :].astype(mxu_dtype),
                preferred_element_type=jnp.float32,
            )
        out_ref[...] = acc.astype(out_ref.dtype)

    return kernel


def hub_gather(hub_x, slots, interpret: bool = False,
               precision: str = "highest"):
    """``out[i] = hub_x[slots[i]]`` (0 when ``slots[i] == H``) via one-hot
    MXU matmuls against a VMEM-resident table.

    ``hub_x``: (H, F) with H % 256 == 0, F % 128 == 0 (TPU lane tiling).
    ``slots``: (E, 1) int32 with E % 2048 == 0.
    ``precision``: "highest" keeps the table dtype in the dot (exact for
    f32 but ~4x the MXU cost); "bf16" rounds table values to bfloat16
    (f32 accumulate, ~1e-3 relative error — selection itself is exact).
    """
    from jax.experimental import pallas as pl

    H, F = hub_x.shape
    E = slots.shape[0]
    if H % _CHUNK or E % _BLOCK_E:
        raise ValueError("hub_gather: H % 256 == 0 and E % 2048 == 0 required")
    mxu_dtype = jnp.bfloat16 if precision == "bf16" else hub_x.dtype
    return pl.pallas_call(
        _make_hub_gather_kernel(mxu_dtype),
        grid=(E // _BLOCK_E,),
        in_specs=[
            pl.BlockSpec((_BLOCK_E, 1), lambda i: (i, 0)),
            pl.BlockSpec((H, F), lambda i: (0, 0)),  # resident across steps
        ],
        out_specs=pl.BlockSpec((_BLOCK_E, F), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((E, F), hub_x.dtype),
        interpret=interpret,
    )(slots, hub_x)


def hub_copy_u_sum(rel: Relation, x, plan: HubPlan = None,
                   num_hubs: int = 2048, interpret: bool = False,
                   precision: str = "highest"):
    """``copy_u`` + ``sum`` with the hub-cache gather. Matches
    ``ops.copy_u_sum(g, x)`` numerically at the default precision; pass a
    prebuilt ``plan`` to amortize the host split across steps."""
    if plan is None:
        plan = HubPlan.build(rel, num_hubs)
    F = x.shape[1]
    Fp = _rup(F, 128)
    hub_x = x[plan.hub_ids]
    if Fp != F:
        hub_x = jnp.pad(hub_x, ((0, 0), (0, Fp - F)))
    msgs = hub_gather(hub_x, plan.slots, interpret=interpret,
                      precision=precision)[
        : plan.num_edges_padded, :F
    ]
    # no scatter-merge (measured 1.7x gather cost per row): hub and cold
    # edges reduce in two sorted segment sums that add elementwise; cold
    # padding rows carry dst == num_dst and are dropped
    out_hub = jax.ops.segment_sum(
        msgs, rel.csc_dst, num_segments=rel.num_dst, indices_are_sorted=True
    )
    cold = x[plan.cold_src]
    out_cold = jax.ops.segment_sum(
        cold, plan.cold_dst, num_segments=rel.num_dst,
        indices_are_sorted=True,
    )
    return out_hub + out_cold
