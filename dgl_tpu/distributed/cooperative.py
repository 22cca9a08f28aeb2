"""Cooperative minibatching / sparse all-to-all (reference
``python/dgl/graphbolt/impl/cooperative_conv.py:12-135``,
``impl/neighbor_sampler.py:555-639``, ``python/dgl/cuda/nccl.py:7,98``).

The reference exchanges seed ids by owner rank over torch.distributed
all_to_all, fetches locally, and redistributes activations fwd/bwd.
TPU-native version: owner-masked request/response buffers moved by two
``jax.lax.all_to_all`` calls inside ``shard_map`` — fully static shapes,
differentiable (the backward pass is the reverse all_to_all, exactly the
reference's ``CooperativeConvFunction.backward``).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

__all__ = ["sparse_all_to_all_pull", "sparse_all_to_all_push"]


def sparse_all_to_all_pull(mesh: Mesh, ranges, table, ids, axis: str = "gp"):
    """Pull rows of a row-sharded table for arbitrary global ids.

    ``ranges``: (P+1,) global row ranges per part (RangePartitionBook).
    ``table``: (P, rows_max, F) sharded over ``axis`` (part-major local rows).
    ``ids``: (P, B) global ids requested by each rank, sharded over ``axis``.
    Returns (P, B, F) rows, same sharding. Differentiable w.r.t. ``table``
    (grads flow back through the reverse all_to_all into the owning shard).
    """
    ranges = jnp.asarray(ranges)
    nparts = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def run(table_blk, ids_blk):
        table0 = table_blk[0]          # (rows_max, F)
        ids0 = ids_blk[0]              # (B,)
        me = jax.lax.axis_index(axis)
        owner = jnp.searchsorted(ranges, ids0, side="right") - 1   # (B,)
        # request buffer: req[q, i] = ids0[i] if owner==q else 0 (masked)
        onehot = owner[None, :] == jnp.arange(nparts)[:, None]     # (P, B)
        req = jnp.where(onehot, ids0[None, :], 0)
        reqm = onehot
        # exchange requests: device p receives req_from[q, i] = rank q's ids
        req_t = jax.lax.all_to_all(req, axis, split_axis=0, concat_axis=0,
                                   tiled=False)
        reqm_t = jax.lax.all_to_all(
            reqm.astype(jnp.int32), axis, split_axis=0, concat_axis=0,
            tiled=False,
        )
        # serve locally-owned rows
        local = jnp.clip(req_t - ranges[me], 0, table0.shape[0] - 1)
        rows = table0[local]                                        # (P, B, F)
        rows = rows * reqm_t[..., None].astype(rows.dtype)
        # send responses back
        resp = jax.lax.all_to_all(rows, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        # resp[q, i] = row for my id i served by rank q; exactly one q valid
        return jnp.sum(resp, axis=0)[None]                          # (1, B, F)

    return run(table, ids)


def sparse_all_to_all_push(mesh: Mesh, ranges, grads, ids, rows_max: int,
                           axis: str = "gp"):
    """Push per-id gradient rows back to the owning shards
    (reference ``nccl.py`` ``sparse_all_to_all_push``): returns
    (P, rows_max, F) accumulated into part-local row positions."""
    ranges = jnp.asarray(ranges)
    nparts = mesh.shape[axis]

    @partial(shard_map, mesh=mesh,
             in_specs=(P(axis), P(axis)), out_specs=P(axis))
    def run(grads_blk, ids_blk):
        g0 = grads_blk[0]              # (B, F)
        ids0 = ids_blk[0]              # (B,)
        me = jax.lax.axis_index(axis)
        owner = jnp.searchsorted(ranges, ids0, side="right") - 1
        onehot = owner[None, :] == jnp.arange(nparts)[:, None]      # (P, B)
        send = g0[None] * onehot[..., None].astype(g0.dtype)        # (P, B, F)
        send_ids = jnp.where(onehot, ids0[None, :], 0)
        recv = jax.lax.all_to_all(send, axis, split_axis=0, concat_axis=0,
                                  tiled=False)
        recv_ids = jax.lax.all_to_all(send_ids, axis, split_axis=0,
                                      concat_axis=0, tiled=False)
        recv_m = jax.lax.all_to_all(
            onehot.astype(jnp.int32), axis, split_axis=0, concat_axis=0,
            tiled=False,
        )
        local = jnp.where(
            recv_m > 0, recv_ids - ranges[me], rows_max
        ).reshape(-1)
        flat = recv.reshape(-1, recv.shape[-1])
        out = jax.ops.segment_sum(flat, local, num_segments=rows_max + 1)
        return out[:rows_max][None]

    return run(grads, ids)
