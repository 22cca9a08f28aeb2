"""Partition-parallel SpMM with halo exchange over ICI.

The TPU-native core of DistDGL's data plane: the reference fans out
``SamplingRequest``/KVStore pulls over TCP (``graph_services.py:737``);
here boundary features move in ONE ``jax.lax.all_to_all`` inside
``shard_map`` over the ``gp`` mesh axis, overlapped by XLA with the local
aggregation (SURVEY.md §5.8, BASELINE north star).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # jax>=0.8
    from jax import shard_map  # type: ignore
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..base import DGLError
from .shard import GraphShards

__all__ = ["halo_exchange", "dist_copy_u_sum", "dist_spmm", "shard_arrays"]


def shard_arrays(mesh: Mesh, shards: GraphShards, axis: str = "gp"):
    """Put the shard index tables on the mesh, partitioned over ``axis``."""
    s = NamedSharding(mesh, P(axis))
    return {
        "src_ext": jax.device_put(shards.src_ext, s),
        "dst_local": jax.device_put(shards.dst_local, s),
        "send_idx": jax.device_put(shards.send_idx, s),
        "send_mask": jax.device_put(shards.send_mask, s),
        "in_deg": jax.device_put(shards.in_deg, s),
    }


def halo_exchange(x_local, send_idx, send_mask, axis: str = "gp"):
    """Inside shard_map: gather my boundary rows per destination part and
    all-to-all them; returns (P, h_max, F) halo rows received (slot [q] =
    rows from part q)."""
    sb = x_local[send_idx] * send_mask[..., None].astype(x_local.dtype)
    return jax.lax.all_to_all(sb, axis, split_axis=0, concat_axis=0, tiled=False)


def _local_spmm(x_local, recv, src_ext, dst_local, n_max, edge_vals=None,
                reduce_op="sum"):
    Pn, h_max, F = recv.shape
    ext = jnp.concatenate([x_local, recv.reshape(Pn * h_max, F)], axis=0)
    msgs = ext[src_ext]
    if edge_vals is not None:
        msgs = msgs * edge_vals[..., None]
    # padding edges carry dst_local == n_max -> dropped by segment ops
    if reduce_op in ("max", "min"):
        seg = jax.ops.segment_max if reduce_op == "max" else jax.ops.segment_min
        out = seg(msgs, dst_local, num_segments=n_max,
                  indices_are_sorted=True)
        # zero-degree rows: match the single-device convention (0, not inf)
        return jnp.where(jnp.isfinite(out), out, 0.0)
    return jax.ops.segment_sum(
        msgs, dst_local, num_segments=n_max, indices_are_sorted=True
    )


def dist_copy_u_sum(mesh: Mesh, shards: GraphShards, x, tables=None,
                    axis: str = "gp", mean: bool = False):
    """Distributed ``copy_u``+``sum`` (optionally mean) over the shards.

    ``x``: (P, n_max, F) part-major features (see ``shards.shard_features``).
    Returns (P, n_max, F) aggregated dst features, same sharding.
    """
    if tables is None:
        tables = shard_arrays(mesh, shards, axis)
    n_max = shards.n_max

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis), P(axis), P(axis), P(axis)),
        out_specs=P(axis),
    )
    def run(x_blk, send_idx, send_mask, src_ext, dst_local, in_deg):
        x0 = x_blk[0]
        recv = halo_exchange(x0, send_idx[0], send_mask[0], axis)
        out = _local_spmm(x0, recv, src_ext[0], dst_local[0], n_max)
        if mean:
            out = out / jnp.maximum(in_deg[0], 1.0)[:, None]
        return out[None]

    return run(
        x,
        tables["send_idx"],
        tables["send_mask"],
        tables["src_ext"],
        tables["dst_local"],
        tables["in_deg"],
    )


def dist_spmm(mesh: Mesh, shards: GraphShards, x, edge_vals=None,
              tables=None, axis: str = "gp", reduce_op: str = "sum"):
    """General distributed g-SpMM: message = x[src] (* edge_vals), reduced
    by sum/mean. ``edge_vals``: (P, e_max) per-edge scalars (or None)."""
    if reduce_op not in ("sum", "mean", "max", "min"):
        raise DGLError(f"Unknown reduce op {reduce_op!r}")
    if tables is None:
        tables = shard_arrays(mesh, shards, axis)
    n_max = shards.n_max
    has_ev = edge_vals is not None
    ev = edge_vals if has_ev else tables["in_deg"][:, :1]  # dummy

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=P(axis),
    )
    def run(x_blk, ev_blk, send_idx, send_mask, src_ext, dst_local, in_deg):
        x0 = x_blk[0]
        recv = halo_exchange(x0, send_idx[0], send_mask[0], axis)
        out = _local_spmm(
            x0, recv, src_ext[0], dst_local[0], n_max,
            edge_vals=ev_blk[0] if has_ev else None,
            reduce_op=reduce_op,
        )
        if reduce_op == "mean":
            out = out / jnp.maximum(in_deg[0], 1.0)[:, None]
        return out[None]

    return run(
        x, ev,
        tables["send_idx"], tables["send_mask"],
        tables["src_ext"], tables["dst_local"], tables["in_deg"],
    )


def init_halo_state(mesh: Mesh, shards: GraphShards, feat_dim: int,
                    dtype=jnp.float32, axis: str = "gp"):
    """Zero halo cache for the delayed-aggregation variant."""
    z = jnp.zeros(
        (shards.num_parts, shards.num_parts, shards.h_max, feat_dim), dtype
    )
    return jax.device_put(z, NamedSharding(mesh, P(axis)))


def dist_copy_u_sum_delayed(mesh: Mesh, shards: GraphShards, x, halo_state,
                            tables=None, axis: str = "gp",
                            mean: bool = False):
    """Delayed-halo aggregation (reference distgnn, ``python/dgl/distgnn/``:
    Libra-partitioned full-graph training with stale remote partials).

    Uses the PREVIOUS iteration's halo features for remote edges while the
    fresh exchange runs — XLA overlaps the all_to_all with the local SpMM
    because nothing downstream of ``out`` depends on it. Returns
    ``(out, new_halo_state)``; thread the state through the training loop.
    One-iteration staleness, bounded like the reference's delayed aggregates.
    """
    if tables is None:
        tables = shard_arrays(mesh, shards, axis)
    n_max = shards.n_max

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(axis),) * 7,
        out_specs=(P(axis), P(axis)),
    )
    def run(x_blk, halo_blk, send_idx, send_mask, src_ext, dst_local, in_deg):
        x0 = x_blk[0]
        fresh = halo_exchange(x0, send_idx[0], send_mask[0], axis)
        out = _local_spmm(x0, halo_blk[0], src_ext[0], dst_local[0], n_max)
        if mean:
            out = out / jnp.maximum(in_deg[0], 1.0)[:, None]
        return out[None], fresh[None]

    return run(
        x, halo_state,
        tables["send_idx"], tables["send_mask"],
        tables["src_ext"], tables["dst_local"], tables["in_deg"],
    )
