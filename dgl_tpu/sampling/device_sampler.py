"""On-device (TPU) neighbor sampling: the TPU-native input pipeline.

The reference keeps the device fed with a host-side async pipeline
(GraphBolt: ``python/dgl/graphbolt/dataloader.py:108-191`` — pipelined CPU
sampling, async feature fetch, non-blocking H2D copies) because CUDA
sampling kernels and CPU workers are the only producers. On TPU the
economics invert: a neighbor pick is a row gather, the measured v5e gather
issue rate is ~2.9 ns/row (benchmarks/probe_r3b), and the graph's CSC plus
the feature table fit in 16 GB HBM for every fits-in-memory dataset. So
the TPU-first design samples *on the chip*: seeds, frontier expansion,
feature gather, and the train step fuse into one jitted program — the MFG
never exists on the host and the whole epoch runs as one ``lax.scan``.
(The host thread-worker pipeline in :mod:`dgl_tpu.dataloading` remains the
path for graphs larger than HBM.)

Semantics (vs reference ``sample_neighbors``,
``src/graph/sampling/neighbor/neighbor.cc:279``):

- in-degree ``d <= fanout``: take ALL in-neighbors (slots ``j < d`` real,
  rest masked) — exactly the reference's behavior for small degrees.
- ``d > fanout``: draw ``fanout`` picks uniformly. ``mode="replace"``
  matches the reference's ``replace=True``. ``mode="unique"`` (default)
  additionally masks duplicate picks, approximating ``replace=False``
  (identical when ``d >> fanout``; at ``d`` close to ``fanout`` it keeps
  ``d(1-(1-1/d)^fanout)`` distinct neighbors in expectation instead of
  ``fanout`` — e.g. 8.3 of 10 at d=12 — each marginally uniform; the
  deviation is quantified by tests/test_device_sampler_stats.py).
  ``mode="exact"`` reproduces the reference's ``replace=False``
  (``src/array/cpu/rowwise_pick.h:27-50``) EXACTLY for any degree with a
  fixed-shape program: picks are drawn sequentially by rank among the
  not-yet-picked offsets, the rank adjusted past earlier picks by a
  ``t``-step monotone fixpoint (O(fanout^3) VPU compares per node —
  free next to the gathers for fanout <= 16; the default stays "unique"
  because the masked-duplicate approximation is cheaper and statistically
  immaterial at ``d >> fanout``).

No deduplication across the frontier: duplicate frontier nodes cost one
extra 2.9 ns gather each instead of a host-side hashmap pass — on TPU the
dedup is the expensive part, not the dup.
"""
from __future__ import annotations

from typing import List, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

__all__ = ["DeviceMFG", "DeviceNeighborSampler", "device_seed_batches"]


class DeviceMFG(NamedTuple):
    """Fixed-shape on-device message-flow graph.

    ``frontiers[0]`` are the seeds (outermost layer);
    ``frontiers[l + 1] = concat([frontiers[l], nbrs[l].ravel()])`` so the
    first ``len(frontiers[l])`` entries of every frontier are the previous
    frontier (self rows line up without any index plumbing).

    ``nbrs[l]``: (num_l, fanout_l) sampled in-neighbor ids;
    ``masks[l]``: matching validity (False = padding / masked duplicate);
    ``seed_mask``: (batch,) validity of the seed slots.
    """

    frontiers: List[jax.Array]
    nbrs: List[jax.Array]
    masks: List[jax.Array]
    seed_mask: jax.Array

    @property
    def num_layers(self) -> int:
        return len(self.nbrs)

    def num_real_edges(self) -> jax.Array:
        """Total unmasked message edges across layers (for edges/s
        accounting, matching the padded-MFG ``_mask`` convention)."""
        return sum(m.sum() for m in self.masks)

    def input_nodes(self) -> jax.Array:
        """Ids whose features the model consumes (innermost frontier)."""
        return self.frontiers[-1]


def _sample_level(key, indptr, indices, frontier, fanout, mode):
    """One frontier expansion: per node, ``fanout`` in-neighbor picks."""
    num = frontier.shape[0]
    start = jnp.take(indptr, frontier)
    deg = jnp.take(indptr, frontier + 1) - start
    u = jax.random.uniform(key, (num, fanout))
    off_rand = jnp.minimum((u * deg[:, None]).astype(jnp.int32),
                           jnp.maximum(deg[:, None] - 1, 0).astype(jnp.int32))
    j = jax.lax.broadcasted_iota(jnp.int32, (num, fanout), 1)
    take_all = (deg[:, None] <= fanout)
    off = jnp.where(take_all, j, off_rand)
    mask = jnp.where(take_all, j < deg[:, None], deg[:, None] > 0)
    if mode == "unique":
        # mask picks equal to an earlier slot (approximate replace=False);
        # take-all rows have distinct offsets already
        dup = (off[:, :, None] == off[:, None, :]) & (
            jax.lax.broadcasted_iota(jnp.int32, (fanout, fanout), 1)
            < jax.lax.broadcasted_iota(jnp.int32, (fanout, fanout), 0)
        )[None]
        mask = mask & ~dup.any(axis=2)
    elif mode == "exact":
        # exact without-replacement: pick t is the r_t-th smallest unused
        # offset, r_t ~ U[0, d-t); map rank -> offset by bumping past
        # earlier picks (monotone fixpoint, t iterations suffice)
        cols = []
        for t in range(fanout):
            span = jnp.maximum(deg - t, 1).astype(jnp.float32)
            r = jnp.minimum((u[:, t] * span).astype(jnp.int32),
                            jnp.maximum(deg - t - 1, 0).astype(jnp.int32))
            adj = r
            for _ in range(t):
                prev = jnp.stack(cols, axis=1)  # (num, t)
                adj = r + (prev <= adj[:, None]).sum(axis=1).astype(r.dtype)
            cols.append(adj)
        off_exact = jnp.stack(cols, axis=1)
        off = jnp.where(take_all, j, off_exact)
    nbr = jnp.take(indices, (start[:, None] + off).reshape(-1))
    return nbr.reshape(num, fanout), mask


class DeviceNeighborSampler:
    """Fixed-shape multi-layer neighbor sampler that runs under ``jit``.

    ``fanouts`` follows the reference convention: ``fanouts[0]`` is the
    innermost (input-side) layer. Use with device-resident CSC arrays
    (``Relation.csc_indptr`` / ``csc_indices`` are already on device) or a
    :class:`~dgl_tpu.Graph` via :meth:`sample_from`.

    Reference counterpart: ``python/dgl/dataloading/neighbor_sampler.py:15``
    (NeighborSampler) — redesigned to run on-device.
    """

    def __init__(self, fanouts: Sequence[int], mode: str = "unique"):
        if mode not in ("unique", "replace", "exact"):
            raise ValueError(
                f"mode must be 'unique', 'replace' or 'exact', got {mode!r}")
        self.fanouts = list(fanouts)
        self.mode = mode

    def sample(self, key, indptr, indices, seeds,
               seed_mask: Optional[jax.Array] = None) -> DeviceMFG:
        seeds = seeds.astype(jnp.int32)
        if seed_mask is None:
            seed_mask = jnp.ones(seeds.shape, bool)
        frontiers, nbrs, masks = [seeds], [], []
        cur, cur_mask = seeds, seed_mask
        for depth, fanout in enumerate(reversed(self.fanouts)):
            key, sub = jax.random.split(key)
            nbr, mask = _sample_level(
                sub, indptr, indices, cur, fanout, self.mode
            )
            mask = mask & cur_mask[:, None]
            nbrs.append(nbr)
            masks.append(mask)
            cur = jnp.concatenate([cur, nbr.reshape(-1)])
            cur_mask = jnp.concatenate([cur_mask, mask.reshape(-1)])
            frontiers.append(cur)
        return DeviceMFG(frontiers, nbrs, masks, seed_mask)

    def sample_from(self, key, g, seeds, **kw) -> DeviceMFG:
        rel = g._relation(None)
        return self.sample(key, rel.csc_indptr.astype(jnp.int32),
                           rel.csc_indices.astype(jnp.int32), seeds, **kw)


def device_seed_batches(key, num_nodes: int, batch_size: int,
                        train_mask: Optional[jax.Array] = None):
    """On-device epoch seed schedule: a shuffled (num_batches, batch)
    id array + validity mask, ready to drive a ``lax.scan`` epoch.

    With ``train_mask``, ids outside the mask get their slots masked (the
    schedule still covers all ``num_nodes`` slots so shapes stay static
    across epochs; masked slots cost one wasted subtree each).
    """
    perm = jax.random.permutation(key, num_nodes)
    nb = -(-num_nodes // batch_size)
    pad = nb * batch_size - num_nodes
    ids = jnp.concatenate([perm, jnp.zeros((pad,), perm.dtype)])
    mask = jnp.concatenate([jnp.ones((num_nodes,), bool),
                            jnp.zeros((pad,), bool)])
    if train_mask is not None:
        mask = mask & jnp.take(train_mask, ids, fill_value=False)
    return ids.reshape(nb, batch_size), mask.reshape(nb, batch_size)
