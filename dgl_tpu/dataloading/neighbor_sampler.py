"""Neighbor samplers producing MFG blocks.

Two tiers:

- ``NeighborSampler`` — reference-compatible ragged path
  (``python/dgl/dataloading/neighbor_sampler.py:11``): per layer
  ``sample_neighbors`` then ``to_block``. Block shapes vary per batch (fine
  for host-side / eager use; causes recompiles under jit).
- ``FixedShapeNeighborSampler`` — the TPU-native path: every minibatch
  produces blocks with **identical static shapes** (capacity =
  seeds x (fanout+1) per layer, plus one dedicated padding slot). Padding
  edges connect pad-slot->pad-slot so real rows are untouched by SpMM.
  This is the ``to_block``-free analog of GraphBolt's fused sampling
  (``graphbolt/src/fused_csc_sampling_graph.cc:779``) redesigned for XLA
  static shapes.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ..base import DGLError, EID, NID
from ..graph import Graph
from .base import BlockSampler

__all__ = [
    "NeighborSampler",
    "MultiLayerNeighborSampler",
    "MultiLayerFullNeighborSampler",
    "FixedShapeNeighborSampler",
    "LaborSampler",
]


class NeighborSampler(BlockSampler):
    """Ragged multi-layer neighbor sampler (reference
    ``dataloading/neighbor_sampler.py:11``)."""

    def __init__(self, fanouts: Sequence[int], edge_dir="in", prob=None,
                 replace=False, seed=None, **kwargs):
        super().__init__(**kwargs)
        self.fanouts = list(fanouts)
        self.edge_dir = edge_dir
        self.prob = prob
        self.replace = replace
        self._rng = np.random.default_rng(seed)

    def sample_blocks(self, g, seed_nodes, exclude_eids=None):
        from ..sampling import sample_neighbors
        from ..transforms.functional import to_block

        seed_nodes = np.asarray(seed_nodes)
        output_nodes = seed_nodes
        blocks = []
        for fanout in reversed(self.fanouts):
            frontier = sample_neighbors(
                g, seed_nodes, fanout, edge_dir=self.edge_dir, prob=self.prob,
                replace=self.replace, exclude_edges=exclude_eids,
                seed=int(self._rng.integers(2**31)),
            )
            block = to_block(frontier, seed_nodes)
            seed_nodes = np.asarray(block.srcdata[NID])
            blocks.insert(0, block)
        return seed_nodes, output_nodes, blocks


MultiLayerNeighborSampler = NeighborSampler


class MultiLayerFullNeighborSampler(NeighborSampler):
    """All neighbors per layer (reference ``MultiLayerFullNeighborSampler``)."""

    def __init__(self, num_layers: int, **kwargs):
        super().__init__([-1] * num_layers, **kwargs)


class LaborSampler(BlockSampler):
    """LABOR-based block sampler (reference ``dataloading/labor_sampler.py``)."""

    def __init__(self, fanouts, edge_dir="in", prob=None,
                 importance_sampling=0, seed=None, **kwargs):
        super().__init__(**kwargs)
        self.fanouts = list(fanouts)
        self.edge_dir = edge_dir
        self.prob = prob
        self.importance_sampling = importance_sampling
        self._rng = np.random.default_rng(seed)

    def sample_blocks(self, g, seed_nodes, exclude_eids=None):
        from ..sampling import sample_labors
        from ..transforms.functional import to_block

        seed_nodes = np.asarray(seed_nodes)
        output_nodes = seed_nodes
        blocks = []
        for fanout in reversed(self.fanouts):
            frontier, _ = sample_labors(
                g, seed_nodes, fanout, edge_dir=self.edge_dir, prob=self.prob,
                importance_sampling=self.importance_sampling,
                random_seed=int(self._rng.integers(2**31)),
            )
            block = to_block(frontier, seed_nodes)
            seed_nodes = np.asarray(block.srcdata[NID])
            blocks.insert(0, block)
        return seed_nodes, output_nodes, blocks


# ---------------------------------------------------------------------------
# Fixed-shape padded sampler (TPU-native)
# ---------------------------------------------------------------------------


def _build_padded_block(
    g: Graph,
    seed_ids: np.ndarray,      # (cap_dst,) real node ids; -1 = padding slot
    fanout: int,
    rng: np.random.Generator,
    replace: bool,
    prob: Optional[str],
):
    """Sample one layer and build a padded block.

    Layout: dst slots occupy src[0:cap_dst] (dst-first like the reference's
    ``to_block``); the LAST dst slot (cap_dst-1) is the padding sink; all
    padding edges are sink->sink.

    Returns (block, src_ids) where src_ids is (cap_src,) with -1 padding.
    """
    from ..sampling.neighbor import sample_neighbors_fixed
    from .. import convert

    cap_dst = seed_ids.shape[0]
    cap_src = cap_dst * (1 + fanout)
    sink_dst = cap_dst - 1
    sink_src = sink_dst  # dst-first layout: same slot index in src space

    # fused native path: sample + dedup + relabel in one C++ pass
    if prob is None:
        from .. import _native

        res = _native.build_padded_block(
            *g._relation(None).host_arrays(
                "csc_indptr", "csc_indices", "csc_eids"
            ),
            seed_ids, fanout, replace, int(rng.integers(2**63)),
        )
        if res is not None:
            src_ids, esrc_n, edst_n, eids_n, emask_n = res
            return _finalize_block(
                g, seed_ids, cap_dst, cap_src, src_ids,
                esrc_n, edst_n, eids_n, emask_n,
            ), src_ids

    real = seed_ids >= 0
    real_seeds = seed_ids[real]
    nbr, eid, mask = sample_neighbors_fixed(
        g, real_seeds, fanout, replace=replace, prob=prob,
        seed=int(rng.integers(2**31)),
    )
    # global->local map: seeds first (dst slots), then new unique sources
    src_ids = np.full(cap_src, -1, dtype=np.int64)
    src_ids[:cap_dst] = seed_ids
    lookup = {}
    for i, s in enumerate(seed_ids):
        if s >= 0 and s not in lookup:
            lookup[int(s)] = i
    nxt = cap_dst
    # edges: (cap_dst-1) real slots x fanout (sink slot contributes padding)
    E = cap_src  # cap_dst*(1+fanout) >= cap_dst*fanout; use exact cap below
    Ecap = cap_dst * fanout
    esrc = np.full(Ecap, sink_src, dtype=np.int64)
    edst = np.full(Ecap, sink_dst, dtype=np.int64)
    eids_out = np.zeros(Ecap, dtype=np.int64)
    emask = np.zeros(Ecap, dtype=bool)
    row_of_seed = np.nonzero(real)[0]
    k = 0
    for r, slot in enumerate(row_of_seed):
        for j in range(fanout):
            if not mask[r, j]:
                continue
            u = int(nbr[r, j])
            loc = lookup.get(u)
            if loc is None:
                loc = nxt
                lookup[u] = loc
                src_ids[loc] = u
                nxt += 1
            pos = slot * fanout + j
            esrc[pos] = loc
            edst[pos] = slot
            eids_out[pos] = eid[r, j]
            emask[pos] = True
    return _finalize_block(
        g, seed_ids, cap_dst, cap_src, src_ids, esrc, edst, eids_out, emask
    ), src_ids


def _mask_excluded_edges(block, exclude_eids):
    """Post-hoc edge exclusion (link prediction leakage control): excluded
    edges keep their slots but are masked AND rerouted to the padding sink,
    so shapes stay static and the aggregation ignores them. Effective
    fanout shrinks by the number of excluded picks (the reference resamples
    instead; acceptable bias for bounded exclusion sets)."""
    import jax.numpy as jnp

    cet = block.canonical_etypes[0]
    eids = np.asarray(block._edge_frames[cet][EID])
    emask = np.asarray(block._edge_frames[cet]["_mask"])
    bad = np.isin(eids, np.asarray(exclude_eids)) & emask
    if not bad.any():
        return
    rel = block._relations[cet]
    sink_dst = rel.num_dst - 1
    # reroute: since aggregation uses csc order, rebuild the relation with
    # excluded edges pointed at the sink
    esrc = np.asarray(rel.src).copy()
    edst = np.asarray(rel.dst).copy()
    esrc[bad] = sink_dst
    edst[bad] = sink_dst
    from ..graph import Relation

    new_rel = Relation.from_coo(
        esrc, edst, rel.num_src, rel.num_dst, to_device=False
    )
    new_rel.max_in_degree = rel.max_in_degree
    new_rel.max_out_degree = rel.max_out_degree
    new_rel.uniform_stride = rel.uniform_stride
    block._relations[cet] = new_rel
    emask = emask & ~bad
    block._edge_frames[cet]["_mask"] = emask


def _finalize_block(g, seed_ids, cap_dst, cap_src, src_ids, esrc, edst,
                    eids_out, emask):
    from .. import convert
    import jax.numpy as jnp

    Ecap = cap_dst * (cap_src // cap_dst - 1)
    block = convert.create_block(
        {("_N", "_E", "_N"): (esrc, edst)},
        num_src_nodes={"_N": cap_src},
        num_dst_nodes={"_N": cap_dst},
        idtype=g.idtype,
        to_device=False,  # host-side arrays: jit converts once per step
    )
    # static degree bounds so every batch shares one pytree treedef (the
    # data-dependent max degrees would otherwise force recompiles)
    brel = block._relations[("_N", "_E", "_N")]
    brel.max_in_degree = Ecap
    brel.max_out_degree = Ecap
    # dst-major layout with exactly `fanout` slots per dst (padding slots
    # carry dst == sink): segment reductions lower to reshape+reduce
    brel.uniform_stride = cap_src // cap_dst - 1
    block._node_frames.setdefault("_N", {})[NID] = np.where(
        src_ids >= 0, src_ids, 0
    )
    block._node_frames["_N"]["_mask"] = src_ids >= 0
    block._dst_frames.setdefault("_N", {})[NID] = np.where(
        seed_ids >= 0, seed_ids, 0
    )
    block._dst_frames["_N"]["_mask"] = seed_ids >= 0
    cet = block.canonical_etypes[0]
    block._edge_frames.setdefault(cet, {})[EID] = eids_out
    block._edge_frames[cet]["_mask"] = emask
    return block


class FixedShapeNeighborSampler(BlockSampler):
    """Static-shape multi-layer sampler for jit-compiled training.

    Every call returns blocks whose shapes depend only on (batch_size,
    fanouts) — one compilation for the whole epoch. Seed batches shorter
    than ``batch_size`` are padded (mask in ``dstdata['_mask']``).
    """

    def __init__(self, fanouts: Sequence[int], batch_size: int,
                 replace=False, prob=None, seed=None, **kwargs):
        super().__init__(**kwargs)
        self.fanouts = list(fanouts)
        self.batch_size = batch_size
        self.replace = replace
        self.prob = prob
        self._rng = np.random.default_rng(seed)

    def sample_blocks(self, g, seed_nodes, exclude_eids=None):
        seed_nodes = np.asarray(seed_nodes).astype(np.int64)
        if seed_nodes.shape[0] > self.batch_size:
            raise DGLError(
                f"got {seed_nodes.shape[0]} seeds > batch_size {self.batch_size}"
            )
        # pad seeds to batch_size + 1 sink slot
        cap0 = self.batch_size + 1
        cur = np.full(cap0, -1, dtype=np.int64)
        cur[: seed_nodes.shape[0]] = seed_nodes
        output_nodes = seed_nodes
        blocks = []
        for fanout in reversed(self.fanouts):
            block, cur = _build_padded_block(
                g, cur, fanout, self._rng, self.replace, self.prob
            )
            if exclude_eids is not None:
                _mask_excluded_edges(block, exclude_eids)
            blocks.insert(0, block)
        return cur, output_nodes, blocks
