"""Tests for ClusterGCN/SAINT/ShaDow samplers + negative samplers +
edge-prediction wrapper."""
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import dataloading as dl
from dgl_tpu.base import NID


@pytest.fixture
def g():
    rng = np.random.default_rng(0)
    return dgl.graph(
        (rng.integers(0, 200, 2000), rng.integers(0, 200, 2000)),
        num_nodes=200,
    )


def test_cluster_gcn(g):
    s = dl.ClusterGCNSampler(g, 8)
    covered = set()
    for c in range(8):
        sg = s.sample(g, [c])
        covered.update(np.asarray(sg.ndata[NID]).tolist())
    assert covered == set(range(200))


def test_saint_modes(g):
    for mode, budget in [("node", 50), ("edge", 100), ("walk", (10, 4))]:
        sg = dl.SAINTSampler(mode, budget, seed=0).sample(g)
        assert sg.num_nodes() > 0
        if mode == "edge":
            assert sg.num_edges() == 100


def test_shadow(g):
    order, seeds, sg = dl.ShaDowKHopSampler([5, 5], seed=0).sample(g, [0, 1, 2])
    nid = np.asarray(sg.ndata[NID])
    np.testing.assert_array_equal(nid[:3], [0, 1, 2])
    # all 1-hop in-neighbors of the seeds must be present (fanout 5 bound)
    assert sg.num_nodes() >= 3


def test_negative_uniform(g):
    s, d = dl.Uniform(3, seed=0)(g, [0, 1])
    assert s.shape == (6,) and d.shape == (6,)
    rel = g._relation(None)
    np.testing.assert_array_equal(
        s, np.repeat(np.asarray(rel.src)[[0, 1]], 3)
    )


def test_edge_prediction_sampler(g):
    eps = dl.as_edge_prediction_sampler(
        dl.NeighborSampler([3], seed=0),
        negative_sampler=dl.Uniform(1, seed=0),
    )
    input_nodes, pair_g, neg_g, blocks = eps.sample(g, np.arange(8))
    assert pair_g.num_edges() == 8
    assert neg_g.num_edges() >= 1
    assert len(blocks) == 1
    # compacted node spaces line up
    assert pair_g.num_nodes() == neg_g.num_nodes()


def test_edge_prediction_exclude(g):
    eps = dl.as_edge_prediction_sampler(
        dl.NeighborSampler([-1], seed=0), exclude="self"
    )
    seed_edges = np.arange(8)
    input_nodes, pair_g, blocks = eps.sample(g, seed_edges)
    from dgl_tpu.base import EID

    sampled_eids = np.asarray(blocks[0].edata[EID])
    assert not np.isin(seed_edges, sampled_eids).any()
