"""Subgraph extraction tests (mirrors reference tests/python/common/test_subgraph.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import subgraph as S
from dgl_tpu.base import EID, NID


@pytest.fixture
def g():
    # 0->1, 0->2, 1->2, 2->3, 3->0
    g = dgl.graph(([0, 0, 1, 2, 3], [1, 2, 2, 3, 0]))
    g.ndata["x"] = jnp.arange(8.0).reshape(4, 2)
    g.edata["w"] = jnp.arange(5.0)
    return g


def test_node_subgraph(g):
    sg = S.node_subgraph(g, [0, 1, 2])
    assert sg.num_nodes() == 3
    # edges among {0,1,2}: 0->1, 0->2, 1->2
    assert sg.num_edges() == 3
    np.testing.assert_array_equal(np.asarray(sg.ndata[NID]), [0, 1, 2])
    np.testing.assert_array_equal(np.asarray(sg.edata[EID]), [0, 1, 2])
    np.testing.assert_allclose(
        np.asarray(sg.ndata["x"]), np.arange(6.0).reshape(3, 2)
    )
    u, v = sg.edges()
    assert set(zip(np.asarray(u).tolist(), np.asarray(v).tolist())) == {
        (0, 1), (0, 2), (1, 2)
    }


def test_node_subgraph_bool_mask(g):
    sg = S.node_subgraph(g, np.array([True, True, True, False]))
    assert sg.num_nodes() == 3 and sg.num_edges() == 3


def test_edge_subgraph_relabel(g):
    sg = S.edge_subgraph(g, [3, 4])  # 2->3, 3->0
    assert sg.num_edges() == 2
    assert sg.num_nodes() == 3  # nodes {2,3,0}
    np.testing.assert_array_equal(np.asarray(sg.edata[EID]), [3, 4])
    # check endpoints map back correctly
    nid = np.asarray(sg.ndata[NID])
    u, v = sg.edges()
    pairs = {
        (nid[int(a)], nid[int(b)])
        for a, b in zip(np.asarray(u), np.asarray(v))
    }
    assert pairs == {(2, 3), (3, 0)}


def test_edge_subgraph_no_relabel(g):
    sg = S.edge_subgraph(g, [0], relabel_nodes=False)
    assert sg.num_nodes() == 4 and sg.num_edges() == 1


def test_in_out_subgraph(g):
    sg = S.in_subgraph(g, [2])
    assert sg.num_edges() == 2  # 0->2, 1->2
    sg2 = S.out_subgraph(g, [0])
    assert sg2.num_edges() == 2  # 0->1, 0->2


def test_khop_in_subgraph(g):
    sg, inv = S.khop_in_subgraph(g, [3], 1)
    # 1-hop in: node 2 -> 3; nodes {2, 3}
    assert sg.num_nodes() == 2
    nid = np.asarray(sg.ndata[NID])
    assert set(nid.tolist()) == {2, 3}
    assert nid[int(inv[0])] == 3


def test_khop_out_subgraph(g):
    sg, inv = S.khop_out_subgraph(g, [0], 2)
    # 0 -> {1,2} -> {2,3}: nodes {0,1,2,3}
    assert sg.num_nodes() == 4


def test_hetero_node_subgraph():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        }
    )
    sg = S.node_subgraph(g, {"user": [0, 1], "game": [0]})
    assert sg.num_nodes("user") == 2
    assert sg.num_nodes("game") == 1
    assert sg.num_edges(("user", "follows", "user")) == 1
    assert sg.num_edges(("user", "plays", "game")) == 2


def test_node_type_subgraph():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        }
    )
    sg = S.node_type_subgraph(g, ["user"])
    assert sg.ntypes == ["user"]
    assert sg.num_edges() == 2
    sg2 = S.edge_type_subgraph(g, ["plays"])
    assert set(sg2.ntypes) == {"user", "game"}
