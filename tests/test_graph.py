"""Graph object semantics (modeled on reference tests/python/common/test_heterograph.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl


def star_graph():
    # edges: 1->0, 2->0, 3->0, 0->4
    src = np.array([1, 2, 3, 0])
    dst = np.array([0, 0, 0, 4])
    return dgl.graph((src, dst), num_nodes=5)


def test_graph_basics():
    g = star_graph()
    assert g.num_nodes() == 5
    assert g.num_edges() == 4
    assert not g.is_block
    assert g.is_homogeneous
    np.testing.assert_array_equal(np.asarray(g.in_degrees()), [3, 0, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(g.out_degrees()), [1, 1, 1, 1, 0])
    u, v = g.edges()
    np.testing.assert_array_equal(np.asarray(u), [1, 2, 3, 0])
    np.testing.assert_array_equal(np.asarray(v), [0, 0, 0, 4])


def test_graph_ndata_edata():
    g = star_graph()
    x = jnp.arange(10.0).reshape(5, 2)
    g.ndata["h"] = x
    assert "h" in g.ndata
    np.testing.assert_allclose(np.asarray(g.ndata["h"]), np.asarray(x))
    w = jnp.ones((4, 1))
    g.edata["w"] = w
    assert g.edata["w"].shape == (4, 1)
    with pytest.raises(dgl.DGLError):
        g.ndata["bad"] = jnp.ones((3, 2))


def test_csr_csc_consistency():
    rng = np.random.default_rng(0)
    n, e = 50, 200
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl.graph((src, dst), num_nodes=n)
    rel = g._relation()
    indptr = np.asarray(rel.csc_indptr)
    indices = np.asarray(rel.csc_indices)
    eids = np.asarray(rel.csc_eids)
    for d in range(n):
        for p in range(indptr[d], indptr[d + 1]):
            assert dst[eids[p]] == d
            assert src[eids[p]] == indices[p]
    indptr = np.asarray(rel.csr_indptr)
    indices = np.asarray(rel.csr_indices)
    eids = np.asarray(rel.csr_eids)
    for s in range(n):
        for p in range(indptr[s], indptr[s + 1]):
            assert src[eids[p]] == s
            assert dst[eids[p]] == indices[p]
    # csc_dst is sorted expanded dst; csr_src sorted expanded src
    np.testing.assert_array_equal(np.asarray(rel.csc_dst), np.sort(dst))
    np.testing.assert_array_equal(np.asarray(rel.csr_src), np.sort(src))


def test_heterograph_construction():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        }
    )
    assert set(g.ntypes) == {"user", "game"}
    assert g.num_nodes("user") == 3
    assert g.num_nodes("game") == 2
    assert g.num_edges(("user", "plays", "game")) == 3
    assert g.num_edges("follows") == 2
    assert g.to_canonical_etype("plays") == ("user", "plays", "game")
    g.nodes["user"].data["h"] = jnp.ones((3, 4))
    assert g.nodes["user"].data["h"].shape == (3, 4)


def test_graph_pytree():
    g = star_graph()
    g.ndata["h"] = jnp.ones((5, 3))
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2.num_nodes() == 5
    assert g2.ndata["h"].shape == (5, 3)

    @jax.jit
    def f(graph, x):
        return graph.in_degrees().astype(jnp.float32) + x.sum()

    out = f(g, g.ndata["h"])
    assert out.shape == (5,)


def test_reverse():
    g = star_graph()
    g.ndata["h"] = jnp.arange(5.0)
    rg = g.reverse()
    np.testing.assert_array_equal(np.asarray(rg.in_degrees()), np.asarray(g.out_degrees()))
    u, v = rg.edges()
    np.testing.assert_array_equal(np.asarray(u), [0, 0, 0, 4])
    np.testing.assert_array_equal(np.asarray(v), [1, 2, 3, 0])
    assert "h" in rg.ndata


def test_local_scope():
    g = star_graph()
    g.ndata["h"] = jnp.ones((5, 2))
    with g.local_scope():
        g.ndata["tmp"] = jnp.zeros((5, 1))
        assert "tmp" in g.ndata
    assert "tmp" not in g.ndata
    assert "h" in g.ndata


def test_padded_graph():
    # 3 real edges, padded to 6: pad edges point at virtual row (n, n)
    n = 4
    src = np.array([0, 1, 2, n, n, n])
    dst = np.array([1, 2, 3, n, n, n])
    g = dgl.graph((src, dst), num_nodes=n, num_edges=3)
    assert g.num_edges() == 3
    rel = g._relation()
    assert rel.num_edges_padded == 6
    np.testing.assert_array_equal(np.asarray(g.in_degrees()), [0, 1, 1, 1])
    np.testing.assert_array_equal(
        np.asarray(rel.edge_mask()), [True, True, True, False, False, False]
    )


def test_block_creation():
    blk = dgl.create_block(([0, 1, 2], [0, 0, 1]), num_src_nodes=5, num_dst_nodes=2)
    assert blk.is_block
    assert blk.num_src_nodes() == 5
    assert blk.num_dst_nodes() == 2
    assert blk.num_edges() == 3
    blk.srcdata["h"] = jnp.ones((5, 3))
    blk.dstdata["h"] = jnp.zeros((2, 3))
    assert blk.srcdata["h"].shape == (5, 3)
    assert blk.dstdata["h"].shape == (2, 3)


def test_to_homogeneous_roundtrip():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        }
    )
    homo = dgl.to_homogeneous(g)
    assert homo.num_nodes() == 5
    assert homo.num_edges() == 5
    hetero = dgl.to_heterogeneous(homo, ["user", "game"], ["follows", "plays"])
    assert hetero.num_nodes("user") == 3
    assert hetero.num_edges("plays") == 3


def test_adj_and_inc():
    import dgl_tpu as dgl
    import numpy as np

    g = dgl.graph(([0, 1, 2], [1, 2, 0]))
    A = g.adj()
    assert A.shape == (3, 3) and A.nnz == 3
    d = np.asarray(A.to_dense())
    assert d[0, 1] == 1 and d[1, 2] == 1 and d[2, 0] == 1
    I_in = g.inc("in")
    di = np.asarray(I_in.to_dense())
    assert di[1, 0] == 1  # edge 0 enters node 1
    I_both = g.inc("both")
    db = np.asarray(I_both.to_dense())
    assert db[1, 0] == 1 and db[0, 0] == -1


def test_to_networkx_roundtrip():
    import dgl_tpu as dgl
    import numpy as np

    g = dgl.graph(([0, 1], [1, 2]))
    nxg = g.to_networkx()
    g2 = dgl.from_networkx(nxg)
    assert g2.num_nodes() == 3 and g2.num_edges() == 2


def test_pickle_roundtrip():
    """Graph pickling (reference test_heterograph pickling tests)."""
    import pickle

    import jax.numpy as jnp
    import numpy as np

    import dgl_tpu as dgl

    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 2], [0, 1]),
        }
    )
    g._node_frames.setdefault("user", {})["x"] = jnp.arange(3.0)
    g2 = pickle.loads(pickle.dumps(g))
    assert g2.num_nodes("user") == 3 and g2.num_edges("plays") == 2
    np.testing.assert_allclose(
        np.asarray(g2._node_frames["user"]["x"]), [0, 1, 2]
    )


def test_convert_bipartite_and_block_to_graph():
    """bipartite_from_scipy/networkx, block_to_graph, module to_networkx."""
    import scipy.sparse as sp
    import networkx as nx
    from dgl_tpu import convert, dataloading

    m = sp.random(5, 7, density=0.4, random_state=0, format="coo")
    g = convert.bipartite_from_scipy(m, "u", "e", "v", eweight_name="w")
    assert g.num_nodes("u") == 5 and g.num_nodes("v") == 7
    assert g.num_edges(("u", "e", "v")) == m.nnz
    E = g._relations[("u", "e", "v")].num_edges
    np.testing.assert_allclose(
        np.sort(np.asarray(g._edge_frames[("u", "e", "v")]["w"])[:E]),
        np.sort(m.data), rtol=1e-6,
    )

    B = nx.Graph()
    B.add_nodes_from([0, 1, 2], bipartite=0)
    B.add_nodes_from(["a", "b"], bipartite=1)
    B.add_edges_from([(0, "a"), (1, "b"), (2, "a")])
    g2 = convert.bipartite_from_networkx(B, "u", "e", "v")
    assert g2.num_edges(("u", "e", "v")) == 3

    rng = np.random.default_rng(0)
    gg = dgl.graph(
        (rng.integers(0, 30, 100), rng.integers(0, 30, 100)), num_nodes=30
    )
    s = dataloading.NeighborSampler([3], seed=0)
    _, _, blocks = s.sample_blocks(gg, [0, 1, 2])
    bp = convert.block_to_graph(blocks[0])
    assert any(nt.endswith("_src") for nt in bp.ntypes)
    assert any(nt.endswith("_dst") for nt in bp.ntypes)
    assert convert.to_networkx(gg).number_of_edges() == 100


def test_graph_method_tail():
    """subgraph/edge views, filters, in/out_edges, clone, multigraph,
    metagraph (reference heterograph method surface)."""
    rng = np.random.default_rng(4)
    g = dgl.graph((rng.integers(0, 10, 40), rng.integers(0, 10, 40)),
                  num_nodes=10)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)

    sub = g.subgraph([0, 1, 2])
    assert sub.num_nodes() == 3
    es = g.edge_subgraph([0, 1, 2, 3])
    assert es.num_edges() == 4

    u, v = g.in_edges(3)
    rel = g._relation(None)
    dst = np.asarray(rel.dst)
    assert np.all(np.asarray(v) == 3)
    assert len(np.asarray(u)) == int((dst[:40] == 3).sum())
    eids = g.out_edges(2, form="eid")
    src = np.asarray(rel.src)
    assert np.all(src[np.asarray(eids)] == 2)

    ids = g.filter_nodes(lambda nb: nb.data["h"][:, 0] > 0)
    want = np.nonzero(np.asarray(g.ndata["h"])[:, 0] > 0)[0]
    np.testing.assert_array_equal(np.asarray(ids), want)
    eids2 = g.filter_edges(lambda eb: eb.src["h"][:, 0] > 0)
    assert np.all(np.asarray(src)[np.asarray(eids2)] < 10)

    assert bool(np.asarray(g.has_nodes([0, 9, 10]))[2]) is False
    c = g.clone()
    c.ndata["h2"] = jnp.zeros((10, 1))
    assert "h2" not in g.ndata

    gm = dgl.graph(([0, 0], [1, 1]))
    assert gm.is_multigraph
    gs = dgl.graph(([0], [1]))
    assert not gs.is_multigraph
    assert list(g.metagraph().nodes) == ["_N"]


def test_graph_method_delegations():
    g = dgl.graph(([0, 1], [1, 2]))
    assert g.add_self_loop().num_edges() == 5
    assert g.remove_self_loop().num_edges() == 2
    assert g.remove_nodes([0]).num_nodes() == 2
    assert g.add_nodes(2).num_nodes() == 5
    g4 = g.add_edges([2], [0])
    assert g4.num_edges() == 3
    assert g.to_simple().num_edges() == 2
    assert g.khop_graph(2).num_edges() >= 1
    sub = g.sample_neighbors([2], 1)
    assert sub.num_edges() == 1
    src, dst = g.global_uniform_negative_sampling(3)
    assert len(src) == len(dst)
    assert g.get_ntype_id(None) == 0
    assert g.get_etype_id("_E") == 0
    assert g.number_of_src_nodes() == 3
    assert not g.is_unibipartite
    hg = dgl.heterograph({("a", "e", "b"): ([0], [0])})
    assert hg.is_unibipartite
    with pytest.raises(Exception):
        g.get_ntype_id("nope")


def test_formats_restriction_round_trip():
    """g.formats(['csc']) drops CSR (1/3 less index memory); missing-format
    access raises pointing back; formats() reports; rebuild restores."""
    import pytest

    import dgl_tpu as dgl
    from dgl_tpu.base import DGLError

    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 30, 100), rng.integers(0, 30, 100)),
                  num_nodes=30)
    assert g.formats()["created"] == ["coo", "csr", "csc"]
    g_csc = g.formats(["csc"])
    assert g_csc.formats()["created"] == ["coo", "csc"]
    rel = g_csc._relation(None)
    assert rel.csr_indptr is None
    np.testing.assert_array_equal(np.asarray(rel.csc_indptr),
                                  np.asarray(g._relation(None).csc_indptr))
    np.testing.assert_array_equal(np.asarray(g_csc.in_degrees()),
                                  np.asarray(g.in_degrees()))
    with pytest.raises(DGLError, match="CSR format"):
        g_csc.out_degrees()
    g_back = g_csc.formats(["coo", "csr", "csc"])
    np.testing.assert_array_equal(np.asarray(g_back.out_degrees()),
                                  np.asarray(g.out_degrees()))
