"""Transforms tests (mirrors reference tests/python/common/test_transform.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import transforms as T


@pytest.fixture
def g():
    g = dgl.graph(([0, 0, 1, 2, 3], [1, 2, 2, 3, 0]))
    g.edata["w"] = jnp.arange(1.0, 6.0)
    return g


def test_add_remove_self_loop(g):
    g2 = T.add_self_loop(g)
    assert g2.num_edges() == g.num_edges() + g.num_nodes()
    # new self-loop edges get fill_data=1
    w = np.asarray(g2.edata["w"])
    np.testing.assert_allclose(w[:5], np.arange(1.0, 6.0))
    np.testing.assert_allclose(w[5:], 1.0)
    g3 = T.remove_self_loop(g2)
    assert g3.num_edges() == g.num_edges()


def test_add_reverse_edges(g):
    g2 = T.add_reverse_edges(g, copy_edata=True)
    assert g2.num_edges() == 10
    u, v = g2.edges()
    np.testing.assert_array_equal(np.asarray(u)[5:], np.asarray(v)[:5])
    np.testing.assert_allclose(np.asarray(g2.edata["w"])[5:], np.arange(1.0, 6.0))


def test_add_remove_edges(g):
    g2 = T.add_edges(g, [1], [3])
    assert g2.num_edges() == 6
    assert bool(g2.has_edges_between(1, 3))
    g3 = T.remove_edges(g, [0, 2])
    assert g3.num_edges() == 3
    np.testing.assert_allclose(np.asarray(g3.edata["w"]), [2.0, 4.0, 5.0])


def test_add_nodes(g):
    g.ndata["x"] = jnp.ones((4, 2))
    g2 = T.add_nodes(g, 2)
    assert g2.num_nodes() == 6
    assert g2.ndata["x"].shape == (6, 2)
    np.testing.assert_allclose(np.asarray(g2.ndata["x"])[4:], 0.0)


def test_to_bidirected():
    g = dgl.graph(([0, 1, 1], [1, 0, 2]))
    g2 = T.to_bidirected(g)
    assert g2.num_edges() == 4  # (0,1),(1,0),(1,2),(2,1)


def test_to_simple():
    g = dgl.graph(([0, 0, 0, 1], [1, 1, 2, 2]))
    sg, wb = T.to_simple(g, writeback_mapping=True)
    assert sg.num_edges() == 3
    cnt = np.asarray(sg.edata["count"])
    assert cnt.sum() == 4
    assert wb.shape == (4,)


def test_khop_graph():
    g = dgl.graph(([0, 1, 2], [1, 2, 3]))
    g2 = T.khop_graph(g, 2)
    u, v = g2.edges()
    pairs = set(zip(np.asarray(u).tolist(), np.asarray(v).tolist()))
    assert pairs == {(0, 2), (1, 3)}


def test_khop_adj():
    g = dgl.graph(([0, 1, 2], [1, 2, 3]))
    a2 = np.asarray(T.khop_adj(g, 2))
    assert a2[0, 2] == 1 and a2[1, 3] == 1 and a2.sum() == 2


def test_knn_graph():
    x = jnp.array([[0.0], [0.1], [10.0], [10.1]])
    g = T.knn_graph(x, 2)
    assert g.num_edges() == 8
    # each node's neighbors are within its cluster
    assert bool(g.has_edges_between(0, 1))
    assert not bool(g.has_edges_between(2, 1))


def test_line_graph():
    g = dgl.graph(([0, 1, 1], [1, 0, 2]))
    lg = T.line_graph(g)
    assert lg.num_nodes() == 3
    u, v = lg.edges()
    pairs = set(zip(np.asarray(u).tolist(), np.asarray(v).tolist()))
    # e0:0->1 feeds e1:1->0 and e2:1->2; e1:1->0 feeds e0
    assert pairs == {(0, 1), (0, 2), (1, 0)}
    lg2 = T.line_graph(g, backtracking=False)
    u, v = lg2.edges()
    pairs2 = set(zip(np.asarray(u).tolist(), np.asarray(v).tolist()))
    assert pairs2 == {(0, 2)}


def test_gcn_norm(g):
    del g.edata["w"]
    g2 = T.GCNNorm()(g)
    w = np.asarray(g2.edata["w"])
    rel = g2._relation(None)
    src = np.asarray(rel.src)
    dst = np.asarray(rel.dst)
    din = np.asarray(rel.in_degrees())
    dout = np.asarray(rel.out_degrees())
    expect = 1.0 / np.sqrt(dout[src] * din[dst])
    np.testing.assert_allclose(w, expect, rtol=1e-5)


def test_compose_and_modules(g):
    t = T.Compose([T.RemoveSelfLoop(), T.AddSelfLoop()])
    g2 = t(g)
    assert g2.num_edges() == 9


def test_drop_edge(g):
    g2 = T.DropEdge(p=0.5, seed=0)(g)
    assert g2.num_edges() <= 5


def test_random_walk_pe():
    g = dgl.graph(([0, 1, 1, 2], [1, 0, 2, 1]))
    pe = T.random_walk_pe(g, 2)
    assert pe.shape == (3, 2)
    # one-step return probability is 0 for all nodes
    np.testing.assert_allclose(np.asarray(pe)[:, 0], 0.0)


def test_lap_pe():
    g = dgl.graph(([0, 1, 1, 2], [1, 0, 2, 1]))
    pe = T.lap_pe(g, 2)
    assert pe.shape == (3, 2)


def test_laplacian_lambda_max():
    g = dgl.graph(([0, 1, 1, 2], [1, 0, 2, 1]))
    lmax = T.laplacian_lambda_max(g)
    assert len(lmax) == 1 and 0 < lmax[0] <= 2.01


def test_shortest_dist():
    g = dgl.graph(([0, 1, 2], [1, 2, 3]))
    d = np.asarray(T.shortest_dist(g))
    assert d[0, 3] == 3 and d[3, 0] == -1


def test_metapath_reachable_graph():
    g = dgl.heterograph(
        {
            ("user", "plays", "game"): ([0, 1], [0, 1]),
            ("game", "played-by", "user"): ([0, 1], [1, 0]),
        }
    )
    mg = T.metapath_reachable_graph(g, ["plays", "played-by"])
    u, v = mg.edges()
    pairs = set(zip(np.asarray(u).tolist(), np.asarray(v).tolist()))
    assert pairs == {(0, 1), (1, 0)}


def test_to_block():
    # frontier: edges into seeds {2, 3}
    g = dgl.graph(([0, 1, 4], [2, 2, 3]))
    blk = T.to_block(g, dst_nodes=[2, 3])
    assert blk.is_block
    assert blk.num_dst_nodes() == 2
    # src = dst-first {2,3} + {0,1,4}
    assert blk.num_src_nodes() == 5
    nid = np.asarray(blk.srcdata[dgl.NID])
    np.testing.assert_array_equal(nid[:2], [2, 3])
    assert set(nid[2:].tolist()) == {0, 1, 4}


def test_functional_tail():
    """remove_nodes / radius / segmented knn / casts / perms / adj algebra
    (the last slice of the reference functional surface)."""
    from dgl_tpu import transforms as T
    F = T.functional

    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 20, 80), rng.integers(0, 20, 80)),
                  num_nodes=20)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(20, 3)), jnp.float32)

    g2 = F.remove_nodes(g, [0, 5])
    assert g2.num_nodes() == 18
    rel = g._relation(None)
    kept = sum(
        1 for s, d in zip(np.asarray(rel.src)[:80], np.asarray(rel.dst)[:80])
        if s not in (0, 5) and d not in (0, 5)
    )
    assert g2.num_edges() == kept

    pts = rng.normal(size=(10, 2))
    gr = F.radius_graph(pts, 0.8)
    d = np.sqrt(((pts[:, None] - pts[None]) ** 2).sum(-1))
    np.fill_diagonal(d, np.inf)
    assert gr.num_edges() == int((d <= 0.8).sum())

    gs = F.segmented_knn_graph(rng.normal(size=(12, 2)), 3, [5, 7])
    # no edge crosses the segment boundary
    rel = gs._relation(None)
    s, dd = np.asarray(rel.src), np.asarray(rel.dst)
    assert not np.any((s < 5) != (dd < 5))

    gb = F.to_bfloat16(g)
    assert gb.ndata["h"].dtype == jnp.bfloat16
    assert g.ndata["h"].dtype == jnp.float32  # original untouched

    nrm = np.asarray(F.norm_by_dst(g))
    deg = np.asarray(g.in_degrees())
    np.testing.assert_allclose(
        nrm, 1.0 / np.maximum(deg, 1)[np.asarray(g._relation(None).dst)],
        rtol=1e-6,
    )

    perm = F.rcmk_perm(g)
    assert sorted(perm) == list(range(20))

    # adjacency algebra vs scipy
    import scipy.sparse as sp
    w = rng.random(80).astype(np.float32)
    g.edata["w"] = jnp.asarray(w)
    P = F.adj_product_graph(g, g, "w")
    a = sp.coo_matrix(
        (w, (np.asarray(g._relation(None).src)[:80],
             np.asarray(g._relation(None).dst)[:80])), shape=(20, 20)
    ).tocsr()
    want = (a @ a).tocoo()
    got = sp.coo_matrix(
        (np.asarray(P.edata["w"]),
         (np.asarray(P._relation(None).src)[: P.num_edges()],
          np.asarray(P._relation(None).dst)[: P.num_edges()])),
        shape=(20, 20),
    )
    np.testing.assert_allclose(got.toarray(), want.toarray(), rtol=1e-4)


def test_sort_by_tag():
    from dgl_tpu.transforms import functional as F

    rng = np.random.default_rng(2)
    src = rng.integers(0, 15, 60)
    dst = rng.integers(0, 15, 60)
    g = dgl.graph((src, dst), num_nodes=15)
    tags = rng.integers(0, 3, 15)
    g2 = F.sort_csr_by_tag(g, tags)
    rel = g2._relation(None)
    indptr = np.asarray(rel.csr_indptr)
    cols = np.asarray(rel.csr_indices)
    offs = np.asarray(g2.ndata["_TAG_OFFSET"])
    for v in range(15):
        row = cols[indptr[v]:indptr[v + 1]]
        rt = tags[row]
        assert np.all(np.diff(rt) >= 0), "row must be tag-sorted"
        for tg in range(3):
            blk = row[offs[v, tg]:offs[v, tg + 1]]
            assert np.all(tags[blk] == tg)
    # same edges survive
    assert g2.num_edges() == 60
    g3 = F.sort_csc_by_tag(g, tags)
    relc = g3._relation(None)
    iptr = np.asarray(relc.csc_indptr)
    rows = np.asarray(relc.csc_indices)
    for v in range(15):
        rt = tags[rows[iptr[v]:iptr[v + 1]]]
        assert np.all(np.diff(rt) >= 0)


def test_module_transform_wrappers():
    from dgl_tpu import transforms as T

    rng = np.random.default_rng(3)
    g = dgl.graph((rng.integers(0, 12, 40), rng.integers(0, 12, 40)),
                  num_nodes=12)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(12, 4)), jnp.float32)

    lg = T.LineGraph()(g)
    assert lg.num_nodes() == 40

    g2 = T.NodeShuffle(seed=0)(g)
    assert g2.num_nodes() == 12 and g2.num_edges() == 40

    g3 = T.LaplacianPE(k=3, feat_name="PE", padding=True)(g.local_var())
    assert g3.ndata["PE"].shape == (12, 3)

    g4 = T.SVDPE(k=2, padding=True)(g.local_var())
    assert g4.ndata["svd_pe"].shape == (12, 4)

    levi = T.ToLevi()(g)
    assert levi.num_nodes() >= 12 + 40 - 1  # nodes + edge-nodes

    p = T.PPR(alpha=0.2)(g)
    assert p.num_edges() > 0

    # AddMetaPaths on a tiny heterograph
    hg = dgl.heterograph({
        ("a", "ab", "b"): ([0, 1, 2], [0, 0, 1]),
        ("b", "ba", "a"): ([0, 1], [1, 2]),
    })
    out = T.AddMetaPaths({"aba": ["ab", "ba"]})(hg)
    assert ("a", "aba", "a") in out.canonical_etypes
    assert ("a", "ab", "b") in out.canonical_etypes


def test_knn_segmented_query():
    import dgl_tpu as dgl

    rng = np.random.default_rng(0)
    # two segments of x, self-query
    x = rng.normal(size=(12, 3))
    segs = np.array([7, 5])
    out = dgl.knn(2, x, segs)
    assert out.shape == (2, 24)
    src, dst = out
    # queries in segment 0 only match x points in segment 0
    assert (src[dst < 7] < 7).all() and (src[dst >= 7] >= 7).all()
    # nearest neighbor of each self-query point is itself
    self_hits = src[::2]
    np.testing.assert_array_equal(self_hits, np.arange(12))
    # separate y query
    y = x[:4] + 1e-9
    yout = dgl.knn(1, x, segs, y=y, y_segs=np.array([4, 0]))
    np.testing.assert_array_equal(yout[0], np.arange(4))
    # brute-force check vs scipy on one segment
    from scipy.spatial import cKDTree

    tree = cKDTree(x[:7])
    _, idx = tree.query(x[:7], k=2)
    got = src[dst < 7].reshape(7, 2)
    assert set(map(tuple, np.sort(got, 1))) == set(
        map(tuple, np.sort(idx, 1))
    )


def test_is_bidirected():
    import dgl_tpu as dgl

    g1 = dgl.graph((np.array([0, 1]), np.array([1, 0])), num_nodes=2)
    assert dgl.is_bidirected(g1)
    g2 = dgl.graph((np.array([0, 1]), np.array([1, 2])), num_nodes=3)
    assert not dgl.is_bidirected(g2)
    # multiplicity matters
    g3 = dgl.graph(
        (np.array([0, 0, 1]), np.array([1, 1, 0])), num_nodes=2
    )
    assert not dgl.is_bidirected(g3)


def test_update_graph_structure():
    import dgl_tpu as dgl

    g = dgl.graph((np.array([0, 1]), np.array([1, 2])), num_nodes=4)
    g.ndata["h"] = jnp.arange(4.0)
    g.edata["w"] = jnp.arange(2.0)
    nt, et = g.ntypes[0], g.canonical_etypes[0]
    new_g = dgl.update_graph_structure(
        g, {et: (np.array([2, 3]), np.array([0, 1]))}
    )
    assert new_g.num_nodes() == 4 and new_g.num_edges() == 2
    np.testing.assert_allclose(np.asarray(new_g.ndata["h"]), np.arange(4.0))
    u, v = (np.asarray(a) for a in new_g.edges())
    assert u.tolist() == [2, 3] and v.tolist() == [0, 1]


def test_partition_graph_with_halo():
    import dgl_tpu as dgl
    from dgl_tpu.base import NID

    rng = np.random.default_rng(0)
    src = rng.integers(0, 30, 200)
    dst = rng.integers(0, 30, 200)
    g = dgl.graph((src, dst), num_nodes=30)
    node_part = (np.arange(30) >= 15).astype(np.int64)
    parts, orig_nids, orig_eids = dgl.partition_graph_with_halo(
        g, node_part, extra_cached_hops=1
    )
    assert orig_nids is None and set(parts) == {0, 1}
    # inner nodes of part p are exactly the assigned ones
    for p in (0, 1):
        sub = parts[p]
        nid = np.asarray(sub.ndata[NID])
        inner = np.asarray(sub.ndata["inner_node"]).astype(bool)
        assert set(nid[inner].tolist()) == set(
            np.nonzero(node_part == p)[0].tolist()
        )
        # halo nodes are 1-hop in-neighbors of inner nodes
        halo = set(nid[~inner].tolist())
        expect_halo = set(src[np.isin(dst, nid[inner])].tolist()) - set(
            nid[inner].tolist()
        )
        assert halo == expect_halo
        # inner edges point at inner nodes
        _, d = sub.edges()
        ie = np.asarray(sub.edata["inner_edge"]).astype(bool)
        assert set(np.asarray(d)[ie].tolist()) <= set(
            np.nonzero(inner)[0].tolist()
        )
    # reshuffle round-trips ids
    parts_r, orig_n, orig_e = dgl.partition_graph_with_halo(
        g, node_part, 1, reshuffle=True
    )
    assert orig_n is not None and np.sort(orig_n).tolist() == list(range(30))
    assert np.sort(orig_e).tolist() == list(range(200))


def test_metis_partition_subgraphs():
    import dgl_tpu as dgl

    rng = np.random.default_rng(1)
    src = rng.integers(0, 50, 400)
    dst = rng.integers(0, 50, 400)
    g = dgl.graph((src, dst), num_nodes=50)
    parts = dgl.metis_partition(g, 3, extra_cached_hops=1)
    assert set(parts) == {0, 1, 2}
    inner_total = sum(
        int(np.asarray(p.ndata["inner_node"]).sum()) for p in parts.values()
    )
    assert inner_total == 50
