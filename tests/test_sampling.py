"""Sampling tests (mirrors reference tests/python/common/sampling/)."""
import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu import sampling
from dgl_tpu.base import EID


@pytest.fixture
def g():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 50, 500)
    dst = rng.integers(0, 50, 500)
    return dgl.graph((src, dst), num_nodes=50)


def test_sample_neighbors_in(g):
    sg = sampling.sample_neighbors(g, [0, 1, 2], 5, seed=0)
    assert sg.num_nodes() == g.num_nodes()
    # every sampled edge points into the seed set
    _, v = sg.edges()
    assert set(np.asarray(v)[: sg.num_edges()].tolist()) <= {0, 1, 2}
    # per-seed cap
    indeg = np.asarray(sg.in_degrees())
    assert (indeg[[0, 1, 2]] <= 5).all()


def test_sample_neighbors_all(g):
    sg = sampling.sample_neighbors(g, [3], -1, seed=0)
    assert sg.num_edges() == int(np.asarray(g.in_degrees())[3])


def test_sample_neighbors_out(g):
    sg = sampling.sample_neighbors(g, [0], 3, edge_dir="out", seed=0)
    u, _ = sg.edges()
    assert set(np.asarray(u)[: sg.num_edges()].tolist()) <= {0}


def test_sample_neighbors_replace(g):
    sg = sampling.sample_neighbors(g, [0], 100, replace=True, seed=0)
    assert sg.num_edges() == 100 or np.asarray(g.in_degrees())[0] == 0


def test_sample_neighbors_prob(g):
    import jax.numpy as jnp

    w = np.zeros(g.num_edges(), np.float32)
    rel = g._relation(None)
    dst = np.asarray(rel.dst)
    # only edges into node 0 with even eid have weight
    w[(dst == 0) & (np.arange(g.num_edges()) % 2 == 0)] = 1.0
    g.edata["p"] = jnp.asarray(w)
    sg = sampling.sample_neighbors(g, [0], 3, prob="p", seed=0)
    eids = np.asarray(sg.edata[EID])
    assert (eids % 2 == 0).all()


def test_sample_neighbors_exclude(g):
    rel = g._relation(None)
    indeg0 = int(np.asarray(g.in_degrees())[0])
    if indeg0 == 0:
        pytest.skip("node 0 has no in-edges")
    excl = np.asarray(rel.csc_eids)[: indeg0]  # all in-edges of node 0
    sg = sampling.sample_neighbors(g, [0], -1, exclude_edges=excl, seed=0)
    assert sg.num_edges() == 0


def test_sample_neighbors_fixed(g):
    nbr, eid, mask = sampling.sample_neighbors_fixed(g, [0, 1, 2, 3], 7, seed=0)
    assert nbr.shape == (4, 7) and mask.dtype == bool
    deg = np.asarray(g.in_degrees())
    for i, s in enumerate([0, 1, 2, 3]):
        assert mask[i].sum() == min(deg[s], 7)
    # edge ids consistent with endpoints
    rel = g._relation(None)
    src, dst = np.asarray(rel.src), np.asarray(rel.dst)
    for i, s in enumerate([0, 1, 2, 3]):
        for j in range(7):
            if mask[i, j]:
                assert src[eid[i, j]] == nbr[i, j]
                assert dst[eid[i, j]] == s


def test_random_walk():
    g = dgl.graph(([0, 1, 2, 3], [1, 2, 3, 0]))
    traces, types = sampling.random_walk(g, [0, 1], length=4, seed=0)
    np.testing.assert_array_equal(traces[0], [0, 1, 2, 3, 0])
    np.testing.assert_array_equal(traces[1], [1, 2, 3, 0, 1])
    assert types.shape == (5,)


def test_random_walk_terminates():
    g = dgl.graph(([0], [1]), num_nodes=3)
    traces, _ = sampling.random_walk(g, [0, 2], length=3, seed=0)
    np.testing.assert_array_equal(traces[0], [0, 1, -1, -1])
    np.testing.assert_array_equal(traces[1], [2, -1, -1, -1])


def test_random_walk_metapath():
    g = dgl.heterograph(
        {
            ("user", "plays", "game"): ([0, 1], [0, 1]),
            ("game", "played-by", "user"): ([0, 1], [1, 0]),
        }
    )
    traces, types = sampling.random_walk(
        g, [0], metapath=["plays", "played-by"], seed=0
    )
    assert traces.shape == (1, 3)
    assert traces[0, 0] == 0


def test_node2vec():
    g = dgl.graph(([0, 1, 2, 3], [1, 2, 3, 0]))
    tr = sampling.node2vec_random_walk(g, [0], 1.0, 1.0, 4, seed=0)
    np.testing.assert_array_equal(tr[0], [0, 1, 2, 3, 0])


def test_pack_traces():
    traces = np.array([[0, 1, -1], [2, 3, 4]])
    types = np.array([0, 0, 0])
    vids, tps, lengths, offsets = sampling.pack_traces(traces, types)
    np.testing.assert_array_equal(vids, [0, 1, 2, 3, 4])
    np.testing.assert_array_equal(lengths, [2, 3])
    np.testing.assert_array_equal(offsets, [0, 2])


def test_negative_sampling(g):
    src, dst = sampling.global_uniform_negative_sampling(g, 40, seed=0)
    assert src.shape[0] <= 40
    rel = g._relation(None)
    existing = set(
        zip(np.asarray(rel.src).tolist(), np.asarray(rel.dst).tolist())
    )
    for a, b in zip(src, dst):
        assert (a, b) not in existing
        assert a != b


def test_labor(g):
    sg, imp = sampling.sample_labors(g, np.arange(50), 5, random_seed=0)
    assert sg.num_nodes() == 50
    # expected sampled degree ~ fanout
    indeg = np.asarray(sg.in_degrees())
    fulldeg = np.asarray(g.in_degrees())
    assert indeg.sum() <= fulldeg.sum()
    assert (indeg[fulldeg <= 5] == fulldeg[fulldeg <= 5]).all()


def test_labor_importance_sampling(g):
    # LABOR-i: importances are per-row mean-preserving (labor_pick.h:271)
    sg, imps = sampling.sample_labors(
        g, np.arange(50), 5, importance_sampling=2, random_seed=0
    )
    imp = imps[0]
    assert imp.shape[0] == sg.num_edges()
    E = sg.num_edges()
    dst = np.asarray(sg._relation(None).dst)[:E]
    for d in np.unique(dst):
        row = imp[dst == d]
        np.testing.assert_allclose(row.mean(), 1.0, rtol=1e-6)
    # convergence mode terminates and matches expected sample size
    sg2, _ = sampling.sample_labors(
        g, np.arange(50), 5, importance_sampling=-1, random_seed=0
    )
    fulldeg = np.asarray(g.in_degrees())[:50]
    want = np.minimum(fulldeg, 5).sum()
    got = np.asarray(sg2.in_degrees())[:50].sum()
    assert 0.5 * want <= got <= 1.6 * want


def test_labor_expected_sample_size(g):
    # E[#picked per seed] ~= min(fanout, deg) for LABOR-0 and LABOR-i
    fulldeg = np.asarray(g.in_degrees())[:50]
    want = np.minimum(fulldeg, 5).sum()
    for isamp in (0, 2):
        tot = 0
        trials = 30
        for t in range(trials):
            sg, _ = sampling.sample_labors(
                g, np.arange(50), 5, importance_sampling=isamp,
                random_seed=t,
            )
            tot += np.asarray(sg.in_degrees())[:50].sum()
        avg = tot / trials
        assert abs(avg - want) / want < 0.15, (isamp, avg, want)


def test_labor_weighted(g):
    rng = np.random.default_rng(0)
    w = rng.random(g.num_edges()).astype(np.float32)
    w[rng.random(g.num_edges()) < 0.2] = 0.0
    g.edata["p"] = w
    sg, imps = sampling.sample_labors(
        g, np.arange(50), 5, prob="p", importance_sampling=1, random_seed=0
    )
    eids = np.asarray(sg.edata["_ID"])
    assert (w[eids] > 0).all()  # zero-weight edges never picked
    assert imps[0].shape[0] == sg.num_edges()


def test_labor_frontier_smaller_than_uniform():
    # the point of LABOR: shared per-source randomness dedups the frontier
    rng = np.random.default_rng(1)
    n, e = 300, 6000
    gg = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                   num_nodes=n)
    seeds = np.arange(100)
    fr_labor, fr_unif = 0, 0
    for t in range(10):
        sg, _ = sampling.sample_labors(gg, seeds, 5, random_seed=t)
        E = sg.num_edges()
        fr_labor += len(np.unique(
            np.asarray(sg._relation(None).src)[:E]
        ))
        su = sampling.sample_neighbors(gg, seeds, 5, seed=t)
        Eu = su.num_edges()
        fr_unif += len(np.unique(
            np.asarray(su._relation(None).src)[:Eu]
        ))
    assert fr_labor < fr_unif


def test_pinsage():
    # bipartite item-user graph
    rng = np.random.default_rng(0)
    iu = (rng.integers(0, 20, 100), rng.integers(0, 10, 100))
    g = dgl.heterograph(
        {
            ("item", "liked-by", "user"): iu,
            ("user", "likes", "item"): (iu[1], iu[0]),
        }
    )
    sampler = sampling.PinSAGESampler(g, "item", "user", 2, 0.2, 10, 3, seed=0)
    out = sampler([0, 1])
    assert out.num_nodes() == 20
    _, v = out.edges()
    assert set(np.asarray(v).tolist()) <= {0, 1}
    assert "weights" in out.edata


def test_temporal_sampling():
    import jax.numpy as jnp

    g = dgl.graph(([0, 1, 2, 3], [4, 4, 4, 4]), num_nodes=5)
    g.ndata["timestamp"] = jnp.asarray([1.0, 2.0, 3.0, 4.0, 3.5])
    nbr, eid, mask = sampling.temporal_sample_neighbors(g, [4], 4, seed=0)
    valid = set(nbr[0][mask[0]].tolist())
    assert valid == {0, 1, 2}  # node 3 (t=4.0) is in the seed's future
    # edge timestamps override
    g.edata["ets"] = jnp.asarray([0.5, 0.5, 9.0, 0.5])
    nbr, eid, mask = sampling.temporal_sample_neighbors(
        g, [4], 4, edge_timestamp="ets", seed=0
    )
    valid = set(nbr[0][mask[0]].tolist())
    assert valid == {0, 1, 3}  # edge from 2 is too new


def test_select_topk():
    from dgl_tpu import sampling

    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 20, 120), rng.integers(0, 20, 120)),
                  num_nodes=20)
    w = rng.random(g._relation(None).num_edges_padded).astype(np.float32)
    g.edata["w"] = jnp.asarray(w)
    sub = sampling.select_topk(g, 3, "w", nodes=np.arange(20))
    rel = g._relation(None)
    eid = np.asarray(sub.edata[dgl.base.EID] if hasattr(dgl, "base")
                     else sub.edata["_ID"])
    dst = np.asarray(rel.dst)
    E = rel.num_edges
    for v in range(20):
        row = np.nonzero(dst[:E] == v)[0]
        got = np.sort(eid[np.asarray(dst[eid]) == v])
        want = row[np.argsort(-w[row], kind="stable")][: min(3, row.size)]
        np.testing.assert_array_equal(got, np.sort(want))


def test_sample_neighbors_biased():
    from dgl_tpu import sampling, transforms

    rng = np.random.default_rng(1)
    g = dgl.graph((rng.integers(0, 25, 300), rng.integers(0, 25, 300)),
                  num_nodes=25)
    tags = rng.integers(0, 2, 25)
    gs = transforms.sort_csc_by_tag(g, tags)
    # bias tag 1 only: every sampled edge's src must have tag 1 when the
    # seed has at least one tag-1 in-neighbor
    sub = sampling.sample_neighbors_biased(
        gs, np.arange(25), 4, bias=[0.0, 1.0], seed=0
    )
    rel = gs._relation(None)
    E = rel.num_edges
    src = np.asarray(rel.src)
    eid = np.asarray(sub.edata["_ID"])
    assert eid.size > 0
    assert np.all(tags[src[eid]] == 1)
    # missing tag offsets -> clear error
    with pytest.raises(Exception):
        sampling.sample_neighbors_biased(g, [0], 2, bias=[1.0, 1.0])


def test_sample_etype_neighbors():
    # homogenized 2-etype graph: edge IDs grouped by etype
    # etype 0: edges 0..3 (ring), etype 1: edges 4..9 (stars into node 0/1)
    src = np.array([0, 1, 2, 3, 2, 3, 4, 2, 3, 4])
    dst = np.array([1, 2, 3, 0, 0, 0, 0, 1, 1, 1])
    g = dgl.graph((src, dst), num_nodes=5)
    etype_offset = [0, 4, 10]
    sg = sampling.sample_etype_neighbors(
        g, [0, 1], etype_offset, fanout=np.array([1, 2]), seed=0
    )
    eid = np.asarray(sg.edata[EID])
    et = np.searchsorted(np.asarray(etype_offset), eid, side="right") - 1
    # per seed: at most 1 type-0 edge and 2 type-1 edges
    dsts = np.asarray(sg.edges()[1])
    for s in (0, 1):
        sel = dsts == s
        assert (et[sel] == 0).sum() <= 1
        assert (et[sel] == 1).sum() <= 2
    # fanout -1 keeps all of that type
    sg_all = sampling.sample_etype_neighbors(
        g, [0], etype_offset, fanout=np.array([-1, -1]), seed=0
    )
    assert sg_all.num_edges() == 4  # node 0 has 1 ring + 3 star in-edges
    # per-etype prob: zero out one candidate
    prob = [np.ones(4), np.array([0.0, 1.0, 1.0, 1.0, 1.0, 1.0])]
    sg_p = sampling.sample_etype_neighbors(
        g, [0], etype_offset, fanout=np.array([0, -1]), prob=prob, seed=0
    )
    assert 4 not in np.asarray(sg_p.edata[EID])  # eid 4 has weight 0
    assert (np.asarray(sg_p.edata[EID]) >= 4).all()  # fanout 0 drops type 0


def test_sample_neighbors_fused(g):
    from dgl_tpu.base import NID

    mapping = {}
    sg = sampling.sample_neighbors_fused(g, [7, 3], 4, seed=1, mapping=mapping)
    nid = np.asarray(sg.ndata[NID])
    # seeds take new IDs 0, 1
    assert nid[0] == 7 and nid[1] == 3
    # edges are relabeled consistently: endpoints map back to parents
    u, v = (np.asarray(a) for a in sg.edges())
    parent = sampling.sample_neighbors(g, [7, 3], 4, seed=1)
    pu, pv = (np.asarray(a) for a in parent.edges())
    assert set(zip(nid[u].tolist(), nid[v].tolist())) == set(
        zip(pu.tolist(), pv.tolist())
    )
    # every sampled dst is a seed
    assert set(v.tolist()) <= {0, 1}
    # mapping dict was filled
    nt = g.ntypes[0]
    assert mapping[nt][7] == 0 and mapping[nt][3] == 1
    # node features are gathered into the new numbering
    g.ndata["h"] = jnp.arange(g.num_nodes(), dtype=jnp.float32)
    sg2 = sampling.sample_neighbors_fused(g, [7, 3], 4, seed=1)
    np.testing.assert_allclose(
        np.asarray(sg2.ndata["h"]), np.asarray(sg2.ndata[NID]).astype(float)
    )


def test_eid_excluder(g):
    frontier = sampling.sample_neighbors(g, [0, 1, 2], 5, seed=0)
    eids = np.asarray(frontier.edata[EID])
    banned = eids[:2]
    out = sampling.EidExcluder(banned)(frontier)
    kept = np.asarray(out.edata[EID])
    assert not np.isin(kept, banned).any()
    assert kept.shape[0] == eids.shape[0] - 2
    # parent EIDs of survivors are preserved
    assert set(kept.tolist()) == set(eids[2:].tolist())
