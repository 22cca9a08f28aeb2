"""Native weighted/top-k rowwise pick (csrc/host_ops.cpp) semantics.

Mirrors the reference's prob-sampling tests
(``tests/python/common/sampling/test_sampling.py``): selection frequencies
proportional to weights, zero-weight exclusion, fanout clamping.
"""
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import _native
from dgl_tpu.sampling import sample_neighbors, sample_neighbors_fixed, select_topk

pytestmark = pytest.mark.skipif(
    not _native.available(), reason="native library unavailable"
)


def _star_graph(deg=40):
    # node `deg` has in-edges from 0..deg-1 (edge i: i -> deg)
    src = np.arange(deg)
    dst = np.full(deg, deg)
    return dgl.graph((src, dst), num_nodes=deg + 1)


def test_prob_zero_weight_never_picked_and_fanout_clamps():
    deg = 16
    g = _star_graph(deg)
    w = np.zeros(deg, np.float32)
    w[: 6] = 1.0  # only 6 eligible
    g.edata["p"] = w
    # !replace picks min(fanout, #positive) = 6
    nbr, eid, mask = sample_neighbors_fixed(
        g, [deg], 10, prob="p", replace=False, seed=0
    )
    assert mask.sum() == 6
    assert set(np.asarray(eid)[mask.astype(bool)]) == set(range(6))
    # replace keeps drawing from the eligible set only
    nbr, eid, mask = sample_neighbors_fixed(
        g, [deg], 10, prob="p", replace=True, seed=0
    )
    assert mask.all()
    assert np.asarray(eid).max() < 6


def test_prob_selection_frequencies():
    deg = 4
    g = _star_graph(deg)
    w = np.array([1.0, 1.0, 2.0, 4.0], np.float32)
    g.edata["p"] = w
    counts = np.zeros(deg)
    trials = 4000
    for t in range(trials):
        _, eid, mask = sample_neighbors_fixed(
            g, [deg], 1, prob="p", replace=True, seed=t
        )
        counts[int(eid[0, 0])] += 1
    freq = counts / trials
    np.testing.assert_allclose(freq, w / w.sum(), atol=0.03)


def test_prob_without_replacement_inclusion_frequencies():
    # E-S reservoir: inclusion prob of the heavy edge must exceed the light
    deg = 6
    g = _star_graph(deg)
    w = np.array([1, 1, 1, 1, 1, 8], np.float32)
    g.edata["p"] = w
    heavy, light = 0, 0
    trials = 2000
    for t in range(trials):
        _, eid, mask = sample_neighbors_fixed(
            g, [deg], 2, prob="p", replace=False, seed=t
        )
        picked = set(np.asarray(eid)[mask.astype(bool)])
        assert len(picked) == 2  # distinct
        heavy += 5 in picked
        light += 0 in picked
    # sequential proportional-without-replacement theory (E-S equivalent):
    # P(heavy) = 8/13 + (5/13)(8/12) = 0.872
    # P(light) = 1/13 + (8/13)(1/5) + (4/13)(1/12) = 0.226
    assert 0.83 < heavy / trials < 0.91
    assert 0.18 < light / trials < 0.27


def test_ragged_sample_neighbors_prob_native_matches_semantics():
    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 50, 400), rng.integers(0, 50, 400)),
                  num_nodes=50)
    w = rng.random(400).astype(np.float32)
    w[rng.random(400) < 0.3] = 0.0
    g.edata["p"] = w
    sub = sample_neighbors(g, np.arange(50), 5, prob="p", seed=1)
    eids = np.asarray(sub.edata["_ID"])
    assert (w[eids] > 0).all()  # zero-weight edges never picked
    # per-dst count <= min(5, #positive in-edges)
    dst = np.asarray(sub._relation(None).dst)[: sub.num_edges()]
    E = g.num_edges()
    gdst = np.asarray(g._relation(None).dst)[:E]
    for d in range(50):
        n_pos = int((w[gdst == d] > 0).sum())
        assert (dst == d).sum() <= min(5, n_pos)


def test_select_topk_native_matches_numpy():
    rng = np.random.default_rng(2)
    g = dgl.graph((rng.integers(0, 30, 300), rng.integers(0, 30, 300)),
                  num_nodes=30)
    w = rng.random(300).astype(np.float32)
    g.edata["w"] = w
    for ascending in (False, True):
        sub = select_topk(g, 3, "w", ascending=ascending)
        eids = np.asarray(sub.edata["_ID"])
        E = g.num_edges()
        gdst = np.asarray(g._relation(None).dst)[:E]
        for d in range(30):
            row = np.nonzero(gdst == d)[0]
            if row.size == 0:
                continue
            order = np.argsort(w[row] if ascending else -w[row],
                               kind="stable")
            expect = set(row[order[: min(3, row.size)]])
            got = set(eids[np.isin(eids, row)])
            assert got == expect, (d, got, expect)


def test_biased_native_respects_tags():
    # two tags; bias 0 for tag 0 -> only tag-1 neighbors picked
    from dgl_tpu.transforms import sort_csc_by_tag

    rng = np.random.default_rng(3)
    n = 40
    g = dgl.graph((rng.integers(0, n, 600), rng.integers(0, n, 600)),
                  num_nodes=n)
    tag = rng.integers(0, 2, n)
    g2 = sort_csc_by_tag(g, tag, tag_offset_name="_TAG_OFFSET")
    sub = dgl.sampling.sample_neighbors_biased(
        g2, np.arange(n), 3, bias=np.array([0.0, 1.0]), seed=0
    )
    eids = np.asarray(sub.edata["_ID"])
    E2 = g2.num_edges()
    gsrc = np.asarray(g2._relation(None).src)[:E2]
    assert (tag[gsrc[eids]] == 1).all()


def test_native_etype_pick_matches_python():
    """Native per-etype pick respects per-type fanouts, slot layout, and
    only returns edges of the slot's type."""
    from dgl_tpu import _native

    if not _native.available():
        import pytest

        pytest.skip("native lib unavailable")
    rng = np.random.default_rng(0)
    n, e, T = 200, 3000, 3
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    tpe = rng.integers(0, T, e).astype(np.int64)
    order = np.argsort(dst, kind="stable")
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr, dst + 1, 1)
    indptr = np.cumsum(indptr)
    indices = src[order].astype(np.int64)
    eids = order.astype(np.int64)
    fanouts = np.array([2, 0, 3], np.int64)
    seeds = np.arange(50, dtype=np.int64)
    nbr, eid, mask = _native.sample_neighbors_etype(
        indptr, indices, eids, tpe, fanouts, seeds, 0, 7
    )
    F = int(fanouts.sum())
    assert nbr.shape == (50, F)
    offs = np.concatenate([[0], np.cumsum(fanouts)])
    for i, s in enumerate(seeds):
        lo, hi = indptr[s], indptr[s + 1]
        row_t = tpe[eids[lo:hi]]
        for t in range(T):
            sl = slice(int(offs[t]), int(offs[t + 1]))
            m = mask[i, sl]
            # picked edges really have type t and come from s's in-edges
            assert (tpe[eid[i, sl][m]] == t).all()
            assert m.sum() == min(int(fanouts[t]), int((row_t == t).sum()))
            picked = eid[i, sl][m]
            assert np.isin(picked, eids[lo:hi]).all()
            assert np.unique(picked).shape[0] == picked.shape[0]  # no dup
    # deterministic in the seed
    nbr2, eid2, _ = _native.sample_neighbors_etype(
        indptr, indices, eids, tpe, fanouts, seeds, 0, 7
    )
    np.testing.assert_array_equal(eid, eid2)
