"""Message-passing engine tests (modeled on reference test_heterograph-update-all.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import function as fn


def simple_graph():
    src = np.array([0, 1, 2, 3, 1])
    dst = np.array([1, 2, 3, 0, 0])
    g = dgl.graph((src, dst), num_nodes=4)
    return g, src, dst


def test_update_all_copy_u_sum():
    g, src, dst = simple_graph()
    x = jnp.arange(8.0).reshape(4, 2)
    g.ndata["h"] = x
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "out"))
    out = np.asarray(g.ndata["out"])
    expected = np.zeros((4, 2))
    for s, d in zip(src, dst):
        expected[d] += np.asarray(x)[s]
    np.testing.assert_allclose(out, expected)


def test_update_all_u_mul_e_max():
    g, src, dst = simple_graph()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((4, 3)).astype(np.float32))
    w = jnp.asarray(np.random.default_rng(1).standard_normal((5, 3)).astype(np.float32))
    g.ndata["h"] = x
    g.edata["w"] = w
    g.update_all(fn.u_mul_e("h", "w", "m"), fn.max("m", "out"))
    out = np.asarray(g.ndata["out"])
    msgs = [[] for _ in range(4)]
    for i, (s, d) in enumerate(zip(src, dst)):
        msgs[d].append(np.asarray(x)[s] * np.asarray(w)[i])
    for d in range(4):
        if msgs[d]:
            np.testing.assert_allclose(out[d], np.stack(msgs[d]).max(0), rtol=1e-5)
        else:
            np.testing.assert_allclose(out[d], 0.0)


def test_apply_edges_builtin_and_udf():
    g, src, dst = simple_graph()
    x = jnp.arange(4.0).reshape(4, 1)
    g.ndata["h"] = x
    g.apply_edges(fn.u_add_v("h", "h", "s"))
    np.testing.assert_allclose(
        np.asarray(g.edata["s"]).ravel(),
        np.asarray(x).ravel()[src] + np.asarray(x).ravel()[dst],
    )

    def udf(edges):
        return {"p": edges.src["h"] * 2 + edges.dst["h"]}

    g.apply_edges(udf)
    np.testing.assert_allclose(
        np.asarray(g.edata["p"]).ravel(),
        2 * np.asarray(x).ravel()[src] + np.asarray(x).ravel()[dst],
    )


def test_udf_reduce_matches_builtin():
    g, src, dst = simple_graph()
    x = jnp.asarray(np.random.default_rng(2).standard_normal((4, 3)).astype(np.float32))
    g.ndata["h"] = x
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "ref"))

    def udf_reduce(nodes):
        return {"out": nodes.mailbox["m"].sum(axis=1)}

    g.update_all(fn.copy_u("h", "m"), udf_reduce)
    np.testing.assert_allclose(
        np.asarray(g.ndata["out"]), np.asarray(g.ndata["ref"]), rtol=1e-5
    )


def test_udf_message_and_reduce():
    g, src, dst = simple_graph()
    x = jnp.asarray(np.random.default_rng(3).standard_normal((4, 2)).astype(np.float32))
    g.ndata["h"] = x

    def msg(edges):
        return {"m": edges.src["h"] + 1.0}

    def red(nodes):
        mask = nodes.mailbox_mask[..., None]
        return {"out": (nodes.mailbox["m"] * mask).sum(1)}

    g.update_all(msg, red)
    expected = np.zeros((4, 2))
    for s, d in zip(src, dst):
        expected[d] += np.asarray(x)[s] + 1.0
    np.testing.assert_allclose(np.asarray(g.ndata["out"]), expected, rtol=1e-5)


def test_multi_update_all():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("game", "played_by", "user"): ([0, 1], [2, 1]),
        },
        {"user": 3, "game": 2},
    )
    g.nodes["user"].data["h"] = jnp.ones((3, 2))
    g.nodes["game"].data["h"] = jnp.ones((2, 2)) * 10
    g.multi_update_all(
        {
            "follows": (fn.copy_u("h", "m"), fn.sum("m", "out")),
            "played_by": (fn.copy_u("h", "m"), fn.sum("m", "out")),
        },
        "sum",
    )
    out = np.asarray(g.nodes["user"].data["out"])
    # user0: nothing -> 0; user1: follows from 0 (1) + game1 (10) = 11
    # user2: follows from 1 (1) + game0 (10) = 11
    np.testing.assert_allclose(out[0], [0, 0])
    np.testing.assert_allclose(out[1], [11, 11])
    np.testing.assert_allclose(out[2], [11, 11])


def test_update_all_under_jit():
    g, src, dst = simple_graph()
    x = jnp.arange(8.0).reshape(4, 2)

    @jax.jit
    def f(graph, x):
        graph.ndata["h"] = x
        graph.update_all(fn.copy_u("h", "m"), fn.sum("m", "out"))
        return graph.ndata["out"]

    out = f(g, x)
    expected = np.zeros((4, 2))
    for s, d in zip(src, dst):
        expected[d] += np.asarray(x)[s]
    np.testing.assert_allclose(np.asarray(out), expected)


def test_batch_unbatch_readout():
    g1 = dgl.graph(([0, 1], [1, 0]), num_nodes=2)
    g1.ndata["h"] = jnp.ones((2, 3))
    g2 = dgl.graph(([0, 1, 2], [1, 2, 0]), num_nodes=3)
    g2.ndata["h"] = jnp.ones((3, 3)) * 2
    bg = dgl.batch([g1, g2])
    assert bg.batch_size == 2
    assert bg.num_nodes() == 5
    assert bg.num_edges() == 5
    np.testing.assert_array_equal(np.asarray(bg.batch_num_nodes()), [2, 3])
    hsum = dgl.sum_nodes(bg, "h")
    np.testing.assert_allclose(np.asarray(hsum), [[2, 2, 2], [6, 6, 6]])
    hmean = dgl.mean_nodes(bg, "h")
    np.testing.assert_allclose(np.asarray(hmean), [[1, 1, 1], [2, 2, 2]])
    gs = dgl.unbatch(bg)
    assert len(gs) == 2
    assert gs[0].num_nodes() == 2 and gs[1].num_nodes() == 3
    np.testing.assert_allclose(np.asarray(gs[1].ndata["h"]), 2.0)


def test_softmax_and_broadcast_nodes():
    g1 = dgl.graph(([0], [1]), num_nodes=2)
    g2 = dgl.graph(([0], [1]), num_nodes=2)
    bg = dgl.batch([g1, g2])
    bg.ndata["s"] = jnp.array([[1.0], [1.0], [0.0], [2.0]])
    sm = np.asarray(dgl.softmax_nodes(bg, "s")).ravel()
    np.testing.assert_allclose(sm[:2], [0.5, 0.5], rtol=1e-5)
    z = np.exp([0.0, 2.0]); z /= z.sum()
    np.testing.assert_allclose(sm[2:], z, rtol=1e-5)
    b = dgl.broadcast_nodes(bg, jnp.array([[5.0], [7.0]]))
    np.testing.assert_allclose(np.asarray(b).ravel(), [5, 5, 7, 7])


def test_apply_edges_subset_under_jit():
    """Traced edge ids: subset apply_edges compiles (compute full-width,
    scatter requested rows; ROADMAP round-1 nit)."""
    import dgl_tpu.function as fn

    rng = np.random.default_rng(0)
    g = dgl.graph(
        (rng.integers(0, 30, 200), rng.integers(0, 30, 200)), num_nodes=30
    )
    h0 = jnp.asarray(rng.normal(size=(30, 4)), jnp.float32)

    @jax.jit
    def f(h, eids):
        gl = g.local_var()
        gl.ndata["h"] = h
        gl.apply_edges(fn.u_add_v("h", "h", "e"), edges=eids)
        return gl.edata["e"]

    out = np.asarray(f(h0, jnp.asarray([3, 7, 11])))
    rel = g._relation(None)
    src, dst = np.asarray(rel.src), np.asarray(rel.dst)
    h = np.asarray(h0)
    for e in (3, 7, 11):
        np.testing.assert_allclose(out[e], h[src[e]] + h[dst[e]], rtol=1e-5)
    others = np.setdiff1d(np.arange(out.shape[0]), [3, 7, 11])
    assert np.all(out[others] == 0)
    # eager python-list path unchanged
    gl = g.local_var()
    gl.ndata["h"] = h0
    gl.apply_edges(fn.u_add_v("h", "h", "e2"), edges=[1, 2])
    assert "e2" in gl.edata


def test_slice_batch_and_random_choice():
    from dgl_tpu import random as dglrandom

    g1 = dgl.graph(([0, 1], [1, 2]), num_nodes=3)
    g1.ndata["h"] = jnp.arange(3.0)[:, None]
    g2 = dgl.graph(([0], [1]), num_nodes=2)
    g2.ndata["h"] = jnp.arange(10.0, 12.0)[:, None]
    bg = dgl.batch([g1, g2])
    s0 = dgl.slice_batch(bg, 0)
    s1 = dgl.slice_batch(bg, 1, store_ids=True)
    assert s0.num_nodes() == 3 and s0.num_edges() == 2
    assert s1.num_nodes() == 2 and s1.num_edges() == 1
    np.testing.assert_allclose(np.asarray(s1.ndata["h"]).ravel(), [10, 11])
    np.testing.assert_array_equal(np.asarray(s1.ndata["_ID"]), [3, 4])
    with pytest.raises(Exception):
        dgl.slice_batch(bg, 2)

    dglrandom.seed(0)
    x = dglrandom.choice(10, 5, replace=False)
    assert len(set(int(v) for v in x)) == 5
    y = dglrandom.choice(3, 100, prob=[0.0, 1.0, 0.0])
    assert np.all(np.asarray(y) == 1)


def test_send_and_recv_udf_reduce():
    """UDF reduce on an edge subset matches a manual computation."""
    import dgl_tpu.function as fn

    rng = np.random.default_rng(1)
    src = rng.integers(0, 12, 60)
    dst = rng.integers(0, 12, 60)
    g = dgl.graph((src, dst), num_nodes=12)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(12, 3)), jnp.float32)
    eids = np.array([0, 5, 9, 9, 20, 33])

    def reducer(nodes):
        m = nodes.mailbox["m"]
        mask = nodes.mailbox_mask[..., None]
        # second-largest-ish statistic: sum of squares of real messages
        return {"out": (m * m * mask).sum(axis=1)}

    out = g.send_and_recv(eids, fn.copy_u("h", "m"), reducer)["out"]
    h = np.asarray(g.ndata["h"])
    want = np.zeros((12, 3), np.float32)
    for e in eids:
        want[dst[e]] += h[src[e]] ** 2
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)
