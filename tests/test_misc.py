"""Tests for homophily, merge, random, mpops."""
import numpy as np
import jax.numpy as jnp

import dgl_tpu as dgl


def test_edge_homophily():
    g = dgl.graph(([0, 1, 2, 3], [1, 2, 3, 0]))
    y = np.array([0, 0, 1, 1])
    # same-label edges: 0->1 (0,0) and 2->3 (1,1) => 0.5
    assert dgl.edge_homophily(g, y) == 0.5


def test_node_homophily():
    g = dgl.graph(([0, 1], [2, 2]))
    y = np.array([0, 1, 0])
    # node 2: 1 of 2 in-neighbors share label; others have no in-edges
    np.testing.assert_allclose(dgl.node_homophily(g, y), 0.5 / 3)


def test_linkx_adjusted():
    g = dgl.graph(([0, 1, 2, 3], [1, 2, 3, 0]))
    y = np.array([0, 0, 1, 1])
    assert 0 <= dgl.linkx_homophily(g, y) <= 1
    assert -1 <= dgl.adjusted_homophily(g, y) <= 1


def test_label_informativeness():
    g = dgl.graph(([0, 1, 2, 3], [1, 0, 3, 2]))
    y = np.array([0, 0, 1, 1])
    # perfectly homophilous -> LI = 1
    np.testing.assert_allclose(dgl.edge_label_informativeness(g, y), 1.0)
    li = dgl.node_label_informativeness(g, y)
    np.testing.assert_allclose(li, 1.0)


def test_merge():
    g1 = dgl.graph(([0, 1], [1, 2]), num_nodes=4)
    g1.ndata["x"] = jnp.ones((4, 2))
    g2 = dgl.graph(([2], [3]), num_nodes=4)
    m = dgl.merge([g1, g2])
    assert m.num_edges() == 3
    assert m.num_nodes() == 4
    assert "x" in m.ndata


def test_random_seed():
    dgl.seed(42)
    a = dgl.random.next_seed()
    dgl.seed(42)
    b = dgl.random.next_seed()
    assert a == b


def test_mpops():
    from dgl_tpu import mpops

    g = dgl.graph(([0, 1], [2, 2]))
    x = jnp.array([[1.0], [2.0], [3.0]])
    out = mpops.copy_u_sum(g, x)
    np.testing.assert_allclose(np.asarray(out).ravel(), [0, 0, 3])
    e = mpops.u_add_v(g, x, x)
    np.testing.assert_allclose(np.asarray(e).ravel(), [4.0, 5.0])


def test_hetero_shared_memory_roundtrip():
    """Graph.shared_memory publishes; hetero_from_shared_memory attaches an
    identical graph (reference heterograph.py:6267 shared-memory plane)."""
    import numpy as np
    import jax.numpy as jnp

    import dgl_tpu as dgl
    from dgl_tpu import convert

    rng = np.random.default_rng(0)
    hg = convert.heterograph({
        ("u", "r", "v"): (rng.integers(0, 10, 30), rng.integers(0, 8, 30)),
        ("v", "s", "u"): (rng.integers(0, 8, 20), rng.integers(0, 10, 20)),
    })
    hg.nodes["u"].data["x"] = jnp.arange(10.0)
    hg.edges_view[("u", "r", "v")].data["w"] = jnp.arange(30.0)
    hg.shared_memory("dgl_tpu_test_heterog")
    try:
        back = convert.hetero_from_shared_memory("dgl_tpu_test_heterog")
        assert back.num_nodes("u") == 10 and back.num_edges(("u","r","v")) == 30
        np.testing.assert_allclose(
            np.asarray(back.nodes["u"].data["x"]), np.arange(10.0)
        )
        np.testing.assert_allclose(
            np.asarray(
                back.edges_view[("u", "r", "v")].data["w"]
            ), np.arange(30.0)
        )
        u0, v0 = (np.asarray(a) for a in hg.edges(etype=("u", "r", "v")))
        u1, v1 = (np.asarray(a) for a in back.edges(etype=("u", "r", "v")))
        np.testing.assert_array_equal(u0, u1)
        np.testing.assert_array_equal(v0, v1)
    finally:
        from multiprocessing import shared_memory

        shm = shared_memory.SharedMemory("dgl_tpu_test_heterog")
        shm.close()
        shm.unlink()
