"""Traversal + propagate tests (mirrors reference tests/python/common/test_traversal.py)."""
import jax.numpy as jnp
import numpy as np

import dgl_tpu as dgl
from dgl_tpu import function as fn
from dgl_tpu import traversal, propagate


def _chain():
    return dgl.graph(([0, 1, 2], [1, 2, 3]))


def test_bfs_nodes():
    layers = traversal.bfs_nodes_generator(_chain(), 0)
    assert [l.tolist() for l in layers] == [[0], [1], [2], [3]]


def test_bfs_edges():
    layers = traversal.bfs_edges_generator(_chain(), 0)
    assert [l.tolist() for l in layers] == [[0], [1], [2]]


def test_topological_nodes():
    g = dgl.graph(([0, 1, 2, 0], [1, 2, 3, 2]))
    layers = traversal.topological_nodes_generator(g)
    assert [l.tolist() for l in layers] == [[0], [1], [2], [3]]


def test_dfs_edges():
    g = dgl.graph(([0, 0, 1], [1, 2, 2]))
    out = traversal.dfs_edges_generator(g, 0)
    flat = [int(e[0]) for e in out]
    assert flat in ([0, 2, 1], [1, 0, 2], [0, 2], [1, 2, 0])
    assert flat[0] in (0, 1)


def test_prop_nodes_ordered():
    # propagate along frontiers after the roots: each node receives its
    # predecessor's already-updated value (the Tree-LSTM pattern)
    g = _chain()
    g.ndata["h"] = jnp.array([[2.0], [1.0], [1.0], [1.0]])
    layers = traversal.topological_nodes_generator(g)
    g.prop_nodes(layers[1:], fn.copy_u("h", "m"), fn.sum("m", "h"))
    np.testing.assert_allclose(
        np.asarray(g.ndata["h"]).ravel(), [2.0, 2.0, 2.0, 2.0]
    )
    # full topo prop zeroes the source frontier (no in-edges -> sum = 0)
    g2 = _chain()
    g2.ndata["h"] = jnp.array([[1.0], [1.0], [1.0], [1.0]])
    propagate.prop_nodes_topo(g2, fn.copy_u("h", "m"), fn.sum("m", "h"))
    np.testing.assert_allclose(
        np.asarray(g2.ndata["h"]).ravel(), [0.0, 0.0, 0.0, 0.0]
    )


def test_pull_push():
    g = dgl.graph(([0, 1], [1, 2]))
    g.ndata["h"] = jnp.array([[1.0], [2.0], [3.0]])
    g.pull([1], fn.copy_u("h", "m"), fn.sum("m", "out"))
    out = np.asarray(g.ndata["out"]).ravel()
    assert out[1] == 1.0
    g.push([1], fn.copy_u("h", "m"), fn.sum("m", "out2"))
    out2 = np.asarray(g.ndata["out2"]).ravel()
    assert out2[2] == 2.0


def test_send_and_recv():
    g = dgl.graph(([0, 1, 2], [2, 2, 0]))
    g.ndata["h"] = jnp.array([[1.0], [2.0], [4.0]])
    g.send_and_recv([0, 1], fn.copy_u("h", "m"), fn.sum("m", "agg"))
    agg = np.asarray(g.ndata["agg"]).ravel()
    assert agg[2] == 3.0
