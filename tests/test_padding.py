"""Padding invariants: a graph with padded edges must produce identical
results on real rows as the unpadded graph (the core static-shape
discipline, SURVEY.md §7 'Hard parts')."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
import dgl_tpu.function as fn
from dgl_tpu import ops


@pytest.fixture
def pair():
    rng = np.random.default_rng(0)
    n, E, pad = 30, 200, 56
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    g = dgl.graph((src, dst), num_nodes=n)
    # padded twin: extra `pad` edges pointing at the virtual rows
    src_p = np.concatenate([src, np.full(pad, n)])
    dst_p = np.concatenate([dst, np.full(pad, n)])
    gp = dgl.graph((src_p, dst_p), num_nodes=n, num_edges=E)
    return g, gp, n, E


def test_padded_num_edges(pair):
    g, gp, n, E = pair
    assert gp.num_edges() == E
    assert gp._relation(None).num_edges_padded == E + 56
    np.testing.assert_array_equal(
        np.asarray(g.in_degrees()), np.asarray(gp.in_degrees())
    )


@pytest.mark.parametrize("reduce_op", ["sum", "mean", "max", "min"])
def test_padded_update_all(pair, reduce_op):
    g, gp, n, E = pair
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(n, 5)), dtype=jnp.float32)
    w = rng.normal(size=(E, 5)).astype(np.float32)
    wp = np.concatenate([w, np.ones((56, 5), np.float32)])  # garbage padding
    for gg, ww in ((g, w), (gp, wp)):
        gl = gg.local_var()
        gl.ndata["x"] = x
        gl.edata["w"] = jnp.asarray(ww)
        gl.update_all(fn.u_mul_e("x", "w", "m"),
                      getattr(fn, reduce_op)("m", "out"))
        if gg is g:
            expect = np.asarray(gl.ndata["out"])
        else:
            got = np.asarray(gl.ndata["out"])
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_padded_edge_softmax(pair):
    g, gp, n, E = pair
    rng = np.random.default_rng(2)
    e = rng.normal(size=(E, 1)).astype(np.float32)
    ep = np.concatenate([e, np.full((56, 1), 7.7, np.float32)])
    a = np.asarray(ops.edge_softmax(g, jnp.asarray(e)))
    ap = np.asarray(ops.edge_softmax(gp, jnp.asarray(ep)))
    np.testing.assert_allclose(ap[:E], a, rtol=1e-5, atol=1e-6)


def test_padded_gradients(pair):
    g, gp, n, E = pair
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(n, 4)), dtype=jnp.float32)
    w = jnp.asarray(rng.normal(size=(E,)), dtype=jnp.float32)
    wp = jnp.concatenate([w, jnp.ones(56)])

    g1 = jax.grad(lambda x: (ops.u_mul_e_sum(g, x, w) ** 2).sum())(x)
    g2 = jax.grad(lambda x: (ops.u_mul_e_sum(gp, x, wp) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-4)
    # edge-grad: padded slots must get zero gradient
    ge = jax.grad(lambda w_: (ops.u_mul_e_sum(gp, x, w_) ** 2).sum())(wp)
    np.testing.assert_allclose(np.asarray(ge)[E:], 0.0)


def test_padded_jit_stability(pair):
    """Same padded capacity, different true edge count -> same treedef."""
    _, gp, n, E = pair
    rng = np.random.default_rng(4)
    src = rng.integers(0, n, E - 10)
    dst = rng.integers(0, n, E - 10)
    src_p = np.concatenate([src, np.full(66, n)])
    dst_p = np.concatenate([dst, np.full(66, n)])
    gp2 = dgl.graph((src_p, dst_p), num_nodes=n, num_edges=E - 10)
    # capacities equal; num_edges static differs -> treedefs differ (by
    # design: num_edges is static). Both still jit cleanly.
    x = jnp.ones((n, 3))
    f = jax.jit(lambda g_, x_: ops.copy_u_sum(g_, x_))
    assert np.isfinite(np.asarray(f(gp, x))).all()
    assert np.isfinite(np.asarray(f(gp2, x))).all()
