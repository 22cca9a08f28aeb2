"""int32/int64 idtype parity across the graph API and kernels.

Mirrors the reference's idtype sweep (``ATEN_ID_TYPE_SWITCH``,
``src/array/kernel.cc:26-43``; tests parametrized via
``tests/utils/__init__.py:4``). int64 cases run under the scoped x64 mode
(see tests/utils.py).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu
from dgl_tpu import function as fn
from dgl_tpu import ops

from utils import parametrize_idtype


def _rand_graph(rng, idtype, n=60, e=300):
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return dgl_tpu.graph((src, dst), num_nodes=n, idtype=idtype), src, dst


@parametrize_idtype
def test_graph_construct_and_query(rng, idtype):
    g, src, dst = _rand_graph(rng, idtype)
    assert g.idtype == jnp.dtype(idtype)
    u, v = g.edges()
    assert u.dtype == jnp.dtype(idtype)
    assert v.dtype == jnp.dtype(idtype)
    np.testing.assert_array_equal(np.asarray(u), src)
    deg = g.in_degrees()
    np.testing.assert_array_equal(
        np.asarray(deg), np.bincount(dst, minlength=60)
    )
    # round-trip astype (int64 leg needs x64 enabled)
    other = jnp.int64 if jnp.dtype(idtype) == jnp.dtype("int32") else jnp.int32
    with jax.enable_x64(True):
        g2 = g.astype(other).astype(idtype)
    np.testing.assert_array_equal(np.asarray(g2.edges()[0]), src)


def test_int64_without_x64_raises(rng):
    if jax.config.jax_enable_x64:
        pytest.skip("x64 globally enabled")
    with pytest.raises(dgl_tpu.DGLError, match="x64"):
        dgl_tpu.graph(([0, 1], [1, 0]), num_nodes=2, idtype=jnp.int64)
    g = dgl_tpu.graph(([0, 1], [1, 0]), num_nodes=2)
    with pytest.raises(dgl_tpu.DGLError, match="x64"):
        g.long()


@parametrize_idtype
def test_spmm_reducers(rng, idtype):
    g, src, dst = _rand_graph(rng, idtype)
    x = jnp.asarray(rng.normal(size=(60, 8)), dtype=jnp.float32)
    ref = np.zeros((60, 8), np.float32)
    np.add.at(ref, dst, np.asarray(x)[src])
    out = ops.copy_u_sum(g, x)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    # max reducer
    refm = np.full((60, 8), -np.inf, np.float32)
    np.maximum.at(refm, dst, np.asarray(x)[src])
    refm[np.isinf(refm)] = 0.0
    outm = ops.copy_u_max(g, x)
    np.testing.assert_allclose(np.asarray(outm), refm, rtol=1e-5, atol=1e-5)


@parametrize_idtype
def test_sddmm_and_edge_softmax(rng, idtype):
    g, src, dst = _rand_graph(rng, idtype)
    x = jnp.asarray(rng.normal(size=(60, 8)), dtype=jnp.float32)
    e = ops.u_dot_v(g, x, x)
    ref = (np.asarray(x)[src] * np.asarray(x)[dst]).sum(-1, keepdims=True)
    np.testing.assert_allclose(np.asarray(e), ref, rtol=1e-4, atol=1e-4)
    a = ops.edge_softmax(g, e[:, 0])
    s = np.zeros(60, np.float64)
    np.add.at(s, dst, np.exp(ref[:, 0] - ref[:, 0].max()))
    assert np.all(np.asarray(a) <= 1.0 + 1e-5)
    # softmax sums to 1 per destination with edges
    acc = np.zeros(60, np.float64)
    np.add.at(acc, dst, np.asarray(a, np.float64))
    has = np.bincount(dst, minlength=60) > 0
    np.testing.assert_allclose(acc[has], 1.0, rtol=1e-4)


@parametrize_idtype
def test_update_all_message_passing(rng, idtype):
    g, src, dst = _rand_graph(rng, idtype)
    g.ndata["h"] = jnp.asarray(rng.normal(size=(60, 4)), dtype=jnp.float32)
    g.update_all(fn.copy_u("h", "m"), fn.mean("m", "out"))
    ref = np.zeros((60, 4), np.float32)
    np.add.at(ref, dst, np.asarray(g.ndata["h"])[src])
    deg = np.maximum(np.bincount(dst, minlength=60), 1)[:, None]
    np.testing.assert_allclose(
        np.asarray(g.ndata["out"]), ref / deg, rtol=1e-4, atol=1e-5
    )


@parametrize_idtype
def test_subgraph_and_block(rng, idtype):
    g, src, dst = _rand_graph(rng, idtype)
    nodes = jnp.asarray(np.arange(0, 30), dtype=idtype)
    sg = g.subgraph(nodes)
    assert sg.idtype == jnp.dtype(idtype)
    u, v = np.asarray(sg.edges()[0]), np.asarray(sg.edges()[1])
    orig = np.asarray(sg.ndata[dgl_tpu.NID])
    mask = (src < 30) & (dst < 30)
    assert len(u) == mask.sum()
    got = set(zip(orig[u].tolist(), orig[v].tolist()))
    expect = set(zip(src[mask].tolist(), dst[mask].tolist()))
    assert got == expect


@parametrize_idtype
def test_sampling_idtype(rng, idtype):
    g, _, _ = _rand_graph(rng, idtype, n=40, e=400)
    seeds = jnp.asarray([0, 1, 2, 3], dtype=idtype)
    sg = dgl_tpu.sampling.sample_neighbors(g, seeds, 5)
    assert sg.idtype == jnp.dtype(idtype)
    u, v = sg.edges()
    assert u.dtype == jnp.dtype(idtype)
    assert set(np.asarray(v).tolist()) <= {0, 1, 2, 3}


@parametrize_idtype
def test_hetero_idtype(rng, idtype):
    g = dgl_tpu.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("user", "plays", "game"): ([0, 1, 2], [0, 0, 1]),
        },
        idtype=idtype,
    )
    assert g.idtype == jnp.dtype(idtype)
    assert g.num_edges("plays") == 3
    sub = g.edge_type_subgraph(["plays"])
    assert sub.idtype == jnp.dtype(idtype)


@parametrize_idtype
def test_segment_ops_idtype(rng, idtype):
    ids = jnp.asarray([0, 0, 1, 2, 2, 2], dtype=idtype)
    x = jnp.asarray(rng.normal(size=(6, 3)), dtype=jnp.float32)
    out = ops.segment.segment_reduce(
        jnp.asarray([2, 1, 3], dtype=idtype), x, reducer="sum"
    )
    ref = np.stack(
        [
            np.asarray(x)[:2].sum(0),
            np.asarray(x)[2:3].sum(0),
            np.asarray(x)[3:].sum(0),
        ]
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)
    del ids
