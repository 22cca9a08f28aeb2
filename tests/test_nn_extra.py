"""Tests for the second tier of conv layers."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.nn.conv import (
    AGNNConv,
    CFConv,
    DenseChebConv,
    DenseGraphConv,
    DenseSAGEConv,
    DotGatConv,
    EGATConv,
    EdgeGATConv,
    GCN2Conv,
    GINEConv,
    GMMConv,
    GatedGCNConv,
    GraphConv,
    GroupRevRes,
    HGTConv,
    PNAConv,
)


@pytest.fixture
def g():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 20, 120)
    dst = rng.integers(0, 20, 120)
    gg = dgl.graph((np.concatenate([src, np.arange(20)]),
                    np.concatenate([dst, np.arange(20)])), num_nodes=20)
    return gg


@pytest.fixture
def x(g):
    return jnp.asarray(
        np.random.default_rng(1).normal(size=(g.num_nodes(), 8)),
        dtype=jnp.float32,
    )


@pytest.fixture
def e(g):
    return jnp.asarray(
        np.random.default_rng(2).normal(size=(g.num_edges(), 6)),
        dtype=jnp.float32,
    )


def _init_apply(mod, *args, **kwargs):
    params = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    return mod.apply(params, *args, **kwargs)


def test_agnn(g, x):
    out = _init_apply(AGNNConv(), g, x)
    assert out.shape == x.shape and np.isfinite(np.asarray(out)).all()


def test_dotgat(g, x):
    out = _init_apply(DotGatConv(8, 4, 2), g, x)
    assert out.shape == (20, 2, 4)


def test_gcn2(g, x):
    out = _init_apply(GCN2Conv(8, layer=2), g, x, x)
    assert out.shape == x.shape
    # grads flow
    mod = GCN2Conv(8, layer=1)
    params = mod.init(jax.random.PRNGKey(0), g, x, x)
    grads = jax.grad(lambda p: mod.apply(p, g, x, x).sum())(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


def test_gine(g, x):
    e8 = jnp.ones((g.num_edges(), 8), jnp.float32)
    out = _init_apply(GINEConv(apply_func=None), g, x, e8)
    assert out.shape == x.shape


def test_cfconv(g, x, e):
    out = _init_apply(CFConv(8, 6, 16, 12), g, x, e)
    assert out.shape == (20, 12)


def test_gmm(g, x):
    pseudo = jnp.asarray(
        np.random.default_rng(3).normal(size=(g.num_edges(), 3)),
        dtype=jnp.float32,
    )
    out = _init_apply(GMMConv(8, 5, 3, 4), g, x, pseudo)
    assert out.shape == (20, 5)


def test_pna(g, x):
    out = _init_apply(PNAConv(8, 10), g, x)
    assert out.shape == (20, 10) and np.isfinite(np.asarray(out)).all()


def test_gatedgcn(g, x, e):
    h6 = jnp.asarray(
        np.random.default_rng(4).normal(size=(20, 6)), dtype=jnp.float32
    )
    mod = GatedGCNConv(6, 6, 6)
    h_out, e_out = _init_apply(mod, g, h6, e)
    assert h_out.shape == (20, 6) and e_out.shape == (g.num_edges(), 6)


def test_egat(g, x, e):
    h_out, f_out = _init_apply(EGATConv(8, 6, 4, 5, 2), g, x, e)
    assert h_out.shape == (20, 2, 4)
    assert f_out.shape == (g.num_edges(), 2, 5)


def test_edgegat(g, x, e):
    out = _init_apply(EdgeGATConv(8, 6, 4, 2), g, x, e)
    assert out.shape == (20, 2, 4)


def test_dense_convs():
    rng = np.random.default_rng(0)
    adj = jnp.asarray((rng.random((10, 10)) < 0.3).astype(np.float32))
    x = jnp.asarray(rng.normal(size=(10, 8)), dtype=jnp.float32)
    assert _init_apply(DenseGraphConv(8, 5), adj, x).shape == (10, 5)
    assert _init_apply(DenseSAGEConv(8, 5), adj, x).shape == (10, 5)
    assert _init_apply(DenseChebConv(8, 5, 3), adj, x).shape == (10, 5)


def test_dense_graphconv_matches_sparse():
    """DenseGraphConv(adj) == GraphConv(g) on the same graph."""
    rng = np.random.default_rng(0)
    src = rng.integers(0, 12, 40)
    dst = rng.integers(0, 12, 40)
    g = dgl.graph(
        (np.concatenate([src, np.arange(12)]),
         np.concatenate([dst, np.arange(12)])),
        num_nodes=12,
    )
    g2 = dgl.to_simple(g)
    x = jnp.asarray(rng.normal(size=(12, 6)), dtype=jnp.float32)
    adj = np.zeros((12, 12), np.float32)
    rel = g2._relation(None)
    adj[np.asarray(rel.src), np.asarray(rel.dst)] = 1.0
    # dense: rows=src, cols=dst; aggregate over in-edges => adj.T @ x
    sparse_mod = GraphConv(6, 4, bias=False)
    params = sparse_mod.init(jax.random.PRNGKey(5), g2, x)
    out_sparse = sparse_mod.apply(params, g2, x)
    dense_mod = DenseGraphConv(6, 4, bias=False)
    w = params["params"]["weight"]
    out_dense = dense_mod.apply(
        {"params": {"weight": w}}, jnp.asarray(adj.T), x
    )
    np.testing.assert_allclose(
        np.asarray(out_sparse), np.asarray(out_dense), rtol=2e-4, atol=2e-5
    )


def test_hgt(g, x):
    ntype = jnp.asarray(np.random.default_rng(5).integers(0, 2, 20))
    etype = jnp.asarray(
        np.random.default_rng(6).integers(0, 3, g.num_edges())
    )
    out = _init_apply(HGTConv(8, 4, 2, 2, 3), g, x, ntype, etype)
    assert out.shape == (20, 8)


def test_grouprevres(g):
    x = jnp.asarray(
        np.random.default_rng(7).normal(size=(20, 16)), dtype=jnp.float32
    )
    mod = GroupRevRes(lambda i: GraphConv(8, 8, name=f"gc{i}"), groups=2)
    out = _init_apply(mod, g, x)
    assert out.shape == (20, 16)


def test_dgn(g, x):
    import dgl_tpu as dgl
    from dgl_tpu.nn.conv import DGNConv

    eig = dgl.lap_pe(g, 2)
    out = _init_apply(DGNConv(8, 8), g, x, eig)
    assert out.shape == (20, 8) and np.isfinite(np.asarray(out)).all()


def test_twirls(g, x):
    from dgl_tpu.nn.conv import TWIRLSConv

    out = _init_apply(TWIRLSConv(8, 4, 16, prop_step=4), g, x)
    assert out.shape == (20, 4)
    out2 = _init_apply(TWIRLSConv(8, 4, 16, prop_step=4, attention=True), g, x)
    assert np.isfinite(np.asarray(out2)).all()


def test_atomic(g):
    from dgl_tpu.nn.conv import AtomicConv

    rng = np.random.default_rng(3)
    z = jnp.asarray(rng.choice([1.0, 6.0], 20))[:, None]
    d = jnp.asarray(rng.uniform(0.5, 5.0, (g.num_edges(), 1)),
                    dtype=jnp.float32)
    conv = AtomicConv((3.0,), (1.5,), (1.0,), features_to_use=(1.0, 6.0))
    out = _init_apply(conv, g, z, d)
    assert out.shape == (20, 2)
    assert (np.asarray(out) >= 0).all()


def test_egnn_equivariance(g):
    from dgl_tpu.nn.conv import EGNNConv
    import scipy.spatial.transform as st

    h = jnp.asarray(np.random.default_rng(0).normal(size=(20, 8)),
                    dtype=jnp.float32)
    xyz = jnp.asarray(np.random.default_rng(1).normal(size=(20, 3)),
                      dtype=jnp.float32)
    m = EGNNConv(8, 16, 8)
    params = m.init(jax.random.PRNGKey(0), g, h, xyz)
    h2, x2 = m.apply(params, g, h, xyz)
    R = jnp.asarray(
        st.Rotation.from_euler("xyz", [0.3, 0.5, 0.7]).as_matrix(),
        dtype=jnp.float32,
    )
    h2r, x2r = m.apply(params, g, h, xyz @ R.T)
    np.testing.assert_allclose(np.asarray(x2r), np.asarray(x2 @ R.T),
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(np.asarray(h2r), np.asarray(h2),
                               rtol=2e-3, atol=2e-4)


def test_pna_helper_functions():
    import numpy as np
    from dgl_tpu import nn as dglnn

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(4, 5, 3)))
    np.testing.assert_allclose(
        np.asarray(dglnn.aggregate_mean(h)), np.asarray(h).mean(1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(dglnn.aggregate_var(h)),
        np.asarray(h).var(1), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dglnn.aggregate_std(h)),
        np.asarray(h).std(1), rtol=1e-4, atol=1e-5,
    )
    m3 = dglnn.aggregate_moment_3(h)
    assert m3.shape == (4, 3)
    D = jnp.asarray([2.0, 3.0, 4.0, 5.0])
    delta = 1.3
    hs = dglnn.aggregate_sum(h)
    amp = dglnn.scale_amplification(hs, D, delta)
    np.testing.assert_allclose(
        np.asarray(amp),
        np.asarray(hs) * (np.log(np.asarray(D) + 1) / delta)[:, None],
        rtol=1e-6,
    )
    assert dglnn.get_aggregate_fn("mean") is dglnn.aggregate_mean
    f = dglnn.get_aggregate_fn("dir_av-1")
    eig = jnp.asarray(rng.normal(size=(4, 5, 2)))
    out = f(h, eig, eig * 0.5)
    assert out.shape == (4, 3)


def test_twirls_functional_helpers():
    import numpy as np
    import dgl_tpu as dgl
    from dgl_tpu import nn as dglnn

    src = np.array([0, 1, 2, 2])
    dst = np.array([1, 2, 0, 1])
    g = dgl.graph((src, dst), num_nodes=3)
    X = jnp.asarray(np.eye(3, dtype=np.float32))
    # AX = adjacency matmul
    A = np.zeros((3, 3), np.float32)
    for s, d in zip(src, dst):
        A[d, s] += 1
    np.testing.assert_allclose(np.asarray(dglnn.AX(g, X)), A @ np.eye(3))
    # D^p X scales rows by in-degree^p
    deg = A.sum(1)
    np.testing.assert_allclose(
        np.asarray(dglnn.D_power_X(g, X, -1.0)),
        np.eye(3) / deg[:, None], rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(dglnn.normalized_AX(g, X)),
        (A @ np.diag(deg ** -0.5)) * (deg ** -0.5)[:, None],
        rtol=1e-6,
    )
    # propagation steps run and keep shape
    prop = dglnn.PropagateNoPrecond()
    Y = prop(g, X, X, 0.2, 1.0)
    assert Y.shape == X.shape
    prop2 = dglnn.Propagate()
    Y2 = prop2(g, X, X, 0.2, 0.5)
    assert Y2.shape == X.shape
    # attention writes edge weights
    att = dglnn.Attention(tau=0.1, T=2.0, p=1.0)
    g2 = att(g, X)
    assert g2.edata["w"].shape == (4,)


def test_misc_nn_helpers():
    import numpy as np
    from dgl_tpu import nn as dglnn

    # matmul_maybe_select / bmm_maybe_select
    W = jnp.asarray(np.arange(12.0).reshape(4, 3))
    np.testing.assert_allclose(
        np.asarray(dglnn.matmul_maybe_select(jnp.array([1, 3]), W)),
        np.asarray(W)[[1, 3]],
    )
    A = jnp.asarray(np.ones((2, 4)))
    np.testing.assert_allclose(
        np.asarray(dglnn.matmul_maybe_select(A, W)), np.asarray(A @ W)
    )
    B = jnp.stack([W, 2 * W])
    out = dglnn.bmm_maybe_select(A, B, jnp.array([0, 1]))
    np.testing.assert_allclose(out[1], np.asarray(A[1] @ (2 * W)))
    # gaussian basis
    val = dglnn.gaussian(jnp.array(0.0), jnp.array(0.0), jnp.array(1.0))
    assert abs(float(val) - 0.3989 / 1.01) < 1e-3
    # RadialPooling shape
    rp = dglnn.RadialPooling(
        interaction_cutoffs=jnp.array([12.0]),
        rbf_kernel_means=jnp.array([0.0]),
        rbf_kernel_scaling=jnp.array([1.0]),
    )
    e = rp(jnp.ones((5, 1)))
    assert e.shape == (1, 5, 1)
    # InvertibleCheckpoint wraps a function with remat
    f = dglnn.InvertibleCheckpoint(lambda x: x * 2)
    np.testing.assert_allclose(np.asarray(f(jnp.ones(3))), 2.0)
    assert dglnn.MCTSNode is not None
