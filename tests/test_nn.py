"""nn layer zoo tests (modeled on reference tests/python/pytorch/test_nn.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.nn import (
    GraphConv,
    SAGEConv,
    GATConv,
    GATv2Conv,
    GINConv,
    RelGraphConv,
    SGConv,
    APPNPConv,
    TAGConv,
    ChebConv,
    EdgeConv,
    GatedGraphConv,
    NNConv,
    HeteroGraphConv,
    TypedLinear,
    HeteroLinear,
    HeteroEmbedding,
    EdgeWeightNorm,
    SumPooling,
    AvgPooling,
    MaxPooling,
    SortPooling,
    GlobalAttentionPooling,
    Set2Set,
)

KEY = jax.random.PRNGKey(0)


def cycle_graph(n=10):
    src = np.arange(n)
    dst = (src + 1) % n
    # add reverse edges so every node has in-degree
    return dgl.graph(
        (np.concatenate([src, dst]), np.concatenate([dst, src])), num_nodes=n
    )


def test_graphconv_norm_both():
    g = cycle_graph(6)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((6, 4)).astype(np.float32))
    layer = GraphConv(4, 3)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (6, 3)
    # manual check: both-norm GCN on the cycle (all degrees 2)
    w = params["params"]["weight"]
    adj = np.zeros((6, 6), dtype=np.float32)
    u, v = g.edges()
    for s, d in zip(np.asarray(u), np.asarray(v)):
        adj[d, s] += 1
    norm = adj / 2.0  # D^-1/2 A D^-1/2 with deg=2 everywhere
    expected = norm @ np.asarray(x) @ np.asarray(w)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_graphconv_zero_in_degree_raises():
    g = dgl.graph(([0], [1]), num_nodes=3)
    x = jnp.ones((3, 4))
    layer = GraphConv(4, 2)
    with pytest.raises(dgl.DGLError):
        layer.init(KEY, g, x)
    layer = GraphConv(4, 2, allow_zero_in_degree=True)
    layer.init(KEY, g, x)


def test_graphconv_edge_weight():
    g = cycle_graph(5)
    x = jnp.ones((5, 2))
    ew = jnp.ones((g.num_edges(),)) * 0.5
    layer = GraphConv(2, 2, norm="none", weight=False, bias=False)
    params = layer.init(KEY, g, x, ew)
    out = layer.apply(params, g, x, ew)
    np.testing.assert_allclose(np.asarray(out), 1.0)  # two in-edges * 0.5


@pytest.mark.parametrize("agg", ["mean", "gcn", "pool", "lstm"])
def test_sageconv(agg):
    g = cycle_graph(8)
    x = jnp.asarray(np.random.default_rng(1).standard_normal((8, 5)).astype(np.float32))
    layer = SAGEConv(5, 3, aggregator_type=agg)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_sageconv_mean_manual():
    g = cycle_graph(6)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((6, 4)).astype(np.float32))
    layer = SAGEConv(4, 4, aggregator_type="mean", bias=False)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    w_self = np.asarray(params["params"]["fc_self"]["kernel"])
    w_neigh = np.asarray(params["params"]["fc_neigh"]["kernel"])
    adj = np.zeros((6, 6), dtype=np.float32)
    u, v = g.edges()
    for s, d in zip(np.asarray(u), np.asarray(v)):
        adj[d, s] += 1
    mean_neigh = (adj @ np.asarray(x)) / adj.sum(1, keepdims=True)
    expected = np.asarray(x) @ w_self + mean_neigh @ w_neigh
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_gatconv():
    g = cycle_graph(7)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((7, 4)).astype(np.float32))
    layer = GATConv(4, 3, num_heads=2)
    params = layer.init(KEY, g, x)
    out, attn = layer.apply(params, g, x, get_attention=True)
    assert out.shape == (7, 2, 3)
    # attention sums to 1 over incoming edges
    a = np.asarray(attn)  # (E, H, 1)
    dst = np.asarray(g.edges()[1])
    sums = np.zeros((7, 2))
    np.add.at(sums, dst, a[:, :, 0])
    np.testing.assert_allclose(sums, 1.0, rtol=1e-5)


def test_gatv2conv():
    g = cycle_graph(7)
    x = jnp.ones((7, 4))
    layer = GATv2Conv(4, 3, num_heads=2)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (7, 2, 3)


def test_ginconv():
    g = cycle_graph(6)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((6, 4)).astype(np.float32))
    mlp = nn.Dense(4)
    layer = GINConv(apply_func=mlp, aggregator_type="sum", init_eps=0.1)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (6, 4)


def test_relgraphconv():
    g = cycle_graph(6)
    E = g.num_edges()
    etypes = jnp.asarray(np.random.default_rng(5).integers(0, 3, E))
    x = jnp.asarray(np.random.default_rng(6).standard_normal((6, 4)).astype(np.float32))
    layer = RelGraphConv(4, 2, num_rels=3, regularizer="basis", num_bases=2)
    params = layer.init(KEY, g, x, etypes)
    out = layer.apply(params, g, x, etypes)
    assert out.shape == (6, 2)
    # manual: sum over in-edges of W[et] h_src + self loop
    p = params["params"]
    W = np.einsum("rb,bio->rio", np.asarray(p["coeff"]), np.asarray(p["basis"]))
    u, v = np.asarray(g.edges()[0]), np.asarray(g.edges()[1])
    expected = np.zeros((6, 2), dtype=np.float32)
    for i in range(E):
        expected[v[i]] += np.asarray(x)[u[i]] @ W[int(etypes[i])]
    expected += np.asarray(x) @ np.asarray(p["loop_weight"])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("cls,kwargs", [
    (SGConv, dict(in_feats=4, out_feats=3, k=2)),
    (TAGConv, dict(in_feats=4, out_feats=3, k=2)),
    (ChebConv, dict(in_feats=4, out_feats=3, k=3)),
])
def test_spectral_convs(cls, kwargs):
    g = cycle_graph(8)
    x = jnp.asarray(np.random.default_rng(7).standard_normal((8, 4)).astype(np.float32))
    layer = cls(**kwargs)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (8, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_appnp():
    g = cycle_graph(8)
    x = jnp.asarray(np.random.default_rng(8).standard_normal((8, 4)).astype(np.float32))
    layer = APPNPConv(k=3, alpha=0.2)
    params = layer.init(KEY, g, x)
    out = layer.apply(params, g, x)
    assert out.shape == (8, 4)


def test_edgeconv_gatedgraphconv_nnconv():
    g = cycle_graph(6)
    x = jnp.asarray(np.random.default_rng(9).standard_normal((6, 4)).astype(np.float32))
    layer = EdgeConv(4, 3)
    params = layer.init(KEY, g, x)
    assert layer.apply(params, g, x).shape == (6, 3)

    layer = GatedGraphConv(4, 6, n_steps=2, n_etypes=1)
    params = layer.init(KEY, g, x)
    assert layer.apply(params, g, x).shape == (6, 6)

    efeat = jnp.ones((g.num_edges(), 2))
    layer = NNConv(4, 3, edge_func=nn.Dense(12), aggregator_type="mean")
    params = layer.init(KEY, g, x, efeat)
    assert layer.apply(params, g, x, efeat).shape == (6, 3)


def test_heterographconv():
    g = dgl.heterograph(
        {
            ("user", "follows", "user"): ([0, 1], [1, 2]),
            ("game", "played_by", "user"): ([0, 1], [2, 1]),
        },
        {"user": 3, "game": 2},
    )
    conv = HeteroGraphConv(
        mods={
            "follows": GraphConv(4, 3, allow_zero_in_degree=True),
            "played_by": GraphConv(4, 3, allow_zero_in_degree=True),
        },
        aggregate="sum",
    )
    inputs = {"user": jnp.ones((3, 4)), "game": jnp.ones((2, 4))}
    params = conv.init(KEY, g, inputs)
    out = conv.apply(params, g, inputs)
    assert set(out.keys()) == {"user"}
    assert out["user"].shape == (3, 3)


def test_typed_hetero_linear_embedding():
    x = jnp.ones((6, 4))
    types = jnp.asarray([0, 0, 1, 1, 2, 2])
    layer = TypedLinear(4, 3, 3)
    params = layer.init(KEY, x, types)
    out = layer.apply(params, x, types)
    assert out.shape == (6, 3)

    hl = HeteroLinear({"a": 4, "b": 2}, 5)
    feats = {"a": jnp.ones((3, 4)), "b": jnp.ones((2, 2))}
    params = hl.init(KEY, feats)
    out = hl.apply(params, feats)
    assert out["a"].shape == (3, 5) and out["b"].shape == (2, 5)

    he = HeteroEmbedding({"a": 10, "b": 5}, 8)
    ids = {"a": jnp.asarray([0, 3]), "b": jnp.asarray([1])}
    params = he.init(KEY, ids)
    out = he.apply(params, ids)
    assert out["a"].shape == (2, 8) and out["b"].shape == (1, 8)


def test_edge_weight_norm():
    g = cycle_graph(5)
    w = jnp.ones((g.num_edges(),))
    layer = EdgeWeightNorm(norm="both")
    params = layer.init(KEY, g, w)
    out = layer.apply(params, g, w)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-5)  # deg 2 both sides


def test_pooling_layers():
    g1 = dgl.graph(([0, 1], [1, 0]), num_nodes=2)
    g2 = dgl.graph(([0, 1, 2], [1, 2, 0]), num_nodes=3)
    bg = dgl.batch([g1, g2])
    x = jnp.asarray(
        np.random.default_rng(10).standard_normal((5, 4)).astype(np.float32)
    )
    for cls, shape in [(SumPooling, (2, 4)), (AvgPooling, (2, 4)), (MaxPooling, (2, 4))]:
        layer = cls()
        params = layer.init(KEY, bg, x)
        out = layer.apply(params, bg, x)
        assert out.shape == shape

    layer = SortPooling(k=2)
    params = layer.init(KEY, bg, x)
    out = layer.apply(params, bg, x)
    assert out.shape == (2, 8)

    layer = GlobalAttentionPooling(gate_nn=nn.Dense(1))
    params = layer.init(KEY, bg, x)
    out = layer.apply(params, bg, x)
    assert out.shape == (2, 4)

    layer = Set2Set(input_dim=4, n_iters=2)
    params = layer.init(KEY, bg, x)
    out = layer.apply(params, bg, x)
    assert out.shape == (2, 8)


def test_gatconv_jit_grad():
    g = cycle_graph(6)
    x = jnp.asarray(np.random.default_rng(11).standard_normal((6, 4)).astype(np.float32))
    layer = GATConv(4, 3, num_heads=2)
    params = layer.init(KEY, g, x)

    @jax.jit
    def loss(p, graph, xx):
        return (layer.apply(p, graph, xx) ** 2).sum()

    grads = jax.grad(loss)(params, g, x)
    flat = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(l)).all() for l in flat)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in flat)
