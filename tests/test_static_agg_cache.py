"""Static-input aggregation caching: exactness tests.

The optimization (precompute_graphconv / precompute_sage_neigh) is an
algebraic rewrite — ``Â (X W) == (Â X) W`` — so forward outputs AND
parameter gradients must match the unoptimized path to float tolerance.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.models import GCN
from dgl_tpu.nn import (
    GraphConv,
    SAGEConv,
    precompute_graphconv,
    precompute_sage_neigh,
)


@pytest.fixture
def g_and_x():
    rng = np.random.default_rng(0)
    n, e = 50, 220
    g = dgl.add_self_loop(
        dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n))
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
    return g, x


@pytest.mark.parametrize("norm", ["both", "left", "right", "none"])
def test_graphconv_precompute_exact(g_and_x, norm):
    g, x = g_and_x
    conv = GraphConv(12, 7, norm=norm)
    params = conv.init(jax.random.PRNGKey(0), g, x)
    want = conv.apply(params, g, x)
    pre = precompute_graphconv(g, x, norm=norm)
    got = conv.apply(params, g, pre, precomputed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_graphconv_precompute_edge_weight(g_and_x):
    g, x = g_and_x
    rng = np.random.default_rng(1)
    ew = jnp.asarray(rng.random(g.num_edges()), jnp.float32)
    conv = GraphConv(12, 7, norm="right")
    params = conv.init(jax.random.PRNGKey(0), g, x)
    want = conv.apply(params, g, x, edge_weight=ew)
    pre = precompute_graphconv(g, x, norm="right", edge_weight=ew)
    got = conv.apply(params, g, pre, precomputed=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_gcn_model_grads_exact(g_and_x):
    g, x = g_and_x
    labels = jnp.asarray(np.random.default_rng(2).integers(0, 3, 50))
    base = GCN(12, 8, 3, dropout=0.0)
    fast = GCN(12, 8, 3, dropout=0.0, static_input_agg=True)
    params = base.init(jax.random.PRNGKey(0), g, x)
    pre = precompute_graphconv(g, x)

    def loss(model, p, feats):
        import optax

        logits = model.apply(p, g, feats)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels).mean()

    l0, g0 = jax.value_and_grad(lambda p: loss(base, p, x))(params)
    l1, g1 = jax.value_and_grad(lambda p: loss(fast, p, pre))(params)
    assert abs(float(l0) - float(l1)) < 1e-5
    for k0, k1 in zip(jax.tree_util.tree_leaves(g0),
                      jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(k0), np.asarray(k1),
                                   rtol=2e-4, atol=1e-5)


def test_sageconv_precompute_exact(g_and_x):
    g, x = g_and_x
    conv = SAGEConv(12, 7)
    params = conv.init(jax.random.PRNGKey(0), g, x)
    want = conv.apply(params, g, x)
    pre = precompute_sage_neigh(g, x)
    got = conv.apply(params, g, x, precomputed_neigh=pre)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_sgc_hops(g_and_x):
    g, x = g_and_x
    one = precompute_graphconv(g, x)
    two = precompute_graphconv(g, one)
    got = precompute_graphconv(g, x, hops=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(two),
                               rtol=1e-5, atol=1e-5)
