"""Explainer tests."""
import jax
import jax.numpy as jnp
import numpy as np

import dgl_tpu as dgl
def test_hetero_gnnexplainer():
    """Hetero explainer learns per-type masks; works graph- and node-level."""
    from dgl_tpu.nn import HeteroGraphConv
    from dgl_tpu.nn.conv import GraphConv
    from dgl_tpu.nn.explain import HeteroGNNExplainer
    from flax import linen as nn

    rng = np.random.default_rng(0)
    hg = dgl.heterograph({
        ("a", "ab", "b"): (rng.integers(0, 8, 30), rng.integers(0, 6, 30)),
        ("b", "ba", "a"): (rng.integers(0, 6, 20), rng.integers(0, 8, 20)),
    })
    feat = {"a": jnp.asarray(rng.normal(size=(8, 5)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)}

    class M(nn.Module):
        @nn.compact
        def __call__(self, g, x, ew):
            conv = HeteroGraphConv(
                {"ab": GraphConv(5, 3, allow_zero_in_degree=True, name="c1"),
                 "ba": GraphConv(5, 3, allow_zero_in_degree=True, name="c2")},
                aggregate="sum")
            h = conv(g, x, mod_kwargs={
                "ab": {"edge_weight": ew[("a", "ab", "b")]},
                "ba": {"edge_weight": ew[("b", "ba", "a")]},
            })
            return h["a"]

    m = M()
    ones = {cet: jnp.ones(hg._relations[cet].num_edges_padded)
            for cet in hg.canonical_etypes}
    params = m.init(jax.random.PRNGKey(0), hg, feat, ones)
    model_fn = lambda g, x, ew: m.apply(params, g, x, ew)

    ex = HeteroGNNExplainer(model_fn, num_hops=1, num_epochs=15)
    fm, em = ex.explain_graph(hg, feat)
    assert set(fm) == {"a", "b"}
    assert set(em) == set(hg.canonical_etypes)
    for v in list(fm.values()) + list(em.values()):
        arr = np.asarray(v)
        assert np.all((arr >= 0) & (arr <= 1))
    nid, sg, fm2, em2 = ex.explain_node("a", 1, hg, feat)
    assert "a" in fm2 and len(em2) >= 1


def test_hetero_pgexplainer():
    from dgl_tpu.nn import HeteroGraphConv
    from dgl_tpu.nn.conv import GraphConv
    from dgl_tpu.nn.explain import HeteroPGExplainer
    from dgl_tpu import readout
    from flax import linen as nn

    rng = np.random.default_rng(1)
    hg = dgl.heterograph({
        ("a", "ab", "b"): (rng.integers(0, 8, 30), rng.integers(0, 6, 30)),
        ("b", "ba", "a"): (rng.integers(0, 6, 20), rng.integers(0, 8, 20)),
    })
    feat = {"a": jnp.asarray(rng.normal(size=(8, 5)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(6, 5)), jnp.float32)}

    class M(nn.Module):
        @nn.compact
        def __call__(self, g, x, ew):
            h = HeteroGraphConv(
                {"ab": GraphConv(5, 4, allow_zero_in_degree=True, name="c1"),
                 "ba": GraphConv(5, 4, allow_zero_in_degree=True, name="c2")},
                aggregate="sum")(g, x, mod_kwargs={
                    "ab": {"edge_weight": ew[("a", "ab", "b")]},
                    "ba": {"edge_weight": ew[("b", "ba", "a")]},
                })
            logits = nn.Dense(3)(h["a"].mean(axis=0, keepdims=True))[0]
            return logits, {k: v for k, v in h.items()}

    m = M()
    ones = {cet: jnp.ones(hg._relations[cet].num_edges_padded)
            for cet in hg.canonical_etypes}
    params = m.init(jax.random.PRNGKey(0), hg, feat, ones)
    model_fn = lambda g, x, ew: m.apply(params, g, x, ew)

    ex = HeteroPGExplainer(model_fn, num_features=4, epochs=10)
    loss = ex.train_step(hg, feat)
    assert np.isfinite(loss)
    probs, masks = ex.explain_graph(hg, feat)
    assert set(masks) == set(hg.canonical_etypes)
    for v in masks.values():
        arr = np.asarray(v)
        assert np.all((arr >= 0) & (arr <= 1))


def test_hetero_subgraphx():
    from dgl_tpu.nn import HeteroGraphConv
    from dgl_tpu.nn.conv import GraphConv
    from dgl_tpu.nn.explain import HeteroSubgraphX
    from flax import linen as nn

    rng = np.random.default_rng(2)
    hg = dgl.heterograph({
        ("a", "ab", "b"): (rng.integers(0, 6, 15), rng.integers(0, 5, 15)),
        ("b", "ba", "a"): (rng.integers(0, 5, 10), rng.integers(0, 6, 10)),
    })
    feat = {"a": jnp.asarray(rng.normal(size=(6, 4)), jnp.float32),
            "b": jnp.asarray(rng.normal(size=(5, 4)), jnp.float32)}

    class M(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = HeteroGraphConv(
                {"ab": GraphConv(4, 4, allow_zero_in_degree=True, name="c1"),
                 "ba": GraphConv(4, 4, allow_zero_in_degree=True, name="c2")},
                aggregate="sum")(g, x)
            pooled = jnp.concatenate(
                [h["a"].mean(0), h["b"].mean(0)])
            return nn.Dense(3)(pooled)

    m = M()
    params = m.init(jax.random.PRNGKey(0), hg, feat)
    model_fn = lambda g, x: m.apply(params, g, x)

    ex = HeteroSubgraphX(model_fn, num_rollouts=4, shapley_steps=4,
                         node_min=2)
    result, score = ex.explain_graph(hg, feat, node_max=5)
    total = sum(len(v) for v in result.values())
    assert 2 <= total <= 11
    for nt, ids in result.items():
        assert np.all(ids < hg.num_nodes(nt)) and np.all(ids >= 0)
    assert np.isfinite(score)
