"""Tests for gt / link / factory / explain / embeddings modules."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.nn import (
    DeepWalk,
    EdgePredictor,
    KNNGraph,
    MetaPath2Vec,
    NodeEmbedding,
    RadiusGraph,
    TransE,
    TransR,
    sparse_adagrad_init,
    sparse_adagrad_update,
    sparse_adam_init,
    sparse_adam_update,
)
from dgl_tpu.nn.gt import (
    BiasedMHA,
    DegreeEncoder,
    EGTLayer,
    GraphormerLayer,
    LapPosEncoder,
    PathEncoder,
    SpatialEncoder,
)
from dgl_tpu.nn.explain import GNNExplainer


def _init_apply(mod, *args, **kwargs):
    params = mod.init(jax.random.PRNGKey(0), *args, **kwargs)
    return mod.apply(params, *args, **kwargs)


# --- gt ---------------------------------------------------------------------


def test_degree_encoder():
    deg = jnp.asarray(np.random.default_rng(0).integers(0, 30, (2, 10)))
    out = _init_apply(DegreeEncoder(8, 16), deg)
    assert out.shape == (2, 10, 16)


def test_spatial_encoder():
    dist = jnp.asarray(
        np.random.default_rng(0).integers(-1, 6, (2, 10, 10))
    )
    out = _init_apply(SpatialEncoder(4, num_heads=3), dist)
    assert out.shape == (2, 10, 10, 3)


def test_path_encoder():
    rng = np.random.default_rng(0)
    dist = jnp.asarray(rng.integers(-1, 4, (2, 6, 6)))
    path = jnp.asarray(rng.normal(size=(2, 6, 6, 3, 5)), dtype=jnp.float32)
    out = _init_apply(PathEncoder(3, 5, num_heads=2), dist, path)
    assert out.shape == (2, 6, 6, 2)


def test_biased_mha_and_graphormer():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 10, 16)), dtype=jnp.float32)
    bias = jnp.asarray(rng.normal(size=(2, 10, 10, 4)), dtype=jnp.float32)
    out = _init_apply(BiasedMHA(16, 4, attn_drop=0.0), x, bias)
    assert out.shape == (2, 10, 16)
    out2 = _init_apply(
        GraphormerLayer(16, 32, 4, dropout=0.0, attn_dropout=0.0), x, bias
    )
    assert out2.shape == (2, 10, 16)


def test_egt_layer():
    rng = np.random.default_rng(0)
    nfeat = jnp.asarray(rng.normal(size=(2, 8, 16)), dtype=jnp.float32)
    efeat = jnp.asarray(rng.normal(size=(2, 8, 8, 6)), dtype=jnp.float32)
    n_out, e_out = _init_apply(EGTLayer(16, 6, 4), nfeat, efeat)
    assert n_out.shape == (2, 8, 16) and e_out.shape == (2, 8, 8, 6)


def test_lap_pos_encoder():
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.normal(size=(10, 4)), dtype=jnp.float32)
    vals = jnp.asarray(rng.normal(size=(10, 4)), dtype=jnp.float32)
    out = _init_apply(LapPosEncoder("DeepSet", 2, 4, 16), vals, vecs)
    assert out.shape == (10, 16)


# --- link -------------------------------------------------------------------


def test_edge_predictor():
    rng = np.random.default_rng(0)
    hs = jnp.asarray(rng.normal(size=(5, 8)), dtype=jnp.float32)
    hd = jnp.asarray(rng.normal(size=(5, 8)), dtype=jnp.float32)
    assert _init_apply(EdgePredictor("dot"), hs, hd).shape == (5, 1)
    assert _init_apply(EdgePredictor("cos"), hs, hd).shape == (5, 1)
    assert _init_apply(EdgePredictor("ele", out_feats=3), hs, hd).shape == (5, 3)
    assert _init_apply(EdgePredictor("cat", out_feats=3), hs, hd).shape == (5, 3)


def test_transe_transr():
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(6, 8)), dtype=jnp.float32)
    t = jnp.asarray(rng.normal(size=(6, 8)), dtype=jnp.float32)
    r = jnp.asarray(rng.integers(0, 3, 6))
    assert _init_apply(TransE(3, 8), h, t, r).shape == (6,)
    assert _init_apply(TransR(3, 4, 8), h, t, r).shape == (6,)


# --- factory ----------------------------------------------------------------


def test_knn_graph_module():
    x = jnp.asarray(np.random.default_rng(0).normal(size=(10, 3)),
                    dtype=jnp.float32)
    g = KNNGraph(3)(x)
    assert g.num_nodes() == 10 and g.num_edges() == 30


def test_radius_graph():
    x = jnp.array([[0.0], [0.1], [5.0]])
    g = RadiusGraph(1.0)(x)
    assert bool(g.has_edges_between(0, 1))
    assert not bool(g.has_edges_between(0, 2))


# --- embeddings -------------------------------------------------------------


def test_node_embedding_and_sparse_optim():
    emb = NodeEmbedding(20, 8)
    ids = jnp.asarray([1, 3, 3, 7])
    rows = emb(ids)
    assert rows.shape == (4, 8)
    grads = jnp.ones((4, 8))
    table = emb.weight
    st = sparse_adagrad_init(table)
    new_table, st = sparse_adagrad_update(table, st, ids, grads, lr=0.1)
    diff = np.abs(np.asarray(new_table - table)).sum(axis=1)
    assert (diff[np.array([1, 3, 7])] > 0).all()
    assert diff[0] == 0  # untouched rows unchanged
    st2 = sparse_adam_init(table)
    new_table2, st2 = sparse_adam_update(table, st2, ids, grads)
    diff2 = np.abs(np.asarray(new_table2 - table)).sum(axis=1)
    assert (diff2[np.array([1, 3, 7])] > 0).all() and diff2[0] == 0
    # per-row step counts only advance for touched rows
    assert float(st2.t[3, 0]) == 1.0 and float(st2.t[0, 0]) == 0.0


def test_deepwalk():
    g = dgl.rand_graph(30, 200, seed=0)
    dw = DeepWalk(30, emb_dim=8, walk_length=5, window_size=2)
    rng = np.random.default_rng(0)
    tgt, ctx, neg = dw.sample_batch(g, np.arange(10), rng)
    assert tgt.shape == ctx.shape and neg.shape[0] == tgt.shape[0]
    params = dw.init(jax.random.PRNGKey(0), tgt, ctx, neg)
    loss = dw.apply(params, tgt, ctx, neg)
    assert np.isfinite(float(loss))


def test_metapath2vec():
    g = dgl.heterograph(
        {
            ("user", "plays", "game"): ([0, 1, 2], [0, 1, 0]),
            ("game", "played-by", "user"): ([0, 1], [1, 2]),
        }
    )
    offs, total = MetaPath2Vec.type_offsets(g)
    mp = MetaPath2Vec(total, emb_dim=8, window_size=2)
    rng = np.random.default_rng(0)
    tgt, ctx, neg = mp.sample_batch(
        g, [0, 1], ["plays", "played-by"] * 2, rng
    )
    if tgt.size:
        params = mp.init(jax.random.PRNGKey(0), tgt, ctx, neg)
        loss = mp.apply(params, tgt, ctx, neg)
        assert np.isfinite(float(loss))


# --- explain ----------------------------------------------------------------


def test_gnnexplainer():
    from dgl_tpu.nn.conv import GraphConv

    g = dgl.add_self_loop(dgl.rand_graph(12, 40, seed=0))
    feat = jnp.asarray(
        np.random.default_rng(0).normal(size=(12, 6)), dtype=jnp.float32
    )
    conv = GraphConv(6, 3)
    params = conv.init(jax.random.PRNGKey(0), g, feat)

    def model_fn(graph, x, eweight):
        return conv.apply(params, graph, x, edge_weight=eweight)

    expl = GNNExplainer(model_fn, num_hops=1, num_epochs=5)
    new_id, sg, fmask, emask = expl.explain_node(3, g, feat)
    assert fmask.shape == (6,)
    assert emask.shape[0] == sg._relation(None).num_edges_padded
    assert np.all((np.asarray(emask) >= 0) & (np.asarray(emask) <= 1))


def test_subgraphx():
    from dgl_tpu import readout
    from dgl_tpu.nn.conv import GraphConv
    from dgl_tpu.nn.explain import SubgraphX
    import dgl_tpu as dgl

    g = dgl.add_self_loop(
        dgl.graph(([0, 1, 2, 3, 4, 5, 6], [1, 2, 0, 4, 5, 6, 3]),
                  num_nodes=7)
    )
    feat = jnp.zeros((7, 4)).at[:, 1].set(1.0)
    conv = GraphConv(4, 2)
    params = conv.init(jax.random.PRNGKey(0), g, feat)

    def model_fn(graph, x):
        h = conv.apply(params, graph, x)
        with graph.local_scope() as gg:
            gg.ndata["h"] = h
            return readout.sum_nodes(gg, "h")

    sx = SubgraphX(model_fn, num_rollouts=6, shapley_steps=4, node_min=2)
    nodes, score = sx.explain_graph(g, feat, node_max=3)
    assert 2 <= len(nodes) <= 3
    assert np.isfinite(score)


def test_sparse_optimizer_classes():
    """Reference-style SparseAdagrad/SparseAdam wrappers update only the
    touched rows of NodeEmbedding tables."""
    from dgl_tpu.nn import NodeEmbedding
    from dgl_tpu.optim import SparseAdagrad, SparseAdam

    emb = NodeEmbedding(10, 4, seed=0)
    w0 = np.asarray(emb.weight).copy()
    opt = SparseAdagrad([emb], lr=0.1)
    ids = jnp.asarray([1, 3, 1])
    grads = jnp.ones((3, 4))
    opt.step([(ids, grads)])
    w1 = np.asarray(emb.weight)
    assert not np.allclose(w1[1], w0[1])
    assert np.allclose(w1[0], w0[0]) and np.allclose(w1[5], w0[5])
    # duplicate ids accumulate: row 1 moved farther than row 3
    assert np.abs(w1[1] - w0[1]).sum() > np.abs(w1[3] - w0[3]).sum() - 1e-6

    emb2 = NodeEmbedding(10, 4, seed=1)
    v0 = np.asarray(emb2.weight).copy()
    SparseAdam([emb2]).step([(ids, grads)])
    v1 = np.asarray(emb2.weight)
    assert not np.allclose(v1[3], v0[3]) and np.allclose(v1[2], v0[2])
