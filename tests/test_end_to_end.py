"""End-to-end model training configs (BASELINE.json north-star configs,
scaled to CI budgets): GCN full-graph, GAT edge-softmax path, R-GCN typed
message passing. Accuracy thresholds assert learning actually happens
(well above chance), mirroring the reference's model_acc benchmarks."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

import dgl_tpu as dgl
from dgl_tpu.data import CoraGraphDataset, SyntheticDataset
from dgl_tpu.models import GCN, GAT, GraphSAGE


def _train_full_graph(model, g, feat, labels, train_mask, test_mask,
                      epochs=60, lr=1e-2, rngs=None):
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, g, feat)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(epochs):
        params, opt_state, loss = step(params, opt_state)

    logits = model.apply(params, g, feat)
    pred = jnp.argmax(logits, axis=-1)
    acc = ((pred == labels) * test_mask).sum() / test_mask.sum()
    return float(acc)


@pytest.fixture(scope="module")
def cora():
    ds = CoraGraphDataset()
    g = ds[0]
    g = dgl.add_self_loop(dgl.remove_self_loop(g))
    return g, ds.num_classes


def test_gcn_cora(cora):
    g, C = cora
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    acc = _train_full_graph(
        GCN(feat.shape[1], 16, C, dropout=0.0),
        g, feat, labels,
        g.ndata["train_mask"].astype(jnp.float32),
        g.ndata["test_mask"].astype(jnp.float32),
    )
    # chance = 1/7 ~ 0.14; synthetic-cora GCN should reach far above
    assert acc > 0.6, f"GCN accuracy too low: {acc}"


def test_gat_path(cora):
    g, C = cora
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    acc = _train_full_graph(
        GAT(feat.shape[1], 8, C, heads=4, feat_drop=0.0, attn_drop=0.0),
        g, feat, labels,
        g.ndata["train_mask"].astype(jnp.float32),
        g.ndata["test_mask"].astype(jnp.float32),
        epochs=40,
    )
    assert acc > 0.5, f"GAT accuracy too low: {acc}"


def test_sage_full_graph():
    ds = SyntheticDataset(num_nodes=500, num_edges=4000, num_classes=5, feat_dim=32)
    g = ds[0]
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    acc = _train_full_graph(
        GraphSAGE(32, 32, 5, num_layers=2, dropout=0.0),
        g, feat, labels,
        g.ndata["train_mask"].astype(jnp.float32),
        g.ndata["test_mask"].astype(jnp.float32),
    )
    assert acc > 0.6, f"SAGE accuracy too low: {acc}"
