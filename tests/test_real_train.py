"""Real-format parse -> train -> accuracy (VERDICT r2 #3): the raw-OGB
csv.gz layout is parsed by ``from_ogb`` and trained end to end through the
public API, proving the parser feeds training, not just the parser tests.
Reference pattern: examples/core/gcn/train.py on ogbn-arxiv.
"""
import os

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

import dgl_tpu as dgl
from dgl_tpu.data.adapter import from_ogb
from dgl_tpu.models import GCN

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


def test_parse_train_accuracy_ogb_raw():
    g = from_ogb("ogbn-arxiv_mid", root=os.path.join(FIX, "ogb"))
    g = dgl.add_self_loop(dgl.remove_self_loop(g))
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    test_mask = np.asarray(g.ndata["test_mask"])
    num_classes = int(np.asarray(labels).max()) + 1
    model = GCN(feat.shape[1], 32, num_classes, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, feat)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for _ in range(120):
        params, opt, loss = step(params, opt)
    pred = np.asarray(jnp.argmax(model.apply(params, g, feat), -1))
    y = np.asarray(labels)
    acc = float((pred[test_mask] == y[test_mask]).mean())
    # planted-signal fixture: GCN must clearly beat chance (0.2) and the
    # feature-only ceiling is ~0.75; the path is broken if this fails
    assert acc >= 0.6, f"parse->train accuracy {acc}"
    assert float(loss) < 1.0
