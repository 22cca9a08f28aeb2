"""Full-graph GCN on Cora (reference ``examples/core/gcn/train.py``).

Run: python examples/gcn_cora.py [--epochs 200]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu.data import CoraGraphDataset
from dgl_tpu.models import GCN


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--hidden", type=int, default=16)
    args = p.parse_args()

    ds = CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    if jax.devices()[0].platform != "cpu":
        # segment-free SpMM fast path (MXU hub matmul + shells); CPU keeps
        # the classic sorted-segment path
        g = g.with_spmm_plans(weighted=True)
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    val_mask = g.ndata["val_mask"]
    test_mask = g.ndata["test_mask"]

    model = GCN(feat.shape[1], args.hidden, ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(args.lr, b1=0.9)
    opt_state = tx.init(params)
    dropout_rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                p, g, feat, deterministic=False, rngs={"dropout": rng}
            )
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    @jax.jit
    def evaluate(params):
        logits = model.apply(params, g, feat)
        pred = jnp.argmax(logits, -1)
        correct = (pred == labels).astype(jnp.float32)
        return (
            (correct * val_mask).sum() / val_mask.sum(),
            (correct * test_mask).sum() / test_mask.sum(),
        )

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        dropout_rng, sub = jax.random.split(dropout_rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if epoch % 20 == 0:
            val_acc, _ = evaluate(params)
            print(f"epoch {epoch:3d} loss {float(loss):.4f} val {float(val_acc):.4f}")
    train_time = time.perf_counter() - t0
    _, test_acc = evaluate(params)
    print(f"train time {train_time:.3f}s  test accuracy {float(test_acc):.4f}")


if __name__ == "__main__":
    main()
