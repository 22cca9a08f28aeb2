"""Model accuracy benchmarks (reference ``benchmarks/benchmarks/model_acc/``):
GCN / GAT / SAGE test accuracy on the citation-shaped datasets. One JSON
line per (model, dataset)."""
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import argparse
import json
import time

import numpy as np


def train_eval(model_name, dataset_name, epochs):
    import jax
    import jax.numpy as jnp
    import optax

    import dgl_tpu as dgl
    from dgl_tpu.data import (
        CiteseerGraphDataset,
        CoraGraphDataset,
        PubmedGraphDataset,
    )
    from dgl_tpu.models import GAT, GCN, GraphSAGE

    ds = {
        "cora": CoraGraphDataset,
        "citeseer": CiteseerGraphDataset,
        "pubmed": PubmedGraphDataset,
    }[dataset_name]()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    test_mask = g.ndata["test_mask"]
    model = {
        "gcn": lambda: GCN(feat.shape[1], 16, ds.num_classes),
        "gat": lambda: GAT(feat.shape[1], 8, ds.num_classes, heads=8),
        "sage": lambda: GraphSAGE(feat.shape[1], 64, ds.num_classes,
                                  num_layers=2),
    }[model_name]()
    params = model.init(jax.random.PRNGKey(0), g, feat)
    # published per-model recipe (reference examples/pytorch/{gcn,gat}):
    # GAT adam 5e-3, others 1e-2; weight decay 5e-4; best-val selection
    lr = 5e-3 if model_name == "gat" else 1e-2
    tx = optax.chain(optax.add_decayed_weights(5e-4), optax.adam(lr))
    opt_state = tx.init(params)
    val_mask = np.asarray(g.ndata["val_mask"])
    rng = jax.random.PRNGKey(1)

    @jax.jit
    def step(params, opt_state, rng):
        def loss_fn(p):
            logits = model.apply(
                p, g, feat, deterministic=False, rngs={"dropout": rng}
            )
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    y = np.asarray(labels)
    tm = np.asarray(test_mask)
    best_val, acc = -1.0, 0.0
    t0 = time.perf_counter()
    for ep in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, _ = step(params, opt_state, sub)
        if ep % 5 == 4 or ep == epochs - 1:
            pred = np.asarray(jnp.argmax(model.apply(params, g, feat), -1))
            va = float((pred[val_mask] == y[val_mask]).mean())
            if va > best_val:
                best_val = va
                acc = float((pred[tm] == y[tm]).mean())
    train_s = time.perf_counter() - t0
    return acc, train_s


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    p.add_argument("--models", nargs="+", default=["gcn", "gat", "sage"])
    p.add_argument("--datasets", nargs="+", default=["cora", "citeseer"])
    args = p.parse_args()
    for d in args.datasets:
        for m in args.models:
            acc, train_s = train_eval(m, d, args.epochs)
            print(
                json.dumps(
                    {
                        "bench": f"model_acc_{m}_{d}",
                        "test_acc": round(acc, 4),
                        "epochs": args.epochs,
                        "train_s": round(train_s, 2),
                    }
                ),
                flush=True,
            )


if __name__ == "__main__":
    main()
