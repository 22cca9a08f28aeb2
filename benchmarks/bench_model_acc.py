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
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
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
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    t0 = time.perf_counter()
    for _ in range(epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, _ = step(params, opt_state, sub)
    train_s = time.perf_counter() - t0
    logits = model.apply(params, g, feat)
    pred = jnp.argmax(logits, -1)
    acc = float(((pred == labels) * test_mask).sum() / test_mask.sum())
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
