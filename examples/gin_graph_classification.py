"""Graph classification with GIN on MiniGC (reference
``examples/pytorch/gin/train.py``).

TPU-first: GraphDataLoader pads every minibatch to ONE static shape
(ghost graphs absorb the slack), so the whole run uses a single compiled
train step.

Run: python examples/gin_graph_classification.py [--epochs 40]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu.data import MiniGCDataset
from dgl_tpu.dataloading import GraphDataLoader
from dgl_tpu.models import GIN


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=40)
    p.add_argument("--num-graphs", type=int, default=320)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--hidden", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-2)
    args = p.parse_args()

    train_ds = MiniGCDataset(args.num_graphs, 10, 20, seed=0)
    test_ds = MiniGCDataset(80, 10, 20, seed=1)
    loader = GraphDataLoader(
        train_ds, batch_size=args.batch_size, shuffle=True, seed=0
    )
    test_loader = GraphDataLoader(test_ds, batch_size=args.batch_size)

    model = GIN(1, args.hidden, train_ds.num_classes, num_layers=3,
                dropout=0.0)
    bg0, y0, m0 = next(iter(loader))
    x0 = bg0.in_degrees().astype(jnp.float32)[:, None]
    params = model.init(jax.random.PRNGKey(0), bg0, x0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, g, x, y, gmask):
        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            m = gmask.astype(ls.dtype)
            return (ls * m).sum() / m.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    @jax.jit
    def predict(params, g, x):
        return model.apply(params, g, x).argmax(-1)

    for epoch in range(args.epochs):
        t0 = time.time()
        tot, nb = 0.0, 0
        for bg, y, gmask in loader:
            x = bg.in_degrees().astype(jnp.float32)[:, None]
            params, opt, loss = step(params, opt, bg, x, y, gmask)
            tot += float(loss)
            nb += 1
        if epoch % 10 == 0 or epoch == args.epochs - 1:
            correct = total = 0
            for bg, y, gmask in test_loader:
                x = bg.in_degrees().astype(jnp.float32)[:, None]
                pred = np.asarray(predict(params, bg, x))
                m = np.asarray(gmask)
                correct += int((pred[m] == np.asarray(y)[m]).sum())
                total += int(m.sum())
            print(
                f"epoch {epoch:3d} loss {tot / nb:.4f} "
                f"test acc {correct / total:.3f} "
                f"({time.time() - t0:.2f}s/epoch)"
            )


if __name__ == "__main__":
    main()
