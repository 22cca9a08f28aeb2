"""Minibatch GraphSAGE with the fixed-shape neighbor sampler
(reference ``examples/graphbolt/node_classification.py``): every batch has
identical static shapes, so the train step compiles exactly once.

Run: python examples/graphsage_minibatch.py [--epochs 5]
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu import dataloading
from dgl_tpu.base import NID
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.models import GraphSAGE


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--fanouts", type=int, nargs="+", default=[10, 10])
    args = p.parse_args()

    ds = SyntheticDataset(
        num_nodes=20_000, num_edges=200_000, num_classes=16, feat_dim=64
    )
    g = ds[0]
    feats = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]

    sampler = dataloading.FixedShapeNeighborSampler(
        args.fanouts, batch_size=args.batch_size, seed=0
    )
    model = GraphSAGE(64, 128, ds.num_classes, num_layers=len(args.fanouts))

    _, _, blocks0 = sampler.sample_blocks(g, train_ids[: args.batch_size])
    x0 = feats[blocks0[0].srcdata[NID]]
    params = model.init(jax.random.PRNGKey(0), blocks0, x0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, blocks, x, y, ymask):
        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        loader = dataloading.DataLoader(
            g, train_ids, sampler, batch_size=args.batch_size,
            shuffle=True, seed=epoch,
        )
        t0 = time.perf_counter()
        tot, nb = 0.0, 0
        for input_nodes, output_nodes, blocks in loader:
            x = feats[blocks[0].srcdata[NID]]
            x = x * blocks[0].srcdata["_mask"][:, None]
            y = labels[blocks[-1].dstdata[NID]]
            ymask = blocks[-1].dstdata["_mask"].astype(jnp.float32)
            params, opt_state, loss = step(params, opt_state, blocks, x, y, ymask)
            tot += float(loss)
            nb += 1
        print(
            f"epoch {epoch} loss {tot / nb:.4f} "
            f"({time.perf_counter() - t0:.2f}s, {nb} batches)"
        )


if __name__ == "__main__":
    main()
