"""Full-graph GAT on Citeseer (reference ``examples/core/gat/train.py`` —
the SDDMM + edge-softmax attention path)."""
import argparse
import time

import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.data import CiteseerGraphDataset
from dgl_tpu.models import GAT


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=200)
    args = p.parse_args()

    ds = CiteseerGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    if jax.devices()[0].platform != "cpu":
        # segment-free edge-softmax + weighted SpMM (ops/shell_spmm.py)
        g = g.with_spmm_plans(weighted=True)
    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"].astype(jnp.float32)
    test_mask = g.ndata["test_mask"]

    model = GAT(feat.shape[1], 8, ds.num_classes, heads=8)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    rng = jax.random.PRNGKey(1)

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

    t0 = time.perf_counter()
    for epoch in range(args.epochs):
        rng, sub = jax.random.split(rng)
        params, opt_state, loss = step(params, opt_state, sub)
        if epoch % 40 == 0:
            print(f"epoch {epoch:3d} loss {float(loss):.4f}")
    logits = model.apply(params, g, feat)
    pred = jnp.argmax(logits, -1)
    acc = ((pred == labels) * test_mask).sum() / test_mask.sum()
    print(
        f"train time {time.perf_counter()-t0:.3f}s  "
        f"test accuracy {float(acc):.4f}"
    )


if __name__ == "__main__":
    main()
