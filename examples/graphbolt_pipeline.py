"""GraphBolt-style pipeline training (reference
``examples/graphbolt/node_classification.py``): ItemSampler ->
NeighborSampler -> FeatureFetcher (cached feature store) -> CopyTo ->
jit-compiled SAGE step."""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu import graphbolt as gb
from dgl_tpu.base import NID
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.models import GraphSAGE
from dgl_tpu.profiler import StageTimer, timed_stage


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--fanouts", type=int, nargs="+", default=[10, 10])
    p.add_argument("--cache", type=int, default=4096)
    args = p.parse_args()

    ds = SyntheticDataset(
        num_nodes=20_000, num_edges=200_000, num_classes=16, feat_dim=64
    )
    g = ds[0]
    feats_np = np.asarray(g.ndata["feat"])
    labels = np.asarray(g.ndata["label"])
    train_ids = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]

    base = gb.NumpyFeature(feats_np)
    cached = gb.CachedFeature(base, capacity=args.cache, policy="s3-fifo")
    store = gb.FeatureStore()
    store[("node", "_N", "feat")] = cached

    itemset = gb.ItemSet(
        (train_ids, labels[train_ids]), names=("seeds", "labels")
    )
    model = GraphSAGE(64, 128, ds.num_classes, num_layers=len(args.fanouts))
    params = None
    tx = optax.adam(1e-3)
    opt_state = None
    timer = StageTimer()

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
        dp = gb.ItemSampler(itemset, args.batch_size, shuffle=True, seed=epoch)
        dp = gb.NeighborSamplerStage(
            dp, g, args.fanouts, batch_size=args.batch_size, seed=epoch
        )
        dp = gb.FeatureFetcher(dp, store, ["feat"])
        dp = gb.CopyTo(dp)
        loader = gb.DataLoader(dp)
        tot, nb = 0.0, 0
        t0 = time.perf_counter()
        for mb in timed_stage(timer, "pipeline", loader):
            with timer.stage("train"):
                blocks = mb.blocks
                x = mb.node_features["feat"]
                x = x * blocks[0].srcdata["_mask"][:, None]
                y = jnp.asarray(labels)[blocks[-1].dstdata[NID]]
                ymask = blocks[-1].dstdata["_mask"].astype(jnp.float32)
                if params is None:
                    params = model.init(jax.random.PRNGKey(0), blocks, x)
                    opt_state = tx.init(params)
                params, opt_state, loss = step(
                    params, opt_state, blocks, x, y, ymask
                )
                tot += float(loss)
                nb += 1
        print(
            f"epoch {epoch} loss {tot/nb:.4f} "
            f"({time.perf_counter()-t0:.2f}s) "
            f"cache hit rate {cached.hit_rate:.2f}"
        )
    print("stage timings:", timer.summary())


if __name__ == "__main__":
    main()
