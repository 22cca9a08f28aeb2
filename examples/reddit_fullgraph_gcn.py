"""Full-graph GCN on a Reddit-scale graph via the bitmap dense SpMM.

Demonstrates the high-degree fast path (``ops/bitmap_spmm.py``): at
Reddit density (avg degree ~490) the adjacency streams as a packed
bitmap through the MXU — cost scales with N^2, not E, and is
degree-skew independent. Measured on a TPU v5e at full Reddit scale
(N=233k, E=114.6M): 0.152 s/epoch, 0.94x the reference's published
single-GPU time (``benchmarks/bench_reddit.py``).

This example runs a scaled-down version anywhere (CPU included):

    python examples/reddit_fullgraph_gcn.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.data import RedditDataset
from dgl_tpu.nn import GraphConv
import flax.linen as nn


def main():
    ds = RedditDataset()  # synthetic stand-in unless raw_dir has real files
    g0 = dgl.to_simple(ds[0])  # the bitmap holds one bit per (src, dst)
    g0 = dgl.add_self_loop(dgl.remove_self_loop(g0))
    # attach the bitmap plan: copy_u+sum then runs as the dense MXU
    # kernel (auto-gated by density; force with bitmap=True)
    g = g0.with_spmm_plans(num_hubs=256, bitmap=True,
                           bitmap_max_bytes=8 << 30)
    assert g._relation(None).bitmap_plan is not None, "density too low?"
    feat = g0.ndata["feat"]
    labels = g0.ndata["label"].astype(jnp.int32)
    train_mask = g0.ndata["train_mask"].astype(jnp.float32)

    class GCN(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            x = GraphConv(feat.shape[1], 16, activation=jax.nn.relu,
                          allow_zero_in_degree=True)(g, x)
            return GraphConv(16, ds.num_classes,
                             allow_zero_in_degree=True)(g, x)

    model = GCN()
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, g):
        def loss_fn(p):
            logits = model.apply(p, g, feat)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for epoch in range(30):
        params, opt, loss = step(params, opt, g)
        if epoch % 10 == 0:
            print(f"epoch {epoch}: loss {float(loss):.4f}")
    logits = model.apply(params, g, feat)
    test = np.asarray(g0.ndata["test_mask"])
    acc = (np.asarray(logits.argmax(-1)) == np.asarray(labels))[test].mean()
    print(f"test acc {acc:.3f}")


if __name__ == "__main__":
    main()
