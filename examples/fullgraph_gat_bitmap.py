"""Full-graph GAT with bitmap-flash attention (``ops/bitmap_gat.py``).

At Reddit-class density, per-edge attention hits the gather issue wall
(~2.9 ns/row x E x many passes). With a bitmap plan attached,
``GATConv`` routes through the flash-style kernel instead: rank-1
logits (``el[s] + er[d]``) built on the VPU, the plane-packed bitmap as
the mask, online softmax over source tiles, aggregation on the MXU —
cost ~ N^2 x heads, independent of E and degree skew. Parity with the
per-edge chain is CI-locked (tests/test_bitmap_gat.py); end-to-end
accuracy is bf16-class (docs/bitmap_accuracy_r05.json: delta -0.002 on
the calibrated Cora recipe).

Runs a scaled-down version anywhere (CPU included):

    python examples/fullgraph_gat_bitmap.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import flax.linen as nn
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.data import CoraGraphDataset
from dgl_tpu.nn.conv import GATConv


class GAT(nn.Module):
    in_feats: int
    num_classes: int
    heads: int = 8
    hidden: int = 8

    @nn.compact
    def __call__(self, g, x):
        h = GATConv(self.in_feats, self.hidden, num_heads=self.heads,
                    allow_zero_in_degree=True)(g, x)
        h = nn.elu(h.reshape(h.shape[0], -1))
        h = GATConv(self.heads * self.hidden, self.num_classes,
                    num_heads=1, allow_zero_in_degree=True)(g, h)
        return h.reshape(h.shape[0], -1)


def main():
    ds = CoraGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(dgl.to_simple(ds[0])))
    # attach the bitmap plan: GATConv then selects the flash kernel
    g = g.with_spmm_plans(bitmap=True)
    assert g._relation(None).bitmap_plan is not None

    feat = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    tr = g.ndata["train_mask"].astype(jnp.float32)
    te = g.ndata["test_mask"].astype(jnp.float32)

    model = GAT(feat.shape[1], ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adamw(5e-3, weight_decay=5e-4)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, g, feat)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels)
            return (ls * tr).sum() / tr.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt, params)
        return optax.apply_updates(params, upd), opt, loss

    for epoch in range(30):
        params, opt, loss = step(params, opt)
        if epoch % 10 == 9:
            pred = jnp.argmax(model.apply(params, g, feat), -1) == labels
            acc = float((pred * te).sum() / te.sum())
            print(f"epoch {epoch + 1}: loss {float(loss):.4f} "
                  f"test acc {acc:.4f}")


if __name__ == "__main__":
    main()
