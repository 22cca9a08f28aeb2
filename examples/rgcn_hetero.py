"""R-GCN entity classification on an ogbn-mag-shaped heterograph
(reference ``examples/pytorch/rgcn-hetero``)."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.data import SyntheticHeteroDataset
from dgl_tpu.nn import HeteroGraphConv
from dgl_tpu.nn.conv import GraphConv


class HeteroRGCN(nn.Module):
    in_feats: int
    hidden: int
    classes: int
    etypes: tuple

    @nn.compact
    def __call__(self, g, inputs):
        h = HeteroGraphConv(
            {et: GraphConv(self.in_feats, self.hidden,
                           allow_zero_in_degree=True, name=f"l0_{et}")
             for et in self.etypes},
            aggregate="sum", name="layer0",
        )(g, inputs)
        h = {k: jax.nn.relu(v) for k, v in h.items()}
        return HeteroGraphConv(
            {et: GraphConv(self.hidden, self.classes,
                           allow_zero_in_degree=True, name=f"l1_{et}")
             for et in self.etypes},
            aggregate="sum", name="layer1",
        )(g, h)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=80)
    args = p.parse_args()

    ds = SyntheticHeteroDataset()
    g = ds[0]
    feats = {nt: g._node_frames[nt]["feat"] for nt in g.ntypes}
    labels = g._node_frames["paper"]["label"].astype(jnp.int32)
    train_mask = g._node_frames["paper"]["train_mask"].astype(jnp.float32)
    test_mask = np.asarray(g._node_frames["paper"]["test_mask"])

    model = HeteroRGCN(64, 32, ds.num_classes, tuple(g.etypes))
    params = model.init(jax.random.PRNGKey(0), g, feats)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, g, feats)["paper"]
            ls = optax.softmax_cross_entropy_with_integer_labels(out, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 20 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")
    out = model.apply(params, g, feats)["paper"]
    pred = np.asarray(jnp.argmax(out, -1))
    acc = (pred[test_mask] == np.asarray(labels)[test_mask]).mean()
    print(f"test accuracy {acc:.4f}")


if __name__ == "__main__":
    main()
