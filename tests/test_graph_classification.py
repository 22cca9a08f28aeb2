"""Graph classification e2e: GIN + readout over batched graphs (the
reference's graphpred pipeline family)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.data import GraphClassificationDataset
from dgl_tpu.nn.conv import GINConv
from dgl_tpu import readout


class GIN(nn.Module):
    in_feats: int
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, g, x):
        mlp1 = nn.Sequential([nn.Dense(self.hidden), jax.nn.relu,
                              nn.Dense(self.hidden)])
        h = GINConv(apply_func=mlp1, aggregator_type="sum", name="gin0")(g, x)
        h = jax.nn.relu(h)
        mlp2 = nn.Sequential([nn.Dense(self.hidden), jax.nn.relu,
                              nn.Dense(self.hidden)])
        h = GINConv(apply_func=mlp2, aggregator_type="sum", name="gin1")(g, h)
        with g.local_scope() as gg:
            gg.ndata["h"] = h
            hg = readout.mean_nodes(gg, "h")
        return nn.Dense(self.classes, name="head")(hg)


def test_gin_graph_classification():
    ds = GraphClassificationDataset(num_graphs=64)
    graphs = [ds[i][0] for i in range(len(ds))]
    labels = np.array([int(ds[i][1]) for i in range(len(ds))])
    bg = dgl.batch(graphs)
    x = bg.ndata["feat"]
    y = jnp.asarray(labels)

    model = GIN(8, 32, ds.num_classes)
    params = model.init(jax.random.PRNGKey(0), bg, x)
    tx = optax.adam(5e-3)
    st = tx.init(params)

    @jax.jit
    def step(p, st):
        loss, grads = jax.value_and_grad(
            lambda p: optax.softmax_cross_entropy_with_integer_labels(
                model.apply(p, bg, x), y
            ).mean()
        )(p)
        u, st = tx.update(grads, st)
        return optax.apply_updates(p, u), st, loss

    for _ in range(60):
        params, st, loss = step(params, st)
    pred = np.asarray(jnp.argmax(model.apply(params, bg, x), -1))
    acc = (pred == labels).mean()
    assert acc > 0.85, f"GIN graph classification acc {acc}"
