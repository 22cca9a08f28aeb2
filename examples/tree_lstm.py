"""Child-Sum Tree-LSTM via topological propagation (reference
``examples/pytorch/tree_lstm``): the classic UDF + ``prop_nodes_topo``
showcase — message passing scheduled along host-computed frontiers, each
step a fixed-shape padded-mailbox UDF reduce."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import linen as nn

import dgl_tpu as dgl
import dgl_tpu.function as fn
from dgl_tpu import traversal


def random_trees(num_trees, max_nodes, rng):
    """Random rooted trees; edges child -> parent."""
    graphs = []
    for _ in range(num_trees):
        n = int(rng.integers(3, max_nodes))
        parents = [int(rng.integers(0, i)) for i in range(1, n)]
        src = np.arange(1, n)
        dst = np.array(parents)
        g = dgl.graph((src, dst), num_nodes=n)
        g.ndata["x"] = jnp.asarray(
            rng.normal(size=(n, 16)), dtype=jnp.float32
        )
        graphs.append(g)
    return graphs


class TreeLSTMCell(nn.Module):
    """Child-sum cell operating on padded mailboxes."""

    h_size: int

    @nn.compact
    def __call__(self, g, x):
        H = self.h_size
        W_iou = nn.Dense(3 * H, use_bias=False, name="W_iou")
        U_iou = nn.Dense(3 * H, use_bias=False, name="U_iou")
        b_iou = self.param("b_iou", nn.initializers.zeros, (3 * H,))
        U_f = nn.Dense(H, name="U_f")

        g.ndata["iou_x"] = W_iou(x)
        g.ndata["h"] = jnp.zeros((g.num_nodes(), H), jnp.float32)
        g.ndata["c"] = jnp.zeros((g.num_nodes(), H), jnp.float32)

        def reduce_fn(nodes):
            h_child = nodes.mailbox["h"]          # (N, D, H) zero-padded
            c_child = nodes.mailbox["c"]
            mask = nodes.mailbox_mask[..., None]  # (N, D, 1)
            h_sum = (h_child * mask).sum(axis=1)
            f = jax.nn.sigmoid(U_f(h_child))      # (N, D, H)
            c_f = (f * c_child * mask).sum(axis=1)
            return {"h_sum": h_sum, "c_f": c_f}

        def apply_fn(nodes):
            iou = nodes.data["iou_x"] + U_iou(
                nodes.data.get("h_sum", jnp.zeros_like(nodes.data["h"]))
            ) + b_iou
            i, o, u = jnp.split(iou, 3, axis=-1)
            i, o, u = jax.nn.sigmoid(i), jax.nn.sigmoid(o), jnp.tanh(u)
            c = i * u + nodes.data.get("c_f", jnp.zeros_like(nodes.data["c"]))
            h = o * jnp.tanh(c)
            return {"h": h, "c": c}

        # leaves first: topo frontiers over child->parent edges
        frontiers = traversal.topological_nodes_generator(g)
        # initialize leaves (no children)
        g.apply_nodes(apply_fn, v=np.asarray(frontiers[0]))
        def msg_fn(edges):
            return {"h": edges.src["h"], "c": edges.src["c"]}

        for frontier in frontiers[1:]:
            g.pull(np.asarray(frontier), msg_fn, reduce_fn)
            g.apply_nodes(apply_fn, v=np.asarray(frontier))
        return g.ndata["h"]


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    args = p.parse_args()

    rng = np.random.default_rng(0)
    trees = random_trees(16, 12, rng)
    # one batched forest -> one topological schedule, one compilation
    forest = dgl.batch(trees)
    sizes = np.asarray([t.num_nodes() for t in trees])
    roots = np.concatenate([[0], np.cumsum(sizes)[:-1]])  # node 0 per tree
    x_all = forest.ndata["x"]
    # task: predict the per-tree mean feature at the root (regression)
    y = jnp.asarray(
        [float(np.asarray(t.ndata["x"]).mean()) for t in trees]
    )

    class Model(nn.Module):
        @nn.compact
        def __call__(self, g, x):
            h = TreeLSTMCell(32, name="cell")(g, x)
            return nn.Dense(1, name="head")(h)

    model = Model()
    gf = forest.local_var()
    params = model.init(jax.random.PRNGKey(0), gf, x_all)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    roots_j = jnp.asarray(roots)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            gl = forest.local_var()
            out = model.apply(p, gl, x_all)
            pred = out[roots_j, 0]
            return ((pred - y) ** 2).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state)
        if epoch % 10 == 0:
            print(f"epoch {epoch} mse {float(loss):.4f}")
    print(f"final mse {float(loss):.4f}")


if __name__ == "__main__":
    main()
