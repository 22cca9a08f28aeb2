"""Link prediction with negative sampling (reference
``examples/core/link_pred``): SAGE encoder + dot-product scorer."""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.models import GraphSAGE
from dgl_tpu.sampling import global_uniform_negative_sampling


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=50)
    args = p.parse_args()

    ds = SyntheticDataset(num_nodes=2000, num_edges=16000, num_classes=4,
                          feat_dim=32)
    g = ds[0]
    feat = g.ndata["feat"]
    rel = g._relation(None)
    pos_src = np.asarray(rel.src)[: rel.num_edges]
    pos_dst = np.asarray(rel.dst)[: rel.num_edges]

    model = GraphSAGE(32, 64, 64, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), g, feat)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, ps, pd, ns, nd):
        def loss_fn(p):
            h = model.apply(p, g, feat)
            pos = (h[ps] * h[pd]).sum(-1)
            neg = (h[ns] * h[nd]).sum(-1)
            return (
                -jax.nn.log_sigmoid(pos).mean()
                - jax.nn.log_sigmoid(-neg).mean()
            )

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        neg_src, neg_dst = global_uniform_negative_sampling(
            g, pos_src.shape[0], seed=epoch
        )
        k = min(neg_src.shape[0], pos_src.shape[0])
        params, opt_state, loss = step(
            params, opt_state,
            jnp.asarray(pos_src[:k]), jnp.asarray(pos_dst[:k]),
            jnp.asarray(neg_src[:k]), jnp.asarray(neg_dst[:k]),
        )
        if epoch % 10 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")
    # AUC on a held-out style sample
    h = model.apply(params, g, feat)
    pos = np.asarray((h[jnp.asarray(pos_src)] * h[jnp.asarray(pos_dst)]).sum(-1))
    ns, nd = global_uniform_negative_sampling(g, pos_src.shape[0], seed=777)
    neg = np.asarray((h[jnp.asarray(ns)] * h[jnp.asarray(nd)]).sum(-1))
    labels = np.concatenate([np.ones_like(pos), np.zeros_like(neg)])
    scores = np.concatenate([pos, neg])
    order = np.argsort(scores)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(scores) + 1)
    n_pos, n_neg = len(pos), len(neg)
    auc = (ranks[:n_pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    print(f"AUC {auc:.4f}")


if __name__ == "__main__":
    main()
