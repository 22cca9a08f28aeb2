"""Distributed link prediction: the DistDGL edge-dataloader workflow, SPMD.

Reference counterpart: ``examples/distributed/graphsage`` link-prediction
mode driving ``dist_dataloader.py:843`` ``DistEdgeDataLoader`` (per-rank
edge splits, negative sampling, remote-sampled MFGs). Here every rank
samples blocks for its OWN edge split's endpoints + uniform negatives
(``distributed.DistEdgeDataLoader``), features are pulled from the
row-sharded table with one ``sparse_all_to_all_pull``, and a dot-product
decoder scores (src, dst) pairs gathered from the per-rank embeddings.

Run with an 8-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/distributed_link_prediction.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

import dgl_tpu.distributed as dist
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.distributed.dist_minibatch import (
    DistEdgeDataLoader,
    PartitionedGraphCSC,
)
from dgl_tpu.models import GraphSAGE


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--fanouts", type=int, nargs="+", default=[5])
    p.add_argument("--num-negatives", type=int, default=2)
    args = p.parse_args()

    n_parts = len(jax.devices())
    ds = SyntheticDataset(
        num_nodes=2048, num_edges=20_000, num_classes=4, feat_dim=32
    )
    g = ds[0]
    parts = dist.metis_partition_assignment(g, n_parts)
    pg = PartitionedGraphCSC.build(g, np.asarray(parts), n_parts)
    print(f"{n_parts} partitions, owned nodes: {np.diff(pg.ranges)}")

    x_old = np.asarray(g.ndata["feat"], np.float32)
    src_old, dst_old = (np.asarray(a) for a in g.edges())
    # train on a slice of the edges, ids mapped into the partitioned space
    train = np.arange(0, g.num_edges(), 4)
    edges_new = np.stack(
        [pg.new_of_old[src_old[train]], pg.new_of_old[dst_old[train]]], 1
    )

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    ftable = pg.shard_rows(x_old)

    loader = DistEdgeDataLoader(
        pg, edges_new, fanouts=args.fanouts, batch_size=args.batch_size,
        num_negatives=args.num_negatives, seed=0,
    )
    model = GraphSAGE(x_old.shape[1], 32, 16, num_layers=len(args.fanouts))

    first = next(iter(loader))
    pos0, neg0, seeds0, pidx0, nidx0, in0, blocks0 = first
    blk0 = jax.tree_util.tree_map(lambda a: a[0], blocks0)
    x0 = x_old[pg.order][np.asarray(in0[0])]
    params = model.init(jax.random.PRNGKey(0), blk0, jnp.asarray(x0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, pos, neg, pidx, nidx, in_ids, blocks):
        x = dist.sparse_all_to_all_pull(
            mesh, pg.ranges, ftable, in_ids, axis="dp"
        )

        def loss_fn(p):
            def fwd(blks, xx):
                mask = blks[0].srcdata["_mask"][:, None]
                return model.apply(p, blks, xx * mask)

            h = jax.vmap(fwd)(blocks, x)          # (P, seeds, D)

            def score(hr, idx_a, idx_b):
                return (hr[idx_a] * hr[idx_b]).sum(-1)

            pos_s = jax.vmap(score)(h, pidx[..., 0], pidx[..., 1])
            neg_s = jax.vmap(
                lambda hr, pa, nb: (
                    hr[pa][:, None, :] * hr[nb]
                ).sum(-1)
            )(h, pidx[..., 0], nidx)
            pos_m = (pos[..., 0] >= 0).astype(jnp.float32)
            pos_loss = optax.sigmoid_binary_cross_entropy(
                pos_s, jnp.ones_like(pos_s)
            )
            neg_loss = optax.sigmoid_binary_cross_entropy(
                neg_s, jnp.zeros_like(neg_s)
            ).mean(-1)
            per = (pos_loss + neg_loss) * pos_m
            return per.sum() / jnp.maximum(pos_m.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for pos, neg, seeds, pidx, nidx, in_ids, blocks in loader:
            params, opt_state, loss = step(
                params, opt_state, pos, neg, pidx, nidx, in_ids, blocks
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.perf_counter() - t0:.2f}s, {len(losses)} steps)")


if __name__ == "__main__":
    main()
