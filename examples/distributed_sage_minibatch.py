"""Distributed minibatch GraphSAGE: the DistDGL training workflow, SPMD.

Reference counterpart: ``examples/distributed/graphsage/node_classification.py``
driving ``dist_dataloader.py:792`` + ``graph_services.py:1037``
(remote-sampled MFGs + KVStore feature pulls). Here (SURVEY.md §5.8 "fully
SPMD sampling"): the graph is dst-partitioned part-major
(``PartitionedGraphCSC``), every rank samples fixed-shape MFGs for its OWN
seed split (``node_split`` semantics), input features stay row-sharded on
the mesh and are fetched per step with one ``sparse_all_to_all_pull``, and
gradients mean-reduce through the jit'd data parallelism (vmapped per-rank
blocks under one optimizer).

Run on however many devices are visible; force an 8-device CPU mesh with
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/distributed_sage_minibatch.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

import dgl_tpu as dgl
import dgl_tpu.distributed as dist
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.distributed.dist_minibatch import (
    DistNeighborSampler,
    DistNodeDataLoader,
    PartitionedGraphCSC,
)
from dgl_tpu.models import GraphSAGE


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=32)
    p.add_argument("--fanouts", type=int, nargs="+", default=[5, 5])
    args = p.parse_args()

    n_parts = len(jax.devices())
    ds = SyntheticDataset(
        num_nodes=4096, num_edges=40_000, num_classes=8, feat_dim=64
    )
    g = ds[0]
    parts = dist.metis_partition_assignment(g, n_parts)
    pg = PartitionedGraphCSC.build(g, np.asarray(parts), n_parts)
    print(f"{n_parts} partitions, owned nodes: {np.diff(pg.ranges)}")

    x_old = np.asarray(g.ndata["feat"], np.float32)
    y_old = np.asarray(g.ndata["label"], np.int32)
    train_old = np.nonzero(np.asarray(g.ndata["train_mask"]))[0]
    # node_split semantics: each rank trains on the seeds it owns
    train_new = np.sort(pg.new_of_old[train_old])

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    ftable = pg.shard_rows(x_old)                      # (P, n_max, F) sharded
    ltable = pg.shard_rows(y_old.astype(np.float32)[:, None])

    sampler = DistNeighborSampler(pg, args.fanouts,
                                  batch_size=args.batch_size, seed=0)
    loader = DistNodeDataLoader(pg, train_new, sampler,
                                batch_size=args.batch_size, shuffle=True)

    model = GraphSAGE(x_old.shape[1], 64, ds.num_classes,
                      num_layers=len(args.fanouts))
    in0, out0, blocks0 = next(iter(loader))
    blk0 = jax.tree_util.tree_map(lambda a: a[0], blocks0)
    x0 = x_old[pg.order][np.asarray(in0[0])]
    params = model.init(jax.random.PRNGKey(0), blk0, jnp.asarray(x0))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, in_ids, out_ids, blocks):
        x = dist.sparse_all_to_all_pull(mesh, pg.ranges, ftable, in_ids,
                                        axis="dp")
        y = dist.sparse_all_to_all_pull(
            mesh, pg.ranges, ltable, jnp.where(out_ids >= 0, out_ids, 0),
            axis="dp",
        )[..., 0].astype(jnp.int32)

        def loss_fn(p):
            def fwd(blks, xx):
                mask = blks[0].srcdata["_mask"][:, None]
                return model.apply(p, blks, xx * mask)

            logits = jax.vmap(fwd)(blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, : y.shape[1]], y
            )
            m = (out_ids >= 0).astype(jnp.float32)
            return (ls * m).sum() / jnp.maximum(m.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        losses = []
        for in_ids, out_ids, blocks in loader:
            params, opt_state, loss = step(params, opt_state, in_ids,
                                           out_ids, blocks)
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.perf_counter() - t0:.2f}s, {len(losses)} steps)")


if __name__ == "__main__":
    main()
