"""Distributed hetero (R-GCN) minibatch training: DistDGL's ogbn-mag
workflow, SPMD.

Reference counterpart: ``examples/distributed/rgcn`` driving
``graph_services.py`` ``sample_etype_neighbors`` over homogenized
partitions. Here: the hetero graph is homogenized
(``convert.to_homogeneous``), dst-partitioned part-major, and every rank
samples per-etype-fanout fixed-shape blocks for its own seed split
(``DistEtypeNeighborSampler``). The per-slot etype layout is STATIC, so
``RelGraphConv``'s typed projection compiles once; features ride the
row-sharded all-to-all pull.

Run with an 8-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu \
  python examples/distributed_rgcn_minibatch.py
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh

import dgl_tpu.distributed as dist
from dgl_tpu import convert
from dgl_tpu.base import ETYPE, NTYPE
from dgl_tpu.data import SyntheticHeteroDataset
from dgl_tpu.distributed.dist_minibatch import (
    DistEtypeNeighborSampler,
    PartitionedGraphCSC,
    stack_blocks,
)
from dgl_tpu.nn import RelGraphConv


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=3)
    p.add_argument("--batch-size", type=int, default=16)
    p.add_argument("--hidden", type=int, default=32)
    args = p.parse_args()

    n_parts = len(jax.devices())
    ds = SyntheticHeteroDataset()
    hg = ds[0]
    category = ds.predict_ntype
    num_classes = ds.num_classes
    homo = convert.to_homogeneous(hg, ndata=["feat"])
    type_per_edge = np.asarray(homo.edata[ETYPE])
    ntype_ids = np.asarray(homo.ndata[NTYPE])
    num_rels = len(hg.canonical_etypes)
    cat_tid = hg.ntypes.index(category)

    parts = dist.metis_partition_assignment(homo, n_parts)
    pg = PartitionedGraphCSC.build(homo, parts, n_parts)
    print(f"{n_parts} partitions, {num_rels} relations, "
          f"category={category!r}")

    x_old = np.asarray(homo.ndata["feat"], np.float32)
    labels_old = np.zeros(homo.num_nodes(), np.float32)
    cat_old = np.nonzero(ntype_ids == cat_tid)[0]
    labels_old[cat_old] = np.asarray(
        hg.nodes[category].data["label"], np.float32
    )
    train_new = np.sort(pg.new_of_old[cat_old])

    mesh = Mesh(np.array(jax.devices()), ("dp",))
    ftable = pg.shard_rows(x_old)
    ltable = pg.shard_rows(labels_old[:, None])

    fanouts = [[4] * num_rels, [4] * num_rels]
    sampler = DistEtypeNeighborSampler(
        pg, type_per_edge, fanouts, batch_size=args.batch_size, seed=0
    )
    loader = dist.DistNodeDataLoader(
        pg, train_new, sampler, batch_size=args.batch_size, shuffle=True
    )
    slot_et = [
        jnp.asarray(sampler.slot_etypes(layer))
        for layer in range(len(fanouts))
    ]

    class RGCN:
        def __init__(self):
            self.l1 = RelGraphConv(
                x_old.shape[1], args.hidden, num_rels, self_loop=False
            )
            self.l2 = RelGraphConv(
                args.hidden, num_classes, num_rels, self_loop=False
            )

        def init(self, key, blocks, x):
            k1, k2 = jax.random.split(key)
            p1 = self.l1.init(k1, blocks[0], x, slot_et[0])
            h = self.l1.apply(p1, blocks[0], x, slot_et[0])
            p2 = self.l2.init(
                k2, blocks[1], jax.nn.relu(h), slot_et[1]
            )
            return {"l1": p1, "l2": p2}

        def apply(self, params, blocks, x):
            h = self.l1.apply(params["l1"], blocks[0], x, slot_et[0])
            h = jax.nn.relu(h) * blocks[1].srcdata["_mask"][:, None]
            return self.l2.apply(params["l2"], blocks[1], h, slot_et[1])

    model = RGCN()
    in0, out0, blocks0 = next(iter(loader))
    blk0 = jax.tree_util.tree_map(lambda a: a[0], blocks0)
    x0 = jnp.asarray(x_old[pg.order][np.asarray(in0[0])])
    params = model.init(jax.random.PRNGKey(0), blk0, x0)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, in_ids, out_ids, blocks):
        x = dist.sparse_all_to_all_pull(
            mesh, pg.ranges, ftable, in_ids, axis="dp"
        )
        y = dist.sparse_all_to_all_pull(
            mesh, pg.ranges, ltable,
            jnp.where(out_ids >= 0, out_ids, 0), axis="dp",
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
            params, opt_state, loss = step(
                params, opt_state, in_ids, out_ids, blocks
            )
            losses.append(float(loss))
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"({time.perf_counter() - t0:.2f}s, {len(losses)} steps)")


if __name__ == "__main__":
    main()
