"""Cooperative minibatching with a sharded embedding table
(reference GraphBolt cooperative minibatching,
``impl/cooperative_conv.py`` + DistEmbedding): each rank samples its own
seed shard, then pulls input features for ARBITRARY global node ids from
the row-sharded table via the differentiable sparse all-to-all — gradients
flow back to the owning shards and are applied with the row-sparse Adam.

Run on a virtual mesh:
XLA_FLAGS=--xla_force_host_platform_device_count=8 python
examples/cooperative_minibatch.py
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import dgl_tpu as dgl
from dgl_tpu.base import NID
from dgl_tpu.dataloading import FixedShapeNeighborSampler
from dgl_tpu.distributed.cooperative import sparse_all_to_all_pull
from dgl_tpu.models import GraphSAGE
from dgl_tpu.parallel import create_mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--steps", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=64)
    args = p.parse_args()

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev,), ("gp",))

    N, E, F, C = 4096, 40_000, 32, 8
    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, N, E), rng.integers(0, N, E)), num_nodes=N)
    labels_np = (np.arange(N) % C).astype(np.int32)

    # row-sharded trainable embedding table (the DistEmbedding)
    rows = N // n_dev
    ranges = np.arange(n_dev + 1) * rows
    centroids = rng.normal(size=(C, F)).astype(np.float32)
    init = centroids[labels_np] + rng.normal(size=(N, F)).astype(np.float32) * 0.5
    table = jax.device_put(
        jnp.asarray(init.reshape(n_dev, rows, F)), NamedSharding(mesh, P("gp"))
    )

    sampler = FixedShapeNeighborSampler([5, 5], batch_size=args.batch_size,
                                        seed=0)
    model = GraphSAGE(F, 64, C, num_layers=2)
    _, _, blocks0 = sampler.sample_blocks(g, np.arange(args.batch_size))
    cap_in = np.asarray(blocks0[0].srcdata[NID]).shape[0]
    params = {
        "model": model.init(
            jax.random.PRNGKey(0), blocks0, jnp.zeros((cap_in, F))
        ),
        "table": table,
    }
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, blocks, ids_sharded, y, ymask):
        def loss_fn(p):
            # cooperative pull: every rank requests its block's input rows
            x = sparse_all_to_all_pull(mesh, ranges, p["table"], ids_sharded)
            x = x.reshape(-1, F)[:cap_in]
            logits = model.apply(p["model"], blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    all_ids = rng.permutation(N)
    for i in range(args.steps):
        seeds = all_ids[
            (i * args.batch_size) % (N - args.batch_size):
        ][: args.batch_size]
        _, _, blocks = sampler.sample_blocks(g, seeds)
        ids = np.asarray(blocks[0].srcdata[NID])
        # pad request list to a multiple of the mesh and shard over gp
        reqs = np.zeros((n_dev, -(-cap_in // n_dev)), np.int32)
        reqs.reshape(-1)[: cap_in] = ids
        ids_sharded = jax.device_put(
            jnp.asarray(reqs), NamedSharding(mesh, P("gp"))
        )
        y = jnp.asarray(labels_np)[blocks[-1].dstdata[NID]]
        ymask = blocks[-1].dstdata["_mask"].astype(jnp.float32)
        params, opt_state, loss = step(
            params, opt_state, blocks, ids_sharded, y, ymask
        )
        if i % 5 == 0:
            print(f"step {i} loss {float(loss):.4f}")
    print(f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
