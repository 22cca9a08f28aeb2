"""Partition-parallel heterogeneous R-GCN training (the papers100M-class
configuration on a heterograph): per-etype halo exchange inside shard_map,
per-relation weights, XLA-psum'd gradients.

XLA_FLAGS=--xla_force_host_platform_device_count=8 python
examples/distributed_hetero_rgcn.py
"""
import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import dgl_tpu.distributed as dist
from dgl_tpu.data import synthetic_hetero_graph
from dgl_tpu.distributed.hetero_shard import (
    build_hetero_shards,
    dist_hetero_copy_u_sum,
)
from dgl_tpu.parallel import create_mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=30)
    args = p.parse_args()

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev,), ("gp",))
    g = synthetic_hetero_graph()
    assign = dist.partition.hetero_partition_assignment(g, n_dev)
    shards = build_hetero_shards(g, assign, n_dev)
    print(
        "hetero shards:",
        {nt: shards.n_max[nt] for nt in shards.ntypes},
        "halo caps:", {nt: shards.h_max[nt] for nt in shards.ntypes},
    )

    F, H, C = 64, 32, 8
    rng = np.random.default_rng(0)
    feats = {nt: np.asarray(g._node_frames[nt]["feat"]) for nt in g.ntypes}
    x = shards.shard_features(feats)
    labels = shards.shard_features(
        {"paper": np.asarray(g._node_frames["paper"]["label"])[:, None]}
    )["paper"][..., 0].astype(jnp.int32)
    mask = shards.shard_features(
        {"paper": np.asarray(
            g._node_frames["paper"]["train_mask"]
        ).astype(np.float32)[:, None]}
    )["paper"][..., 0]

    repl = NamedSharding(mesh, P())
    params = jax.device_put(
        {
            "w1": {nt: jnp.asarray(rng.normal(size=(F, H)) * 0.1, jnp.float32)
                   for nt in g.ntypes},
            "w2": {nt: jnp.asarray(rng.normal(size=(H, C)) * 0.1, jnp.float32)
                   for nt in g.ntypes},
        },
        repl,
    )
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, labels, mask):
        def loss_fn(p):
            h1 = dist_hetero_copy_u_sum(mesh, shards, x, mean=True)
            h1 = {nt: jax.nn.relu(v @ p["w1"][nt] + x[nt] @ p["w1"][nt])
                  for nt, v in h1.items()}
            h2 = dist_hetero_copy_u_sum(mesh, shards, h1, mean=True)
            logits = h2["paper"] @ p["w2"]["paper"]
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            )
            return (ls * mask).sum() / jnp.maximum(mask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        params, opt_state, loss = step(params, opt_state, x, labels, mask)
        if epoch % 10 == 0:
            print(f"epoch {epoch} loss {float(loss):.4f}")
    print(f"final loss {float(loss):.4f}")


if __name__ == "__main__":
    main()
