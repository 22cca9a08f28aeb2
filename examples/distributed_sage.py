"""Partition-parallel full-graph training over a device mesh
(reference ``examples/distributed/graphsage/node_classification.py``):
METIS-style shards + halo-exchange SpMM, gradients psum'd by XLA.

Runs on however many devices are visible (force an 8-device CPU mesh with
XLA_FLAGS=--xla_force_host_platform_device_count=8 JAX_PLATFORMS=cpu).
"""
import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import dgl_tpu as dgl
import dgl_tpu.distributed as dist
from dgl_tpu.data import SyntheticDataset
from dgl_tpu.distributed.dist_spmm import shard_arrays
from dgl_tpu.parallel import create_mesh


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=20)
    args = p.parse_args()

    n_dev = len(jax.devices())
    mesh = create_mesh((n_dev,), ("gp",))
    print(f"mesh: {n_dev} devices over axis 'gp'")

    ds = SyntheticDataset(
        num_nodes=4096, num_edges=40_000, num_classes=8, feat_dim=64
    )
    g = ds[0]
    parts = dist.metis_partition_assignment(g, n_dev)
    shards = dist.build_shards(g, parts, n_dev)
    tables = shard_arrays(mesh, shards)
    print(
        f"shards: n_max={shards.n_max} e_max={shards.e_max} "
        f"h_max={shards.h_max} edge_cut={dist.partition.edge_cut(g, parts)}"
    )

    x = shards.shard_features(np.asarray(g.ndata["feat"]))
    y = shards.shard_features(
        np.asarray(g.ndata["label"])[:, None].astype(np.int32)
    )[..., 0]
    m = shards.shard_features(
        np.asarray(g.ndata["train_mask"])[:, None].astype(np.float32)
    )[..., 0]

    F, H, C = 64, 64, 8
    rng = np.random.default_rng(0)
    params = {
        "w1": jnp.asarray(rng.normal(size=(F, H)) * 0.1, jnp.float32),
        "w2": jnp.asarray(rng.normal(size=(H, C)) * 0.1, jnp.float32),
    }
    params = jax.device_put(params, NamedSharding(mesh, P()))
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, x, y, m):
        def loss_fn(p):
            h = dist.dist_copy_u_sum(mesh, shards, x, tables=tables, mean=True)
            h = jax.nn.relu(h @ p["w1"])
            h = dist.dist_copy_u_sum(mesh, shards, h, tables=tables, mean=True)
            logits = h @ p["w2"]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * m).sum() / jnp.maximum(m.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        params, opt_state, loss = step(params, opt_state, x, y, m)
        loss.block_until_ready()
        print(f"epoch {epoch} loss {float(loss):.4f} ({time.perf_counter()-t0:.3f}s)")


if __name__ == "__main__":
    main()
