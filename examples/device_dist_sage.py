"""Distributed GraphSAGE minibatch training on the ON-DEVICE sampler.

The round-4 unified input pipeline (``distributed/device_dist_sampler.py``):
each device holds its partition's CSC in memory, a layer expansion is one
masked ``all_to_all`` request/response pair, and sampling + feature pull
+ fwd/bwd + grad psum fuse into ONE ``shard_map`` program scanned over
steps. Run on the CPU virtual mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/device_dist_sage.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

if jax.default_backend() not in ("tpu",):
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

import dgl_tpu as dgl
from dgl_tpu.distributed import (
    DeviceDistSampler,
    metis_partition_assignment,
    shard_csc_arrays,
)
from dgl_tpu.distributed.dist_minibatch import (
    PartitionedGraphCSC,
    pull_rows_in_shard_map,
)
from dgl_tpu.models import DeviceSAGE
from dgl_tpu.sampling import DeviceNeighborSampler


def main():
    rng = np.random.default_rng(0)
    N, E, F, C = 20_000, 200_000, 32, 7
    src = rng.integers(0, N, E)
    dst = rng.integers(0, N, E)
    g = dgl.graph((src, dst), num_nodes=N)

    devices = np.array(jax.devices())
    Pn = len(devices)
    mesh = Mesh(devices, ("dp",))
    parts = metis_partition_assignment(g, Pn)
    pg = PartitionedGraphCSC.build(g, parts, Pn)
    indptr_sh, indices_sh = shard_csc_arrays(pg)
    feats = pg.shard_rows(rng.normal(size=(N, F)).astype(np.float32))
    labels = pg.shard_rows(
        rng.integers(0, C, N).astype(np.float32)[:, None])

    B, S, fanouts = 128, 8, [5, 5]
    sampler = DeviceDistSampler(fanouts, pg.ranges)
    print(f"analytic comm: "
          f"{sampler.comm_bytes_per_sample(B, Pn)/1e3:.0f} KB/step/rank")

    model = DeviceSAGE(F, 64, C, num_layers=2)
    rel = g._relation(None)
    mfg0 = DeviceNeighborSampler(fanouts).sample(
        jax.random.PRNGKey(0), rel.csc_indptr.astype(jnp.int32),
        rel.csc_indices.astype(jnp.int32),
        jnp.arange(B, dtype=jnp.int32))
    params = model.init(
        jax.random.PRNGKey(1), mfg0,
        jnp.zeros((mfg0.input_nodes().shape[0], F)))
    tx = optax.adam(1e-2)
    opt0 = tx.init(params)

    seeds = rng.integers(0, N, (Pn, S, B)).astype(np.int32)
    keys = jax.random.split(jax.random.PRNGKey(2), Pn)

    def rank_epoch(params, opt, key, ip, ix, sds, ftab, ltab):
        ip, ix, sds, ftab, ltab = (ip[0], ix[0], sds[0], ftab[0],
                                   ltab[0])

        def step(carry, inp):
            params, opt = carry
            sd, i = inp
            mfg = sampler.sample_shard(
                jax.random.fold_in(key[0], i), ip, ix, sd, axis="dp")
            x = pull_rows_in_shard_map(pg.ranges, ftab,
                                       mfg.input_nodes(), "dp")
            y = pull_rows_in_shard_map(pg.ranges, ltab, sd,
                                       "dp")[:, 0].astype(jnp.int32)

            def loss_fn(p):
                logits = model.apply(p, mfg, x)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            l, grads = jax.value_and_grad(loss_fn)(params)
            grads = jax.lax.pmean(grads, "dp")
            upd, opt = tx.update(grads, opt)
            return (optax.apply_updates(params, upd), opt), l

        (params, opt), losses = jax.lax.scan(
            step, (params, opt), (sds, jnp.arange(S)))
        return (jax.tree_util.tree_map(lambda a: a[None], params),
                losses[None])

    run = jax.jit(shard_map(
        rank_epoch, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp"), P("dp"), P("dp"),
                  P("dp", None, None), P("dp", None, None)),
        out_specs=(P("dp"), P("dp")),
    ))
    new_params, losses = run(params, opt0, keys, indptr_sh, indices_sh,
                             jnp.asarray(seeds), feats, labels)
    print("per-step losses (rank 0):",
          np.round(np.asarray(losses)[0], 3))


if __name__ == "__main__":
    main()
