"""GraphSAGE minibatch training with the ON-DEVICE sampler.

The TPU-first input pipeline (sampling/device_sampler.py): the graph's CSC
and the feature table live in HBM, neighbor picks are row gathers, and the
ENTIRE epoch — seed shuffle, frontier sampling, feature fetch, fwd/bwd,
adam — compiles into one ``lax.scan``. Nothing crosses the host boundary
during training. Compare examples/graphsage_minibatch.py (the host
pipeline, for graphs larger than HBM) and the reference's GraphBolt
pipeline (``python/dgl/graphbolt/dataloader.py``), whose async CPU stages
this design replaces. Measured on a v5e: 0.83 ms/step at B=512
fanouts=[10,10] — faster end-to-end than the pre-sampled compute-only
path (bench.py sage_minibatch_end_to_end).

Run: python examples/sage_device_sampler.py [--epochs 5]
"""
import argparse
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
import optax

import dgl_tpu as dgl
from dgl_tpu.models import DeviceSAGE
from dgl_tpu.sampling import DeviceNeighborSampler, device_seed_batches


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--cpu", action="store_true")
    args = p.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from dgl_tpu.data import PubmedGraphDataset

    ds = PubmedGraphDataset()
    g = dgl.add_self_loop(dgl.remove_self_loop(ds[0]))
    n = g.num_nodes()
    feats = g.ndata["feat"]
    labels = g.ndata["label"].astype(jnp.int32)
    train_mask = g.ndata["train_mask"]
    test_mask = np.asarray(g.ndata["test_mask"])
    rel = g._relation(None)
    indptr = rel.csc_indptr.astype(jnp.int32)
    indices = rel.csc_indices.astype(jnp.int32)

    B = args.batch_size
    sampler = DeviceNeighborSampler([10, 10])
    model = DeviceSAGE(feats.shape[1], 64, ds.num_classes, num_layers=2)
    mfg0 = sampler.sample(jax.random.PRNGKey(0), indptr, indices,
                          jnp.arange(B, dtype=jnp.int32))
    params = model.init(jax.random.PRNGKey(1), mfg0,
                        feats[mfg0.input_nodes()])
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def epoch(params, opt, key):
        ids, mask = device_seed_batches(key, n, B, train_mask)

        def step(carry, inp):
            params, opt = carry
            seeds, smask, i = inp
            mfg = sampler.sample(jax.random.fold_in(key, i), indptr,
                                 indices, seeds, seed_mask=smask)

            def loss_fn(p):
                logits = model.apply(p, mfg, feats[mfg.input_nodes()])
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, labels[seeds])
                w = smask.astype(jnp.float32)
                return (ls * w).sum() / jnp.maximum(w.sum(), 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            return (optax.apply_updates(params, upd), opt), loss

        (params, opt), losses = jax.lax.scan(
            step, (params, opt), (ids, mask, jnp.arange(ids.shape[0])))
        return params, opt, losses.mean()

    for e in range(args.epochs):
        params, opt, loss = epoch(params, opt, jax.random.PRNGKey(e))
        print(f"epoch {e}: mean loss {float(loss):.4f}", flush=True)

    # full-neighborhood inference via take-all sampling (fanout >= max deg
    # would be exact; 25 is close at PubMed's mean in-degree ~5)
    infer = DeviceNeighborSampler([25, 25])
    accs = []
    for lo in range(0, n, 2048):
        seeds = jnp.arange(lo, min(lo + 2048, n), dtype=jnp.int32)
        pad = 2048 - seeds.shape[0]
        smask = jnp.concatenate([jnp.ones(seeds.shape[0], bool),
                                 jnp.zeros(pad, bool)])
        seeds = jnp.concatenate([seeds, jnp.zeros(pad, jnp.int32)])
        mfg = infer.sample(jax.random.PRNGKey(99), indptr, indices, seeds,
                           seed_mask=smask)
        logits = model.apply(params, mfg, feats[mfg.input_nodes()])
        pred = np.asarray(jnp.argmax(logits, -1))
        sel = test_mask[np.asarray(seeds)[np.asarray(smask)]]
        accs.append((pred[np.asarray(smask)][sel]
                     == np.asarray(labels)[np.asarray(seeds)[np.asarray(smask)]][sel]))
    acc = float(np.concatenate(accs).mean())
    print(f"test accuracy: {acc:.4f}")


if __name__ == "__main__":
    main()
