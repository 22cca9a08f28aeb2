"""On-device sampler + DeviceSAGE tests.

Parity anchor: with fanout >= max in-degree the sampler takes ALL
in-neighbors (reference sample_neighbors semantics for d <= fanout), so a
DeviceSAGE forward must equal full-graph SAGEConv stacking exactly.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl
from dgl_tpu.models import DeviceSAGE, GraphSAGE
from dgl_tpu.sampling import (
    DeviceMFG,
    DeviceNeighborSampler,
    device_seed_batches,
)


def _toy(n=40, e=160, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return dgl.graph((src, dst), num_nodes=n), src, dst


def test_take_all_matches_dense():
    g, src, dst = _toy()
    n = g.num_nodes()
    fanout = int(np.bincount(dst, minlength=n).max()) + 1
    s = DeviceNeighborSampler([fanout])
    seeds = jnp.arange(n, dtype=jnp.int32)
    mfg = s.sample_from(jax.random.PRNGKey(0), g, seeds)
    # every real in-edge appears exactly once, padding masked
    for v in range(n):
        want = sorted(src[dst == v].tolist())
        m = np.asarray(mfg.masks[0][v])
        got = sorted(np.asarray(mfg.nbrs[0][v])[m].tolist())
        assert got == want


def test_masks_and_shapes_static():
    g, _, _ = _toy()
    s = DeviceNeighborSampler([3, 5])
    seeds = jnp.arange(8, dtype=jnp.int32)
    fn = jax.jit(lambda k: s.sample_from(k, g, seeds))
    mfg = fn(jax.random.PRNGKey(0))
    assert mfg.frontiers[0].shape == (8,)
    assert mfg.nbrs[0].shape == (8, 5)  # outermost uses fanouts[-1]
    assert mfg.frontiers[1].shape == (8 + 40,)
    assert mfg.nbrs[1].shape == (48, 3)
    assert mfg.frontiers[2].shape == (48 + 144,)
    # sampled ids are real in-neighbors wherever unmasked
    indptr = np.asarray(g._relation(None).csc_indptr)
    indices = np.asarray(g._relation(None).csc_indices)
    front = np.asarray(mfg.frontiers[0])
    for r, v in enumerate(front):
        nb = set(indices[indptr[v]:indptr[v + 1]].tolist())
        row = np.asarray(mfg.nbrs[0][r])
        msk = np.asarray(mfg.masks[0][r])
        assert all(int(x) in nb for x in row[msk])


def test_unique_mode_masks_duplicates():
    # one node with 2 in-edges, fanout 6 with replacement would duplicate
    g = dgl.graph(([1, 2, 3], [0, 0, 0]), num_nodes=4)
    s = DeviceNeighborSampler([2], mode="unique")
    mfg = s.sample_from(jax.random.PRNGKey(1), g,
                        jnp.zeros((1,), jnp.int32))
    m = np.asarray(mfg.masks[0][0])
    picks = np.asarray(mfg.nbrs[0][0])[m]
    assert len(set(picks.tolist())) == len(picks)


def test_seed_mask_propagates():
    g, _, _ = _toy()
    s = DeviceNeighborSampler([4])
    seeds = jnp.arange(8, dtype=jnp.int32)
    smask = jnp.asarray([True] * 5 + [False] * 3)
    mfg = s.sample_from(jax.random.PRNGKey(0), g, seeds, seed_mask=smask)
    assert not np.asarray(mfg.masks[0][5:]).any()
    assert np.asarray(mfg.num_real_edges()) == np.asarray(
        mfg.masks[0][:5]).sum()


def test_device_sage_matches_sageconv_full_graph():
    from dgl_tpu.nn import SAGEConv

    g, src, dst = _toy(n=30, e=90, seed=3)
    g = dgl.add_self_loop(g)  # no zero-degree rows: mean well-defined
    n = g.num_nodes()
    fanout = int(np.asarray(g.in_degrees()).max()) + 1
    F, H, C = 6, 8, 3
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)

    s = DeviceNeighborSampler([fanout, fanout])
    seeds = jnp.arange(n, dtype=jnp.int32)
    mfg = s.sample_from(jax.random.PRNGKey(0), g, seeds)
    model = DeviceSAGE(F, H, C, num_layers=2)
    params = model.init(jax.random.PRNGKey(7), mfg,
                        feats[mfg.input_nodes()])
    out = model.apply(params, mfg, feats[mfg.input_nodes()])

    # reference stacking with the SAME weights
    p = params["params"]

    def layer(i, gg, h):
        conv_p = {
            "fc_neigh": {"kernel": p[f"sage{i}_fc_neigh"]["kernel"]},
            "fc_self": {"kernel": p[f"sage{i}_fc_self"]["kernel"]},
            "bias": p[f"sage{i}_bias"],
        }
        conv = SAGEConv(h.shape[-1], conv_p["fc_neigh"]["kernel"].shape[1])
        return conv.apply({"params": conv_p}, gg, h)

    h = layer(0, g, feats)
    h = jax.nn.relu(h)
    h = layer(1, g, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(h),
                               rtol=2e-4, atol=2e-5)


def test_device_seed_batches_cover_all():
    ids, mask = device_seed_batches(jax.random.PRNGKey(0), 103, 16)
    assert ids.shape == (7, 16)
    got = sorted(np.asarray(ids)[np.asarray(mask)].tolist())
    assert got == list(range(103))


def test_device_seed_batches_train_mask():
    tm = jnp.asarray([True, False] * 50)
    ids, mask = device_seed_batches(jax.random.PRNGKey(1), 100, 10, tm)
    picked = np.asarray(ids)[np.asarray(mask)]
    assert sorted(picked.tolist()) == list(range(0, 100, 2))


def test_epoch_scan_trains():
    """A full sampled-training epoch as one lax.scan step function."""
    import optax

    g, _, _ = _toy(n=64, e=300, seed=5)
    g = dgl.add_self_loop(g)
    n = g.num_nodes()
    F, H, C, B = 5, 8, 3, 16
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, C, n), jnp.int32)
    s = DeviceNeighborSampler([3, 3])
    model = DeviceSAGE(F, H, C, num_layers=2)
    rel = g._relation(None)
    indptr = rel.csc_indptr.astype(jnp.int32)
    indices = rel.csc_indices.astype(jnp.int32)

    mfg0 = s.sample(jax.random.PRNGKey(0), indptr, indices,
                    jnp.arange(B, dtype=jnp.int32))
    params = model.init(jax.random.PRNGKey(1), mfg0,
                        feats[mfg0.input_nodes()])
    tx = optax.adam(1e-2)

    @jax.jit
    def epoch(params, opt, key):
        kperm, ksamp = jax.random.split(key)
        ids, mask = device_seed_batches(kperm, n, B)

        def step(carry, inp):
            params, opt = carry
            seeds, smask, i = inp
            mfg = s.sample(jax.random.fold_in(ksamp, i), indptr, indices,
                           seeds, seed_mask=smask)

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
            step, (params, opt),
            (ids, mask, jnp.arange(ids.shape[0])))
        return params, opt, losses

    opt0 = tx.init(params)
    p1, o1, l1 = epoch(params, opt0, jax.random.PRNGKey(2))
    p2, o2, l2 = epoch(p1, o1, jax.random.PRNGKey(3))
    assert np.isfinite(np.asarray(l1)).all()
    assert float(l2.mean()) < float(l1.mean()) + 0.5  # training proceeds
