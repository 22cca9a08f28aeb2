"""Uniform-stride block fast path (ops/spmm.py::_gspmm_uniform +
edge_softmax reshape branch) vs the classic segment path on the SAME
fixed-shape MFG blocks."""
import copy

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu
from dgl_tpu import ops
from dgl_tpu.dataloading import FixedShapeNeighborSampler


def _block(fanout=5, batch=16, seed=0):
    rng = np.random.default_rng(seed)
    n, e = 200, 1500
    g = dgl_tpu.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                      num_nodes=n)
    sampler = FixedShapeNeighborSampler([fanout], batch_size=batch, seed=1)
    seeds = rng.choice(n, batch - 3, replace=False)  # underfull: padding
    _, _, blocks = sampler.sample_blocks(g, seeds)
    return blocks[0]


def _declassify(rel):
    """Copy of the relation with the fast-path flag off (classic path)."""
    new = copy.copy(rel)
    new.uniform_stride = 0
    return new


@pytest.fixture(scope="module")
def block():
    return _block()


@pytest.mark.parametrize("opname", [
    "copy_u_sum", "copy_u_mean", "copy_u_max", "copy_u_min",
    "u_mul_e_sum", "u_add_e_max", "copy_e_sum",
])
def test_block_ops_match_classic(block, opname):
    rel = block._relation(None)
    assert rel.uniform_stride > 0
    rel0 = _declassify(rel)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(rel.num_src, 8)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(rel.num_dst * rel.uniform_stride,)),
                    jnp.float32)
    f = getattr(ops, opname)
    if opname.startswith("copy_u"):
        args = (x,)
    elif opname.startswith("copy_e"):
        args = (e,)
    else:
        args = (x, e)
    out = f(rel, *args)
    ref = f(rel0, *args)
    # the classic path aggregates padding-edge messages into the sink row
    # (masked downstream); compare real dst slots only
    out, ref = out[:-1], ref[:-1]
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # gradients agree on real slots
    if opname == "u_mul_e_sum":
        R = jnp.asarray(rng.normal(size=ref.shape), jnp.float32)
        g1 = jax.grad(lambda a, b: jnp.sum(f(rel0, a, b)[:-1] * R),
                      argnums=(0, 1))(x, e)
        g2 = jax.grad(lambda a, b: jnp.sum(f(rel, a, b)[:-1] * R),
                      argnums=(0, 1))(x, e)
        for a, b in zip(g1, g2):
            np.testing.assert_allclose(b, a, rtol=1e-4, atol=1e-4)


def test_block_edge_softmax_matches_classic(block):
    rel = block._relation(None)
    rel0 = _declassify(rel)
    rng = np.random.default_rng(3)
    E = rel.num_dst * rel.uniform_stride
    for shape in [(), (4,)]:
        lg = jnp.asarray(rng.normal(size=(E,) + shape) * 2, jnp.float32)
        out = ops.edge_softmax(rel, lg)
        ref = ops.edge_softmax(rel0, lg)
        # compare on REAL edges only (padding edges are masked downstream;
        # the classic path assigns them sink-softmax values, the fast path 0)
        real = np.asarray(rel.dst[:E]) == np.repeat(
            np.arange(rel.num_dst), rel.uniform_stride)
        real &= np.asarray(rel.dst[:E]) != (rel.num_dst - 1)
        np.testing.assert_allclose(out[real], ref[real], rtol=1e-5,
                                   atol=1e-6)
        R = jnp.asarray(rng.normal(size=lg.shape), jnp.float32)
        maskj = jnp.asarray(real).reshape((-1,) + (1,) * len(shape))
        g1 = jax.grad(lambda l: jnp.sum(
            jnp.where(maskj, ops.edge_softmax(rel0, l), 0) * R))(lg)
        g2 = jax.grad(lambda l: jnp.sum(
            jnp.where(maskj, ops.edge_softmax(rel, l), 0) * R))(lg)
        np.testing.assert_allclose(g2[real], g1[real], rtol=1e-4, atol=1e-5)


def test_sage_minibatch_training_unchanged():
    """End-to-end: 3 SAGE minibatch steps produce the same losses with the
    fast path as with the classic path."""
    import optax

    from dgl_tpu.models import GraphSAGE

    rng = np.random.default_rng(4)
    n, e, F, C, B = 300, 2500, 12, 4, 32
    g = dgl_tpu.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                      num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, F)), jnp.float32)
    y = jnp.asarray(rng.integers(0, C, n), jnp.int32)
    model = GraphSAGE(F, 16, C, num_layers=2)
    tx = optax.sgd(0.1)

    def run(declassify):
        # fresh sampler per run: its internal rng must not carry over
        sampler = FixedShapeNeighborSampler([5, 5], batch_size=B, seed=7)
        srng = np.random.default_rng(9)
        params = None
        opt = None
        losses = []
        for step in range(3):
            seeds = srng.choice(n, B, replace=False)
            in_ids, out_ids, blocks = sampler.sample_blocks(g, seeds)
            if declassify:
                for b in blocks:
                    cet = b.canonical_etypes[0]
                    b._relations[cet] = _declassify(b._relations[cet])
            xb = x[np.where(np.asarray(in_ids) >= 0, in_ids, 0)]
            mask = blocks[0].srcdata["_mask"][:, None]
            if params is None:
                params = model.init(jax.random.PRNGKey(0), blocks,
                                    xb * mask)
                opt = tx.init(params)

            def loss_fn(p):
                logits = model.apply(p, blocks, xb * mask)
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits[: len(seeds)], y[seeds])
                return ls.mean()

            l, grads = jax.value_and_grad(loss_fn)(params)
            upd, opt = tx.update(grads, opt)
            params = optax.apply_updates(params, upd)
            losses.append(float(l))
        return losses

    fast = run(False)
    slow = run(True)
    np.testing.assert_allclose(fast, slow, rtol=1e-5, atol=1e-6)
