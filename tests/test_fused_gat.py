"""Fused shell-space GAT attention (ops/fused_gat.py): value and gradient
parity vs the SDDMM + edge_softmax + u_mul_e_sum chain (reference
``gatconv.py:337-346`` semantics)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import function as fn
from dgl_tpu.nn import GATConv
from dgl_tpu.ops import edge_softmax
from dgl_tpu.ops.fused_gat import fused_gat_attention
from dgl_tpu.ops.shell_spmm import build_shell_plan


def _graph(n=500, e=4000, seed=0, skew=True):
    rng = np.random.default_rng(seed)
    if skew:  # power-law out-degrees: exercises deep rev shells+residual
        w = 1.0 / np.arange(1, n + 1)
        src = rng.choice(n, e, p=w / w.sum())
    else:
        src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return dgl.graph((src, dst), num_nodes=n)


def _chain(g, el, er, h, slope=0.2):
    with g.local_scope() as gg:
        gg.srcdata.update({"ft": h, "el": el[:, :, None]})
        gg.dstdata.update({"er": er[:, :, None]})
        gg.apply_edges(fn.u_add_v("el", "er", "e"))
        e = jax.nn.leaky_relu(gg.edata["e"], slope)
        a = edge_softmax(gg, e)
        gg.edata["a"] = a
        gg.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "ft"))
        return gg.dstdata["ft"]


@pytest.mark.parametrize("skew", [True, False])
def test_forward_parity(skew):
    g = _graph(skew=skew)
    plan = build_shell_plan(g._relation(None), gather_dtype="f32")
    rng = np.random.default_rng(1)
    H, O = 4, 8
    el = jnp.asarray(rng.normal(size=(500, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(500, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(500, H, O)).astype(np.float32))
    out = fused_gat_attention(0.2, plan, el, er, h)
    ref = _chain(g, el, er, h)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_grad_parity():
    g = _graph(n=300, e=2500, seed=2)
    plan = build_shell_plan(g._relation(None), gather_dtype="f32")
    rng = np.random.default_rng(3)
    H, O = 3, 5
    el = jnp.asarray(rng.normal(size=(300, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(300, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(300, H, O)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(300, H, O)).astype(np.float32))

    def loss_f(el, er, h):
        return (fused_gat_attention(0.2, plan, el, er, h) * w).sum()

    def loss_r(el, er, h):
        return (_chain(g, el, er, h) * w).sum()

    gf = jax.grad(loss_f, argnums=(0, 1, 2))(el, er, h)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(el, er, h)
    for a, b, name in zip(gf, gr, ["del", "der", "dh"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_zero_in_degree_rows_and_empty():
    g = dgl.graph(([0, 1], [1, 2]), num_nodes=5)
    plan = build_shell_plan(g._relation(None), gather_dtype="f32")
    el = jnp.ones((5, 2))
    er = jnp.ones((5, 2))
    h = jnp.ones((5, 2, 3))
    out = fused_gat_attention(0.2, plan, el, er, h)
    assert np.allclose(np.asarray(out)[0], 0)
    assert np.allclose(np.asarray(out)[1], 1)
    assert np.allclose(np.asarray(out)[3:], 0)


def test_gatconv_dispatches_fused_and_matches():
    g = _graph(n=200, e=1500, seed=4)
    gw = g.with_spmm_plans(num_hubs=16, weighted=True,
                           gather_dtype="f32", dense_attn=False)
    assert gw._relation(None).shell_plan is not None
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(200, 12)).astype(np.float32))
    conv = GATConv(12, 6, num_heads=2, allow_zero_in_degree=True)
    params = conv.init(jax.random.PRNGKey(0), g, x)

    def loss(p, graph):
        return (conv.apply(p, graph, x) ** 2).sum()

    l1, g1 = jax.value_and_grad(loss)(params, g)
    l2, g2 = jax.value_and_grad(loss)(params, gw)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-3)


def test_bf16_gather_error_bound():
    g = _graph(n=400, e=3000, seed=6)
    plan32 = build_shell_plan(g._relation(None), gather_dtype="f32")
    plan16 = build_shell_plan(g._relation(None), gather_dtype="bf16")
    rng = np.random.default_rng(7)
    H, O = 2, 16
    el = jnp.asarray(rng.normal(size=(400, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(400, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(400, H, O)).astype(np.float32))
    a = np.asarray(fused_gat_attention(0.2, plan16, el, er, h))
    b = np.asarray(fused_gat_attention(0.2, plan32, el, er, h))
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 2e-2


def test_dropout_mask_grad_parity():
    """attn_drop semantics (dropout AFTER softmax, reference
    gatconv.py:344): fused path with an (E, H) eid-order mask matches
    the chain with the same mask, values and grads."""
    g = _graph(n=250, e=2000, seed=8)
    plan = build_shell_plan(g._relation(None), gather_dtype="f32")
    rng = np.random.default_rng(9)
    H, O = 3, 6
    E = g.num_edges()
    el = jnp.asarray(rng.normal(size=(250, H)).astype(np.float32))
    er = jnp.asarray(rng.normal(size=(250, H)).astype(np.float32))
    h = jnp.asarray(rng.normal(size=(250, H, O)).astype(np.float32))
    keep = 0.6
    mask = jnp.asarray(
        (rng.random((E, H)) < keep).astype(np.float32) / keep)
    w = jnp.asarray(rng.normal(size=(250, H, O)).astype(np.float32))

    def loss_f(el, er, h):
        return (fused_gat_attention(0.2, plan, el, er, h, mask) * w).sum()

    def loss_r(el, er, h):
        from dgl_tpu import function as fn
        from dgl_tpu.ops import edge_softmax

        with g.local_scope() as gg:
            gg.srcdata.update({"ft": h, "el": el[:, :, None]})
            gg.dstdata.update({"er": er[:, :, None]})
            gg.apply_edges(fn.u_add_v("el", "er", "e"))
            e = jax.nn.leaky_relu(gg.edata["e"], 0.2)
            a = edge_softmax(gg, e) * mask[:, :, None]
            gg.edata["a"] = a
            gg.update_all(fn.u_mul_e("ft", "a", "m"), fn.sum("m", "ft"))
            return (gg.dstdata["ft"] * w).sum()

    v_f = float(loss_f(el, er, h))
    v_r = float(loss_r(el, er, h))
    np.testing.assert_allclose(v_f, v_r, rtol=1e-5)
    gf = jax.grad(loss_f, argnums=(0, 1, 2))(el, er, h)
    gr = jax.grad(loss_r, argnums=(0, 1, 2))(el, er, h)
    for a, b, name in zip(gf, gr, ["del", "der", "dh"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-4, atol=5e-4, err_msg=name)


def test_gatconv_fused_dropout_runs_and_is_unbiased():
    g = _graph(n=200, e=1600, seed=10)
    gw = g.with_spmm_plans(num_hubs=16, weighted=True,
                           gather_dtype="f32", dense_attn=False)
    x = jnp.ones((200, 8))
    conv = GATConv(8, 4, num_heads=2, attn_drop=0.5,
                   allow_zero_in_degree=True)
    params = conv.init(jax.random.PRNGKey(0), gw, x)
    det = conv.apply(params, gw, x)
    outs = [
        conv.apply(params, gw, x, deterministic=False,
                   rngs={"dropout": jax.random.PRNGKey(i)})
        for i in range(24)
    ]
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    mean = np.mean([np.asarray(o) for o in outs], axis=0)
    # E[dropout-masked attention] == deterministic output
    rel_l2 = (np.linalg.norm(mean - np.asarray(det))
              / np.linalg.norm(np.asarray(det)))
    assert rel_l2 < 0.2, rel_l2
