"""Packed-bitmap dense SpMM (ops/bitmap_spmm.py): parity vs the segment
path, VJP, plan gating, and gspmm dispatch. Reference semantics:
``copy_u + sum`` (``src/array/cpu/spmm.h:47``)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import ops
from dgl_tpu.ops.bitmap_spmm import (
    BitmapPlan,
    bitmap_bytes,
    bitmap_copy_u_sum,
    build_bitmap_plan,
)


def _simple_graph(n_src=300, n_dst=200, e=4000, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n_src, e)
    dst = rng.integers(0, n_dst, e)
    flat = np.unique(dst.astype(np.int64) * n_src + src)  # dedup
    src = (flat % n_src).astype(np.int64)
    dst = (flat // n_src).astype(np.int64)
    return dgl.heterograph(
        {("u", "r", "v"): (src, dst)},
        num_nodes_dict={"u": n_src, "v": n_dst},
    )


def test_forward_matches_segment_path():
    g = _simple_graph()
    rel = g._relation(None)
    plan = build_bitmap_plan(rel, compute_dtype="float32")
    assert plan is not None
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.normal(size=(300, 24)).astype(np.float32))
    ref = ops.copy_u_sum(g, u)
    out = bitmap_copy_u_sum(plan, u)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_bf16_error_bound():
    g = _simple_graph(seed=2)
    rel = g._relation(None)
    plan = build_bitmap_plan(rel)  # default bf16
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
    ref = np.asarray(ops.copy_u_sum(g, u))
    out = np.asarray(bitmap_copy_u_sum(plan, u))
    rel_l2 = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel_l2 < 1e-2, rel_l2


def test_vjp_matches_segment_path():
    g = _simple_graph(seed=4)
    rel = g._relation(None)
    plan = build_bitmap_plan(rel, compute_dtype="float32")
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(200, 8)).astype(np.float32))

    g_ref = jax.grad(lambda x: (ops.copy_u_sum(g, x) * w).sum())(u)
    g_bm = jax.grad(lambda x: (bitmap_copy_u_sum(plan, x) * w).sum())(u)
    np.testing.assert_allclose(np.asarray(g_bm), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_symmetric_graph_reuses_forward_bits():
    rng = np.random.default_rng(6)
    src = rng.integers(0, 100, 500)
    dst = rng.integers(0, 100, 500)
    g = dgl.graph((np.concatenate([src, dst]),
                   np.concatenate([dst, src])), num_nodes=100)
    g = dgl.to_simple(g)
    plan = build_bitmap_plan(g._relation(None), compute_dtype="float32")
    assert plan is not None and plan.bits_rev is None
    u = jnp.asarray(rng.normal(size=(100, 4)).astype(np.float32))
    ref = ops.copy_u_sum(g, u)
    np.testing.assert_allclose(np.asarray(bitmap_copy_u_sum(plan, u)),
                               np.asarray(ref), rtol=1e-5, atol=1e-5)
    gr = jax.grad(lambda x: (bitmap_copy_u_sum(plan, x) ** 2).sum())(u)
    gref = jax.grad(lambda x: (ops.copy_u_sum(g, x) ** 2).sum())(u)
    np.testing.assert_allclose(np.asarray(gr), np.asarray(gref),
                               rtol=1e-4, atol=1e-4)


def test_refuses_multiedges_and_budget():
    gm = dgl.graph(([0, 0, 1], [1, 1, 2]), num_nodes=3)
    assert build_bitmap_plan(gm._relation(None)) is None
    g = _simple_graph()
    assert build_bitmap_plan(g._relation(None), max_bytes=10) is None
    assert bitmap_bytes(300, 200, False) > 0


def test_gspmm_dispatch_and_with_spmm_plans():
    g = _simple_graph(n_src=256, n_dst=256, e=40000, seed=7)
    # density 40000/65536 >> 5e-4 -> auto-attaches
    gp = g.with_spmm_plans(num_hubs=16, bitmap="auto")
    rel = gp._relation(None)
    assert rel.bitmap_plan is not None
    rng = np.random.default_rng(8)
    u = jnp.asarray(rng.normal(size=(256, 12)).astype(np.float32))
    ref = np.asarray(ops.copy_u_sum(g, u))
    out = np.asarray(ops.copy_u_sum(gp, u))
    rel_l2 = np.linalg.norm(out - ref) / np.linalg.norm(ref)
    assert rel_l2 < 1e-2
    # mean reducer divides by in-degree
    ref_m = np.asarray(ops.copy_u_mean(g, u))
    out_m = np.asarray(ops.copy_u_mean(gp, u))
    assert np.linalg.norm(out_m - ref_m) / np.linalg.norm(ref_m) < 1e-2
    # 3D features fall through to the other paths (still correct to the
    # int8-hub path's accuracy class)
    u3 = jnp.asarray(rng.normal(size=(256, 2, 6)).astype(np.float32))
    a = np.asarray(ops.copy_u_sum(gp, u3))
    b = np.asarray(ops.copy_u_sum(g, u3))
    assert np.linalg.norm(a - b) / np.linalg.norm(b) < 5e-2


def test_auto_gate_skips_sparse_graphs():
    g = _simple_graph(n_src=3000, n_dst=3000, e=3000, seed=9)
    gp = g.with_spmm_plans(num_hubs=16, bitmap="auto")
    assert gp._relation(None).bitmap_plan is None  # density ~3e-4


def test_graph_pytree_roundtrip_with_bitmap():
    g = _simple_graph(seed=10).with_spmm_plans(num_hubs=16, bitmap=True)
    leaves, treedef = jax.tree_util.tree_flatten(g)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert g2._relation(None).bitmap_plan is not None
    rng = np.random.default_rng(11)
    u = jnp.asarray(rng.normal(size=(300, 8)).astype(np.float32))

    @jax.jit
    def f(graph, x):
        return ops.copy_u_sum(graph, x)

    out = f(g, u)
    ref = ops.copy_u_sum(_simple_graph(seed=10), u)
    assert (np.linalg.norm(np.asarray(out) - np.asarray(ref))
            / np.linalg.norm(np.asarray(ref)) < 1e-2)


def test_pallas_kernel_interpret_matches_xla_fallback():
    """Lock the Pallas kernel itself in CI (interpret mode on CPU): the
    tile-repeat plane expand + MXU accumulation must match the XLA
    fallback bit for bit at f32."""
    import dgl_tpu.ops.bitmap_spmm as bs

    g = _simple_graph(n_src=700, n_dst=600, e=9000, seed=12)
    plan = build_bitmap_plan(g._relation(None), compute_dtype="float32")
    rng = np.random.default_rng(13)
    u = jnp.asarray(rng.normal(size=(700, 20)).astype(np.float32))
    up = jnp.pad(u, ((0, plan.bits.shape[1] * 8 - 700), (0, 0)))
    ref = bs._bitmap_matmul_xla(plan.bits, up, jnp.float32)
    bs._FORCE_PALLAS_INTERPRET = True
    try:
        out = bs._bitmap_matmul_pallas(plan.bits, up, jnp.float32)
    finally:
        bs._FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
