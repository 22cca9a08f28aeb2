"""Weighted shell-decomposition g-SpMM (ops/shell_spmm.py) vs the classic
sorted-segment path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu
from dgl_tpu import ops
from dgl_tpu.ops.shell_spmm import ShellSpMMPlan, build_shell_plan


def _graph(n=300, e=2500, seed=0):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n + 1)
    src = rng.choice(n, e, p=w / w.sum())
    dst = rng.integers(0, n, e)
    return dgl_tpu.graph((src, dst), num_nodes=n)


@pytest.fixture(scope="module")
def graphs():
    g0 = _graph()
    gw = g0.with_spmm_plans(num_hubs=64, weighted=True, gather_dtype="f32")
    return g0, gw


@pytest.mark.parametrize("opname", [
    "u_mul_e_sum", "u_add_e_sum", "u_sub_e_sum", "u_div_e_sum",
    "u_mul_e_mean", "copy_e_sum",
])
def test_weighted_ops_match(graphs, opname):
    g0, gw = graphs
    assert gw._relation(None).shell_plan is not None
    rng = np.random.default_rng(1)
    n, E = g0.num_nodes(), g0.num_edges()
    x = jnp.asarray(rng.normal(size=(n, 24)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(E,)) + 3.0, jnp.float32)
    R = jnp.asarray(rng.normal(size=(n, 24)), jnp.float32)
    f = getattr(ops, opname)
    if opname == "copy_e_sum":
        ref, out = f(g0, e), f(gw, e)
        loss = lambda gg: (lambda x_, e_: jnp.sum(
            jnp.sum(f(gg, e_)) * jnp.sum(x_ * 0) + jnp.sum(f(gg, e_))))
    else:
        ref, out = f(g0, x, e), f(gw, x, e)
        loss = lambda gg: (lambda x_, e_: jnp.sum(f(gg, x_, e_) * R))
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    gx0, ge0 = jax.grad(loss(g0), argnums=(0, 1))(x, e)
    gx1, ge1 = jax.grad(loss(gw), argnums=(0, 1))(x, e)
    np.testing.assert_allclose(gx1, gx0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ge1, ge0, rtol=1e-4, atol=1e-4)


def test_multihead_broadcast(graphs):
    # the GAT aggregation shape: u (N, H, D) * e (E, H, 1)
    g0, gw = graphs
    rng = np.random.default_rng(2)
    n, E, H, D = g0.num_nodes(), g0.num_edges(), 4, 6
    xh = jnp.asarray(rng.normal(size=(n, H, D)), jnp.float32)
    eh = jnp.asarray(rng.normal(size=(E, H, 1)), jnp.float32)
    Rh = jnp.asarray(rng.normal(size=(n, H, D)), jnp.float32)
    ref = ops.u_mul_e_sum(g0, xh, eh)
    np.testing.assert_allclose(ops.u_mul_e_sum(gw, xh, eh), ref,
                               rtol=1e-5, atol=1e-5)
    loss = lambda gg: (lambda x_, e_: jnp.sum(ops.u_mul_e_sum(gg, x_, e_)
                                              * Rh))
    gx0, ge0 = jax.grad(loss(g0), argnums=(0, 1))(xh, eh)
    gx1, ge1 = jax.grad(loss(gw), argnums=(0, 1))(xh, eh)
    np.testing.assert_allclose(gx1, gx0, rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ge1, ge0, rtol=1e-4, atol=1e-4)


def test_bf16_gather_mode():
    g0 = _graph()
    gw = g0.with_spmm_plans(num_hubs=64, weighted=True, gather_dtype="bf16")
    rng = np.random.default_rng(3)
    n, E = g0.num_nodes(), g0.num_edges()
    x = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
    ref = ops.u_mul_e_sum(g0, x, e)
    out = ops.u_mul_e_sum(gw, x, e)
    assert float(jnp.max(jnp.abs(out - ref)) /
                 (jnp.max(jnp.abs(ref)) + 1e-9)) < 2e-2


def test_padded_graph_weighted():
    src = np.array([0, 1, 1, 2, 5, 5])
    dst = np.array([1, 2, 0, 0, 5, 5])
    g = dgl_tpu.graph((src, dst), num_nodes=5, num_edges=4)
    gw = g.with_spmm_plans(num_hubs=2, weighted=True, gather_dtype="f32")
    x = jnp.arange(15, dtype=jnp.float32).reshape(5, 3)
    e = jnp.asarray([1.0, 2.0, 0.5, 3.0, 7.0, 7.0])[: g._relation(None).src.shape[0]]
    ref = ops.u_mul_e_sum(g, x, e)
    np.testing.assert_allclose(ops.u_mul_e_sum(gw, x, e), ref, rtol=1e-6)
    # padding edges must not contribute to dE
    loss = lambda gg: (lambda e_: jnp.sum(ops.u_mul_e_sum(gg, x, e_)))
    ge0 = jax.grad(loss(g))(e)
    ge1 = jax.grad(loss(gw))(e)
    np.testing.assert_allclose(ge1, ge0, rtol=1e-5, atol=1e-5)


def test_plan_pytree_roundtrip(graphs):
    _, gw = graphs
    leaves, treedef = jax.tree_util.tree_flatten(gw)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    p = g2._relation(None).shell_plan
    assert isinstance(p, ShellSpMMPlan)
    assert len(p.shells) > 0 and len(p.rev_shells) > 0


def test_empty_graph_shell_plan():
    g = dgl_tpu.graph((np.zeros(0, np.int64), np.zeros(0, np.int64)),
                      num_nodes=4)
    plan = build_shell_plan(g._relation(None), "f32")
    x = jnp.ones((4, 3), jnp.float32)
    e = jnp.ones((g._relation(None).src.shape[0],), jnp.float32)
    from dgl_tpu.ops.shell_spmm import shell_gspmm_sum

    out = shell_gspmm_sum("mul", plan, x, e)
    np.testing.assert_allclose(out, np.zeros((4, 3)))


@pytest.mark.parametrize("shape", [(), (4,), (4, 1)])
@pytest.mark.parametrize("norm_by", ["dst", "src"])
def test_shell_edge_softmax(graphs, shape, norm_by):
    g0, gw = graphs
    rng = np.random.default_rng(5)
    E = g0.num_edges()
    lg = jnp.asarray(rng.normal(size=(E,) + shape) * 3, jnp.float32)
    R = jnp.asarray(rng.normal(size=(E,) + shape), jnp.float32)
    ref = ops.edge_softmax(g0, lg, norm_by=norm_by)
    out = ops.edge_softmax(gw, lg, norm_by=norm_by)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)
    g1 = jax.grad(lambda l: jnp.sum(
        ops.edge_softmax(g0, l, norm_by=norm_by) * R))(lg)
    g2 = jax.grad(lambda l: jnp.sum(
        ops.edge_softmax(gw, l, norm_by=norm_by) * R))(lg)
    np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-5)


def test_shell_edge_softmax_subset(graphs):
    g0, gw = graphs
    rng = np.random.default_rng(6)
    E = g0.num_edges()
    eids = np.sort(rng.choice(E, 500, replace=False))
    lg = jnp.asarray(rng.normal(size=(E,)) * 3, jnp.float32)
    ref = ops.edge_softmax(g0, lg, eids=eids)
    out = ops.edge_softmax(gw, lg, eids=eids)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-6)


def test_gatconv_with_plans(graphs):
    # the full GAT layer (edge_softmax + u_mul_e_sum) must be unchanged by
    # attaching weighted plans
    from dgl_tpu.nn.conv.gatconv import GATConv

    g0, gw = graphs
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.normal(size=(g0.num_nodes(), 16)), jnp.float32)
    conv = GATConv(16, 8, 4)
    p = conv.init(jax.random.PRNGKey(0), g0, x)
    r0 = conv.apply(p, g0, x)
    r1 = conv.apply(p, gw, x)
    np.testing.assert_allclose(r1, r0, rtol=1e-5, atol=1e-5)
    lo = lambda gg: (lambda p: jnp.sum(conv.apply(p, gg, x) ** 2))
    d0 = jax.grad(lo(g0))(p)
    d1 = jax.grad(lo(gw))(p)
    for a, b in zip(jax.tree_util.tree_leaves(d0),
                    jax.tree_util.tree_leaves(d1)):
        np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-3)


@pytest.mark.parametrize("opname", [
    "copy_u_max", "copy_u_min", "u_mul_e_max", "u_add_e_min", "copy_e_max",
])
def test_cmp_reducers_match(graphs, opname):
    g0, gw = graphs
    rng = np.random.default_rng(8)
    n, E = g0.num_nodes(), g0.num_edges()
    x = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(E,)), jnp.float32)
    R = jnp.asarray(rng.normal(size=(n, 12)), jnp.float32)
    f = getattr(ops, opname)
    if opname.startswith("copy_u"):
        args = (x,)
    elif opname.startswith("copy_e"):
        args = (e,)
    else:
        args = (x, e)
    ref = f(g0, *args)
    out = f(gw, *args)
    np.testing.assert_allclose(out, ref, rtol=1e-5, atol=1e-5)
    # gradients flow to the arg-extremum positions in both paths
    if opname.startswith("copy_u"):
        Rr = R[:, : ref.shape[-1]] if ref.ndim == 2 else R[:, 0]
        g1 = jax.grad(lambda a: jnp.sum(f(g0, a) * Rr))(x)
        g2 = jax.grad(lambda a: jnp.sum(f(gw, a) * Rr))(x)
        np.testing.assert_allclose(g2, g1, rtol=1e-4, atol=1e-4)


def test_hetero_bipartite_plans():
    # with_spmm_plans builds per-relation plans incl. bipartite ones
    rng = np.random.default_rng(9)
    g = dgl_tpu.heterograph({
        ("user", "follows", "user"): (rng.integers(0, 40, 300),
                                      rng.integers(0, 40, 300)),
        ("user", "rates", "item"): (rng.integers(0, 40, 200),
                                    rng.integers(0, 25, 200)),
    }, num_nodes_dict={"user": 40, "item": 25})
    gw = g.with_spmm_plans(num_hubs=16, weighted=True, gather_dtype="f32")
    x = jnp.asarray(rng.normal(size=(40, 8)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(200,)), jnp.float32)
    np.testing.assert_allclose(
        ops.u_mul_e_sum(gw, x, e, etype="rates"),
        ops.u_mul_e_sum(g, x, e, etype="rates"), rtol=1e-5, atol=1e-5)
    ref = ops.copy_u_sum(g, x, etype="follows")
    out = ops.copy_u_sum(gw, x, etype="follows")
    assert float(jnp.max(jnp.abs(out - ref)) /
                 jnp.max(jnp.abs(ref))) < 1e-2  # bf16 shell cold default


def test_high_degree_capped_shells():
    """A ~30k-out-degree node must not explode the plan build (capped
    shells + sorted residual, ops/shell_spmm.py::SHELL_CAP); results match
    the classic path including the reverse (dU) direction and norm_by=src
    softmax that route through the residual."""
    import time

    rng = np.random.default_rng(0)
    n, e_extra = 20_000, 100_000
    src = np.concatenate([np.zeros(10_000, np.int64),
                          rng.integers(0, n, e_extra)])
    dst = rng.integers(0, n, src.shape[0])
    t0 = time.perf_counter()
    g0 = dgl_tpu.graph((src, dst), num_nodes=n)
    gw = g0.with_spmm_plans(num_hubs=64, weighted=True, gather_dtype="f32")
    assert time.perf_counter() - t0 < 30
    plan = gw._relation(None).shell_plan
    from dgl_tpu.ops.shell_spmm import SHELL_CAP
    assert len(plan.rev_shells) <= SHELL_CAP
    assert int(plan.res_src[2].shape[0]) >= 9_000
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    e = jnp.asarray(rng.normal(size=(g0.num_edges(),)), jnp.float32)
    R = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    np.testing.assert_allclose(ops.u_mul_e_sum(gw, x, e),
                               ops.u_mul_e_sum(g0, x, e),
                               rtol=1e-5, atol=1e-5)
    g1 = jax.grad(lambda a: jnp.sum(ops.u_mul_e_sum(g0, a, e) * R))(x)
    g2 = jax.grad(lambda a: jnp.sum(ops.u_mul_e_sum(gw, a, e) * R))(x)
    # the 10k-term residual sum reassociates: magnitude-relative tolerance
    assert float(jnp.max(jnp.abs(g2 - g1)) / jnp.max(jnp.abs(g1))) < 1e-4
    lg = jnp.asarray(rng.normal(size=(g0.num_edges(),)) * 2, jnp.float32)
    np.testing.assert_allclose(
        ops.edge_softmax(gw, lg, norm_by="src"),
        ops.edge_softmax(g0, lg, norm_by="src"), rtol=1e-5, atol=1e-6)


def test_star_graph_single_dst():
    """All edges into one dst (max cold in-degree = E): capped shells must
    still match classic exactly."""
    import dgl_tpu as dgl
    from dgl_tpu import function as fn

    n = 64
    src = np.arange(1, n)
    dst = np.zeros(n - 1, np.int64)
    g0 = dgl.graph((src, dst), num_nodes=n)
    gw = g0.with_spmm_plans(num_hubs=4, weighted=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(n, 8)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(1).random(n - 1), jnp.float32)
    for g in (g0, gw):
        g.srcdata["h"] = x
        g.edata["w"] = w
        g.update_all(fn.u_mul_e("h", "w", "m"), fn.sum("m", "o"))
    np.testing.assert_allclose(
        np.asarray(gw.dstdata["o"]), np.asarray(g0.dstdata["o"]),
        rtol=2e-2, atol=2e-2,
    )


def test_zero_in_degree_rows_with_plans():
    """Isolated dsts return exact zeros (sum) under the shell plan."""
    import dgl_tpu as dgl
    from dgl_tpu import function as fn

    src = np.array([0, 1, 2])
    dst = np.array([3, 3, 4])
    g = dgl.graph((src, dst), num_nodes=8).with_spmm_plans(
        num_hubs=2, weighted=True
    )
    x = jnp.ones((8, 4), jnp.float32)
    g.srcdata["h"] = x
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    out = np.asarray(g.dstdata["o"])
    np.testing.assert_allclose(out[[0, 1, 2, 5, 6, 7]], 0.0)
    np.testing.assert_allclose(out[3], 2.0, rtol=2e-2)


def test_self_loop_only_graph_plans():
    """Pure self-loop graph: every edge is (i, i)."""
    import dgl_tpu as dgl
    from dgl_tpu import function as fn

    n = 32
    g0 = dgl.graph((np.arange(n), np.arange(n)), num_nodes=n)
    gw = g0.with_spmm_plans(num_hubs=8, weighted=True)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(n, 4)),
                    jnp.float32)
    for g in (g0, gw):
        g.srcdata["h"] = x
        g.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    np.testing.assert_allclose(
        np.asarray(gw.dstdata["o"]), np.asarray(g0.dstdata["o"]),
        rtol=2e-2, atol=2e-2,
    )


def test_reorder_for_spmm_identity_unrank_and_parity():
    """reorder_for_spmm relabels to rank order: the fwd unrank gather is
    elided (plan.unrank_dst None) and outputs match the unreordered plan
    modulo the permutation."""
    import dgl_tpu as dgl
    from dgl_tpu import ops
    from dgl_tpu.transforms import reorder_for_spmm

    rng = np.random.default_rng(3)
    n, e = 300, 2400
    w = 1.0 / np.arange(1, n + 1)
    src = rng.choice(n, e, p=w / w.sum())
    dst = rng.integers(0, n, e)
    g = dgl.graph((src, dst), num_nodes=n)
    x = jnp.asarray(rng.normal(size=(n, 16)), jnp.float32)

    gp = g.with_spmm_plans(num_hubs=32)
    want = np.asarray(ops.copy_u_sum(gp, x))

    g2, perm = reorder_for_spmm(g, num_hubs=32)
    assert g2._relation(None).hub_plan.unrank_dst is None
    got = np.asarray(ops.copy_u_sum(g2, x[perm]))
    np.testing.assert_allclose(got, want[perm], rtol=2e-2, atol=1e-3)
