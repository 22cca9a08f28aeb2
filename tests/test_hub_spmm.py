"""Dense-hub SpMM (ops/hub_spmm.py) vs the reference segment path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu
from dgl_tpu import ops
from dgl_tpu.ops.hub_spmm import HubSpMMPlan, build_hub_plan, hub_copy_u_sum


def _powerlaw_graph(n=500, e=4000, seed=0):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n + 1)
    src = rng.choice(n, e, p=w / w.sum())
    dst = rng.integers(0, n, e)
    return dgl_tpu.graph((src, dst), num_nodes=n)


@pytest.mark.parametrize("precision,tol", [("f32", 1e-5), ("bf16", 5e-2)])
def test_forward_matches_segment_path(precision, tol):
    g = _powerlaw_graph()
    rel = g._relation(None)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(500, 64)),
                    jnp.float32)
    ref = ops.copy_u_sum(g, x)
    plan = build_hub_plan(rel, num_hubs=64, precision=precision)
    out = hub_copy_u_sum(plan, x)
    assert 0.0 < plan.coverage < 1.0
    # bf16 feature rounding gives ~1e-3 relative error per element; near-zero
    # sums need the absolute term
    np.testing.assert_allclose(out, ref, rtol=tol, atol=tol)


def test_all_hub_and_feature_ranks():
    # num_hubs >= num_src: every edge served by the dense matmul
    g = _powerlaw_graph(n=100, e=900)
    rel = g._relation(None)
    plan = build_hub_plan(rel, num_hubs=100, precision="f32")
    assert plan.coverage == 1.0
    for shape in [(100,), (100, 16), (100, 4, 8)]:
        x = jnp.asarray(np.random.default_rng(2).normal(size=shape),
                        jnp.float32)
        ref = ops.copy_u_sum(g, x)
        np.testing.assert_allclose(hub_copy_u_sum(plan, x), ref,
                                   rtol=1e-5, atol=1e-5)


def test_padded_graph():
    # padding edges (src == num_src / dst == num_dst) must be excluded
    src = np.array([0, 1, 1, 2, 5, 5])
    dst = np.array([1, 2, 0, 0, 5, 5])
    g = dgl_tpu.graph((src, dst), num_nodes=5, num_edges=4)
    rel = g._relation(None)
    x = jnp.arange(15, dtype=jnp.float32).reshape(5, 3)
    ref = ops.copy_u_sum(g, x)
    plan = build_hub_plan(rel, num_hubs=2, precision="f32")
    np.testing.assert_allclose(hub_copy_u_sum(plan, x), ref, rtol=1e-6)


def test_gradients_match():
    g = _powerlaw_graph(n=300, e=2500)
    rel = g._relation(None)
    plan = build_hub_plan(rel, num_hubs=64, precision="f32")
    x = jnp.asarray(np.random.default_rng(3).normal(size=(300, 32)),
                    jnp.float32)
    w = jnp.asarray(np.random.default_rng(4).normal(size=(300, 32)),
                    jnp.float32)

    def loss_ref(x):
        return jnp.sum(ops.copy_u_sum(g, x) * w[: g.num_dst_nodes()])

    def loss_hub(x):
        return jnp.sum(hub_copy_u_sum(plan, x) * w[: g.num_dst_nodes()])

    np.testing.assert_allclose(jax.grad(loss_hub)(x), jax.grad(loss_ref)(x),
                               rtol=1e-4, atol=1e-4)


def test_graph_level_dispatch_under_jit():
    g = _powerlaw_graph(n=200, e=1500)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(200, 24)),
                    jnp.float32)
    ref_sum = ops.copy_u_sum(g, x)
    ref_mean = ops.copy_u_mean(g, x)
    gp = g.with_spmm_plans(num_hubs=128, precision="f32")
    assert gp._relation(None).hub_plan is not None

    @jax.jit
    def f(g, x):
        return ops.copy_u_sum(g, x), ops.copy_u_mean(g, x)

    out_sum, out_mean = f(gp, x)
    np.testing.assert_allclose(out_sum, ref_sum, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(out_mean, ref_mean, rtol=1e-5, atol=1e-5)
    # plan survives the pytree round-trip
    leaves, treedef = jax.tree_util.tree_flatten(gp)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert isinstance(g2._relation(None).hub_plan, HubSpMMPlan)


def test_unsupported_ops_fall_back():
    g = _powerlaw_graph(n=120, e=800).with_spmm_plans(num_hubs=64,
                                                      precision="f32")
    x = jnp.asarray(np.random.default_rng(6).normal(size=(120, 8)),
                    jnp.float32)
    e = jnp.asarray(np.random.default_rng(7).normal(
        size=(g.num_edges(),)), jnp.float32)
    g0 = _powerlaw_graph(n=120, e=800)
    np.testing.assert_allclose(
        ops.u_mul_e_sum(g, x, e), ops.u_mul_e_sum(g0, x, e), rtol=1e-5)
    np.testing.assert_allclose(
        ops.copy_u_max(g, x), ops.copy_u_max(g0, x), rtol=1e-5)


# -- shell cold mode (segment-sum-free cold tail) -----------------------------


@pytest.mark.parametrize("precision,cold,tol", [
    ("f32", "shell-f32", 1e-5),
    ("int8", "shell", 1e-2),
    ("bf16", "shell", 1e-2),
])
def test_shell_forward_and_grad(precision, cold, tol):
    g = _powerlaw_graph(n=500, e=4000)
    rel = g._relation(None)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(500, 64)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(500, 64)), jnp.float32)
    plan = build_hub_plan(rel, num_hubs=64, precision=precision, cold=cold)
    assert plan.cold == cold and len(plan.shells) > 0
    ref = ops.copy_u_sum(g, x)
    out = hub_copy_u_sum(plan, x)
    # bf16 rounding error scales with the magnitude of the summed rows, so
    # compare max-normalized (matches the legacy bf16-cold tolerance policy)
    assert float(jnp.max(jnp.abs(out - ref)) / jnp.max(jnp.abs(ref))) < tol
    g1 = jax.grad(lambda x: jnp.sum(ops.copy_u_sum(g, x) * w))(x)
    g2 = jax.grad(lambda x: jnp.sum(hub_copy_u_sum(plan, x) * w))(x)
    assert float(jnp.max(jnp.abs(g2 - g1)) / jnp.max(jnp.abs(g1))) < tol


def test_shell_is_default_for_low_precision():
    rel = _powerlaw_graph()._relation(None)
    assert build_hub_plan(rel, 64, precision="int8").cold == "shell"
    assert build_hub_plan(rel, 64, precision="bf16").cold == "shell"
    assert build_hub_plan(rel, 64, precision="f32").cold == "f32"


def test_shell_padded_graph():
    # padding edges (src == num_src / dst == num_dst) must be excluded
    src = np.array([0, 1, 1, 2, 5, 5])
    dst = np.array([1, 2, 0, 0, 5, 5])
    g = dgl_tpu.graph((src, dst), num_nodes=5, num_edges=4)
    rel = g._relation(None)
    x = jnp.arange(15, dtype=jnp.float32).reshape(5, 3)
    ref = ops.copy_u_sum(g, x)
    plan = build_hub_plan(rel, num_hubs=2, precision="f32", cold="shell-f32")
    np.testing.assert_allclose(hub_copy_u_sum(plan, x), ref, rtol=1e-6)


def test_shell_all_hub_empty_cold():
    g = _powerlaw_graph(n=100, e=900)
    plan = build_hub_plan(g._relation(None), num_hubs=100,
                          precision="f32", cold="shell-f32")
    assert plan.coverage == 1.0 and len(plan.shells) == 0
    x = jnp.asarray(np.random.default_rng(2).normal(size=(100, 16)),
                    jnp.float32)
    np.testing.assert_allclose(hub_copy_u_sum(plan, x),
                               ops.copy_u_sum(g, x), rtol=1e-5, atol=1e-5)


def test_shell_plan_pytree_roundtrip():
    gp = _powerlaw_graph(n=200, e=1500).with_spmm_plans(num_hubs=64,
                                                        precision="int8")
    plan = gp._relation(None).hub_plan
    assert plan.cold == "shell"
    leaves, treedef = jax.tree_util.tree_flatten(gp)
    g2 = jax.tree_util.tree_unflatten(treedef, leaves)
    p2 = g2._relation(None).hub_plan
    assert p2.cold == "shell" and len(p2.shells) == len(plan.shells)
    x = jnp.asarray(np.random.default_rng(5).normal(size=(200, 24)),
                    jnp.float32)

    @jax.jit
    def f(g, x):
        return ops.copy_u_sum(g, x)

    np.testing.assert_allclose(f(g2, x), ops.copy_u_sum(
        _powerlaw_graph(n=200, e=1500), x), rtol=5e-2, atol=5e-2)


def test_auto_num_hubs():
    """num_hubs='auto' picks by coverage: power-law graphs get a small
    table; flat-degree graphs stop at the diminishing-returns elbow."""
    import dgl_tpu as dgl
    from dgl_tpu import function as fn

    rng = np.random.default_rng(0)
    n, e = 20_000, 200_000
    # zipf sources: few hubs cover most edges
    w = 1.0 / np.arange(1, n + 1)
    src = rng.choice(n, e, p=w / w.sum())
    dst = rng.integers(0, n, e)
    g = dgl.graph((src, dst), num_nodes=n)
    h_zipf = dgl.Graph._auto_num_hubs(g._relation(None))
    assert h_zipf <= 1024  # heavy tail -> small table suffices
    # uniform sources: no hubs; elbow keeps the table small
    g2 = dgl.graph(
        (rng.integers(0, n, e), rng.integers(0, n, e)), num_nodes=n
    )
    h_flat = dgl.Graph._auto_num_hubs(g2._relation(None))
    assert h_flat <= 4096
    # auto plans still compute correctly
    gw = g.with_spmm_plans(num_hubs="auto", weighted=True)
    x = jnp.asarray(rng.normal(size=(n, 8)), jnp.float32)
    g.srcdata["h"] = x
    g.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    gw.srcdata["h"] = x
    gw.update_all(fn.copy_u("h", "m"), fn.sum("m", "o"))
    np.testing.assert_allclose(
        np.asarray(gw.dstdata["o"]), np.asarray(g.dstdata["o"]),
        rtol=3e-2, atol=3e-2,
    )
