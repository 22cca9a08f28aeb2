"""Hub-cache Pallas SpMM: interpret-mode correctness vs the XLA path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import ops
from dgl_tpu.ops.pallas_hub import HubPlan, hub_copy_u_sum, hub_gather


def _powerlaw_graph(n, e, seed=0):
    rng = np.random.default_rng(seed)
    # zipf-ish source distribution: hubs exist
    p = 1.0 / np.arange(1, n + 1)
    p /= p.sum()
    src = rng.choice(n, size=e, p=p)
    dst = rng.integers(0, n, e)
    return dgl.graph((src, dst), num_nodes=n)


@pytest.mark.parametrize("num_hubs", [256, 1024])
def test_hub_copy_u_sum_matches_xla(num_hubs):
    g = _powerlaw_graph(3000, 20000)
    rel = g._relation(None)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(3000, 32)), jnp.float32)
    plan = HubPlan.build(rel, num_hubs)
    assert 0.0 < plan.coverage <= 1.0
    got = hub_copy_u_sum(rel, x, plan=plan, interpret=True)
    want = ops.copy_u_sum(g, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4,
                               atol=2e-4)


def test_hub_covers_more_on_powerlaw():
    g = _powerlaw_graph(3000, 20000)
    plan = HubPlan.build(g._relation(None), 1024)
    rng = np.random.default_rng(0)
    src = rng.integers(0, 3000, 20000)
    dst = rng.integers(0, 3000, 20000)
    gu = dgl.graph((src, dst), num_nodes=3000)
    plan_u = HubPlan.build(gu._relation(None), 1024)
    # same hub budget covers far more of a power-law graph
    assert plan.coverage > plan_u.coverage


def test_all_hubs_no_cold():
    """num_hubs >= num_src: every edge served from the table."""
    g = _powerlaw_graph(200, 3000, seed=2)
    rel = g._relation(None)
    plan = HubPlan.build(rel, 200)
    assert plan.coverage == 1.0
    x = jnp.asarray(
        np.random.default_rng(3).normal(size=(200, 8)), jnp.float32
    )
    got = hub_copy_u_sum(rel, x, plan=plan, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ops.copy_u_sum(g, x)), rtol=2e-4,
        atol=2e-4,
    )


def test_hub_gather_zero_for_sentinel():
    H, F = 256, 128
    hub = jnp.asarray(np.random.default_rng(0).normal(size=(H, F)),
                      jnp.float32)
    slots = np.full((2048, 1), H, np.int32)
    slots[0, 0] = 3
    out = hub_gather(hub, jnp.asarray(slots), interpret=True)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(hub[3]),
                               rtol=1e-5)
    assert float(jnp.abs(out[1:]).max()) == 0.0


def test_padded_graph_parity():
    """Graphs with padded edge slots (from stack/batch) stay correct."""
    g = _powerlaw_graph(500, 4000, seed=4)
    rel = g._relation(None)
    assert rel.num_edges_padded >= rel.num_edges
    x = jnp.asarray(
        np.random.default_rng(5).normal(size=(rel.num_src, 16)), jnp.float32
    )
    got = hub_copy_u_sum(rel, x, num_hubs=256, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ops.copy_u_sum(g, x)), rtol=2e-4,
        atol=2e-4,
    )


def test_bf16_precision_mode():
    """precision='bf16' rounds table values only; error stays ~1e-3."""
    g = _powerlaw_graph(1000, 8000, seed=7)
    rel = g._relation(None)
    x = jnp.asarray(
        np.random.default_rng(8).normal(size=(1000, 16)), jnp.float32
    )
    plan = HubPlan.build(rel, 512)
    got = hub_copy_u_sum(rel, x, plan=plan, interpret=True, precision="bf16")
    want = ops.copy_u_sum(g, x)
    rel_err = float(
        jnp.max(jnp.abs(got - want)) / jnp.maximum(jnp.max(jnp.abs(want)), 1e-9)
    )
    assert rel_err < 2e-2, rel_err
