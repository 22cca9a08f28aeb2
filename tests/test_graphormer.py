"""Graphormer model test (graph classification on planted structure)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

import dgl_tpu as dgl
from dgl_tpu.models import Graphormer, prepare_batch


def test_graphormer_trains():
    rng = np.random.default_rng(0)
    graphs, ys = [], []
    for i in range(8):
        g = dgl.rand_graph(int(rng.integers(5, 12)), 30, seed=i)
        g.ndata["feat"] = jnp.asarray(
            rng.normal(size=(g.num_nodes(), 16)), dtype=jnp.float32
        )
        graphs.append(g)
        ys.append(i % 2)
    x, deg, dist, am = prepare_batch(graphs)
    y = jnp.asarray(ys)
    m = Graphormer(16, 32, 2, num_layers=2, num_heads=4, dropout=0.0)
    params = m.init(jax.random.PRNGKey(0), x, deg, dist, am)
    tx = optax.adam(1e-3)
    st = tx.init(params)

    @jax.jit
    def step(p, st):
        loss, grads = jax.value_and_grad(
            lambda p: optax.softmax_cross_entropy_with_integer_labels(
                m.apply(p, x, deg, dist, am), y
            ).mean()
        )(p)
        u, st = tx.update(grads, st)
        return optax.apply_updates(p, u), st, loss

    for _ in range(40):
        params, st, loss = step(params, st)
    assert float(loss) < 0.4
    assert np.isfinite(float(loss))


def test_spatial_encoder_3d():
    from dgl_tpu.nn.gt import SpatialEncoder3d

    rng = np.random.default_rng(0)
    coord = jnp.asarray(rng.normal(size=(2, 5, 3)), jnp.float32)
    ntype = jnp.asarray(rng.integers(0, 4, (2, 5)))
    enc = SpatialEncoder3d(num_kernels=4, num_heads=3, max_node_type=10)
    params = enc.init(jax.random.PRNGKey(0), coord, ntype)
    out = enc.apply(params, coord, ntype)
    assert out.shape == (2, 5, 5, 3)
    assert np.isfinite(np.asarray(out)).all()
    assert enc.apply(params, coord).shape == (2, 5, 5, 3)
    # translation invariance: shifting all coordinates leaves the bias
    out_shift = enc.apply(params, coord + 7.5, ntype)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out_shift), rtol=1e-4, atol=1e-5
    )
