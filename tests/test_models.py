"""Model zoo tests."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
def test_gin_graph_classification():
    """GIN trains on a tiny synthetic graph-classification set; pad_batch
    gives every minibatch ONE static shape -> one jit compile, loss drops."""
    import optax
    from dgl_tpu.models import GIN
    from dgl_tpu.data import MiniGCDataset

    ds = MiniGCDataset(64, 12, 16, seed=0)
    graphs = [g for g, _ in ds]
    labels = np.asarray([int(l) for _, l in ds])
    max_n = 8 * 16 + 8          # capacity: 8 graphs of <=16 nodes + ghosts
    max_e = max(
        sum(g.num_edges() for g in graphs[i : i + 8]) for i in range(0, 64, 8)
    ) + 8
    batches = []
    for i in range(0, 64, 8):
        bg, gmask = dgl.pad_batch(graphs[i : i + 8], 9, max_n, max_e)
        deg = bg.in_degrees().astype(jnp.float32)[:, None]
        y = np.zeros(9, np.int64)
        y[:8] = labels[i : i + 8]
        batches.append((bg, deg, jnp.asarray(y), gmask))
    treedefs = {
        str(jax.tree_util.tree_flatten(b[0])[1]) for b in batches
    }
    assert len(treedefs) == 1, "pad_batch must give one treedef"

    model = GIN(1, 16, ds.num_classes, num_layers=3, dropout=0.0)
    params = model.init(jax.random.PRNGKey(0), batches[0][0], batches[0][1])
    tx = optax.adam(1e-2)
    opt = tx.init(params)
    traces = []

    @jax.jit
    def step(params, opt, g, x, y, gmask):
        traces.append(1)

        def loss_fn(p):
            logits = model.apply(p, g, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            m = gmask.astype(ls.dtype)
            return (ls * m).sum() / m.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    losses = []
    for epoch in range(8):
        tot = 0.0
        for g, x, y, gmask in batches:
            params, opt, loss = step(params, opt, g, x, y, gmask)
            tot += float(loss)
        losses.append(tot)
    assert len(traces) == 1, f"expected 1 compile, got {len(traces)}"
    assert losses[-1] < losses[0] * 0.9


def test_pad_batch_readout_parity():
    """Ghost segments must not perturb real graphs' readouts."""
    from dgl_tpu.data import MiniGCDataset
    from dgl_tpu import readout

    ds = MiniGCDataset(6, 8, 12, seed=1)
    graphs = [g for g, _ in ds]
    for g in graphs:
        g.ndata["h"] = jnp.asarray(
            np.random.default_rng(0).normal(size=(g.num_nodes(), 4)),
            jnp.float32,
        )
    plain = dgl.batch(graphs)
    padded, gmask = dgl.pad_batch(graphs, 8, 200, 300)
    for op in ("sum", "mean", "max"):
        want = np.asarray(readout.readout_nodes(plain, "h", op=op))
        got = np.asarray(readout.readout_nodes(padded, "h", op=op))
        np.testing.assert_allclose(got[:6], want, rtol=1e-5, atol=1e-6)
    assert int(np.asarray(gmask).sum()) == 6
    with pytest.raises(Exception):
        dgl.pad_batch(graphs, 6, 200, 300)  # no room for a ghost
    with pytest.raises(Exception):
        dgl.pad_batch(graphs, 8, 10, 300)  # node budget too small
