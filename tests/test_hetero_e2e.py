"""R-GCN on an ogbn-mag-shaped heterograph (the BASELINE R-GCN config):
HeteroGraphConv over 4 relations + typed RelGraphConv on the homogeneous
encoding; both must train to well above chance."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.data import SyntheticHeteroDataset
from dgl_tpu.nn import HeteroGraphConv
from dgl_tpu.nn.conv import GraphConv
from dgl_tpu.models import RGCN


@pytest.fixture(scope="module")
def mag():
    ds = SyntheticHeteroDataset()
    return ds[0], ds.num_classes


class HeteroRGCN(nn.Module):
    in_feats: int
    hidden: int
    classes: int
    etypes: tuple

    @nn.compact
    def __call__(self, g, inputs):
        h = HeteroGraphConv(
            {
                et: GraphConv(self.in_feats, self.hidden,
                              allow_zero_in_degree=True, name=f"l0_{et}")
                for et in self.etypes
            },
            aggregate="sum",
            name="layer0",
        )(g, inputs)
        h = {k: jax.nn.relu(v) for k, v in h.items()}
        h = HeteroGraphConv(
            {
                et: GraphConv(self.hidden, self.classes,
                              allow_zero_in_degree=True, name=f"l1_{et}")
                for et in self.etypes
            },
            aggregate="sum",
            name="layer1",
        )(g, h)
        return h


def test_hetero_rgcn_mag(mag):
    g, C = mag
    etypes = tuple(g.etypes)
    feats = {nt: g._node_frames[nt]["feat"] for nt in g.ntypes}
    labels = g._node_frames["paper"]["label"].astype(jnp.int32)
    train_mask = g._node_frames["paper"]["train_mask"].astype(jnp.float32)
    test_mask = np.asarray(g._node_frames["paper"]["test_mask"])

    model = HeteroRGCN(64, 32, C, etypes)
    params = model.init(jax.random.PRNGKey(0), g, feats)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, g, feats)["paper"]
            ls = optax.softmax_cross_entropy_with_integer_labels(out, labels)
            return (ls * train_mask).sum() / train_mask.sum()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
    out = model.apply(params, g, feats)["paper"]
    pred = np.asarray(jnp.argmax(out, -1))
    acc = (pred[test_mask] == np.asarray(labels)[test_mask]).mean()
    assert acc > 0.4, f"hetero R-GCN acc too low: {acc} (chance 1/8)"


def test_rgcn_homogeneous_encoding(mag):
    """RGCN over dgl.to_homogeneous(g) with etype ids (the reference's
    entity-classification path)."""
    g, C = mag
    homo = dgl.to_homogeneous(g)
    etypes = homo.edata[dgl.ETYPE].astype(jnp.int32)
    ntype_ids = np.asarray(homo.ndata[dgl.NTYPE])
    n = homo.num_nodes()
    rng = np.random.default_rng(0)
    # features: place per-type features into a shared space
    F = 64
    x = np.zeros((n, F), np.float32)
    offset = 0
    paper_slice = None
    for i, nt in enumerate(g.ntypes):
        cnt = g.num_nodes(nt)
        x[offset : offset + cnt] = np.asarray(g._node_frames[nt]["feat"])
        if nt == "paper":
            paper_slice = (offset, offset + cnt)
        offset += cnt
    labels = np.asarray(g._node_frames["paper"]["label"])

    model = RGCN(F, 32, C, num_rels=len(g.canonical_etypes), num_bases=2)
    xj = jnp.asarray(x)
    params = model.init(jax.random.PRNGKey(0), homo, xj, etypes)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)
    lo, hi = paper_slice
    yj = jnp.asarray(labels.astype(np.int32))

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            out = model.apply(p, homo, xj, etypes)[lo:hi]
            return optax.softmax_cross_entropy_with_integer_labels(
                out, yj
            ).mean()

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    for _ in range(40):
        params, opt_state, loss = step(params, opt_state)
    out = model.apply(params, homo, xj, etypes)[lo:hi]
    acc = (np.asarray(jnp.argmax(out, -1)) == labels).mean()
    assert acc > 0.4, f"homogeneous RGCN acc too low: {acc}"
