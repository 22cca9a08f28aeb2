"""Hetero fixed-shape minibatch training (R-GCN minibatch config):
HeteroGraphConv over padded hetero MFG blocks, one compile per epoch."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

import dgl_tpu as dgl
from dgl_tpu.base import NID
from dgl_tpu.data import synthetic_hetero_graph
from dgl_tpu.dataloading import DataLoader, HeteroFixedShapeNeighborSampler
from dgl_tpu.nn import HeteroGraphConv
from dgl_tpu.nn.conv import GraphConv


FANOUT = {("paper", "cites", "paper"): 5, ("author", "writes", "paper"): 3}


@pytest.fixture(scope="module")
def g():
    return synthetic_hetero_graph()


def test_shapes_stable(g):
    sampler = HeteroFixedShapeNeighborSampler(
        g, [FANOUT, FANOUT], batch_size=8, seed_ntype="paper", seed=0
    )
    defs = set()
    for seeds in (np.arange(8), np.arange(50, 58), np.arange(3)):
        _, _, blocks = sampler.sample_blocks(g, seeds)
        flat, td = jax.tree_util.tree_flatten(blocks)
        defs.add((str(td), tuple(x.shape for x in flat)))
    assert len(defs) == 1


class MiniHeteroRGCN(nn.Module):
    etypes: tuple
    in_feats: int
    hidden: int
    classes: int

    @nn.compact
    def __call__(self, blocks, inputs):
        h = HeteroGraphConv(
            {et: GraphConv(self.in_feats, self.hidden,
                           allow_zero_in_degree=True, name=f"l0_{et}")
             for et in self.etypes},
            aggregate="sum", name="layer0",
        )(blocks[0], inputs)
        h = {k: jax.nn.relu(v) for k, v in h.items()}
        # carry over src features for types without layer-0 output
        h2_in = dict(h)
        h = HeteroGraphConv(
            {et: GraphConv(self.hidden, self.classes,
                           allow_zero_in_degree=True, name=f"l1_{et}")
             for et in self.etypes},
            aggregate="sum", name="layer1",
        )(blocks[1], h2_in)
        return h


def test_hetero_minibatch_training(g):
    sampler = HeteroFixedShapeNeighborSampler(
        g, [FANOUT, FANOUT], batch_size=16, seed_ntype="paper", seed=0
    )
    feats = {nt: np.asarray(g._node_frames[nt]["feat"]) for nt in g.ntypes}
    labels = np.asarray(g._node_frames["paper"]["label"])
    train_ids = np.nonzero(np.asarray(g._node_frames["paper"]["train_mask"]))[0]

    # only etypes whose src features feed layer 0 and whose dst appears in
    # layer 1's inputs: cites (paper->paper) and writes (author->paper)
    model = MiniHeteroRGCN(("cites", "writes"), 64, 32, 8)
    _, _, blocks0 = sampler.sample_blocks(g, train_ids[:16])

    def block_inputs(blocks):
        return {
            nt: jnp.asarray(feats[nt])[
                blocks[0]._node_frames[nt][NID]
            ] * blocks[0]._node_frames[nt]["_mask"][:, None]
            for nt in blocks[0]._node_frames
        }

    x0 = block_inputs(blocks0)
    params = model.init(jax.random.PRNGKey(0), blocks0, x0)
    tx = optax.adam(5e-3)
    opt_state = tx.init(params)
    compiles = []

    @jax.jit
    def step(params, opt_state, blocks, x, y, ymask):
        compiles.append(1)

        def loss_fn(p):
            out = model.apply(p, blocks, x)["paper"]
            ls = optax.softmax_cross_entropy_with_integer_labels(out, y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for epoch in range(3):
        loader = DataLoader(
            g, train_ids[:320], sampler, batch_size=16, shuffle=True,
            seed=epoch,
        )
        tot, nb = 0.0, 0
        for _, output_nodes, blocks in loader:
            x = block_inputs(blocks)
            y = jnp.asarray(labels)[blocks[-1]._dst_frames["paper"][NID]]
            ymask = blocks[-1]._dst_frames["paper"]["_mask"].astype(
                jnp.float32
            )
            params, opt_state, loss = step(
                params, opt_state, blocks, x, y, ymask
            )
            tot += float(loss)
            nb += 1
        losses.append(tot / nb)
    assert len(compiles) == 1, f"expected 1 compile, got {len(compiles)}"
    assert losses[-1] < losses[0]


def test_hetero_exclude_eids(g):
    """Edge exclusion (hetero link prediction): excluded eids never appear
    masked-in, and shapes/treedef match the unexcluded case."""
    from dgl_tpu.base import EID

    sampler = HeteroFixedShapeNeighborSampler(
        g, [FANOUT], batch_size=8, seed_ntype="paper", seed=0
    )
    cet = ("paper", "cites", "paper")
    rel = g._relations[g.to_canonical_etype(cet)]
    excl = np.asarray(rel.csc_eids)[:40]
    _, _, blocks = sampler.sample_blocks(
        g, np.arange(8), exclude_eids={cet: excl}
    )
    blk = blocks[0]
    em = np.asarray(blk._edge_frames[cet]["_mask"])
    eid = np.asarray(blk._edge_frames[cet][EID])
    assert not np.isin(eid[em], excl).any()
    sampler2 = HeteroFixedShapeNeighborSampler(
        g, [FANOUT], batch_size=8, seed_ntype="paper", seed=0
    )
    _, _, blocks2 = sampler2.sample_blocks(g, np.arange(8))
    f1, t1 = jax.tree_util.tree_flatten(blocks)
    f2, t2 = jax.tree_util.tree_flatten(blocks2)
    assert str(t1) == str(t2)
    assert all(a.shape == b.shape for a, b in zip(f1, f2))
