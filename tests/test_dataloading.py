"""Dataloading tests (mirrors reference tests/python/pytorch/dataloading/)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import dataloading
from dgl_tpu.base import EID, NID


@pytest.fixture
def g():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 100, 1000)
    dst = rng.integers(0, 100, 1000)
    g = dgl.graph((src, dst), num_nodes=100)
    g.ndata["feat"] = jnp.asarray(
        rng.normal(size=(100, 8)), dtype=jnp.float32
    )
    return g


def test_neighbor_sampler_blocks(g):
    sampler = dataloading.NeighborSampler([3, 5], seed=0)
    input_nodes, output_nodes, blocks = sampler.sample_blocks(g, [0, 1, 2])
    assert len(blocks) == 2
    # last block's dst = seeds
    np.testing.assert_array_equal(
        np.asarray(blocks[-1].dstdata[NID]), [0, 1, 2]
    )
    # block 0 src includes block 1 src seeds (dst-first invariant)
    b1_src = np.asarray(blocks[1].srcdata[NID])
    b0_dst = np.asarray(blocks[0].dstdata[NID])
    np.testing.assert_array_equal(b1_src, b0_dst)
    # per-dst in-degree bounded by fanout
    assert int(np.asarray(blocks[1].in_degrees()).max()) <= 5


def test_full_neighbor_sampler(g):
    sampler = dataloading.MultiLayerFullNeighborSampler(2)
    _, _, blocks = sampler.sample_blocks(g, [7])
    indeg_g = int(np.asarray(g.in_degrees())[7])
    assert blocks[1].num_edges() == indeg_g


def test_dataloader_iteration(g):
    sampler = dataloading.NeighborSampler([2, 2], seed=0)
    loader = dataloading.DataLoader(
        g, np.arange(100), sampler, batch_size=32, shuffle=True, seed=1
    )
    n = 0
    seen = []
    for input_nodes, output_nodes, blocks in loader:
        n += 1
        seen.append(np.asarray(output_nodes))
        assert len(blocks) == 2
    assert n == 4  # ceil(100/32)
    assert len(loader) == 4
    all_seen = np.sort(np.concatenate(seen))
    np.testing.assert_array_equal(all_seen, np.arange(100))


def test_dataloader_no_prefetch_same_result(g):
    s1 = dataloading.NeighborSampler([2], seed=5)
    s2 = dataloading.NeighborSampler([2], seed=5)
    l1 = dataloading.DataLoader(
        g, np.arange(20), s1, batch_size=10, use_prefetch_thread=False
    )
    l2 = dataloading.DataLoader(
        g, np.arange(20), s2, batch_size=10, use_prefetch_thread=True
    )
    for (i1, o1, b1), (i2, o2, b2) in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_fixed_shape_sampler_static_shapes(g):
    sampler = dataloading.FixedShapeNeighborSampler([3, 5], batch_size=8, seed=0)
    shapes = set()
    treedefs = set()
    for seeds in ([0, 1, 2, 3, 4, 5, 6, 7], [8, 9, 10, 11, 12, 13, 14, 15], [16, 17]):
        input_nodes, output_nodes, blocks = sampler.sample_blocks(g, seeds)
        flat, treedef = jax.tree_util.tree_flatten(blocks)
        shapes.add(tuple(x.shape for x in flat))
        treedefs.add(str(treedef))
    assert len(shapes) == 1, "fixed sampler must produce identical shapes"
    assert len(treedefs) == 1


def test_fixed_shape_sampler_correct(g):
    sampler = dataloading.FixedShapeNeighborSampler([4], batch_size=4, seed=0)
    _, _, blocks = sampler.sample_blocks(g, [0, 1, 2, 3])
    (block,) = blocks
    # masked edges all connect real src to real dst slots matching graph
    src_nid = np.asarray(block.srcdata[NID])
    dst_nid = np.asarray(block.dstdata[NID])
    emask = np.asarray(block.edata["_mask"])
    rel = block._relation(None)
    esrc = np.asarray(rel.src)
    edst = np.asarray(rel.dst)
    gsrc = np.asarray(g._relation(None).src)
    gdst = np.asarray(g._relation(None).dst)
    eid = np.asarray(block.edata[EID])
    cnt = 0
    for k in range(esrc.shape[0]):
        if not emask[k]:
            continue
        cnt += 1
        assert gsrc[eid[k]] == src_nid[esrc[k]]
        assert gdst[eid[k]] == dst_nid[edst[k]]
    deg = np.asarray(g.in_degrees())
    expect = sum(min(int(deg[s]), 4) for s in [0, 1, 2, 3])
    assert cnt == expect


def test_fixed_shape_minibatch_training(g):
    """End-to-end: jit-compiled SAGE train step over fixed-shape blocks
    compiles once and loss decreases."""
    import optax
    from dgl_tpu.models import GraphSAGE

    labels = jnp.asarray(np.random.default_rng(0).integers(0, 4, 100))
    feats = g.ndata["feat"]
    sampler = dataloading.FixedShapeNeighborSampler([3, 3], batch_size=16, seed=0)
    model = GraphSAGE(8, 16, 4, num_layers=2)

    _, _, blocks0 = sampler.sample_blocks(g, np.arange(16))
    x0 = feats[blocks0[0].srcdata[NID]]
    params = model.init(jax.random.PRNGKey(0), blocks0, x0)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    traces = []

    @jax.jit
    def step(params, opt_state, blocks, x, y, ymask):
        traces.append(1)

        def loss_fn(p):
            logits = model.apply(p, blocks, x)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (ls * ymask).sum() / jnp.maximum(ymask.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    losses = []
    for epoch in range(3):
        loader = dataloading.DataLoader(
            g, np.arange(96), sampler, batch_size=16, shuffle=True, seed=epoch
        )
        tot = 0.0
        for input_nodes, output_nodes, blocks in loader:
            x = feats[blocks[0].srcdata[NID]]
            x = x * blocks[0].srcdata["_mask"][:, None]
            y = labels[blocks[-1].dstdata[NID]]
            ymask = blocks[-1].dstdata["_mask"].astype(jnp.float32)
            params, opt_state, loss = step(
                params, opt_state, blocks, x, y, ymask
            )
            tot += float(loss)
        losses.append(tot)
    assert len(traces) == 1, f"expected 1 compile, got {len(traces)}"
    assert losses[-1] < losses[0]


def test_fixed_shape_exclusion(g):
    """Edge exclusion for link prediction keeps static shapes and drops the
    excluded picks from aggregation."""
    import dgl_tpu as dgl

    sampler = dataloading.FixedShapeNeighborSampler([5], batch_size=8, seed=0)
    rel = g._relation(None)
    indeg0 = int(np.asarray(g.in_degrees())[0])
    excl = np.asarray(rel.csc_eids)[:indeg0]
    _, _, blocks = sampler.sample_blocks(g, np.arange(8), exclude_eids=excl)
    blk = blocks[0]
    em = np.asarray(blk.edata["_mask"])
    eid = np.asarray(blk.edata[EID])
    assert not np.isin(eid[em], excl).any()
    # shapes identical to the unexcluded case
    _, _, blocks2 = sampler.sample_blocks(g, np.arange(8))
    f1, t1 = jax.tree_util.tree_flatten(blocks)
    f2, t2 = jax.tree_util.tree_flatten(blocks2)
    assert str(t1) == str(t2)
    assert all(a.shape == b.shape for a, b in zip(f1, f2))


def test_graph_dataloader_static_shapes():
    """GraphDataLoader pads every batch to ONE treedef; labels masked."""
    from dgl_tpu.data import MiniGCDataset
    from dgl_tpu.dataloading import GraphDataLoader

    ds = MiniGCDataset(20, 8, 14, seed=0)
    loader = GraphDataLoader(ds, batch_size=4, shuffle=True, seed=1)
    defs = set()
    seen = 0
    for bg, labels, gmask in loader:
        flat, td = jax.tree_util.tree_flatten(bg)
        defs.add((str(td), tuple(x.shape for x in flat)))
        assert labels.shape[0] == 5  # batch_size + ghost slot
        seen += int(np.asarray(gmask).sum())
    assert seen == 20
    assert len(defs) == 1, "all batches must share one static shape"
    assert len(loader) == 5
    # unpadded mode keeps plain dgl.batch semantics
    loader2 = GraphDataLoader(ds, batch_size=4, pad=False)
    bg, labels, gmask = next(iter(loader2))
    assert bg.batch_size == 4


def test_reverse_types_exclusion():
    """exclude='reverse_types': seeds of etype A also exclude the same ids
    in the mapped reverse etype."""
    from dgl_tpu.dataloading.base import find_exclude_eids

    hg = dgl.heterograph({
        ("u", "follows", "v"): ([0, 1, 2], [1, 2, 0]),
        ("v", "followed-by", "u"): ([1, 2, 0], [0, 1, 2]),
    })
    out = find_exclude_eids(
        hg, {"follows": np.array([0, 2])}, "reverse_types",
        reverse_etypes={"follows": "followed-by"},
    )
    np.testing.assert_array_equal(out[("u", "follows", "v")], [0, 2])
    np.testing.assert_array_equal(out[("v", "followed-by", "u")], [0, 2])
    with pytest.raises(Exception):
        find_exclude_eids(hg, {"follows": [0]}, "reverse_types")


def test_tensorized_dataset():
    ds = dataloading.TensorizedDataset(np.arange(10), 3)
    batches = list(ds)
    assert len(batches) == len(ds) == 4
    assert np.concatenate(batches).tolist() == list(range(10))
    ds2 = dataloading.TensorizedDataset(np.arange(10), 3, drop_last=True)
    assert len(list(ds2)) == len(ds2) == 3
    # hetero flattening
    dsd = dataloading.TensorizedDataset(
        {"a": np.arange(2), "b": np.arange(3)}, 2
    )
    items = [it for b in dsd for it in b]
    assert ("a", 0) in items and ("b", 2) in items and len(items) == 5


def test_ddp_tensorized_dataset():
    # 10 items over 3 ranks: padded by wrap-around to 4 each
    per_rank = [
        list(dataloading.DDPTensorizedDataset(
            np.arange(10), 2, rank=r, world_size=3))
        for r in range(3)
    ]
    lens = [len(b) for b in per_rank]
    assert lens == [2, 2, 2]  # equal step counts
    seen = np.concatenate([np.concatenate(b) for b in per_rank])
    assert set(seen.tolist()) == set(range(10))
    # factory
    ds = dataloading.create_tensorized_dataset(
        np.arange(8), 2, use_ddp=True, rank=1, world_size=2
    )
    assert isinstance(ds, dataloading.DDPTensorizedDataset)


def test_node_collator(g):
    sampler = dataloading.NeighborSampler([3, 3], seed=0)
    coll = dataloading.NodeCollator(g, np.arange(10), sampler)
    input_nodes, output_nodes, blocks = coll.collate([0, 1, 2])
    assert np.asarray(output_nodes).tolist() == [0, 1, 2]
    assert len(blocks) == 2
    assert blocks[-1].num_dst_nodes() == 3


def test_edge_collator(g):
    sampler = dataloading.NeighborSampler([3], seed=0)
    coll = dataloading.EdgeCollator(
        g, np.arange(g.num_edges()), sampler, exclude="self",
        negative_sampler=dataloading.Uniform(2, seed=0),
    )
    out = coll.collate([0, 5, 9])
    input_nodes, pair_graph, neg_graph, blocks = out
    assert pair_graph.num_edges() == 3
    assert neg_graph.num_edges() == 6


def test_graph_collator():
    gs = [
        dgl.graph((np.array([0]), np.array([1])), num_nodes=3)
        for _ in range(4)
    ]
    labels = np.arange(4.0)
    coll = dataloading.GraphCollator()
    bg, bl = coll.collate(list(zip(gs, labels)))
    assert bg.num_nodes() == 12 and bg.num_edges() == 4
    np.testing.assert_allclose(np.asarray(bl), labels)


def test_spot_target(g):
    st = dataloading.SpotTarget(g, exclude="self", degree_threshold=1000)
    seed_edges = np.array([0, 1, 2])
    excl = st(seed_edges)
    # threshold higher than any degree: everything excluded
    assert np.asarray(excl).tolist() == [0, 1, 2]
    st0 = dataloading.SpotTarget(g, exclude="self", degree_threshold=0)
    assert np.asarray(st0(seed_edges)).size == 0
    # as exclusion callable inside the edge-prediction sampler
    sampler = dataloading.NeighborSampler([3], seed=0)
    eps = dataloading.as_edge_prediction_sampler(sampler, exclude=st)
    input_nodes, pair_graph, blocks = eps.sample(g, seed_edges)
    assert pair_graph.num_edges() == 3


def test_capped_neighbor_sampler(g):
    sampler = dataloading.CappedNeighborSampler(
        [5, 5], fixed_k=7, upsample_rare_types=False, seed=0
    )
    input_nodes, output_nodes, subg = sampler.sample(g, np.arange(4))
    assert np.asarray(output_nodes).tolist() == [0, 1, 2, 3]
    # input_nodes align with the subgraph rows: feat[input_nodes] works
    np.testing.assert_array_equal(
        np.asarray(input_nodes), np.asarray(subg.ndata[NID])
    )
    assert np.asarray(input_nodes).shape[0] == subg.num_nodes()
    # induced subgraph contains all the seeds
    nid = set(np.asarray(subg.ndata[NID]).tolist())
    assert {0, 1, 2, 3} <= nid
    # capping bounds growth: at most seeds + fixed_k per layer
    assert subg.num_nodes() <= 4 + 7 * 2


def test_dist_edge_dataloader():
    from dgl_tpu.distributed import (
        DistEdgeDataLoader, PartitionedGraphCSC,
        metis_partition_assignment,
    )

    rng = np.random.default_rng(0)
    src = rng.integers(0, 40, 300)
    dst = rng.integers(0, 40, 300)
    g = dgl.graph((src, dst), num_nodes=40)
    parts = metis_partition_assignment(g, 2)
    pg = PartitionedGraphCSC.build(g, parts, 2)
    # train edges in new-id space
    new = np.asarray(pg.new_of_old)
    edges_new = np.stack([new[src[:50]], new[dst[:50]]], 1)
    loader = DistEdgeDataLoader(
        pg, edges_new, fanouts=[3], batch_size=4, num_negatives=2, seed=0
    )
    steps = 0
    for pos, neg, seeds, pidx, nidx, in_nodes, blocks in loader:
        steps += 1
        P, B = pos.shape[0], pos.shape[1]
        assert P == 2 and B == 4
        assert neg.shape == (2, 4, 2)
        # every non-padding endpoint resolves to its own id via seeds[pidx]
        pos_np, seeds_np, pidx_np = (np.asarray(x) for x in (pos, seeds, pidx))
        for p in range(P):
            valid = pos_np[p] >= 0
            got = seeds_np[p][pidx_np[p]]
            assert (got[valid] == pos_np[p][valid]).all()
        assert len(blocks) == 1
    assert steps == len(loader) > 0


def test_worker_storage_columns(g):
    from dgl_tpu.dataloading import (
        remove_parent_storage_columns, restore_parent_storage_columns,
        CollateWrapper,
    )
    from dgl_tpu.subgraph import edge_subgraph

    # relabel_nodes=False keeps the node frames SHARED with the parent
    sub = edge_subgraph(g, np.arange(50), relabel_nodes=False)
    nt = g.ntypes[0]
    assert sub._node_frames[nt]["feat"] is g._node_frames[nt]["feat"]
    stripped = remove_parent_storage_columns(sub, g)
    assert isinstance(stripped._node_frames[nt]["feat"], tuple)
    restored = restore_parent_storage_columns(stripped, g)
    assert restored._node_frames[nt]["feat"] is g._node_frames[nt]["feat"]

    # CollateWrapper runs the sampler and strips shared columns
    sampler = dataloading.NeighborSampler([3], seed=0)

    def sample(graph, items):
        return sampler.sample_blocks(graph, np.asarray(items))

    cw = CollateWrapper(sample, g, use_uva=False, device=None)
    input_nodes, output_nodes, blocks = cw([0, 1, 2])
    assert len(blocks) == 1


def test_dist_loader_aliases():
    from dgl_tpu import dataloading as dl
    from dgl_tpu import distributed as dist

    assert dl.DistDataLoader is dl.DataLoader
    assert dl.DistNodeDataLoader is dist.DistNodeDataLoader
    assert dl.DistEdgeDataLoader is dist.DistEdgeDataLoader


def test_sparse_grad_optimizer_base():
    import jax
    import jax.numpy as jnp
    from dgl_tpu import optim
    from dgl_tpu.nn.sparse_emb import NodeEmbedding

    emb = NodeEmbedding(10, 4, "e", init_func=lambda arr: arr)
    opt = optim.SparseAdagrad([emb], lr=0.1)
    assert isinstance(opt, optim.SparseGradOptimizer)
    ids = jnp.array([1, 3])
    grads = jnp.ones((2, 4))
    before = np.asarray(emb.weight).copy()
    opt.step([(ids, grads)])
    after = np.asarray(emb.weight)
    assert (after[1] != before[1]).all() and (after[0] == before[0]).all()
    opt.zero_grad()  # no-op, must exist
