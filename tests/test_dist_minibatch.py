"""Distributed minibatch path (distributed/dist_minibatch.py) vs single-device.

Runs on the 8-virtual-CPU mesh from conftest. Mirrors the reference's
DistDGL workflow tests (``tests/distributed/test_mp_dataloader.py``):
owner-grouped sampling must equal plain sampling, and distributed minibatch
training must match single-device training on the union of the per-rank
batches.
"""
import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

import dgl_tpu as dgl
import dgl_tpu.distributed as dist
from dgl_tpu.base import NID
from dgl_tpu.distributed.dist_minibatch import (
    DistNeighborSampler,
    DistNodeDataLoader,
    PartitionedGraphCSC,
    node_split_by_owner,
    pull_rows_in_shard_map,
)

P_PARTS = 4


def _graph(n=120, e=900, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    return dgl.graph((src, dst), num_nodes=n)


def _partition(g, p=P_PARTS):
    parts = dist.metis_partition_assignment(g, p)
    return PartitionedGraphCSC.build(g, parts, p)


def test_partition_union_and_neighbors():
    g = _graph()
    pg = _partition(g)
    rel = g._relation(None)
    E = rel.num_edges
    # every edge appears in exactly one partition
    assert sum(e.shape[0] for e in pg.eids) == E
    all_eids = np.sort(np.concatenate(pg.eids))
    np.testing.assert_array_equal(all_eids, np.arange(E))
    # in_neighbors matches the original graph (through the relabeling)
    src = np.asarray(rel.src)[:E]
    dst = np.asarray(rel.dst)[:E]
    for node_old in [0, 7, 55, 119]:
        node_new = int(pg.new_of_old[node_old])
        nbrs, _ = pg.in_neighbors(node_new)
        expect = np.sort(pg.new_of_old[src[dst == node_old]])
        np.testing.assert_array_equal(np.sort(nbrs), expect)


def test_dist_sampler_full_fanout_equals_dense_aggregation():
    g = _graph(n=80, e=500, seed=1)
    pg = _partition(g)
    max_deg = int(np.max(np.asarray(g.in_degrees())))
    sampler = DistNeighborSampler(pg, [max_deg], batch_size=16, seed=0)
    seeds_new = pg.new_of_old[np.arange(16)]
    _, out_nodes, blocks = sampler.sample_blocks(seeds_new)
    blk = blocks[0]
    # mean-aggregate features through the sampled block == true neighbor mean
    x_old = np.random.default_rng(2).normal(size=(80, 8)).astype(np.float32)
    x_new = x_old[pg.order]
    src_ids = np.asarray(blk.srcdata[NID])
    xs = jnp.asarray(x_new[src_ids]) * blk.srcdata["_mask"][:, None]
    from dgl_tpu import ops

    agg = ops.copy_u_sum(blk, xs)
    ref = ops.copy_u_sum(g, jnp.asarray(x_old))
    for i, s_new in enumerate(seeds_new):
        np.testing.assert_allclose(
            agg[i], np.asarray(ref)[int(pg.order[s_new])], rtol=1e-5, atol=1e-5
        )


def test_node_split_by_owner():
    g = _graph()
    pg = _partition(g)
    ids = np.arange(g.num_nodes())
    splits = node_split_by_owner(ids, pg.ranges, pg.num_parts)
    assert sum(len(s) for s in splits) == g.num_nodes()
    for p, s in enumerate(splits):
        assert np.all((s >= pg.ranges[p]) & (s < pg.ranges[p + 1]))


def test_pull_rows_in_shard_map():
    devs = jax.devices()[:P_PARTS]
    mesh = Mesh(np.array(devs), ("dp",))
    n_max, F = 8, 5
    ranges = np.arange(P_PARTS + 1) * n_max
    table = jnp.arange(P_PARTS * n_max * F, dtype=jnp.float32).reshape(
        P_PARTS, n_max, F
    )
    ids = jnp.asarray(
        np.random.default_rng(0).integers(0, P_PARTS * n_max, (P_PARTS, 12))
    )
    from functools import partial

    from jax.sharding import PartitionSpec as PS

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    @partial(shard_map, mesh=mesh, in_specs=(PS("dp"), PS("dp")),
             out_specs=PS("dp"))
    def run(table_blk, ids_blk):
        return pull_rows_in_shard_map(ranges, table_blk[0], ids_blk[0],
                                      "dp")[None]

    out = run(table, ids)
    flat = table.reshape(-1, F)
    np.testing.assert_allclose(out, flat[ids], rtol=1e-6)


def test_dist_minibatch_training_parity():
    """3 steps of 2-layer SAGE: distributed (4 ranks, feature pull via
    all_to_all, vmapped per-rank blocks) vs single device on the union
    batch. Full fanout -> deterministic MFGs -> identical losses."""
    import optax

    from dgl_tpu.models import GraphSAGE

    n, F, C, B = 96, 12, 4, 8
    g = _graph(n=n, e=700, seed=3)
    pg = _partition(g)
    max_deg = int(np.max(np.asarray(g.in_degrees())))
    rng = np.random.default_rng(4)
    x_old = rng.normal(size=(n, F)).astype(np.float32)
    y_old = rng.integers(0, C, n).astype(np.int32)
    x_new = x_old[pg.order]
    y_new = y_old[pg.order]

    # train ids: equal seed counts per part (balanced, shuffle off) so the
    # union-batch single-device run sees the same loss normalization
    owned = np.diff(pg.ranges)
    steps = int(min(3, owned.min() // B))
    assert steps >= 2, f"partition too imbalanced for the test: {owned}"
    train_new = np.concatenate(
        [np.arange(pg.ranges[p], pg.ranges[p] + steps * B)
         for p in range(P_PARTS)]
    )
    fanouts = [max_deg, max_deg]
    sampler = DistNeighborSampler(pg, fanouts, batch_size=B, seed=0)
    loader = DistNodeDataLoader(pg, train_new, sampler, batch_size=B,
                                shuffle=False)
    assert len(loader) == steps

    devs = jax.devices()[:P_PARTS]
    mesh = Mesh(np.array(devs), ("dp",))
    ftable = pg.shard_rows(x_old)
    ltable = pg.shard_rows(y_old.astype(np.float32)[:, None])

    model = GraphSAGE(F, 16, C, num_layers=2)
    batches = list(loader)
    in0, out0, blocks0 = batches[0]
    x0 = x_new[np.asarray(in0[0])]
    blk0 = jax.tree_util.tree_map(lambda a: a[0], blocks0)
    params0 = model.init(jax.random.PRNGKey(0), blk0, jnp.asarray(x0))
    tx = optax.sgd(0.5)

    # ---- distributed run ----
    @jax.jit
    def dist_step(params, opt_state, in_ids, out_ids, blocks):
        x = dist.sparse_all_to_all_pull(mesh, pg.ranges, ftable, in_ids,
                                        axis="dp")             # (P, S, F)
        y = dist.sparse_all_to_all_pull(
            mesh, pg.ranges, ltable, jnp.where(out_ids >= 0, out_ids, 0),
            axis="dp",
        )[..., 0].astype(jnp.int32)                            # (P, B)

        def loss_fn(p):
            def fwd(blks, xx):
                mask = blks[0].srcdata["_mask"][:, None]
                return model.apply(p, blks, xx * mask)

            logits = jax.vmap(fwd)(blocks, x)                  # (P, B+1?, C)
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits[:, : y.shape[1]], y
            )
            m = (out_ids >= 0).astype(jnp.float32)
            return (ls * m).sum() / jnp.maximum(m.sum(), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    params_d = params0
    opt_d = tx.init(params0)
    losses_d = []
    for in_ids, out_ids, blocks in batches:
        params_d, opt_d, loss = dist_step(params_d, opt_d, in_ids, out_ids,
                                          blocks)
        losses_d.append(float(loss))

    # ---- single-device run on the union of the per-rank batches ----
    params_s = params0
    opt_s = tx.init(params0)
    losses_s = []
    xg = jnp.asarray(x_new)
    for in_ids, out_ids, blocks in batches:
        def loss_fn(p):
            total, cnt = 0.0, 0.0
            for r in range(P_PARTS):
                blk = jax.tree_util.tree_map(lambda a, r=r: a[r], blocks)
                xx = xg[in_ids[r]] * blk[0].srcdata["_mask"][:, None]
                logits = model.apply(p, blk, xx)
                yr = jnp.asarray(y_new[np.asarray(out_ids[r]).clip(0)])
                m = (out_ids[r] >= 0).astype(jnp.float32)
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits[: yr.shape[0]], yr
                )
                total = total + (ls * m).sum()
                cnt = cnt + m.sum()
            return total / cnt

        loss, grads = jax.value_and_grad(loss_fn)(params_s)
        updates, opt_s = tx.update(grads, opt_s)
        params_s = optax.apply_updates(params_s, updates)
        losses_s.append(float(loss))

    np.testing.assert_allclose(losses_d, losses_s, rtol=1e-4, atol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-5),
        params_d, params_s,
    )


def test_dist_etype_neighbor_sampler():
    """Per-etype fanouts on the homogenized partitioned graph: per-seed
    type-t in-edges bounded by fanouts[t], static slot-type layout, blocks
    consumable by RelGraphConv (the DistDGL hetero minibatch workflow)."""
    import jax
    import jax.numpy as jnp

    import dgl_tpu as dgl
    from dgl_tpu import convert
    from dgl_tpu.base import EID, ETYPE, NID
    from dgl_tpu.distributed import (
        DistEtypeNeighborSampler, PartitionedGraphCSC,
        metis_partition_assignment,
    )

    rng = np.random.default_rng(0)
    n_user, n_item = 30, 20
    hg = convert.heterograph({
        ("user", "follows", "user"): (
            rng.integers(0, n_user, 120), rng.integers(0, n_user, 120)
        ),
        ("user", "rates", "item"): (
            rng.integers(0, n_user, 150), rng.integers(0, n_item, 150)
        ),
        ("item", "rev_rates", "user"): (
            rng.integers(0, n_item, 150), rng.integers(0, n_user, 150)
        ),
    })
    homo = convert.to_homogeneous(hg)
    type_per_edge = np.asarray(homo.edata[ETYPE])
    parts = metis_partition_assignment(homo, 2)
    pg = PartitionedGraphCSC.build(homo, parts, 2)
    # etype array must be mapped into the ORIGINAL edge order pg.eids uses
    fanouts = [[2, 3, 1]]
    sampler = DistEtypeNeighborSampler(
        pg, type_per_edge, fanouts, batch_size=8, seed=0
    )
    seeds = pg.new_of_old[np.arange(8)]
    input_nodes, output_nodes, blocks = sampler.sample_blocks(seeds)
    (blk,) = blocks
    # static per-slot etype layout
    slot_et = sampler.slot_etypes(0, cap_dst=9)
    assert slot_et.shape[0] == blk.num_edges()
    em = np.asarray(blk.edata["_mask"])
    eid = np.asarray(blk.edata[EID])
    # every REAL sampled edge's true type matches its slot's static type
    np.testing.assert_array_equal(
        type_per_edge[eid[em]], slot_et[em]
    )
    # per-seed per-type counts bounded by the fanout vector
    edst = np.asarray(blk._relation(None).dst)
    for s in range(8):
        for t, f in enumerate(fanouts[0]):
            cnt = int(((edst == s) & em & (slot_et == t)).sum())
            assert cnt <= f
    # RelGraphConv consumes the block + static etypes under jit
    from dgl_tpu.nn import RelGraphConv

    conv = RelGraphConv(6, 4, num_rels=3, self_loop=False)
    x = jnp.asarray(
        rng.normal(size=(int(blk.num_src_nodes()), 6)), jnp.float32
    )
    params = conv.init(
        jax.random.PRNGKey(0), blk, x, jnp.asarray(slot_et)
    )
    out = jax.jit(
        lambda p, b, xx, et: conv.apply(p, b, xx, et)
    )(params, blk, x, jnp.asarray(slot_et))
    assert out.shape == (9, 4)
    assert np.isfinite(np.asarray(out)).all()
