"""Chunked-graph dispatch pipeline (reference tools/chunk_graph.py +
tools/distpartitioning shuffle, rebuilt as a streaming single-host tool)."""
import json
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import dgl_tpu as dgl

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from chunked_dispatch import dispatch, write_chunked  # noqa: E402


@pytest.fixture
def chunked(tmp_path):
    rng = np.random.default_rng(0)
    n, e = 200, 900
    g = dgl.graph((rng.integers(0, n, e), rng.integers(0, n, e)),
                  num_nodes=n)
    g.ndata["feat"] = jnp.asarray(rng.normal(size=(n, 6)), jnp.float32)
    g.ndata["label"] = jnp.asarray(rng.integers(0, 4, n), jnp.int32)
    meta = write_chunked(g, "toy", str(tmp_path / "chunked"), num_chunks=3)
    return g, meta, tmp_path


def test_write_chunked_schema(chunked):
    g, meta_path, _ = chunked
    meta = json.load(open(meta_path))
    assert meta["edge_type"] == ["_N:_E:_N"]
    assert sum(meta["num_edges_per_chunk"][0]) == g.num_edges()
    assert sum(meta["num_nodes_per_chunk"][0]) == g.num_nodes()
    assert len(meta["edges"]["_N:_E:_N"]["data"]) == 3


def test_dispatch_preserves_graph(chunked):
    from dgl_tpu.distributed.partition import (
        load_partition, metis_partition_assignment)

    g, meta_path, tmp_path = chunked
    parts = metis_partition_assignment(g, 4)
    out = str(tmp_path / "shards")
    book = dispatch(meta_path, parts, 4, out)
    assert book["num_edges"] == g.num_edges()

    # every edge appears exactly once across parts (routed by dst owner),
    # endpoints mapped back to ORIGINAL ids via relabeling
    n = g.num_nodes()
    order = np.argsort(parts, kind="stable")
    seen = []
    ranges = np.array(book["node_ranges"])
    for p in range(4):
        sub, b = load_partition(out, p)
        new_ids = np.asarray(sub.ndata["_new_id"])
        inner = np.asarray(sub.ndata["inner_node"])
        assert inner.sum() == ranges[p + 1] - ranges[p]
        rel = sub._relation(None)
        s = np.asarray(rel.src)[: rel.num_edges]
        d = np.asarray(rel.dst)[: rel.num_edges]
        old_of_local = np.empty(new_ids.shape[0], np.int64)
        # _new_id -> old id via global order
        old_of_local = order[new_ids]
        seen.append(np.stack([old_of_local[s], old_of_local[d]], 1))
        # owned features intact
        feat = np.asarray(sub.ndata["feat"])[inner]
        want = np.asarray(g.ndata["feat"])[old_of_local[np.nonzero(inner)[0]]]
        np.testing.assert_allclose(feat, want, rtol=1e-6)
    got = np.concatenate(seen)
    src0 = np.asarray(g._relation(None).src)[: g.num_edges()]
    dst0 = np.asarray(g._relation(None).dst)[: g.num_edges()]
    want = np.stack([src0, dst0], 1)
    got_sorted = got[np.lexsort(got.T)]
    want_sorted = want[np.lexsort(want.T)]
    np.testing.assert_array_equal(got_sorted, want_sorted)
