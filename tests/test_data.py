"""Data zoo tests (mirrors reference tests/integration/test_data.py)."""
import json
import os

import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import data as D


def test_save_load_graphs(tmp_path):
    g = dgl.graph(([0, 1, 2], [1, 2, 0]))
    g.ndata["x"] = jnp.arange(6.0).reshape(3, 2)
    g.edata["w"] = jnp.arange(3.0)
    g2 = dgl.heterograph(
        {
            ("user", "plays", "game"): ([0, 1], [0, 1]),
        }
    )
    path = str(tmp_path / "graphs.npz")
    D.save_graphs(path, [g, g2], labels={"y": np.array([1.0, 2.0])})
    graphs, labels = D.load_graphs(path)
    assert len(graphs) == 2
    assert graphs[0].num_nodes() == 3
    np.testing.assert_allclose(np.asarray(graphs[0].ndata["x"]), np.arange(6.0).reshape(3, 2))
    np.testing.assert_allclose(np.asarray(graphs[0].edata["w"]), np.arange(3.0))
    assert graphs[1].num_nodes("game") == 2
    np.testing.assert_allclose(np.asarray(labels["y"]), [1.0, 2.0])
    # partial load
    graphs, _ = D.load_graphs(path, [1])
    assert len(graphs) == 1


def test_cora_synthetic(tmp_path):
    ds = D.CoraGraphDataset(raw_dir=str(tmp_path), verbose=False)
    g = ds[0]
    assert ds.num_classes == 7
    assert g.num_nodes() == 2708
    assert g.ndata["feat"].shape == (2708, 1433)
    assert int(np.asarray(g.ndata["train_mask"]).sum()) == 140
    assert int(np.asarray(g.ndata["val_mask"]).sum()) == 500
    assert int(np.asarray(g.ndata["test_mask"]).sum()) == 1000
    # cache round-trip
    ds2 = D.CoraGraphDataset(raw_dir=str(tmp_path))
    g2 = ds2[0]
    assert g2.num_nodes() == g.num_nodes()
    np.testing.assert_allclose(
        np.asarray(g2.ndata["feat"]), np.asarray(g.ndata["feat"])
    )


def test_synthetic_dataset():
    ds = D.SyntheticDataset(num_nodes=200, num_edges=1000, num_classes=4, feat_dim=16)
    g = ds[0]
    assert g.num_nodes() == 200
    assert ds.num_classes == 4


def test_ppi_dataset():
    ds = D.PPIDataset(mode="valid")
    assert len(ds) == 2
    g = ds[0]
    assert g.ndata["label"].shape[1] == 121


def test_csv_dataset(tmp_path):
    ddir = tmp_path / "csvds"
    ddir.mkdir()
    with open(ddir / "meta.json", "w") as f:
        json.dump(
            {
                "dataset_name": "toy",
                "node_data": [{"file_name": "nodes.csv", "ntype": "_N"}],
                "edge_data": [{"file_name": "edges.csv", "etype": ["_N", "_E", "_N"]}],
            },
            f,
        )
    with open(ddir / "nodes.csv", "w") as f:
        f.write("node_id,label,feat\n")
        for i in range(4):
            f.write(f"{i},{i % 2},\"{i}.0,{i+1}.0\"\n")
    with open(ddir / "edges.csv", "w") as f:
        f.write("src_id,dst_id,weight\n0,1,0.5\n1,2,0.25\n2,3,1.0\n")
    ds = D.CSVDataset(str(ddir))
    g = ds[0]
    assert g.num_nodes() == 4 and g.num_edges() == 3
    np.testing.assert_allclose(np.asarray(g.ndata["label"]), [0, 1, 0, 1])
    assert g.ndata["feat"].shape == (4, 2)
    np.testing.assert_allclose(np.asarray(g.edata["weight"]), [0.5, 0.25, 1.0])


def test_ba_shape():
    ds = D.BAShapeDataset()
    g = ds[0]
    labels = np.asarray(g.ndata["label"])
    assert set(labels.tolist()) == {0, 1, 2, 3}


def test_dataset_repr():
    ds = D.SyntheticDataset(num_nodes=10, num_edges=20, num_classes=2, feat_dim=4)
    assert "synthetic" in repr(ds)


def test_named_extra_datasets():
    """Every reference-named dataset family instantiates with correct task
    structure."""
    from dgl_tpu import data as D

    kg = D.FB15k237Dataset()
    g = kg[0]
    assert kg.num_rels == 237
    assert int(np.asarray(g.edata["etype"]).max()) < 237
    assert kg.train.shape[1] == 3

    rdf = D.AIFBDataset()
    assert rdf.predict_category == "Personen"
    assert rdf.num_classes == 4
    assert rdf.predict_category in rdf[0].ntypes

    qm = D.QM9EdgeDataset()
    g0, y0 = qm[0]
    assert y0.shape == (19,)
    assert "R" in g0.ndata and g0.ndata["R"].shape[1] == 3
    assert "edge_attr" in g0.edata

    sst = D.SSTDataset()
    t0 = sst[0]
    # leaves have words, internal nodes are PAD
    x = np.asarray(t0.ndata["x"])
    assert (x == -1).any() and (x >= 0).any()
    # tree: every non-root node has exactly one out-edge
    deg = np.asarray(t0.out_degrees())
    assert (deg <= 1).all() and (deg == 0).sum() == 1

    btc = D.BitcoinOTCDataset()
    assert len(btc) == 10 and btc.is_temporal
    w = np.asarray(btc[0].edata["h"])
    assert w.min() >= -10 and w.max() <= 10

    ml = D.MovieLensDataset()[0]
    assert ("user", "rates", "movie") in ml.canonical_etypes

    pat = D.PATTERNDataset()
    g = pat[3]
    assert "label" in g.ndata and pat.num_classes == 2

    assert D.QM9 is D.QM9Dataset and D.DGLBuiltinDataset is D.DGLDataset


def test_rdf_dataset_message_passing():
    """Regression: the renamed predict-category graph must be fully
    functional (stale-etype bug caught by probing update_all)."""
    import dgl_tpu.function as fn
    from dgl_tpu import data as D

    ds = D.AIFBDataset()
    g = ds[0]
    assert not any("paper" in c for c in g.canonical_etypes)
    gl = g.local_var()
    for nt in gl.ntypes:
        gl._node_frames.setdefault(nt, {})["h"] = jnp.ones(
            (gl.num_nodes(nt), 4)
        )
    gl.multi_update_all(
        {cet: (fn.copy_u("h", "m"), fn.sum("m", "agg"))
         for cet in gl.canonical_etypes},
        "sum",
    )
    agg = gl._node_frames[ds.predict_category]["agg"]
    assert np.isfinite(np.asarray(agg)).all()


def test_heterophilous_datasets(tmp_path):
    from dgl_tpu.data import RomanEmpireDataset, MinesweeperDataset

    ds = MinesweeperDataset()
    g = ds[0]
    assert g.num_nodes() == 10000 and ds.num_classes == 2
    # real parser path: write the published npz layout and reload
    import numpy as np

    n, e = 30, 60
    rng = np.random.default_rng(0)
    np.savez(
        tmp_path / "minesweeper.npz",
        edges=np.stack(
            [rng.integers(0, n, e), rng.integers(0, n, e)], 1
        ),
        node_features=rng.normal(size=(n, 7)).astype(np.float32),
        node_labels=rng.integers(0, 2, n),
        train_masks=rng.random((10, n)) < 0.5,
        val_masks=rng.random((10, n)) < 0.25,
        test_masks=rng.random((10, n)) < 0.25,
    )
    real = MinesweeperDataset(raw_dir=str(tmp_path))
    g2 = real[0]
    assert g2.num_nodes() == n
    assert g2.ndata["train_mask"].shape == (n, 10)
    assert g2.ndata["feat"].shape == (n, 7)
    # bidirected structure
    import dgl_tpu as dgl

    assert dgl.is_bidirected(g2)


def test_data_utils_surface():
    import numpy as np
    import dgl_tpu as dgl
    from dgl_tpu.data import (
        idx2mask, generate_mask_tensor, Subset, add_nodepred_split,
        add_node_property_split, negative_sample, sbm,
        mask_nodes_by_property, build_knowledge_graph,
        compute_adjacency_matrix_images, compute_edges_list,
        load_yaml_with_sanity_check,
    )

    m = idx2mask([1, 3], 5)
    assert m.tolist() == [0, 1, 0, 1, 0]
    t = generate_mask_tensor(m)
    assert t.dtype == bool
    from dgl_tpu.data import MiniGCDataset

    ds = MiniGCDataset(8, 6, 10, seed=0)
    sub = Subset(ds, [0, 3])
    assert len(sub) == 2
    from dgl_tpu.data import CoraGraphDataset

    cds = CoraGraphDataset()
    add_nodepred_split(cds, [0.8, 0.1, 0.1], seed=0)
    g = cds[0]
    tm = np.asarray(g.ndata["train_mask"])
    assert 0 < tm.sum() < g.num_nodes()
    add_node_property_split(cds, [0.3, 0.1, 0.1, 0.3, 0.2], "popularity")
    assert "out_test_mask" in cds[0].ndata
    # negatives avoid existing edges and self loops
    neg = negative_sample(g, 50, seed=0)
    assert neg.shape[0] == 2 and neg.shape[1] <= 50
    assert not np.asarray(g.has_edges_between(neg[0], neg[1])).any()
    assert (neg[0] != neg[1]).all()
    A = sbm(3, 10, 8.0, 1.0, rng=np.random.RandomState(0))
    assert A.shape == (30, 30)
    masks = mask_nodes_by_property(np.arange(20.0), [0.2] * 5, 0)
    assert sum(int(np.asarray(v).sum()) for v in masks.values()) == 20
    kg = build_knowledge_graph(
        10, 2, np.array([[0, 0, 1], [2, 1, 3]]), None, None
    )
    assert len(kg.canonical_etypes) == 4  # 2 rels + reverses
    Aimg = compute_adjacency_matrix_images(
        np.random.default_rng(0).random((12, 2)),
        np.random.default_rng(1).random((12, 3)),
    )
    knns, vals = compute_edges_list(Aimg, kth=5)
    assert knns.shape[0] == 12
    # meta file sanity check (JSON twin of meta.yaml)
    import json, tempfile, os

    with tempfile.TemporaryDirectory() as d:
        p = os.path.join(d, "meta.json")
        with open(p, "w") as f:
            json.dump({
                "dataset_name": "demo",
                "node_data": [{"file_name": "nodes.csv"}],
                "edge_data": [{"file_name": "edges.csv"}],
            }, f)
        meta = load_yaml_with_sanity_check(p)
        assert meta.dataset_name == "demo"
        assert meta.node_data[0].ntype == "_V"


def test_csv_constructor_classes(tmp_path):
    import numpy as np
    from dgl_tpu.data import (
        MetaNode, MetaEdge, NodeData, EdgeData, DGLGraphConstructor,
        DefaultDataParser,
    )

    with open(tmp_path / "nodes.csv", "w") as f:
        f.write("node_id,feat\n0,\"1.0,2.0\"\n1,\"3.0,4.0\"\n2,\"5.0,6.0\"\n")
    with open(tmp_path / "edges.csv", "w") as f:
        f.write("src_id,dst_id,w\n0,1,0.5\n1,2,0.25\n")
    nd = NodeData.load_from_csv(MetaNode("nodes.csv"), str(tmp_path))
    ed = EdgeData.load_from_csv(MetaEdge("edges.csv"), str(tmp_path))
    assert nd.id.tolist() == [0, 1, 2]
    graphs, gdata = DGLGraphConstructor.construct_graphs(nd, ed)
    assert len(graphs) == 1
    g = graphs[0]
    assert g.num_nodes() == 3 and g.num_edges() == 2
    np.testing.assert_allclose(np.asarray(g.edata["w"]), [0.5, 0.25])
    np.testing.assert_allclose(
        np.asarray(g.ndata["feat"]), [[1, 2], [3, 4], [5, 6]]
    )


def test_serialize_versioned_loaders(tmp_path):
    import numpy as np
    import jax.numpy as jnp
    import dgl_tpu as dgl
    from dgl_tpu.data import (
        save_graphs, load_graph_v1, load_graph_v2, load_labels,
        load_tensors, save_tensors, storage_metadata,
    )

    g = dgl.graph((np.array([0, 1]), np.array([1, 2])), num_nodes=3)
    p = str(tmp_path / "g.npz")
    save_graphs(p, [g], {"y": jnp.arange(3.0)})
    gs, labels = load_graph_v2(p)
    assert gs[0].num_edges() == 2
    gs1, _ = load_graph_v1(p)
    assert gs1[0].num_nodes() == 3
    lab = load_labels(p)
    np.testing.assert_allclose(np.asarray(lab["y"]), [0, 1, 2])
    meta = storage_metadata(p)
    assert meta.num_graphs == 1 and "y" in meta.labels
    tp = str(tmp_path / "t.npz")
    save_tensors(tp, {"a": jnp.ones(4)})
    back = load_tensors(tp)
    np.testing.assert_allclose(np.asarray(back["a"]), 1.0)


def test_lrgb_and_motif_datasets():
    import numpy as np
    from dgl_tpu.data import (
        PeptidesFunctionalDataset, VOCSuperpixelsDataset,
        BA2MotifDataset, BACommunityDataset, CoraBinary,
    )

    pf = PeptidesFunctionalDataset(num_graphs=6)
    g, y = pf[0]
    assert y.shape == (10,) and pf.num_tasks == 10
    voc = VOCSuperpixelsDataset(num_graphs=2)
    assert voc.num_classes == 21 and "label" in voc[0].ndata
    ba2 = BA2MotifDataset(num_graphs=4)
    labels = {int(ba2[i][1]) for i in range(4)}
    assert labels <= {0, 1}
    bc = BACommunityDataset()
    assert bc.num_classes == 8
    lab = np.asarray(bc[0].ndata["label"])
    assert lab.max() == 7  # both communities' roles present
    cb = CoraBinary(num_pairs=2)
    g1, pm, label = cb[1]
    assert pm.shape[0] == g1.num_nodes()
