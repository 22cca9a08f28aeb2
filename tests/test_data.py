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
