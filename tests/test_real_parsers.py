"""Real-format parser tests over the checked-in fixture files.

Each test drives a dataset class through the SAME parse path real data
takes (reference formats: tu.py text family, qm9_eV.npz,
knowledge_graph.py triple dirs, rdf.py N-Triples + split TSVs,
movielens.py u.data, OGB's raw csv.gz layout) — synthetic fallbacks are
NOT used here.
"""
import os

import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu.data import (
    AIFBDataset,
    FB15k237Dataset,
    MovieLensDataset,
    QM9Dataset,
    TUDataset,
    from_ogb,
)
from dgl_tpu.data import parsers

FIX = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures")


# -- TU -----------------------------------------------------------------


def test_tu_parses_real_files():
    ds = TUDataset(name="MUTAG", raw_dir=os.path.join(FIX, "tu"))
    assert len(ds) == 3
    g0, y0 = ds[0]
    g1, y1 = ds[1]
    g2, y2 = ds[2]
    assert [g.num_nodes() for g in (g0, g1, g2)] == [3, 4, 4]
    assert [g.num_edges() for g in (g0, g1, g2)] == [6, 6, 8]
    # raw labels {-1, 1} densified to {0, 1}
    assert [int(y0), int(y1), int(y2)] == [1, 0, 1]
    assert ds.num_classes == 2
    # one-hot node-label features (3 distinct labels)
    assert g0.ndata["feat"].shape == (3, 3)
    assert np.allclose(np.asarray(g0.ndata["feat"]).sum(1), 1.0)
    assert ds.max_num_node == 4
    # edges are local to each graph
    assert int(np.asarray(g2._relation(None).src).max()) < 4


def test_tu_falls_back_to_synthetic_without_files():
    ds = TUDataset(name="ENZYMES")  # no raw files anywhere
    assert len(ds) == 120


# -- QM9 ----------------------------------------------------------------


def test_qm9_parses_npz():
    ds = QM9Dataset(raw_dir=os.path.join(FIX, "qm9"), cutoff=100.0)
    assert len(ds) == 3
    g, y = ds[0]
    assert g.num_nodes() == 3
    # cutoff=100 => complete graph minus self loops, bidirected
    assert g.num_edges() == 6
    assert g.ndata["R"].shape == (3, 3)
    assert y.shape == (12,)
    assert ds.num_tasks == 12


def test_qm9_label_keys_subset():
    ds = QM9Dataset(raw_dir=os.path.join(FIX, "qm9"),
                    label_keys=["gap", "Cv"])
    _, y = ds[0]
    assert y.shape == (2,)
    # key order respected: 'gap' fixture values center on 4, 'Cv' on 11
    raw = np.load(os.path.join(FIX, "qm9", "qm9_eV.npz"))
    assert np.isclose(float(y[0]), float(raw["gap"][0]))
    assert np.isclose(float(y[1]), float(raw["Cv"][0]))


# -- KG triples ---------------------------------------------------------


def test_kg_parses_triple_dir():
    ds = FB15k237Dataset(raw_dir=os.path.join(FIX, "kg"))
    assert ds.num_entities == 8
    assert ds.num_rels == 3
    assert ds.train.shape == (14, 3)
    assert ds.valid.shape == (3, 3)
    assert ds.test.shape == (3, 3)
    g = ds[0]
    assert g.num_nodes() == 8
    assert g.num_edges() == 14
    # etype ids map through relations.dict
    rel_names = {}
    with open(os.path.join(FIX, "kg", "FB15k-237", "relations.dict")) as f:
        for line in f:
            i, name = line.strip().split("\t")
            rel_names[name] = int(i)
    with open(os.path.join(FIX, "kg", "FB15k-237", "train.txt")) as f:
        first = f.readline().strip().split("\t")
    assert int(np.asarray(g.edata["etype"])[0]) == rel_names[first[1]]


def test_kg_dict_files_define_id_space():
    n_ent, n_rel, train, valid, test = parsers.parse_kg_dir(
        os.path.join(FIX, "kg")
    )
    assert train[:, 1].max() < n_rel
    assert max(train[:, 0].max(), train[:, 2].max()) < n_ent


# -- RDF ----------------------------------------------------------------


def test_rdf_ntriples_parser():
    triples = parsers.parse_ntriples(
        os.path.join(FIX, "rdf", "aifb", "fixture.nt")
    )
    assert len(triples) == 11
    # literal object stripped to its lexical form
    lits = [o for _, _, o in triples if o.startswith("_literal:")]
    assert lits == ["_literal:Alice"]


def test_aifb_parses_real_rdf():
    ds = AIFBDataset(raw_dir=os.path.join(FIX, "rdf", "aifb"))
    g = ds[0]
    assert ds.predict_category == "Personen"
    assert "Personen" in g.ntypes and "Gruppen" in g.ntypes
    assert g.num_nodes("Personen") == 4
    labels = np.asarray(g.nodes["Personen"].data["label"])
    train_mask = np.asarray(g.nodes["Personen"].data["train_mask"])
    test_mask = np.asarray(g.nodes["Personen"].data["test_mask"])
    assert train_mask.sum() == 3 and test_mask.sum() == 1
    assert not np.any(train_mask & test_mask)
    assert set(labels[train_mask | test_mask]) == {0, 1}
    assert ds.num_classes == 2
    # reverse relations inserted (reference insert_reverse=True default)
    assert any(et.startswith("rev-") for _, et, _ in g.canonical_etypes)


# -- MovieLens ----------------------------------------------------------


def test_movielens_parses_u_data():
    ds = MovieLensDataset(raw_dir=os.path.join(FIX, "movielens"))
    g = ds[0]
    assert set(g.ntypes) == {"user", "movie"}
    assert g.num_edges(("user", "rates", "movie")) == 30
    ratings = np.asarray(
        g.edges_view[("user", "rates", "movie")].data["rating"]
    )[:30]
    raw = np.loadtxt(os.path.join(FIX, "movielens", "ml-100k", "u.data"),
                     dtype=np.int64)
    assert np.array_equal(ratings, raw[:, 2].astype(np.float32))
    assert "timestamp" in g.edges_view[("user", "rates", "movie")].data


# -- OGB raw layout -----------------------------------------------------


def test_from_ogb_parses_raw_layout():
    g = from_ogb("ogbn-arxiv", root=os.path.join(FIX, "ogb"))
    assert g.num_nodes() == 12
    assert g.num_edges() == 30
    assert g.ndata["feat"].shape == (12, 4)
    tr = np.asarray(g.ndata["train_mask"])
    va = np.asarray(g.ndata["val_mask"])
    te = np.asarray(g.ndata["test_mask"])
    assert tr.sum() == 8 and va.sum() == 2 and te.sum() == 2
    assert not np.any(tr & va) and not np.any(tr & te)
    labels = np.asarray(g.ndata["label"])
    assert labels.shape == (12,) and labels.max() <= 2


def test_from_ogb_missing_root_raises():
    with pytest.raises(dgl.DGLError):
        from_ogb("ogbn-products", root="/nonexistent")


# -- round-3 long-tail real formats -----------------------------------------


def test_bitcoinotc_real_csv():
    from dgl_tpu.data.named_extra import BitcoinOTCDataset

    ds = BitcoinOTCDataset(raw_dir=os.path.join(FIX, "btc"))
    assert len(ds) >= 2  # 3 windows -> >=2 cumulative snapshots
    g0, gl = ds[0], ds[len(ds) - 1]
    assert gl.num_edges() > g0.num_edges()  # cumulative growth
    w = np.asarray(gl.edata["h"])
    assert w.min() >= -10 and w.max() <= 10 and (w != 0).any()


def test_icews_style_temporal_kg_real_tsv():
    from dgl_tpu.data.named_extra import ICEWS18Dataset

    ds = ICEWS18Dataset(mode="train", raw_dir=os.path.join(FIX, "tkg"))
    assert len(ds) == 5  # 5 day buckets in the fixture
    g = ds[len(ds) - 1]
    raw = np.loadtxt(os.path.join(FIX, "tkg", "train.txt"),
                     delimiter="\t").astype(np.int64)
    assert g.num_edges() == raw.shape[0]  # last cumulative graph = all
    rt = np.asarray(g.edata["rel_type"])[: g.num_edges()]
    assert set(np.unique(rt)) <= set(range(8))
    assert ds[0].num_edges() < g.num_edges()


def test_fraud_real_mat():
    from scipy import io as sio

    from dgl_tpu.data.named_extra import FraudYelpDataset

    ds = FraudYelpDataset(raw_dir=os.path.join(FIX, "fraud"))
    g = ds[0]
    raw = sio.loadmat(os.path.join(FIX, "fraud", "YelpChi.mat"))
    n = raw["features"].shape[0]
    assert g.num_nodes("review") == n
    assert set(g.etypes) == {"net_rsr", "net_rtr", "net_rur"}
    feat = np.asarray(g.nodes["review"].data["feature"])
    np.testing.assert_allclose(
        feat, np.asarray(raw["features"].todense(), np.float32), rtol=1e-6)
    labels = np.asarray(g.nodes["review"].data["label"])
    np.testing.assert_array_equal(labels,
                                  raw["label"].squeeze().astype(np.int32))
    tm = np.asarray(g.nodes["review"].data["train_mask"])
    assert 0 < tm.sum() < n


def test_ppi_real_layout(tmp_path):
    """Real PPI layout (GraphSAGE distribution; reference data/ppi.py):
    node-link json + feats/labels/graph_id npy -> per-component graphs."""
    import json

    rng = np.random.default_rng(0)
    n = 40
    gid = np.repeat([0, 1], [25, 15])
    nodes = [{"id": int(i)} for i in range(n)]
    links = []
    for _ in range(120):
        a, b = rng.integers(0, n, 2)
        if gid[a] == gid[b]:
            links.append({"source": int(a), "target": int(b)})
    json.dump({"nodes": nodes, "links": links},
              open(tmp_path / "train_graph.json", "w"))
    np.save(tmp_path / "train_feats.npy",
            rng.normal(size=(n, 50)).astype(np.float32))
    np.save(tmp_path / "train_labels.npy",
            (rng.random((n, 121)) < 0.1).astype(np.float32))
    np.save(tmp_path / "train_graph_id.npy", gid)

    from dgl_tpu.data import PPIDataset

    ds = PPIDataset(mode="train", raw_dir=str(tmp_path))
    assert len(ds) == 2
    g0, g1 = ds[0], ds[1]
    assert g0.num_nodes() == 25 and g1.num_nodes() == 15
    assert g0.ndata["feat"].shape == (25, 50)
    assert g0.ndata["label"].shape == (25, 121)
    assert g0.num_edges() + g1.num_edges() == len(links)
    # every edge stays within its component
    src, dst = (np.asarray(a) for a in g1.edges())
    assert src.max() < 15 and dst.max() < 15


def test_superpixel_real_pkl(tmp_path):
    """Real superpixel pickle (benchmarking-gnns layout; reference
    data/superpixel.py:150): (labels, [(mean_px, coord), ...]) ->
    gaussian-kNN graphs with node/edge features."""
    import pickle

    rng = np.random.default_rng(0)
    sp_data = []
    labels = []
    for i in range(5):
        n = int(rng.integers(30, 60))
        sp_data.append((rng.random((n, 1)).astype(np.float32),
                        (rng.random((n, 2)) * 28).astype(np.float32)))
        labels.append(i % 10)
    d = tmp_path / "superpixels"
    d.mkdir()
    with open(d / "mnist_75sp_train.pkl", "wb") as f:
        pickle.dump((np.asarray(labels), sp_data), f)

    from dgl_tpu.data import MNISTSuperPixelDataset

    ds = MNISTSuperPixelDataset(raw_dir=str(tmp_path), split="train")
    assert len(ds) == 5
    g0, y0 = ds[0]
    n0 = sp_data[0][0].shape[0]
    assert g0.num_nodes() == n0
    assert g0.ndata["feat"].shape == (n0, 3)  # mean_px + 2 coords
    assert g0.edata["feat"].shape[1] == 1
    # 8-NN-by-similarity construction: at most 8 out-edges per node
    src, _ = (np.asarray(a) for a in g0.edges())
    assert np.bincount(src, minlength=n0).max() <= 8
    assert int(y0) == 0


def test_sst_real_ptb_trees(tmp_path):
    """Real SST layout (reference data/tree.py): PTB s-expressions +
    vocab -> child->parent trees with word ids, labels, leaf masks."""
    (tmp_path / "vocab.txt").write_text("the\nmovie\nrocks\nbores\n")
    (tmp_path / "train.txt").write_text(
        "(3 (2 (2 the) (2 movie)) (4 rocks))\n"
        "(1 (2 (2 the) (2 movie)) (0 bores))\n")

    from dgl_tpu.data import SSTDataset

    ds = SSTDataset(mode="train", raw_dir=str(tmp_path))
    assert len(ds) == 2
    assert ds.vocab_size == 4
    g = ds[0]
    # 5 nodes: root, inner, the, movie, rocks
    assert g.num_nodes() == 5
    x = np.asarray(g.ndata["x"])
    mask = np.asarray(g.ndata["mask"])
    y = np.asarray(g.ndata["y"])
    assert mask.sum() == 3  # three leaves
    assert set(x[mask == 1].tolist()) == {0, 1, 2}
    assert y[0] == 3  # root sentiment
    # every non-root node has exactly one out-edge to its parent
    src, dst = (np.asarray(a) for a in g.edges())
    assert len(src) == 4
    out_deg = np.bincount(src, minlength=5)
    assert out_deg[0] == 0 and (out_deg[1:] == 1).all()


def test_fakenews_real_layout(tmp_path):
    """Real UPFD FakeNews layout (reference data/fakenews.py)."""
    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    gid = np.repeat([0, 1, 2], [5, 4, 6])
    n = gid.shape[0]
    src, dst = [], []
    for g_idx in range(3):
        nodes = np.nonzero(gid == g_idx)[0]
        for i in range(1, nodes.shape[0]):
            src.append(nodes[i])
            dst.append(nodes[0])  # propagation-tree shape
    np.savetxt(tmp_path / "A.txt",
               np.stack([src, dst], 1), fmt="%d", delimiter=", ")
    np.save(tmp_path / "node_graph_id.npy", gid)
    np.save(tmp_path / "graph_labels.npy", np.array([0, 1, 0]))
    np.save(tmp_path / "train_idx.npy", np.array([0]))
    np.save(tmp_path / "val_idx.npy", np.array([1]))
    np.save(tmp_path / "test_idx.npy", np.array([2]))
    sp.save_npz(tmp_path / "new_profile_feature.npz",
                sp.csr_matrix(rng.random((n, 10)).astype(np.float32)))

    from dgl_tpu.data import FakeNewsDataset

    ds = FakeNewsDataset(name="politifact", feature_name="profile",
                         raw_dir=str(tmp_path))
    assert len(ds) == 3
    g0, y0 = ds[0]
    assert g0.num_nodes() == 5 and g0.num_edges() == 4
    assert int(y0) == 0
    assert ds.feature.shape == (n, 10)
    assert np.asarray(ds.train_mask).sum() == 1


def test_graphsaint_real_layout(tmp_path):
    """Real GraphSAINT layout (reference data/flickr.py):
    adj_full.npz + feats.npy + class_map.json + role.json."""
    import json

    import scipy.sparse as sp

    rng = np.random.default_rng(0)
    n = 30
    adj = sp.random(n, n, density=0.2, format="csr",
                    random_state=1, dtype=np.float32)
    sp.save_npz(tmp_path / "adj_full.npz", adj)
    np.save(tmp_path / "feats.npy", rng.normal(size=(n, 6)))
    json.dump({str(i): int(i % 7) for i in range(n)},
              open(tmp_path / "class_map.json", "w"))
    json.dump({"tr": list(range(0, 20)), "va": list(range(20, 25)),
               "te": list(range(25, 30))},
              open(tmp_path / "role.json", "w"))

    from dgl_tpu.data import FlickrDataset

    ds = FlickrDataset(raw_dir=str(tmp_path))
    g = ds[0]
    assert g.num_nodes() == n
    assert g.num_edges() == adj.nnz
    assert g.ndata["feat"].shape == (n, 6)
    assert np.asarray(g.ndata["train_mask"]).sum() == 20
    assert int(np.asarray(g.ndata["label"])[13]) == 13 % 7


def test_wikics_real_json(tmp_path):
    """Real WikiCS data.json (reference data/wikics.py)."""
    import json

    rng = np.random.default_rng(0)
    n, T = 20, 3  # T split variants
    data = {
        "features": rng.normal(size=(n, 5)).tolist(),
        "labels": (np.arange(n) % 4).tolist(),
        "links": [[int(j) for j in rng.integers(0, n, 2)]
                  for _ in range(n)],
        "train_masks": (rng.random((T, n)) < 0.5).tolist(),
        "val_masks": (rng.random((T, n)) < 0.2).tolist(),
        "stopping_masks": (rng.random((T, n)) < 0.2).tolist(),
        "test_mask": (rng.random(n) < 0.3).tolist(),
    }
    json.dump(data, open(tmp_path / "data.json", "w"))

    from dgl_tpu.data import WikiCSDataset

    ds = WikiCSDataset(raw_dir=str(tmp_path))
    g = ds[0]
    assert g.num_nodes() == n
    assert g.ndata["feat"].shape == (n, 5)
    assert g.ndata["train_mask"].shape == (n, T)
    assert g.ndata["test_mask"].shape == (n,)
    # bidirected: every edge has its reverse
    src, dst = (np.asarray(a) for a in g.edges())
    pairs = set(zip(src.tolist(), dst.tolist()))
    assert all((b, a) in pairs for a, b in pairs)


def test_geom_gcn_real_layout(tmp_path):
    """Real geom-gcn layout (reference data/geom_gcn.py): tab-separated
    node features/labels + edges + 10 split npz files."""
    rng = np.random.default_rng(0)
    n, d = 12, 4
    lines = ["node_id\tfeature\tlabel"]
    for i in range(n):
        fv = ",".join(str(round(float(v), 3))
                      for v in rng.random(d))
        lines.append(f"{i}\t{fv}\t{i % 3}")
    (tmp_path / "out1_node_feature_label.txt").write_text(
        "\n".join(lines) + "\n")
    e_lines = ["id1\tid2"]
    for _ in range(30):
        a, b = rng.integers(0, n, 2)
        e_lines.append(f"{a}\t{b}")
    (tmp_path / "out1_graph_edges.txt").write_text(
        "\n".join(e_lines) + "\n")
    for i in range(10):
        np.savez(tmp_path / f"cornell_split_0.6_0.2_{i}.npz",
                 train_mask=(rng.random(n) < 0.6),
                 val_mask=(rng.random(n) < 0.2),
                 test_mask=(rng.random(n) < 0.2))

    from dgl_tpu.data import CornellDataset

    ds = CornellDataset(raw_dir=str(tmp_path))
    g = ds[0]
    assert g.num_nodes() == n
    assert g.num_edges() == 30
    assert g.ndata["feat"].shape == (n, d)
    assert g.ndata["train_mask"].shape == (n, 10)
    assert ds.num_classes == 3


def test_sbm_pattern_real_pkl(tmp_path):
    """Real benchmarking-gnns SBM pickle (the public distribution the
    reference re-serializes as DGL .bin; reference data/pattern.py:91):
    3 splits of dicts with dense W + node_feat + node_label."""
    import pickle

    import torch

    rng = np.random.default_rng(3)
    splits = []
    for ns in (4, 2, 2):
        samples = []
        for _ in range(ns):
            n = int(rng.integers(20, 40))
            W = (rng.random((n, n)) < 0.2).astype(np.float32)
            np.fill_diagonal(W, 0)
            samples.append({
                "W": torch.from_numpy(W),
                "rand_idx": torch.arange(n),
                "node_feat": torch.from_numpy(
                    rng.integers(0, 3, n).astype(np.int64)),
                "node_label": torch.from_numpy(
                    rng.integers(0, 2, n).astype(np.int16)),
            })
        splits.append(samples)
    with open(tmp_path / "SBM_PATTERN.pkl", "wb") as f:
        pickle.dump(splits, f)

    from dgl_tpu.data import PATTERNDataset

    ds = PATTERNDataset(mode="train", raw_dir=str(tmp_path))
    assert len(ds) == 4
    g0 = ds[0]
    W0 = splits[0][0]["W"].numpy()
    assert g0.num_nodes() == W0.shape[0]
    assert g0.num_edges() == int(W0.sum())
    np.testing.assert_array_equal(
        np.asarray(g0.ndata["label"]),
        splits[0][0]["node_label"].numpy().astype(np.int32))
    ds_test = PATTERNDataset(mode="test", raw_dir=str(tmp_path))
    assert len(ds_test) == 2


def test_lrgb_peptides_real_csv(tmp_path):
    """Real LRGB peptides CSV (reference data/lrgb.py:145,408): SMILES
    + 11 regression targets (struct) / label lists (func), parsed with
    the dependency-free SMILES reader."""
    import csv
    import gzip

    target_names = [
        "Inertia_mass_a", "Inertia_mass_b", "Inertia_mass_c",
        "Inertia_valence_a", "Inertia_valence_b", "Inertia_valence_c",
        "length_a", "length_b", "length_c", "Spherocity",
        "Plane_best_fit",
    ]
    smiles = ["CC(=O)Nc1ccc(O)cc1",          # paracetamol
              "NC(CC(=O)O)C(=O)O",           # aspartic acid
              "CC(C)C[C@@H](C(=O)O)N",       # leucine (stereo skipped)
              "C1CCCCC1N"]                   # cyclohexylamine
    rng = np.random.default_rng(5)
    with gzip.open(tmp_path / "peptide_structure_dataset.csv.gz",
                   "wt") as f:
        w = csv.writer(f)
        w.writerow(["smiles"] + target_names)
        for s in smiles:
            w.writerow([s] + [f"{v:.4f}" for v in rng.normal(size=11)])

    from dgl_tpu.data import PeptidesStructuralDataset

    ds = PeptidesStructuralDataset(raw_dir=str(tmp_path))
    assert len(ds) == 4
    g0, y0 = ds[0]
    assert g0.num_nodes() == 11  # paracetamol heavy atoms
    assert g0.ndata["feat"].shape == (11, 4)
    assert g0.edata["feat"].shape[0] == g0.num_edges()
    assert np.asarray(y0).shape == (11,)
    assert ds.num_tasks == 11
    # ring closure: the aromatic ring's 6 atoms flagged as ring members
    ring_flags = np.asarray(g0.ndata["feat"])[:, 3]
    assert ring_flags.sum() >= 2  # closure endpoints flagged

    with gzip.open(tmp_path / "peptide_multi_class_dataset.csv.gz",
                   "wt") as f:
        w = csv.writer(f)
        w.writerow(["smiles", "labels"])
        for i, s in enumerate(smiles):
            w.writerow([s, f"[{i % 10}]"])

    from dgl_tpu.data import PeptidesFunctionalDataset

    dsf = PeptidesFunctionalDataset(raw_dir=str(tmp_path))
    assert len(dsf) == 4
    _, yf = dsf[1]
    yf = np.asarray(yf)
    assert yf.shape == (10,) and yf[1] == 1.0 and yf.sum() == 1.0
