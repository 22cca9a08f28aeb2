"""Generate the tiny real-format fixture files checked in under
``tests/fixtures/``. Deterministic; re-run to regenerate:

    python tests/fixtures/make_fixtures.py

Each fixture mirrors the reference's extracted archive layout so the
real parse paths in ``dgl_tpu/data/parsers.py`` are exercised end to
end (TU text files, qm9_eV.npz, KG triple dirs, RDF N-Triples + split
TSVs, MovieLens u.data, the OGB raw csv.gz layout).
"""
import gzip
import os

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def write(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write(text)


def write_gz(path, text):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with gzip.open(path, "wt") as f:
        f.write(text)


def make_tu():
    # 3 graphs: triangle (label 1), 4-path (label -1), 4-cycle (label 1).
    # 1-based ids, as in the real TU files; labels use the raw {-1, 1}
    # convention to exercise densification.
    root = os.path.join(HERE, "tu", "MUTAG")
    edges = [
        # graph 1: nodes 1-3 triangle (bidirected)
        (1, 2), (2, 1), (2, 3), (3, 2), (3, 1), (1, 3),
        # graph 2: nodes 4-7 path
        (4, 5), (5, 4), (5, 6), (6, 5), (6, 7), (7, 6),
        # graph 3: nodes 8-11 cycle
        (8, 9), (9, 8), (9, 10), (10, 9), (10, 11), (11, 10),
        (11, 8), (8, 11),
    ]
    write(os.path.join(root, "MUTAG_A.txt"),
          "".join(f"{a}, {b}\n" for a, b in edges))
    indicator = [1] * 3 + [2] * 4 + [3] * 4
    write(os.path.join(root, "MUTAG_graph_indicator.txt"),
          "".join(f"{i}\n" for i in indicator))
    write(os.path.join(root, "MUTAG_graph_labels.txt"), "1\n-1\n1\n")
    node_labels = [0, 1, 2, 0, 1, 1, 0, 2, 2, 1, 0]
    write(os.path.join(root, "MUTAG_node_labels.txt"),
          "".join(f"{x}\n" for x in node_labels))
    write(os.path.join(root, "MUTAG_edge_labels.txt"),
          "".join(f"{i % 3}\n" for i in range(len(edges))))


def make_qm9():
    rng = np.random.default_rng(7)
    N = np.array([3, 5, 4], np.int64)
    total = int(N.sum())
    R = rng.normal(0, 1.0, (total, 3)).astype(np.float32)
    Z = rng.integers(1, 9, total).astype(np.int64)
    keys = ["mu", "alpha", "homo", "lumo", "gap", "r2", "zpve", "U0",
            "U", "H", "G", "Cv"]
    data = {"N": N, "R": R, "Z": Z}
    for i, k in enumerate(keys):
        data[k] = (rng.normal(0, 1, len(N)) + i).astype(np.float32)
    os.makedirs(os.path.join(HERE, "qm9"), exist_ok=True)
    np.savez(os.path.join(HERE, "qm9", "qm9_eV.npz"), **data)


def make_kg():
    root = os.path.join(HERE, "kg", "FB15k-237")
    ents = [f"/m/e{i}" for i in range(8)]
    rels = ["/film/director", "/people/nationality", "/location/contains"]
    write(os.path.join(root, "entities.dict"),
          "".join(f"{i}\t{e}\n" for i, e in enumerate(ents)))
    write(os.path.join(root, "relations.dict"),
          "".join(f"{i}\t{r}\n" for i, r in enumerate(rels)))
    rng = np.random.default_rng(3)
    triples = [(ents[rng.integers(8)], rels[rng.integers(3)],
                ents[rng.integers(8)]) for _ in range(20)]
    for split, sl in (("train", slice(0, 14)), ("valid", slice(14, 17)),
                      ("test", slice(17, 20))):
        write(os.path.join(root, f"{split}.txt"),
              "".join(f"{h}\t{r}\t{t}\n" for h, r, t in triples[sl]))


def make_rdf():
    root = os.path.join(HERE, "rdf", "aifb")
    P = "http://www.aifb.uni-karlsruhe.de"
    O = "http://swrc.ontoware.org/ontology"
    lines = []
    # 4 persons in 2 groups, publications linking them
    for i in range(4):
        grp = i % 2 + 1
        lines.append(f"<{P}/Personen/id{i}instance> <{O}#memberOf> "
                     f"<{P}/Gruppen/id{grp}instance> .")
    for j in range(3):
        a, b = j, (j + 1) % 4
        lines.append(f"<{P}/Publikationen/id{j}pub> <{O}#author> "
                     f"<{P}/Personen/id{a}instance> .")
        lines.append(f"<{P}/Publikationen/id{j}pub> <{O}#author> "
                     f"<{P}/Personen/id{b}instance> .")
    lines.append(f'<{P}/Personen/id0instance> <{O}#name> "Alice" .')
    write(os.path.join(root, "fixture.nt"), "\n".join(lines) + "\n")
    write(
        os.path.join(root, "trainingSet.tsv"),
        "person\tid\tlabel_affiliation\n"
        + f"{P}/Personen/id0instance\t0\t{P}/Gruppen/id1instance\n"
        + f"{P}/Personen/id1instance\t1\t{P}/Gruppen/id2instance\n"
        + f"{P}/Personen/id2instance\t2\t{P}/Gruppen/id1instance\n",
    )
    write(
        os.path.join(root, "testSet.tsv"),
        "person\tid\tlabel_affiliation\n"
        + f"{P}/Personen/id3instance\t3\t{P}/Gruppen/id2instance\n",
    )


def make_movielens():
    root = os.path.join(HERE, "movielens", "ml-100k")
    rng = np.random.default_rng(11)
    rows = []
    for _ in range(30):
        rows.append((int(rng.integers(1, 6)), int(rng.integers(1, 9)),
                     int(rng.integers(1, 6)), int(rng.integers(8e8, 9e8))))
    write(os.path.join(root, "u.data"),
          "".join(f"{u}\t{i}\t{r}\t{t}\n" for u, i, r, t in rows))


def make_ogb():
    root = os.path.join(HERE, "ogb", "ogbn_arxiv")
    rng = np.random.default_rng(5)
    n, e, d = 12, 30, 4
    edges = rng.integers(0, n, (e, 2))
    write_gz(os.path.join(root, "raw", "edge.csv.gz"),
             "".join(f"{a},{b}\n" for a, b in edges))
    write_gz(os.path.join(root, "raw", "num-node-list.csv.gz"), f"{n}\n")
    feat = rng.normal(0, 1, (n, d))
    write_gz(os.path.join(root, "raw", "node-feat.csv.gz"),
             "".join(",".join(f"{x:.6f}" for x in row) + "\n"
                     for row in feat))
    labels = rng.integers(0, 3, n)
    write_gz(os.path.join(root, "raw", "node-label.csv.gz"),
             "".join(f"{x}\n" for x in labels))
    perm = rng.permutation(n)
    for key, sl in (("train", perm[:8]), ("valid", perm[8:10]),
                    ("test", perm[10:])):
        write_gz(os.path.join(root, "split", "time", f"{key}.csv.gz"),
                 "".join(f"{x}\n" for x in sl))


def make_ogb_mid():
    """A mid-size raw-OGB-format fixture with planted class signal so the
    parse -> train -> accuracy path (tests/test_real_train.py) produces a
    meaningful accuracy, not just a smoke test: 3k nodes, homophilous SBM
    edges, class-centroid features, real csv.gz layout."""
    root = os.path.join(HERE, "ogb", "ogbn_arxiv_mid")
    rng = np.random.default_rng(11)
    n, e, d, c = 3000, 12000, 32, 5
    labels = rng.integers(0, c, n)
    src = rng.integers(0, n, e)
    same = rng.random(e) < 0.7
    order = np.argsort(labels, kind="stable")
    starts = np.searchsorted(labels[order], np.arange(c + 1))
    lo = starts[labels[src]]
    width = starts[labels[src] + 1] - lo
    dst = np.where(same, order[lo + (rng.random(e) * width).astype(int)],
                   rng.integers(0, n, e))
    write_gz(os.path.join(root, "raw", "edge.csv.gz"),
             "".join(f"{a},{b}\n" for a, b in zip(src, dst)))
    write_gz(os.path.join(root, "raw", "num-node-list.csv.gz"), f"{n}\n")
    cent = rng.normal(0, 1, (c, d)) * 0.6
    feat = cent[labels] + rng.normal(0, 1, (n, d))
    write_gz(os.path.join(root, "raw", "node-feat.csv.gz"),
             "".join(",".join(f"{x:.4f}" for x in row) + "\n"
                     for row in feat))
    write_gz(os.path.join(root, "raw", "node-label.csv.gz"),
             "".join(f"{x}\n" for x in labels))
    perm = rng.permutation(n)
    for key, sl in (("train", perm[:1800]), ("valid", perm[1800:2400]),
                    ("test", perm[2400:])):
        write_gz(os.path.join(root, "split", "time", f"{key}.csv.gz"),
                 "".join(f"{x}\n" for x in sl))


def make_bitcoinotc():
    """soc-sign-bitcoinotc.csv sample: SOURCE,TARGET,RATING,TIME rows
    spanning 3 fourteen-day windows."""
    root = os.path.join(HERE, "btc")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(21)
    t0 = 1_289_000_000
    lines = []
    for i in range(48):
        s, d = rng.integers(1, 25, 2)
        r = rng.integers(-10, 11)
        t = t0 + int(i // 16) * 14 * 24 * 3600 + int(rng.integers(0, 3600))
        lines.append(f"{s},{d},{r},{t}\n")
    with open(os.path.join(root, "soc-sign-bitcoinotc.csv"), "w") as f:
        f.writelines(lines)


def make_temporal_kg():
    """ICEWS18-style train.txt: head \\t rel \\t tail \\t time(hours)."""
    root = os.path.join(HERE, "tkg")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(22)
    with open(os.path.join(root, "train.txt"), "w") as f:
        for _ in range(60):
            h, t = rng.integers(0, 30, 2)
            r = rng.integers(0, 8)
            tm = int(rng.integers(0, 5)) * 24
            f.write(f"{h}\t{r}\t{t}\t{tm}\n")


def make_fraud():
    """YelpChi.mat sample: sparse per-relation adjacency + sparse
    features + label row vector (the reference's .mat layout)."""
    import scipy.sparse as sp
    from scipy import io as sio

    root = os.path.join(HERE, "fraud")
    os.makedirs(root, exist_ok=True)
    rng = np.random.default_rng(23)
    n = 60
    mats = {}
    for et in ("net_rsr", "net_rtr", "net_rur"):
        src = rng.integers(0, n, 150)
        dst = rng.integers(0, n, 150)
        mats[et] = sp.coo_matrix(
            (np.ones(150), (src, dst)), shape=(n, n)).tocsc()
    mats["features"] = sp.csc_matrix(
        rng.normal(size=(n, 12)).astype(np.float64))
    mats["label"] = (rng.random(n) < 0.2).astype(np.float64)[None, :]
    mats["homo"] = (mats["net_rsr"] + mats["net_rtr"]
                    + mats["net_rur"]).tocsc()
    sio.savemat(os.path.join(root, "YelpChi.mat"), mats)


if __name__ == "__main__":
    make_tu()
    make_qm9()
    make_kg()
    make_rdf()
    make_movielens()
    make_ogb()
    make_ogb_mid()
    make_bitcoinotc()
    make_temporal_kg()
    make_fraud()
    print("fixtures written under", HERE)
