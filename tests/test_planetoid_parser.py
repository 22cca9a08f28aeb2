"""Real planetoid-format parsing: generate a file set in the planetoid
layout and parse it through CitationGraphDataset(synthetic=False)."""
import os
import pickle

import numpy as np
import pytest
import scipy.sparse as sp

from dgl_tpu.data import CitationGraphDataset


def _write_planetoid(dirpath, name, n_train=20, n_all=80, n_test=20,
                     feat_dim=10, classes=3, seed=0):
    rng = np.random.default_rng(seed)
    n = n_all + n_test

    def onehot(labels):
        oh = np.zeros((labels.shape[0], classes))
        oh[np.arange(labels.shape[0]), labels] = 1
        return oh

    labels = rng.integers(0, classes, n)
    feats = sp.csr_matrix(
        (rng.random((n, feat_dim)) < 0.2).astype(np.float32)
    )
    # permuted test index; planetoid stores tx/ty rows in FILE order of
    # test.index (shuffled), the parser restores positional order
    test_idx = n_all + rng.permutation(n_test)
    allx = feats[:n_all]
    tx = feats[test_idx]
    x = feats[:n_train]
    y = onehot(labels[:n_train])
    ally = onehot(labels[:n_all])
    ty = onehot(labels[test_idx])
    graph = {
        int(i): [int(v) for v in rng.integers(0, n, 3)] for i in range(n)
    }
    os.makedirs(dirpath, exist_ok=True)
    for suffix, obj in (
        ("x", x), ("y", y), ("tx", tx), ("ty", ty),
        ("allx", allx), ("ally", ally), ("graph", graph),
    ):
        with open(os.path.join(dirpath, f"ind.{name}.{suffix}"), "wb") as f:
            pickle.dump(obj, f)
    np.savetxt(
        os.path.join(dirpath, f"ind.{name}.test.index"), test_idx, fmt="%d"
    )
    return feats, labels, test_idx


def test_parse_planetoid_files(tmp_path, monkeypatch):
    name = "cora"  # reuse a known name so the stats table applies
    raw = tmp_path / "raw"
    feats, labels, test_idx = _write_planetoid(str(raw / name), name)
    ds = CitationGraphDataset(
        name, raw_dir=str(raw), synthetic=False, reverse_edge=False,
        force_reload=True,
    )
    g = ds[0]
    assert g.num_nodes() == 100
    # features on sorted positions must round-trip (test rows reordered by
    # the parser into their index positions)
    got = np.asarray(g.ndata["feat"])
    dense = np.asarray(feats.todense())
    # the parser must restore every node's own features/labels
    np.testing.assert_allclose(got, dense)
    got_labels = np.asarray(g.ndata["label"])
    np.testing.assert_array_equal(got_labels, labels)
    assert int(np.asarray(g.ndata["train_mask"]).sum()) == 20
    assert int(np.asarray(g.ndata["test_mask"]).sum()) == 20
