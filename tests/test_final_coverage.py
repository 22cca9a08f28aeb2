"""Coverage for late-round additions: health, workers, transforms, optim."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl


def test_health_watchdog():
    from dgl_tpu.health import DeviceTimeout, run_with_watchdog

    assert run_with_watchdog(lambda: 7, timeout_s=5) == 7
    out = run_with_watchdog(
        lambda: time.sleep(5), timeout_s=1, fallback=lambda: "fb"
    )
    assert out == "fb"
    with pytest.raises(DeviceTimeout):
        run_with_watchdog(lambda: time.sleep(5), timeout_s=1)


def test_dataloader_workers_match_serial():
    from dgl_tpu import dataloading as dl

    rng = np.random.default_rng(0)
    g = dgl.graph(
        (rng.integers(0, 500, 5000), rng.integers(0, 500, 5000)),
        num_nodes=500,
    )
    ids = np.arange(160)

    def run(nw):
        sampler = dl.FixedShapeNeighborSampler([4], batch_size=32, seed=7)
        loader = dl.DataLoader(
            g, ids, sampler, batch_size=32, num_workers=nw
        )
        return [
            np.asarray(blocks[-1]._dst_frames["_N"][dgl.NID])
            for _, _, blocks in loader
        ]

    a = run(1)
    b = run(4)
    assert len(a) == len(b) == 5
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)  # seed order preserved


def test_to_levi_and_drnl():
    from dgl_tpu.transforms import functional as F

    g = dgl.graph(([0, 1, 2], [1, 2, 3]))
    lv = F.to_levi(g)
    assert lv.num_nodes("edge") == 3
    assert lv.num_edges("belongs") == 3 and lv.num_edges("points") == 3
    gb = dgl.to_bidirected(g)
    z = np.asarray(F.double_radius_node_labeling(gb, 0, 3))
    assert z[0] == 1 and z[3] == 1
    assert (z[1:3] > 0).all()


def test_svd_pe():
    from dgl_tpu.transforms import functional as F

    g = dgl.rand_graph(10, 40, seed=0)
    pe = F.svd_pe(g, 3, random_flip=False)
    assert pe.shape == (10, 6)
    assert np.isfinite(np.asarray(pe)).all()


def test_optim_namespace():
    from dgl_tpu import optim

    table = jnp.ones((10, 4))
    st = optim.sparse_adam_init(table)
    t2, st = optim.sparse_adam_update(
        table, st, jnp.asarray([1, 2]), jnp.ones((2, 4))
    )
    assert float(jnp.abs(t2 - table).sum()) > 0


def test_named_datasets_shapes():
    from dgl_tpu.data import CornellDataset, WisconsinDataset

    for cls, n, d in ((CornellDataset, 183, 1703),
                      (WisconsinDataset, 251, 1703)):
        ds = cls()
        g = ds[0]
        assert g.num_nodes() == n
        assert g.ndata["feat"].shape[1] == d


def test_formats_and_aliases():
    g = dgl.rand_graph(5, 12, seed=0)
    f = g.formats()
    assert set(f["created"]) == {"coo", "csr", "csc"}
    assert dgl.DGLGraph is dgl.Graph
    out = dgl.apply_each({"a": jnp.ones(2)}, lambda v: v * 2)
    np.testing.assert_allclose(np.asarray(out["a"]), 2.0)


def test_public_api_parity_locked():
    """Regression guard for the round-2 parity audit: every public name of
    the audited reference modules must keep resolving (IMPLEMENTATION_
    STATUS.md records the two by-design exclusion groups)."""
    import ast
    import os

    REF = "/root/reference/python/dgl"
    if not os.path.isdir(REF):
        import pytest

        pytest.skip("reference checkout not present")

    def public_names(path):
        names = set()
        try:
            tree = ast.parse(open(path).read())
        except SyntaxError:
            return names
        for node in tree.body:
            if isinstance(node, ast.Assign):
                for t in node.targets:
                    if isinstance(t, ast.Name) and t.id == "__all__":
                        try:
                            names |= set(ast.literal_eval(node.value))
                        except Exception:
                            pass
            elif isinstance(node, (ast.FunctionDef, ast.ClassDef)):
                if not node.name.startswith("_"):
                    names.add(node.name)
        return names

    def module_public(dirpath):
        names = set()
        for root, _, files in os.walk(dirpath):
            if "mxnet" in root or "tensorflow" in root:
                continue
            for f in files:
                if f.endswith(".py") and not f.startswith("_"):
                    names |= public_names(os.path.join(root, f))
        return names

    import importlib

    import dgl_tpu

    top = set(dir(dgl_tpu))
    # by-design exclusions (IMPLEMENTATION_STATUS.md "parity audit"):
    # CUDA/cugraph-ops conv wrappers
    ALLOWED_NN = {
        "CuGraphBaseConv", "CuGraphGATConv", "CuGraphRelGraphConv",
        "CuGraphSAGEConv",
    }
    checks = [
        ("sampling", "dgl_tpu.sampling", set()),
        ("dataloading", "dgl_tpu.dataloading", set()),
        ("graphbolt", "dgl_tpu.graphbolt", set()),
        ("transforms", "dgl_tpu.transforms", set()),
        ("data", "dgl_tpu.data", set()),
        ("sparse", "dgl_tpu.sparse", set()),
        ("geometry", "dgl_tpu.geometry", set()),
        ("optim", "dgl_tpu.optim", set()),
        ("nn/pytorch", "dgl_tpu.nn", ALLOWED_NN),
    ]
    failures = {}
    for sub, ours_mod, allowed in checks:
        ref = module_public(os.path.join(REF, sub))
        mod = importlib.import_module(ours_mod)
        ours = set(dir(mod)) | top
        missing = sorted(n for n in ref if n not in ours and n not in allowed)
        if missing:
            failures[sub] = missing
    assert not failures, f"public-API parity regressed: {failures}"
