"""Checkpoint save/load round-trip (npz default path)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu.models import GCN


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    g = dgl.graph((rng.integers(0, 20, 80), rng.integers(0, 20, 80)),
                  num_nodes=20)
    x = jnp.asarray(rng.normal(size=(20, 4)), jnp.float32)
    m = GCN(4, 8, 3)
    params = m.init(jax.random.PRNGKey(0), g, x)
    path = os.path.join(str(tmp_path), "ckpt")
    dgl.save_checkpoint(path, params, step=7)
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    restored, step = dgl.load_checkpoint(path, target=zeros,
                                         return_step=True)
    assert step == 7
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    # default return shape stays a bare pytree
    r2 = dgl.load_checkpoint(path, target=zeros)
    assert jax.tree_util.tree_structure(r2) == \
        jax.tree_util.tree_structure(params)
    # model still runs with restored params
    out = m.apply(restored, g, x)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(m.apply(params, g, x)), rtol=1e-6
    )
    with pytest.raises(ValueError):
        dgl.load_checkpoint(path)  # no target
