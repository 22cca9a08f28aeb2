"""CI locks for the Pallas shell-prefix accumulation kernel
(``ops/shell_pallas.py``): interpret-mode parity against the XLA
prefix_reduce path on the hub-plan cold tail, plus the raw kernel vs a
numpy oracle."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

import dgl_tpu
from dgl_tpu import ops
import dgl_tpu.ops.shell_pallas as sp
from dgl_tpu.ops.hub_spmm import build_hub_plan, hub_copy_u_sum


def _powerlaw_graph(n=6000, e=60000, seed=0):
    rng = np.random.default_rng(seed)
    w = 1.0 / np.arange(1, n + 1)
    src = rng.choice(n, e, p=w / w.sum())
    dst = rng.integers(0, n, e)
    return dgl_tpu.graph((src, dst), num_nodes=n)


def test_kernel_matches_numpy_oracle():
    """Raw kernel: nested-prefix sum with base, multiple feature blocks."""
    rng = np.random.default_rng(1)
    BR = 512
    level_rows = [3 * BR, 2 * BR - 17, BR - 3, 5]
    n_out = 3 * BR - 9
    pieces, segs = [], []
    for m in level_rows:
        mp = sp._rup(m, BR)
        block = np.zeros((mp, 256), np.float32)
        block[:m] = rng.normal(size=(m, 256))
        pieces.append(block)
        segs.append(block)
    # trailing zero block for uncovered out rows (none here; n_out covered)
    nb_out = sp._rup(n_out, BR) // BR
    _, _, _, piece_rows = sp._grid_vectors(level_rows, nb_out, BR)
    flat = np.concatenate(segs)
    if piece_rows > flat.shape[0]:
        flat = np.concatenate(
            [flat, np.zeros((piece_rows - flat.shape[0], 256), np.float32)])
    base = rng.normal(size=(sp._rup(n_out, 8), 256)).astype(np.float32)
    ref = np.zeros((sp._rup(n_out, BR), 256), np.float32)
    ref[: base.shape[0]] = base
    for m, block in zip(level_rows, segs):
        ref[: block.shape[0]] += block
    sp._FORCE_PALLAS_INTERPRET = True
    try:
        out = sp.shell_prefix_sum_pallas(jnp.asarray(flat), level_rows,
                                         n_out, base=jnp.asarray(base))
    finally:
        sp._FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_kernel_no_base_uncovered_blocks_zero():
    """Output blocks beyond level-0 coverage must come back zero (they
    read the trailing all-zero piece block)."""
    BR = 512
    level_rows = [700]
    n_out = 2048  # rows [700, 2048) uncovered
    rng = np.random.default_rng(2)
    flat_real = rng.normal(size=(700, 128)).astype(np.float32)
    nb_out = n_out // BR
    _, _, _, piece_rows = sp._grid_vectors(level_rows, nb_out, BR)
    flat = np.zeros((piece_rows, 128), np.float32)
    flat[:700] = flat_real
    sp._FORCE_PALLAS_INTERPRET = True
    try:
        out = np.asarray(sp.shell_prefix_sum_pallas(
            jnp.asarray(flat), level_rows, n_out))
    finally:
        sp._FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(out[:700], flat_real, rtol=1e-6)
    assert np.all(out[700:] == 0.0)


def test_hub_cold_tail_pallas_matches_xla():
    """End-to-end: hub_copy_u_sum with the Pallas cold tail (interpret)
    vs the shipped XLA prefix_reduce path, fwd AND bwd."""
    g = _powerlaw_graph()
    rel = g._relation(None)
    plan = build_hub_plan(rel, num_hubs=256, precision="f32", cold="shell-f32")
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(g.num_nodes(), 128)).astype(np.float32))

    def loss(x):
        y = hub_copy_u_sum(plan, x)
        return jnp.sum(y * y), y

    (ref_l, ref_y), ref_g = jax.value_and_grad(loss, has_aux=True)(x)
    sp._FORCE_PALLAS_INTERPRET = True
    try:
        (out_l, out_y), out_g = jax.value_and_grad(loss, has_aux=True)(x)
    finally:
        sp._FORCE_PALLAS_INTERPRET = False
    np.testing.assert_allclose(np.asarray(out_y), np.asarray(ref_y),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out_g), np.asarray(ref_g),
                               rtol=1e-4, atol=1e-4)


def test_hub_cold_tail_pallas_vs_classic_spmm():
    """Pallas cold tail against the classic gather+segment path (the
    ground truth), bf16 gather dtype (headline config)."""
    g = _powerlaw_graph(seed=7)
    rel = g._relation(None)
    plan = build_hub_plan(rel, num_hubs=256, precision="int8", cold="shell")
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.normal(size=(g.num_nodes(), 128)).astype(np.float32))
    ref = ops.gspmm(g, "copy_lhs", "sum", x, None)
    sp._FORCE_PALLAS_INTERPRET = True
    try:
        out = hub_copy_u_sum(plan, x)
    finally:
        sp._FORCE_PALLAS_INTERPRET = False
    err = (np.linalg.norm(np.asarray(out) - np.asarray(ref))
           / np.linalg.norm(np.asarray(ref)))
    assert err < 5e-3, err  # bf16 gather class


def test_gate_respects_env(monkeypatch):
    monkeypatch.setenv("DGL_TPU_NO_PALLAS_SHELLS", "1")
    assert not sp.use_pallas_shells()


def test_ok_rejects_unaligned_features():
    assert not sp.pallas_shell_ok(100, 10000)
    assert sp.pallas_shell_ok(256, 10000)
    assert not sp.pallas_shell_ok(256, 100)


def test_weighted_gspmm_pallas_matches_classic():
    """shell_gspmm_sum with the Pallas accumulator (interpret) vs the
    classic gspmm path, all binary ops, fwd + grads."""
    from dgl_tpu.ops.shell_spmm import build_shell_plan, shell_gspmm_sum

    g = _powerlaw_graph(n=4000, e=40000, seed=4)
    rel = g._relation(None)
    plan = build_shell_plan(rel, gather_dtype="f32")
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.normal(size=(4000, 128)).astype(np.float32))
    e = jnp.asarray(
        rng.uniform(0.5, 2.0, size=(g.num_edges(), 1)).astype(np.float32))
    for op in ("copy_lhs", "mul", "add", "div"):
        ref = ops.gspmm(g, op, "sum", u, None if op == "copy_lhs" else e)

        def loss(u, e):
            y = shell_gspmm_sum(op, plan, u,
                                None if op == "copy_lhs" else e)
            return jnp.sum(y * y), y

        (rl, ry), rg = jax.value_and_grad(loss, has_aux=True)(u, e)
        sp._FORCE_PALLAS_INTERPRET = True
        try:
            (ol, oy), og = jax.value_and_grad(loss, has_aux=True)(u, e)
        finally:
            sp._FORCE_PALLAS_INTERPRET = False
        np.testing.assert_allclose(np.asarray(oy), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4, err_msg=op)
        np.testing.assert_allclose(np.asarray(og), np.asarray(rg),
                                   rtol=2e-4, atol=2e-4, err_msg=op)
