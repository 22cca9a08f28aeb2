"""Exhaustive builtin message x reducer sweep vs a dense numpy reference
(mirrors reference tests/python/common/test_heterograph-kernel.py)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
import dgl_tpu.function as fn


def _dense_reference(src, dst, n, u, e, binary_op, reduce_op):
    """Numpy reference for update_all(msg(u op e), reduce)."""
    E = src.shape[0]
    msgs = []
    for k in range(E):
        uu = u[src[k]]
        ee = e[k]
        if binary_op == "copy_u":
            m = uu
        elif binary_op == "copy_e":
            m = ee
        else:
            m = {
                "add": uu + ee,
                "sub": uu - ee,
                "mul": uu * ee,
                "div": uu / ee,
            }[binary_op]
        msgs.append(m)
    out = np.zeros((n,) + msgs[0].shape, np.float64)
    if reduce_op in ("max", "min"):
        out = np.full(
            (n,) + msgs[0].shape,
            -np.inf if reduce_op == "max" else np.inf,
        )
    cnt = np.zeros(n)
    for k in range(E):
        d = dst[k]
        cnt[d] += 1
        if reduce_op in ("sum", "mean"):
            out[d] += msgs[k]
        elif reduce_op == "max":
            out[d] = np.maximum(out[d], msgs[k])
        else:
            out[d] = np.minimum(out[d], msgs[k])
    if reduce_op == "mean":
        out = out / np.maximum(cnt, 1)[:, None]
    if reduce_op in ("max", "min"):
        out[cnt == 0] = 0.0  # DGL zero-degree semantics
    return out


BINARY = ["add", "sub", "mul", "div", "copy_u", "copy_e"]
REDUCE = ["sum", "mean", "max", "min"]


@pytest.fixture(scope="module")
def setup():
    rng = np.random.default_rng(0)
    n, E, F = 20, 100, 6
    src = rng.integers(0, n, E)
    dst = rng.integers(0, n, E)
    g = dgl.graph((src, dst), num_nodes=n)
    u = rng.uniform(0.5, 2.0, (n, F))
    e = rng.uniform(0.5, 2.0, (E, F))
    return g, src, dst, n, u, e


@pytest.mark.parametrize("binary_op", BINARY)
@pytest.mark.parametrize("reduce_op", REDUCE)
def test_update_all_sweep(setup, binary_op, reduce_op):
    g, src, dst, n, u, e = setup
    gl = g.local_var()
    gl.ndata["u"] = jnp.asarray(u, dtype=jnp.float32)
    gl.edata["e"] = jnp.asarray(e, dtype=jnp.float32)
    if binary_op == "copy_u":
        mfunc = fn.copy_u("u", "m")
    elif binary_op == "copy_e":
        mfunc = fn.copy_e("e", "m")
    else:
        mfunc = getattr(fn, f"u_{binary_op}_e")("u", "e", "m")
    rfunc = getattr(fn, reduce_op)("m", "out")
    gl.update_all(mfunc, rfunc)
    got = np.asarray(gl.ndata["out"])
    expect = _dense_reference(src, dst, n, u, e, binary_op, reduce_op)
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("binary_op", ["add", "sub", "mul", "div", "dot"])
def test_apply_edges_sweep(setup, binary_op):
    g, src, dst, n, u, e = setup
    gl = g.local_var()
    v = np.random.default_rng(1).uniform(0.5, 2.0, (n, 6))
    gl.ndata["u"] = jnp.asarray(u, dtype=jnp.float32)
    gl.ndata["v"] = jnp.asarray(v, dtype=jnp.float32)
    mfunc = getattr(fn, f"u_{binary_op}_v")("u", "v", "out")
    gl.apply_edges(mfunc)
    got = np.asarray(gl.edata["out"])
    uu, vv = u[src], v[dst]
    if binary_op == "dot":
        expect = (uu * vv).sum(-1, keepdims=True)
    else:
        expect = {
            "add": uu + vv, "sub": uu - vv, "mul": uu * vv, "div": uu / vv
        }[binary_op]
    np.testing.assert_allclose(got, expect, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("binary_op", ["add", "mul"])
@pytest.mark.parametrize("reduce_op", ["sum", "max"])
def test_update_all_grad_sweep(setup, binary_op, reduce_op):
    """Gradients of the fused path vs JAX AD through the dense formulation."""
    g, src, dst, n, u, e = setup
    uj = jnp.asarray(u, dtype=jnp.float32)
    ej = jnp.asarray(e, dtype=jnp.float32)
    from dgl_tpu import ops

    fused = getattr(ops, f"u_{binary_op}_e_{reduce_op}")

    def loss_fused(u_, e_):
        return (fused(g, u_, e_) ** 2).sum()

    def loss_dense(u_, e_):
        m = u_[jnp.asarray(src)]
        m = m + e_ if binary_op == "add" else m * e_
        seg = jnp.asarray(dst)
        if reduce_op == "sum":
            out = jax.ops.segment_sum(m, seg, num_segments=n)
        else:
            out = jax.ops.segment_max(m, seg, num_segments=n)
            out = jnp.where(jnp.isfinite(out), out, 0)
        return (out ** 2).sum()

    gu1, ge1 = jax.grad(loss_fused, argnums=(0, 1))(uj, ej)
    gu2, ge2 = jax.grad(loss_dense, argnums=(0, 1))(uj, ej)
    np.testing.assert_allclose(np.asarray(gu1), np.asarray(gu2),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(ge1), np.asarray(ge2),
                               rtol=2e-3, atol=2e-3)
