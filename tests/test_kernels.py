"""g-SpMM / g-SDDMM / edge-softmax correctness vs dense numpy references.

Mirrors the reference kernel tests (tests/python/common/test_heterograph-kernel.py):
every (op, reducer) pair checked against an explicit per-edge numpy loop, and
gradients checked against finite differences / dense autodiff equivalents.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import dgl_tpu as dgl
from dgl_tpu import ops

SPMM_OPS = ["add", "sub", "mul", "div", "copy_lhs", "copy_rhs"]
REDUCERS = ["sum", "mean", "max", "min"]


def make_graph(n=13, e=60, seed=0):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    g = dgl.graph((src, dst), num_nodes=n)
    return g, src, dst


def ref_spmm(src, dst, n, op, red, u, e):
    """Dense numpy reference of gspmm."""
    E = len(src)
    msgs = [[] for _ in range(n)]
    for i in range(E):
        if op == "copy_lhs":
            m = u[src[i]]
        elif op == "copy_rhs":
            m = e[i]
        else:
            lu, le = u[src[i]], e[i]
            if op == "add":
                m = lu + le
            elif op == "sub":
                m = lu - le
            elif op == "mul":
                m = lu * le
            elif op == "div":
                m = lu / le
        msgs[dst[i]].append(m)
    feat_shape = msgs[0][0].shape if any(msgs) else ()
    for d in range(n):
        if not msgs[d]:
            continue
        feat_shape = np.broadcast_shapes(*[np.shape(m) for m in msgs[d]])
        break
    out = np.zeros((n,) + feat_shape, dtype=np.float64)
    for d in range(n):
        if not msgs[d]:
            continue
        stack = np.stack([np.broadcast_to(m, feat_shape) for m in msgs[d]])
        if red == "sum":
            out[d] = stack.sum(0)
        elif red == "mean":
            out[d] = stack.mean(0)
        elif red == "max":
            out[d] = stack.max(0)
        elif red == "min":
            out[d] = stack.min(0)
    return out


@pytest.mark.parametrize("op", SPMM_OPS)
@pytest.mark.parametrize("red", REDUCERS)
def test_gspmm_forward(op, red):
    g, src, dst = make_graph()
    n = g.num_nodes()
    e_cnt = g.num_edges()
    rng = np.random.default_rng(1)
    u = rng.standard_normal((n, 4)).astype(np.float32)
    e = (rng.standard_normal((e_cnt, 4)).astype(np.float32) + 3.0)  # avoid /0
    lhs = jnp.asarray(u) if op != "copy_rhs" else None
    rhs = jnp.asarray(e) if op != "copy_lhs" else None
    out = ops.gspmm(g, op, red, lhs, rhs)
    expected = ref_spmm(src, dst, n, op, red, u, e)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("op", ["add", "mul", "copy_lhs", "copy_rhs"])
def test_gspmm_broadcast(op):
    """Edge data broadcasting over feature dims (DGL broadcast semantics)."""
    g, src, dst = make_graph()
    n, e_cnt = g.num_nodes(), g.num_edges()
    rng = np.random.default_rng(2)
    u = rng.standard_normal((n, 4)).astype(np.float32)
    e = rng.standard_normal((e_cnt, 1)).astype(np.float32) + 2.0
    lhs = jnp.asarray(u) if op != "copy_rhs" else None
    rhs = jnp.asarray(e) if op != "copy_lhs" else None
    out = ops.gspmm(g, op, "sum", lhs, rhs)
    expected = ref_spmm(src, dst, n, op, "sum", u, e)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("op", ["add", "sub", "mul", "div", "copy_lhs", "copy_rhs"])
def test_gspmm_sum_grads(op):
    g, src, dst = make_graph(n=8, e=20)
    n, e_cnt = g.num_nodes(), g.num_edges()
    rng = np.random.default_rng(3)
    u = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    e = jnp.asarray(rng.standard_normal((e_cnt, 3)).astype(np.float32) + 3.0)

    def loss(u_, e_):
        lhs = u_ if op != "copy_rhs" else None
        rhs = e_ if op != "copy_lhs" else None
        out = ops.gspmm(g, op, "sum", lhs, rhs)
        return (out * out).sum()

    du, de = jax.grad(loss, argnums=(0, 1))(u, e)

    # numerical check
    def loss_np(u_, e_):
        out = ref_spmm(src, dst, n, op, "sum", u_, e_)
        return (out * out).sum()

    eps = 1e-3
    u64 = np.asarray(u, dtype=np.float64)
    e64 = np.asarray(e, dtype=np.float64)
    if op != "copy_rhs":
        for idx in [(0, 0), (3, 2), (7, 1)]:
            up = u64.copy(); up[idx] += eps
            um = u64.copy(); um[idx] -= eps
            fd = (loss_np(up, e64) - loss_np(um, e64)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(du)[idx], fd, rtol=2e-2, atol=1e-3)
    if op != "copy_lhs":
        for idx in [(0, 0), (10, 2), (19, 1)]:
            ep = e64.copy(); ep[idx] += eps
            em = e64.copy(); em[idx] -= eps
            fd = (loss_np(u64, ep) - loss_np(u64, em)) / (2 * eps)
            np.testing.assert_allclose(np.asarray(de)[idx], fd, rtol=2e-2, atol=1e-3)


def test_gspmm_max_grad():
    g, src, dst = make_graph(n=8, e=20)
    n = g.num_nodes()
    rng = np.random.default_rng(4)
    u = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))

    def loss(u_):
        return (ops.gspmm(g, "copy_lhs", "max", u_, None) ** 2).sum()

    du = jax.grad(loss)(u)
    u64 = np.asarray(u, dtype=np.float64)

    def loss_np(u_):
        return (ref_spmm(src, dst, n, "copy_lhs", "max", u_, None) ** 2).sum()

    eps = 1e-4
    for idx in [(0, 0), (3, 2), (7, 1)]:
        up = u64.copy(); up[idx] += eps
        um = u64.copy(); um[idx] -= eps
        fd = (loss_np(up) - loss_np(um)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(du)[idx], fd, rtol=2e-2, atol=1e-3)


def test_gspmm_padded_matches_unpadded():
    n = 10
    rng = np.random.default_rng(5)
    src = rng.integers(0, n, 30)
    dst = rng.integers(0, n, 30)
    g1 = dgl.graph((src, dst), num_nodes=n)
    src_p = np.concatenate([src, np.full(10, n)])
    dst_p = np.concatenate([dst, np.full(10, n)])
    g2 = dgl.graph((src_p, dst_p), num_nodes=n, num_edges=30)
    u = jnp.asarray(rng.standard_normal((n, 5)).astype(np.float32))
    e1 = jnp.asarray(rng.standard_normal((30, 5)).astype(np.float32))
    e2 = jnp.concatenate([e1, jnp.full((10, 5), 1e9, dtype=jnp.float32)])
    for red in ["sum", "max", "mean"]:
        o1 = ops.gspmm(g1, "mul", red, u, e1)
        o2 = ops.gspmm(g2, "mul", red, u, e2)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2), rtol=1e-5)
    # grads also match on the real prefix
    def l1(e_):
        return (ops.gspmm(g1, "mul", "sum", u, e_) ** 2).sum()
    def l2(e_):
        return (ops.gspmm(g2, "mul", "sum", u, e_) ** 2).sum()
    d1 = jax.grad(l1)(e1)
    d2 = jax.grad(l2)(e2)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2)[:30], rtol=1e-4)
    np.testing.assert_allclose(np.asarray(d2)[30:], 0.0)


SDDMM_OPS = ["add", "sub", "mul", "div", "dot"]


@pytest.mark.parametrize("op", SDDMM_OPS)
@pytest.mark.parametrize("targets", [("u", "v"), ("u", "e"), ("e", "v")])
def test_gsddmm_forward(op, targets):
    lt, rt = targets
    g, src, dst = make_graph()
    n, e_cnt = g.num_nodes(), g.num_edges()
    rng = np.random.default_rng(6)
    data = {
        "u": rng.standard_normal((n, 4)).astype(np.float32),
        "v": rng.standard_normal((n, 4)).astype(np.float32) + 2.0,
        "e": rng.standard_normal((e_cnt, 4)).astype(np.float32) + 2.0,
    }
    out = ops.gsddmm(
        g, op, jnp.asarray(data[lt]), jnp.asarray(data[rt]),
        lhs_target=lt, rhs_target=rt,
    )
    def fetch(t, i):
        if t == "u":
            return data["u"][src[i]]
        if t == "v":
            return data["v"][dst[i]]
        return data["e"][i]
    expected = []
    for i in range(e_cnt):
        L, R = fetch(lt, i), fetch(rt, i)
        if op == "add":
            expected.append(L + R)
        elif op == "sub":
            expected.append(L - R)
        elif op == "mul":
            expected.append(L * R)
        elif op == "div":
            expected.append(L / R)
        elif op == "dot":
            expected.append(np.array([np.dot(L, R)]))
    np.testing.assert_allclose(
        np.asarray(out), np.stack(expected), rtol=1e-4, atol=1e-5
    )


@pytest.mark.parametrize("op", SDDMM_OPS)
def test_gsddmm_grads(op):
    g, src, dst = make_graph(n=7, e=15)
    n, e_cnt = g.num_nodes(), g.num_edges()
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32) + 2.0)

    def loss(x_, y_):
        out = ops.gsddmm(g, op, x_, y_, lhs_target="u", rhs_target="v")
        return (out * out).sum()

    dx, dy = jax.grad(loss, argnums=(0, 1))(x, y)

    def loss_np(x_, y_):
        L = x_[src]
        R = y_[dst]
        if op == "add":
            out = L + R
        elif op == "sub":
            out = L - R
        elif op == "mul":
            out = L * R
        elif op == "div":
            out = L / R
        elif op == "dot":
            out = (L * R).sum(-1, keepdims=True)
        return (out * out).sum()

    x64, y64 = np.asarray(x, np.float64), np.asarray(y, np.float64)
    eps = 1e-4
    for idx in [(0, 0), (3, 2), (6, 1)]:
        xp = x64.copy(); xp[idx] += eps
        xm = x64.copy(); xm[idx] -= eps
        fd = (loss_np(xp, y64) - loss_np(xm, y64)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dx)[idx], fd, rtol=2e-2, atol=1e-3)
        yp = y64.copy(); yp[idx] += eps
        ym = y64.copy(); ym[idx] -= eps
        fd = (loss_np(x64, yp) - loss_np(x64, ym)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dy)[idx], fd, rtol=2e-2, atol=1e-3)


def test_edge_softmax():
    g, src, dst = make_graph(n=9, e=40)
    e_cnt = g.num_edges()
    rng = np.random.default_rng(8)
    logits = rng.standard_normal((e_cnt, 2)).astype(np.float32)
    out = ops.edge_softmax(g, jnp.asarray(logits))
    # reference: softmax over incoming edges of each dst
    expected = np.zeros_like(logits)
    for d in range(g.num_nodes()):
        idx = np.nonzero(dst == d)[0]
        if len(idx) == 0:
            continue
        z = np.exp(logits[idx] - logits[idx].max(0))
        expected[idx] = z / z.sum(0)
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-6)
    # rows sum to one per dst
    sums = np.zeros((g.num_nodes(), 2))
    np.add.at(sums, dst, np.asarray(out))
    present = np.unique(dst)
    np.testing.assert_allclose(sums[present], 1.0, rtol=1e-4)


def test_edge_softmax_grad():
    g, src, dst = make_graph(n=6, e=12)
    e_cnt = g.num_edges()
    rng = np.random.default_rng(9)
    logits = jnp.asarray(rng.standard_normal((e_cnt,)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((e_cnt,)).astype(np.float32))

    def loss(l):
        return (ops.edge_softmax(g, l) * w).sum()

    dl = jax.grad(loss)(logits)

    def loss_np(l):
        out = np.zeros_like(l)
        for d in range(g.num_nodes()):
            idx = np.nonzero(dst == d)[0]
            if len(idx) == 0:
                continue
            z = np.exp(l[idx] - l[idx].max())
            out[idx] = z / z.sum()
        return (out * np.asarray(w, np.float64)).sum()

    l64 = np.asarray(logits, np.float64)
    eps = 1e-5
    for i in [0, 5, 11]:
        lp = l64.copy(); lp[i] += eps
        lm = l64.copy(); lm[i] -= eps
        fd = (loss_np(lp) - loss_np(lm)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(dl)[i], fd, rtol=1e-2, atol=1e-4)


def test_segment_reduce():
    seglen = jnp.array([3, 0, 2, 1])
    val = jnp.arange(12.0).reshape(6, 2)
    out = ops.segment_reduce(seglen, val, "sum")
    expected = np.array([[0 + 2 + 4, 1 + 3 + 5], [0, 0], [6 + 8, 7 + 9], [10, 11]])
    np.testing.assert_allclose(np.asarray(out), expected)
    out = ops.segment_reduce(seglen, val, "max")
    expected = np.array([[4, 5], [0, 0], [8, 9], [10, 11]])
    np.testing.assert_allclose(np.asarray(out), expected)
    out = ops.segment_reduce(seglen, val, "mean")
    expected = np.array([[2, 3], [0, 0], [7, 8], [10, 11]])
    np.testing.assert_allclose(np.asarray(out), expected)


def test_segment_mm_and_gather_mm():
    rng = np.random.default_rng(10)
    a = rng.standard_normal((10, 4)).astype(np.float32)
    b = rng.standard_normal((3, 4, 5)).astype(np.float32)
    seglen = jnp.array([4, 0, 6])
    out = ops.segment_mm(jnp.asarray(a), jnp.asarray(b), seglen)
    expected = np.concatenate([a[:4] @ b[0], a[4:] @ b[2]])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)

    idx = rng.integers(0, 3, 10)
    out = ops.gather_mm(jnp.asarray(a), jnp.asarray(b), jnp.asarray(idx))
    expected = np.stack([a[i] @ b[idx[i]] for i in range(10)])
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-4, atol=1e-5)


def test_gspmm_bf16():
    """bf16 feature path: forward matches f32 within bf16 tolerance and
    gradients flow (the traffic-halving lever on TPU)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import dgl_tpu as dgl
    from dgl_tpu import ops

    rng = np.random.default_rng(0)
    g = dgl.rand_graph(50, 400, seed=0)
    x32 = jnp.asarray(rng.normal(size=(50, 16)), dtype=jnp.float32)
    x16 = x32.astype(jnp.bfloat16)
    out32 = ops.copy_u_sum(g, x32)
    out16 = ops.copy_u_sum(g, x16)
    assert out16.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out16.astype(jnp.float32)), np.asarray(out32),
        rtol=0.05, atol=0.3,
    )
    grad = jax.grad(lambda x: (ops.copy_u_sum(g, x).astype(jnp.float32) ** 2).sum())(x16)
    assert grad.dtype == jnp.bfloat16
    assert np.isfinite(np.asarray(grad.astype(jnp.float32))).all()


def test_edge_softmax_partial():
    """Softmax over an edge subset (reference edge_softmax eids arg):
    excluded edges get zeros; included edges normalize among themselves."""
    rng = np.random.default_rng(3)
    src = rng.integers(0, 20, 100)
    dst = rng.integers(0, 20, 100)
    g = dgl.graph((src, dst), num_nodes=20)
    logits = jnp.asarray(rng.normal(size=(100, 4)), jnp.float32)
    eids = np.arange(0, 100, 3)
    out = np.asarray(ops.edge_softmax(g, logits, eids=eids))
    mask = np.zeros(100, bool)
    mask[eids] = True
    assert np.all(out[~mask] == 0)
    for d in range(20):
        sel = np.where((dst == d) & mask)[0]
        if sel.size == 0:
            continue
        e = np.exp(np.asarray(logits)[sel])
        np.testing.assert_allclose(
            out[sel], e / e.sum(axis=0, keepdims=True), rtol=1e-5
        )
