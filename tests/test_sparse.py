"""dgl.sparse facade tests (mirrors reference tests/python/pytorch/sparse/)."""
import jax.numpy as jnp
import numpy as np
import pytest

from dgl_tpu import sparse as dglsp


@pytest.fixture
def A():
    row = jnp.array([0, 0, 1, 2])
    col = jnp.array([1, 2, 2, 0])
    val = jnp.array([1.0, 2.0, 3.0, 4.0])
    return dglsp.from_coo(row, col, val, (3, 3))


def test_basic_props(A):
    assert A.shape == (3, 3)
    assert A.nnz == 4
    d = np.asarray(A.to_dense())
    expect = np.array([[0, 1, 2], [0, 0, 3], [4, 0, 0]], np.float32)
    np.testing.assert_allclose(d, expect)


def test_transpose(A):
    d = np.asarray(A.T.to_dense())
    np.testing.assert_allclose(d, np.asarray(A.to_dense()).T)


def test_elementwise(A):
    B = 2 * A
    np.testing.assert_allclose(
        np.asarray(B.to_dense()), 2 * np.asarray(A.to_dense())
    )
    C = A + A
    np.testing.assert_allclose(
        np.asarray(C.to_dense()), 2 * np.asarray(A.to_dense())
    )


def test_add_different_patterns(A):
    B = dglsp.from_coo(
        jnp.array([0, 1]), jnp.array([0, 2]), jnp.array([5.0, 7.0]), (3, 3)
    )
    C = A + B
    np.testing.assert_allclose(
        np.asarray(C.to_dense()),
        np.asarray(A.to_dense()) + np.asarray(B.to_dense()),
    )


def test_spmm(A):
    X = jnp.asarray(np.random.default_rng(0).normal(size=(3, 5)),
                    dtype=jnp.float32)
    out = dglsp.spmm(A, X)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(A.to_dense()) @ np.asarray(X), rtol=1e-5
    )
    out2 = A @ X
    np.testing.assert_allclose(np.asarray(out2), np.asarray(out), rtol=1e-5)


def test_spspmm(A):
    C = dglsp.spspmm(A, A)
    np.testing.assert_allclose(
        np.asarray(C.to_dense()),
        np.asarray(A.to_dense()) @ np.asarray(A.to_dense()),
        rtol=1e-5,
    )


def test_sddmm(A):
    rng = np.random.default_rng(0)
    X1 = jnp.asarray(rng.normal(size=(3, 4)), dtype=jnp.float32)
    X2 = jnp.asarray(rng.normal(size=(4, 3)), dtype=jnp.float32)
    out = dglsp.sddmm(A, X1, X2)
    dense = np.asarray(X1) @ np.asarray(X2)
    r, c = np.asarray(A.row), np.asarray(A.col)
    np.testing.assert_allclose(
        np.asarray(out.val), dense[r, c] * np.asarray(A.val), rtol=1e-5
    )


def test_softmax(A):
    S = dglsp.softmax(A)
    d = np.asarray(S.to_dense())
    # each nonzero row sums to 1
    row_sums = d.sum(axis=1)
    np.testing.assert_allclose(row_sums, [1.0, 1.0, 1.0], rtol=1e-5)


def test_reduce(A):
    np.testing.assert_allclose(
        np.asarray(A.sum(dim=1)), np.asarray(A.to_dense()).sum(1), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(A.sum(dim=0)), np.asarray(A.to_dense()).sum(0), rtol=1e-6
    )
    assert float(A.sum()) == 10.0


def test_diag_identity():
    D = dglsp.diag(jnp.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(np.asarray(D.to_dense()), np.diag([1, 2, 3]))
    I = dglsp.identity((3, 3))
    np.testing.assert_allclose(np.asarray(I.to_dense()), np.eye(3))


def test_coalesce():
    A = dglsp.from_coo(
        jnp.array([0, 0, 1]), jnp.array([1, 1, 2]),
        jnp.array([1.0, 2.0, 3.0]), (2, 3),
    )
    assert A.has_duplicate()
    B = A.coalesce()
    assert B.nnz == 2 and not B.has_duplicate()
    assert float(B.to_dense()[0, 1]) == 3.0


def test_from_csr():
    A = dglsp.from_csr(
        jnp.array([0, 2, 3]), jnp.array([0, 1, 1]),
        jnp.array([1.0, 2.0, 3.0]),
    )
    np.testing.assert_allclose(
        np.asarray(A.to_dense()), [[1, 2], [0, 3]]
    )


def test_bspmm(A):
    import dgl_tpu

    rng = np.random.default_rng(0)
    val = jnp.asarray(rng.normal(size=(4, 2)), dtype=jnp.float32)
    Ah = dglsp.val_like(A, val)
    X = jnp.asarray(rng.normal(size=(3, 5, 2)), dtype=jnp.float32)
    out = dglsp.bspmm(Ah, X)
    assert out.shape == (3, 5, 2)
    for h in range(2):
        dense = np.zeros((3, 3), np.float32)
        dense[np.asarray(A.row), np.asarray(A.col)] = np.asarray(val[:, h])
        np.testing.assert_allclose(
            np.asarray(out[..., h]), dense @ np.asarray(X[..., h]),
            rtol=1e-4, atol=1e-5,
        )


def test_elementwise_functions_and_inv():
    from dgl_tpu import sparse as dglsp

    A = dglsp.from_coo([0, 1, 2], [1, 2, 0], jnp.asarray([1.0, 2.0, 3.0]),
                       shape=(3, 3))
    B = dglsp.val_like(A, jnp.asarray([10.0, 20.0, 30.0]))
    np.testing.assert_allclose(
        np.asarray(dglsp.add(A, B).to_dense()),
        np.asarray(A.to_dense()) + np.asarray(B.to_dense()),
    )
    np.testing.assert_allclose(
        np.asarray(dglsp.power(A, 2.0).val), [1.0, 4.0, 9.0]
    )
    np.testing.assert_allclose(np.asarray(dglsp.mul(A, 2.0).val), [2, 4, 6])
    D = dglsp.diag(jnp.asarray([2.0, 4.0, 8.0]))
    Dinv = dglsp.inv(D)
    np.testing.assert_allclose(
        np.asarray(Dinv.to_dense()), np.diag([0.5, 0.25, 0.125])
    )
    with pytest.raises(ValueError):
        dglsp.inv(A)


def test_bcoo_scipy_roundtrip():
    import scipy.sparse as sp
    from dgl_tpu import sparse as dglsp

    rng = np.random.default_rng(0)
    m = sp.random(10, 8, density=0.3, random_state=rng, format="coo")
    A = dglsp.from_scipy(m)
    np.testing.assert_allclose(
        np.asarray(A.to_dense()), m.toarray(), rtol=1e-6
    )
    back = dglsp.to_scipy(A)
    np.testing.assert_allclose(back.toarray(), m.toarray(), rtol=1e-6)
    bc = dglsp.to_bcoo(A)
    np.testing.assert_allclose(np.asarray(bc.todense()), m.toarray(), rtol=1e-6)
    A2 = dglsp.from_bcoo(bc)
    np.testing.assert_allclose(
        np.asarray(A2.to_dense()), m.toarray(), rtol=1e-6
    )


def test_named_reductions(A):
    from dgl_tpu import sparse as dglsp

    dense = np.asarray(A.to_dense())
    np.testing.assert_allclose(np.asarray(dglsp.sum(A)), dense.sum())
    np.testing.assert_allclose(
        np.asarray(dglsp.sum(A, 1)), dense.sum(1)
    )
    np.testing.assert_allclose(np.asarray(dglsp.smax(A)), 4.0)
    np.testing.assert_allclose(np.asarray(dglsp.smin(A)), 1.0)
    np.testing.assert_allclose(
        np.asarray(dglsp.smean(A)), np.mean([1.0, 2.0, 3.0, 4.0])
    )
    # sprod over nnz and per-row (rows with no nnz -> 0, reference semantics)
    np.testing.assert_allclose(np.asarray(dglsp.sprod(A)), 24.0)
    np.testing.assert_allclose(
        np.asarray(dglsp.sprod(A, 1)), [2.0, 3.0, 4.0]
    )
    np.testing.assert_allclose(np.asarray(A.sprod(0)), [4.0, 1.0, 6.0])
    empty_row = dglsp.from_coo(
        jnp.array([0]), jnp.array([1]), jnp.array([5.0]), (2, 2)
    )
    np.testing.assert_allclose(np.asarray(dglsp.sprod(empty_row, 1)), [5.0, 0.0])


def test_sp_prefixed_ops(A):
    from dgl_tpu import sparse as dglsp

    dense = np.asarray(A.to_dense())
    np.testing.assert_allclose(
        np.asarray(dglsp.sp_add(A, A).to_dense()), 2 * dense
    )
    np.testing.assert_allclose(
        np.asarray(dglsp.sp_power(A, 2.0).val), [1, 4, 9, 16]
    )
    np.testing.assert_allclose(
        np.asarray(dglsp.spsp_mul(A, A).to_dense()), dense * dense
    )
    # intersection semantics on differing patterns
    B = dglsp.from_coo(
        jnp.array([0, 1]), jnp.array([1, 0]), jnp.array([10.0, 7.0]), (3, 3)
    )
    prod = dglsp.spsp_mul(A, B)
    np.testing.assert_allclose(
        np.asarray(prod.to_dense()), dense * np.asarray(B.to_dense())
    )
    assert prod.nnz == 1
    # vector broadcasts
    v = jnp.array([[1.0], [2.0], [3.0]])
    np.testing.assert_allclose(
        np.asarray(dglsp.sp_mul_v(A, v).to_dense()),
        dense * np.asarray(v),
    )
    np.testing.assert_allclose(
        np.asarray(dglsp.sp_add_v(A, v).val),
        np.asarray(A.val) + np.asarray(v)[np.asarray(A.row), 0],
    )
    assert dglsp.is_scalar(3.0)
    assert dglsp.is_scalar(jnp.float32(2.0))
    assert not dglsp.is_scalar(v)


def test_torch_sparse_roundtrip(A):
    import torch

    from dgl_tpu import sparse as dglsp

    dense = np.asarray(A.to_dense())
    t = dglsp.to_torch_sparse_coo(A)
    np.testing.assert_allclose(t.to_dense().numpy(), dense)
    back = dglsp.from_torch_sparse(t)
    np.testing.assert_allclose(np.asarray(back.to_dense()), dense)
    csr = dglsp.to_torch_sparse_csr(A)
    assert csr.layout == torch.sparse_csr
    np.testing.assert_allclose(csr.to_dense().numpy(), dense)
    back2 = dglsp.from_torch_sparse(csr)
    np.testing.assert_allclose(np.asarray(back2.to_dense()), dense)
    csc = dglsp.to_torch_sparse_csc(A)
    np.testing.assert_allclose(csc.to_dense().numpy(), dense)
