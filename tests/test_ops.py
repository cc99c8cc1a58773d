"""Pallas/unrolled kernel correctness (CPU: interpret-equivalent unrolled
path; the pallas path runs on TPU under the bench)."""

import numpy as np
import pytest

import mrcal_tpu  # noqa: F401
from mrcal_tpu.ops.batched_cholesky import (_unrolled_cholesky_solve,
                                            batched_cholesky_solve)


@pytest.mark.parametrize("n,K,B", [(6, 7, 40), (3, 5, 17), (6, 1, 3)])
def test_unrolled_cholesky_solve(n, K, B):
    np.random.seed(0)
    M = np.random.randn(B, n, n)
    A = np.einsum("bij,bkj->bik", M, M) + 3 * np.eye(n)
    rhs = np.random.randn(B, n, K)
    x = np.asarray(_unrolled_cholesky_solve(A, rhs, n))
    x_ref = np.linalg.solve(A, rhs)
    assert np.allclose(x, x_ref, atol=1e-9)


def test_batched_cholesky_solve_dispatch():
    np.random.seed(1)
    B, n, K = 11, 6, 4
    M = np.random.randn(B, n, n)
    A = np.einsum("bij,bkj->bik", M, M) + 3 * np.eye(n)
    rhs = np.random.randn(B, n, K)
    x = np.asarray(batched_cholesky_solve(A, rhs, use_pallas=False))
    assert np.allclose(x, np.linalg.solve(A, rhs), atol=1e-9)


def test_apply_homography():
    # reference: mrcal-genpywrap.py:721 apply_homography
    import mrcal_tpu
    H = np.array([[2., 0, 1], [0, 3, 2], [0, 0, 1]])
    q = np.array([[1., 1], [0, 0]])
    assert np.allclose(np.asarray(mrcal_tpu.apply_homography(H, q)),
                       [[3, 5], [1, 2]])
    Hp = np.array([[1., 0, 0], [0, 1, 0], [0.1, 0, 1]])
    assert np.allclose(np.asarray(mrcal_tpu.apply_homography(Hp,
                                                             np.array([1., 2]))),
                       [1 / 1.1, 2 / 1.1])
    # broadcasting over stacked homographies
    out = np.asarray(mrcal_tpu.apply_homography(np.stack([H, Hp]),
                                                np.array([1., 2])))
    assert out.shape == (2, 2)


def test_cholmod_factorization_sparse_path():
    """Nstate>4096 with a scipy-sparse J uses the O(nnz) SuperLU path;
    mode-A solves must match the dense factorization."""
    import scipy.sparse
    from mrcal_tpu.factorization import CHOLMOD_factorization
    rng = np.random.default_rng(0)
    n, m = 4200, 9000
    J = scipy.sparse.random(m, n, density=2e-4, random_state=1,
                            format="csr")
    # guarantee full column rank: add a scaled identity block
    J = scipy.sparse.vstack(
        [J, scipy.sparse.identity(n, format="csr") * 2.0]).tocsr()
    fac_sparse = CHOLMOD_factorization(J)
    fac_dense = CHOLMOD_factorization(J, force_dense=True)
    assert fac_sparse._lu is not None          # sparse path taken
    bt = rng.normal(size=(3, n))
    xs = np.asarray(fac_sparse.solve_xt_JtJ_bt(bt))
    xd = np.asarray(fac_dense.solve_xt_JtJ_bt(bt))
    assert np.allclose(xs, xd, rtol=1e-8, atol=1e-10)
    # rcond agrees within an order of magnitude (different estimates)
    rs, rd = fac_sparse.rcond(), fac_dense.rcond()
    assert 0.01 < rs / rd < 100
    import pytest
    with pytest.raises(NotImplementedError):
        fac_sparse.solve_xt_JtJ_bt(bt, mode="L")
