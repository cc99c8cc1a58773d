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


def test_cholesky_solve_near_singular():
    """Adversarial conditioning: cond=1e6 SPD blocks must stay finite and
    track the f64 solution to f32-conditioning accuracy on BOTH variants
    (this is the round-1 'NaN on TPU f32' regression guard; verified green
    standalone on the v5e 2026-08-21, pallas == xla-unrolled to the bit)."""
    rng = np.random.default_rng(3)
    n, K, B = 6, 7, 64
    U = np.linalg.qr(rng.normal(size=(B, n, n)))[0]
    eig = np.stack([np.logspace(0, -6, n)] * B)
    A = ((U * eig[:, None, :]) @ U.transpose(0, 2, 1)).astype(np.float32)
    rhs = rng.normal(size=(B, n, K)).astype(np.float32)
    x = np.asarray(_unrolled_cholesky_solve(A, rhs, n))
    x_ref = np.linalg.solve(A.astype(np.float64), rhs.astype(np.float64))
    assert np.isfinite(x).all()
    rel = np.abs(x - x_ref).max() / np.abs(x_ref).max()
    assert rel < 0.1       # f32 forward error at cond 1e6


def test_pallas_cholesky_tpu():
    """The pallas SoA kernel itself, TPU-only (skipped on the CPU test
    backend; run standalone against the real chip)."""
    import jax
    if jax.default_backend() == "cpu":
        pytest.skip("pallas TPU kernel needs a TPU backend")
    from mrcal_tpu.ops.batched_cholesky import batched_cholesky_solve_pallas
    rng = np.random.default_rng(0)
    for n, K, B in [(6, 7, 84), (3, 4, 500)]:
        M = rng.normal(size=(B, n, n))
        A = (M @ M.transpose(0, 2, 1) + n * np.eye(n)).astype(np.float32)
        rhs = rng.normal(size=(B, n, K)).astype(np.float32)
        x = np.asarray(batched_cholesky_solve_pallas(A, rhs))
        x_ref = np.linalg.solve(A.astype(np.float64),
                                rhs.astype(np.float64))
        assert np.abs(x - x_ref).max() < 1e-5


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
    """Nstate>4096 with a scipy-sparse J uses the O(nnz) sparse-Cholesky
    path (SuperLU symmetric mode); the FULL cholmod_solve2 system matrix
    (A/LDLt/L/LD/Lt/DLt/P/Pt/D) must be available and consistent with the
    dense factorization (reference: mrcal-pywrap.c:435-604)."""
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
    # rcond: both now report the factor-diagonal ratio (CHOLMOD's
    # estimate); the permutations differ so allow slack
    rs, rd = fac_sparse.rcond(), fac_dense.rcond()
    assert 0.01 < rs / rd < 100

    # the split systems compose: P -> L -> Lt -> Pt == A  (CHOLMOD LL'
    # chaining semantics), on BOTH paths
    for fac in (fac_sparse, fac_dense):
        y = np.asarray(fac.solve_xt_JtJ_bt(bt, mode="P"))
        y = np.asarray(fac.solve_xt_JtJ_bt(y, mode="L"))
        y = np.asarray(fac.solve_xt_JtJ_bt(y, mode="Lt"))
        y = np.asarray(fac.solve_xt_JtJ_bt(y, mode="Pt"))
        xa = np.asarray(fac.solve_xt_JtJ_bt(bt, mode="A"))
        assert np.allclose(y, xa, rtol=1e-8, atol=1e-10)

    # the sparse Cholesky factor reconstructs the permuted JtJ
    JtJ = (J.T @ J).toarray()
    p = fac_sparse._perm
    Lc = fac_sparse._Lc.toarray()
    assert np.allclose(Lc @ Lc.T, JtJ[np.ix_(p, p)], rtol=1e-9, atol=1e-9)

    # L followed by Lt equals LDLt == A in the permuted basis: check the
    # single-system solves against dense triangular algebra
    z = np.asarray(fac_sparse.solve_xt_JtJ_bt(bt, mode="L"))
    z_ref = np.linalg.solve(Lc, bt.T).T
    assert np.allclose(z, z_ref, rtol=1e-8, atol=1e-10)
