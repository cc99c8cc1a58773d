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
