"""Batched small-block Cholesky factor+solve as a Pallas TPU kernel.

The Schur elimination factors Nframes 6x6 (and Npoints 3x3) SPD blocks and
solves them against K right-hand sides per block.  XLA's batched Cholesky
lowers these tiny factorizations poorly (loop-carried scalar code); here
the factorization is fully unrolled (static 6x6) with every lane of the
VPU working on a different block — the batch axis IS the vector axis.

Layout: A (B, n, n) f32/f64, rhs (B, n, K).  Internally the batch is tiled
to multiples of 8 sublanes x 128 lanes.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp


def unrolled_cholesky_factor(A, n):
    """Fully-unrolled batched Cholesky: A (B, n, n) SPD -> L as a list of
    lists of (B,) arrays.  Every operation is elementwise over the batch
    axis -> pure VPU code (XLA's batched Cholesky lowers tiny blocks to
    loop-carried scalar code instead; measured 3.5 ms for the splined
    frame elimination vs ~0.3 ms unrolled)."""
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A[:, i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    return L


def unrolled_cholesky_solve_factored(L, rhs, n):
    """Triangular solves against a factor from unrolled_cholesky_factor.
    rhs: (B, n, K) -> (B, n, K); K-wide elementwise ops."""
    y = [None] * n
    for i in range(n):
        s = rhs[:, i, :]
        for k in range(i):
            s = s - L[i][k][:, None] * y[k]
        y[i] = s / L[i][i][:, None]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i][:, None] * x[k]
        x[i] = s / L[i][i][:, None]
    return jnp.stack(x, axis=1)          # (B, n, K)


def _unrolled_cholesky_solve(A, rhs, n):
    """Factor + solve in one call (see the factored pair above)."""
    return unrolled_cholesky_solve_factored(
        unrolled_cholesky_factor(A, n), rhs, n)


def _kernel_soa(A_ref, rhs_ref, out_ref, *, n, K):
    """SoA layout: A_ref (n*n, T), rhs_ref (n*K, T), out_ref (n*K, T).
    The batch axis is the LANE axis; each (T,)-row op is one VPU op."""
    # factor
    L = [[None] * n for _ in range(n)]
    for i in range(n):
        for j in range(i + 1):
            s = A_ref[i * n + j, :]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            if i == j:
                L[i][j] = jnp.sqrt(s)
            else:
                L[i][j] = s / L[j][j]
    # forward/back solves, one RHS column at a time (K static, unrolled)
    for c in range(K):
        y = [None] * n
        for i in range(n):
            s = rhs_ref[i * K + c, :]
            for k in range(i):
                s = s - L[i][k] * y[k]
            y[i] = s / L[i][i]
        x = [None] * n
        for i in reversed(range(n)):
            s = y[i]
            for k in range(i + 1, n):
                s = s - L[k][i] * x[k]
            x[i] = s / L[i][i]
        for i in range(n):
            out_ref[i * K + c, :] = x[i]


@functools.partial(jax.jit, static_argnames=("tile",))
def batched_cholesky_solve_pallas(A, rhs, tile=1024):
    """solve(A, rhs) for a batch of small SPD blocks via a Pallas kernel.

    A: (B, n, n), rhs: (B, n, K) -> (B, n, K).  n must be small (3/6).
    Data is transposed to SoA ((n*n, B) / (n*K, B)) so the batch rides the
    lane axis of the VPU."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, n, _ = A.shape
    K = rhs.shape[-1]
    Bp = (B + tile - 1) // tile * tile
    if Bp != B:
        # pad with identity blocks so the factorization stays finite
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), (Bp - B, n, n))
        A = jnp.concatenate([A, eye], axis=0)
        rhs = jnp.concatenate(
            [rhs, jnp.zeros((Bp - B, n, K), rhs.dtype)], axis=0)

    At = A.reshape(Bp, n * n).T          # (n*n, Bp)
    rt = rhs.reshape(Bp, n * K).T        # (n*K, Bp)

    out = pl.pallas_call(
        functools.partial(_kernel_soa, n=n, K=K),
        grid=(Bp // tile,),
        in_specs=[
            pl.BlockSpec((n * n, tile), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n * K, tile), lambda i: (i * 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n * K, tile), lambda i: (i * 0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * K, Bp), rhs.dtype),
    )(At, rt)
    return out.T.reshape(Bp, n, K)[:B]


def batched_cholesky_solve(A, rhs, use_pallas=None):
    """Batched SPD solve; Pallas kernel on TPU, unrolled-XLA elsewhere.

    This is the drop-in used by the Schur elimination
    (mrcal_tpu.optimize.solver.schur_step) when MRCAL_TPU_PALLAS=1."""
    if use_pallas is None:
        import os
        use_pallas = bool(os.environ.get("MRCAL_TPU_PALLAS")) and \
            jax.default_backend() not in ("cpu",)
    if use_pallas:
        return batched_cholesky_solve_pallas(A, rhs)
    return _unrolled_cholesky_solve(A, rhs, A.shape[-1])
