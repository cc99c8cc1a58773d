"""Factorization of JtJ with reusable solves — the CHOLMOD_factorization
equivalent (reference: mrcal-pywrap.c:435-604 CHOLMOD_factorization class,
CHOLMOD_factorization_solve_xt_JtJ_bt.docstring).

The reference wraps cholmod_analyze/cholmod_factorize and exposes
solve_xt_JtJ_bt (broadcasting over rows of bt) with a mode= argument for
every cholmod_solve2 system.  Here:

  - calibration-scale problems (Nstate <= 4096) factor DENSE on the MXU —
    a few-thousand-state Cholesky is microseconds there, and every
    reference solve mode is expressed through (L, P=I);
  - larger (SfM-scale) problems with a scipy-sparse J keep JtJ sparse and
    factor with SuperLU (scipy.sparse.linalg.splu) — O(nnz) memory like
    the reference's CHOLMOD, supporting the 'A' system (the one the
    uncertainty machinery uses).
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401

_DENSE_NSTATE_MAX = 4096


class CHOLMOD_factorization:
    """Factorize JtJ once, solve many times.

    Accepts J as a scipy sparse matrix (like the reference) or a dense
    array.  Dense path: LL^T with no fill-reducing permutation (P/Pt are
    identity).  Sparse path (Nstate > 4096, scipy-sparse J): SuperLU on
    the sparse JtJ; only the 'A' solve system is available there."""

    def __init__(self, J=None, JtJ=None, *, force_dense=None):
        self._lu = None
        self._L = None
        sparse_in = J is not None and hasattr(J, "tocsc")
        n = (J.shape[1] if J is not None
             else np.asarray(JtJ).shape[-1])
        use_dense = (n <= _DENSE_NSTATE_MAX or not sparse_in) \
            if force_dense is None else force_dense

        if not use_dense:
            import scipy.sparse
            import scipy.sparse.linalg
            Jc = J.tocsc()
            JtJ_s = (Jc.T @ Jc).tocsc()
            self._lu = scipy.sparse.linalg.splu(JtJ_s)
            self._n = n
            return

        if JtJ is None:
            if J is None:
                raise Exception("need J or JtJ")
            Jd = J.toarray() if hasattr(J, "toarray") else np.asarray(J)
            JtJ = Jd.T @ Jd
        self._JtJ = jnp.asarray(JtJ)
        self._L = jnp.linalg.cholesky(self._JtJ)
        self._n = self._L.shape[0]
        if not bool(jnp.all(jnp.isfinite(self._L))):
            raise Exception("JtJ is not positive definite")

    def solve_xt_JtJ_bt(self, bt, mode="A", sys=None):
        """Solve xt JtJ = bt for xt, broadcasting over leading dims of bt
        (reference modes: CHOLMOD_A/LDLt/LD/DLt/L/Lt/D/P/Pt).

        Dense path: D = I, LD==L, DLt==Lt, P==Pt==I.  Sparse path
        supports 'A' only (SuperLU does not expose the split systems)."""
        if sys is not None:
            mode = sys
        mode = mode.replace("CHOLMOD_", "")

        if self._lu is not None:
            if mode not in ("A", "LDLt"):
                raise NotImplementedError(
                    f"sparse factorization supports mode='A' only; "
                    f"got '{mode}'. Build with force_dense=True for the "
                    "split L/Lt/D/P systems")
            bt = np.asarray(bt, dtype=np.float64)
            rhs = np.atleast_2d(bt)
            lead = rhs.shape[:-1]
            x = self._lu.solve(rhs.reshape(-1, self._n).T).T
            return x.reshape(lead + (self._n,)).reshape(bt.shape)

        bt = jnp.asarray(bt)
        rhs = jnp.swapaxes(jnp.atleast_2d(bt), -1, -2)    # columns
        L = self._L

        def lower(r):
            return jax.scipy.linalg.solve_triangular(L, r, lower=True)

        def upper(r):
            return jax.scipy.linalg.solve_triangular(L.T, r, lower=False)

        if mode in ("A", "LDLt"):
            x = upper(lower(rhs))
        elif mode in ("L", "LD"):
            x = lower(rhs)
        elif mode in ("Lt", "DLt"):
            x = upper(rhs)
        elif mode in ("D", "P", "Pt"):
            x = rhs
        else:
            raise Exception(f"Unknown solve mode '{mode}'")
        out = jnp.swapaxes(x, -1, -2)
        return out.reshape(bt.shape)

    def rcond(self):
        """Reciprocal condition-number estimate (reference:
        CHOLMOD_factorization_rcond).  Dense: from the Cholesky diagonal;
        sparse: from the U diagonal of the LU factors."""
        if self._lu is not None:
            d = np.abs(self._lu.U.diagonal())
            return float(d.min() / d.max())
        d = jnp.abs(jnp.diagonal(self._L)) ** 2
        return float(jnp.min(d) / jnp.max(d))
