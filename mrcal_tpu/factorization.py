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
    factor with SuperLU driven in SYMMETRIC mode (fill-reducing symmetric
    permutation, diagonal pivoting threshold 0): for an SPD matrix this
    yields P JtJ P' = L_unit D L_unit' with U = D L_unit', i.e. a genuine
    sparse Cholesky L = L_unit sqrt(D) — so every split solve system
    (L/Lt/LD/DLt/P/Pt) is available at O(nnz) memory, like the
    reference's CHOLMOD path.  The P/L/Lt/Pt solves compose to the 'A'
    solve exactly as CHOLMOD's do.
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
    identity).  Sparse path (Nstate > 4096, scipy-sparse J): sparse
    Cholesky via SuperLU symmetric mode; all solve systems supported,
    with a real fill-reducing permutation P."""

    def __init__(self, J=None, JtJ=None, *, force_dense=None):
        self._lu = None
        self._L = None
        self._Lc = None
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
            # symmetric mode + zero diagonal-pivot threshold: no numerical
            # row pivoting, so for SPD input  P A P' = L_unit U  with
            # U = D L_unit'  — an LDLt == Cholesky factorization
            self._lu = scipy.sparse.linalg.splu(
                JtJ_s, permc_spec="MMD_AT_PLUS_A", diag_pivot_thresh=0.0,
                options=dict(SymmetricMode=True))
            self._n = n
            d = self._lu.U.diagonal()
            if np.any(d <= 0) or not np.all(np.isfinite(d)):
                raise Exception("JtJ is not positive definite")
            self._d = np.asarray(d)
            # the sparse Cholesky factor L = L_unit sqrt(D), lower tri
            self._Lc = (self._lu.L @
                        scipy.sparse.diags(np.sqrt(self._d))).tocsr()
            self._LcT = self._Lc.T.tocsr()
            # SymmetricMode keeps rows and columns identically permuted.
            # Convention check (tested): Lc Lc' == JtJ[pi, pi] with
            # pi = argsort(perm_c) — i.e. the factorization's P maps
            # through the INVERSE of SuperLU's perm_c
            self._perm = np.argsort(np.asarray(self._lu.perm_c))
            self._perm_inv = np.asarray(self._lu.perm_c)
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

        Dense path: P==Pt==I, D==I (LL^T), LD==L, DLt==Lt.  Sparse path:
        real fill-reducing P; solve(P)∘solve(L)∘solve(Lt)∘solve(Pt)
        composes to solve(A), exactly like chaining cholmod_solve2
        systems against an LL^T factor."""
        if sys is not None:
            mode = sys
        mode = mode.replace("CHOLMOD_", "")

        if self._lu is not None:
            import scipy.sparse.linalg as spla
            bt = np.asarray(bt, dtype=np.float64)
            rhs2 = np.atleast_2d(bt).reshape(-1, self._n)
            if mode in ("A", "LDLt"):
                x = self._lu.solve(rhs2.T).T
            elif mode in ("L", "LD"):
                x = spla.spsolve_triangular(
                    self._Lc, rhs2.T, lower=True).T
            elif mode in ("Lt", "DLt"):
                x = spla.spsolve_triangular(
                    self._LcT, rhs2.T, lower=False).T
            elif mode == "P":
                x = rhs2[:, self._perm]
            elif mode == "Pt":
                x = rhs2[:, self._perm_inv]
            elif mode == "D":
                x = rhs2
            else:
                raise Exception(f"Unknown solve mode '{mode}'")
            return x.reshape(bt.shape)

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
        CHOLMOD_factorization_rcond = min/max of the factor diagonal).
        Dense: from the Cholesky diagonal; sparse: from the D diagonal of
        the symmetric LDLt — the same quantity CHOLMOD reports (cholmod
        rcond uses the diagonal of the factor), not the loose row-pivoted
        LU estimate."""
        if self._lu is not None:
            return float(self._d.min() / self._d.max())
        d = jnp.abs(jnp.diagonal(self._L)) ** 2
        return float(jnp.min(d) / jnp.max(d))
