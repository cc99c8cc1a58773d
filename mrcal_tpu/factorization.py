"""Factorization of JtJ with reusable solves — the CHOLMOD_factorization
equivalent (reference: mrcal-pywrap.c:435-604 CHOLMOD_factorization class,
CHOLMOD_factorization_solve_xt_JtJ_bt.docstring).

The reference wraps cholmod_analyze/cholmod_factorize and exposes
solve_xt_JtJ_bt (broadcasting over rows of bt) with a mode= argument for
every cholmod_solve2 system.  Here the factorization is a dense Cholesky on
the MXU — calibration-scale JtJ (a few thousand states) is comfortably
dense territory — and all the solve modes are expressed through (L, P)."""

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401


class CHOLMOD_factorization:
    """Factorize JtJ = L L^T once, solve many times.

    Accepts J as a scipy sparse matrix (like the reference) or a dense
    array.  Unlike CHOLMOD there is no fill-reducing permutation (dense
    factorization): the P/Pt modes are identity."""

    def __init__(self, J=None, JtJ=None):
        if JtJ is None:
            if J is None:
                raise Exception("need J or JtJ")
            Jd = J.toarray() if hasattr(J, "toarray") else np.asarray(J)
            JtJ = Jd.T @ Jd
        self._JtJ = jnp.asarray(JtJ)
        self._L = jnp.linalg.cholesky(self._JtJ)
        if not bool(jnp.all(jnp.isfinite(self._L))):
            raise Exception("JtJ is not positive definite")

    def solve_xt_JtJ_bt(self, bt, mode="A", sys=None):
        """Solve xt JtJ = bt for xt, broadcasting over leading dims of bt
        (reference modes: CHOLMOD_A/LDLt/LD/DLt/L/Lt/D/P/Pt).

        With our LL^T factorization: D = I, LD==L, DLt==Lt, P==Pt==I."""
        if sys is not None:
            mode = sys
        mode = mode.replace("CHOLMOD_", "")
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
        """Reciprocal condition-number estimate from the Cholesky diagonal
        (reference: CHOLMOD_factorization_rcond)."""
        d = jnp.abs(jnp.diagonal(self._L)) ** 2
        return float(jnp.min(d) / jnp.max(d))
