"""Public projection API: mrcal.project / mrcal.unproject equivalents.

Reference: /root/reference/mrcal/projections.py (project:29, unproject:112,
special-model pairs :470-1033).  Gradients come from JAX AD instead of the
reference's hand-written C kernels; broadcasting is native.
"""

import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import lensmodels as _lm
from .lensmodels import project_core, unproject_core, parse_lensmodel


def _finish(result, out):
    if out is None:
        return result
    import numpy as np
    if isinstance(result, tuple):
        for o, r in zip(out, result):
            np.copyto(np.asarray(o), np.asarray(r))
        return out
    np.copyto(np.asarray(out), np.asarray(result))
    return out


def project(v, lensmodel, intrinsics_data, *, get_gradients=False, out=None):
    """Project 3D camera-frame points to pixel coordinates.

    v: (...,3) points, intrinsics_data: (...,Nintrinsics).
    Returns q: (...,2).  With get_gradients=True returns
    (q, dq_dv (...,2,3), dq_dintrinsics (...,2,Nintrinsics)), matching the
    reference API (mrcal/projections.py:29)."""
    lm = parse_lensmodel(lensmodel)
    v = jnp.asarray(v)
    intrinsics_data = jnp.asarray(intrinsics_data)
    q = project_core(v, intrinsics_data, lm)
    if not get_gradients:
        return _finish(q, out)

    Ni = lm.num_params
    f = lambda v_, i_: project_core(v_, i_, lm)
    dq_dv = jnp.vectorize(jax.jacfwd(f, argnums=0),
                          signature=f"(3),({Ni})->(2,3)")(v, intrinsics_data)
    # For big intrinsics vectors (splined models) reverse-mode is the right
    # direction: 2 outputs vs Ni inputs.
    dq_di = jnp.vectorize(jax.jacrev(f, argnums=1),
                          signature=f"(3),({Ni})->(2,{Ni})")(v, intrinsics_data)
    return _finish((q, dq_dv, dq_di), out)


def unproject(q, lensmodel, intrinsics_data, *, normalize=False,
              get_gradients=False, out=None):
    """Unproject pixel coordinates to observation vectors.

    q: (...,2) -> v: (...,3).  normalize=True returns unit vectors.
    With get_gradients=True returns (v, dv_dq (...,3,2),
    dv_dintrinsics (...,3,Nintrinsics)) (reference: projections.py:112)."""
    lm = parse_lensmodel(lensmodel)
    q = jnp.asarray(q)
    intrinsics_data = jnp.asarray(intrinsics_data)

    def f(q_, i_):
        v_ = unproject_core(q_, i_, lm)
        if normalize:
            v_ = v_ / jnp.linalg.norm(v_, axis=-1, keepdims=True)
        return v_

    v = f(q, intrinsics_data)
    if not get_gradients:
        return _finish(v, out)
    Ni = lm.num_params
    # gradients via implicit function theorem would be cheaper; jacfwd through
    # the fixed-iteration solve is correct and simple (2 input dims dominate)
    dv_dq = jnp.vectorize(jax.jacfwd(f, argnums=0),
                          signature=f"(2),({Ni})->(3,2)")(q, intrinsics_data)
    dv_di = jnp.vectorize(jax.jacrev(f, argnums=1),
                          signature=f"(2),({Ni})->(3,{Ni})")(q, intrinsics_data)
    return _finish((v, dv_dq, dv_di), out)


# ----------------------------------------------------------------------------
# special-model convenience pairs (reference: projections.py:470-1033)
# ----------------------------------------------------------------------------

def _special(corefn, points, fxycxy, get_gradients, out, ncoords_in):
    fxycxy = jnp.asarray(fxycxy, dtype=jnp.asarray(points).dtype) \
        if not isinstance(fxycxy, jnp.ndarray) else fxycxy
    points = jnp.asarray(points)
    res = corefn(points, fxycxy)
    if not get_gradients:
        return _finish(res, out)
    nout = res.shape[-1]
    jac = jnp.vectorize(jax.jacfwd(corefn, argnums=0),
                        signature=f"({ncoords_in}),(4)->({nout},{ncoords_in})")
    return _finish((res, jac(points, fxycxy)), out)


def project_pinhole(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._project_pinhole_core, points, fxycxy,
                    get_gradients, out, 3)


def unproject_pinhole(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._unproject_pinhole_core, points, fxycxy,
                    get_gradients, out, 2)


def project_stereographic(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._project_stereographic_core, points, fxycxy,
                    get_gradients, out, 3)


def unproject_stereographic(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._unproject_stereographic_core, points, fxycxy,
                    get_gradients, out, 2)


def project_lonlat(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._project_lonlat_core, points, fxycxy,
                    get_gradients, out, 3)


def unproject_lonlat(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._unproject_lonlat_core, points, fxycxy,
                    get_gradients, out, 2)


def project_latlon(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._project_latlon_core, points, fxycxy,
                    get_gradients, out, 3)


def unproject_latlon(points, fxycxy=None, *, get_gradients=False, out=None):
    if fxycxy is None:
        fxycxy = jnp.array([1., 1., 0., 0.])
    return _special(_lm._unproject_latlon_core, points, fxycxy,
                    get_gradients, out, 2)
