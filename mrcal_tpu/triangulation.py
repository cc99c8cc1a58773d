"""Two-view triangulation, TPU-native.

Reference: /root/reference/triangulation.cc (geometric:108, lindstrom:215,
leecivera l1:437 / linf:516 / mid2:641 / wmid2:711) and the Python wrappers
in /root/reference/mrcal/triangulation.py.  The reference implements each
method with a forward-mode autodiff template; here each is a pure jnp
function (broadcast-native, jit/vmap-safe) and gradients come from JAX.

All failure cases (divergent rays, chirality violations) return (0,0,0),
exactly like the reference.
"""

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from .poseutils import rotate_point_R


def _dot(a, b):
    return jnp.sum(a * b, axis=-1)


def _zero_where(cond, m):
    return jnp.where(cond[..., None], jnp.zeros_like(m), m)


def _parse_args(v1, t01, get_gradients, v_are_local, Rt01):
    """Reference: mrcal/triangulation.py:27."""
    if (Rt01 is not None) == (t01 is not None):
        raise Exception("Exactly one of Rt01 and t01 must be given")
    if v_are_local:
        if get_gradients:
            raise Exception("get_gradients requires v_are_local=False")
        if Rt01 is None:
            raise Exception("v_are_local requires Rt01")
        Rt01 = jnp.asarray(Rt01)
        v1 = rotate_point_R(Rt01[..., :3, :], jnp.asarray(v1))
        t01 = Rt01[..., 3, :]
    else:
        if t01 is None:
            t01 = jnp.asarray(Rt01)[..., 3, :]
            if get_gradients:
                raise Exception("get_gradients requires t01")
    return jnp.asarray(v1), jnp.asarray(t01)


# ----------------------------------------------------------------------------
# core methods (v0, v1, t01 all in camera-0 coords)
# ----------------------------------------------------------------------------

def _geometric(v0, v1, t01):
    """Midpoint of the common perpendicular (triangulation.cc:108)."""
    d00 = _dot(v0, v0)
    d11 = _dot(v1, v1)
    d01 = _dot(v0, v1)
    d0t = _dot(v0, t01)
    d1t = _dot(v1, t01)
    denom = d00 * d11 - d01 * d01
    bad = jnp.abs(denom) <= 1e-10
    denom_safe = jnp.where(bad, 1.0, denom)
    k0 = (d11 * d0t - d01 * d1t) / denom_safe
    k1 = (d01 * d0t - d00 * d1t) / denom_safe
    m = (v0 * k0[..., None] + v1 * k1[..., None] + t01) * 0.5
    return _zero_where(bad | (k0 <= 0) | (k1 <= 0), m)


def _assume_intersect(v0, v1, t01):
    """Intersect two rays assumed coplanar (triangulation.cc:20-60).
    Returns (m, ok)."""
    det_xz = v1[..., 0] * v0[..., 2] - v0[..., 0] * v1[..., 2]
    det_yz = v1[..., 1] * v0[..., 2] - v0[..., 1] * v1[..., 2]
    use_xz = jnp.abs(det_xz) > jnp.abs(det_yz)

    det = jnp.where(use_xz, det_xz, det_yz)
    bad = jnp.abs(det) <= 1e-10
    det_safe = jnp.where(bad, 1.0, det)

    num_xz = t01[..., 2] * v1[..., 0] - t01[..., 0] * v1[..., 2]
    num_yz = t01[..., 2] * v1[..., 1] - t01[..., 1] * v1[..., 2]
    k0 = jnp.where(use_xz, num_xz, num_yz) / det_safe

    k1neg_xz = jnp.logical_xor(
        t01[..., 2] * v0[..., 0] > t01[..., 0] * v0[..., 2], det > 0)
    k1neg_yz = jnp.logical_xor(
        t01[..., 2] * v0[..., 1] > t01[..., 1] * v0[..., 2], det > 0)
    k1_negative = jnp.where(use_xz, k1neg_xz, k1neg_yz)

    ok = (~bad) & (k0 > 0) & (~k1_negative)
    return v0 * k0[..., None], ok


def _chirality(l0, v0, l1, v1, t01):
    """Lee-Civera chirality test (triangulation.cc:577-637)."""
    x_nom = l1[..., None] * v1 + t01 - l0[..., None] * v0
    x0 = l1[..., None] * v1 + t01 + l0[..., None] * v0
    x1 = -l1[..., None] * v1 + t01 - l0[..., None] * v0
    x01 = -l1[..., None] * v1 + t01 + l0[..., None] * v0
    nom2 = _dot(x_nom, x_nom)
    return ((_dot(x0, x0) - nom2 > 0) &
            (_dot(x1, x1) - nom2 > 0) &
            (_dot(x01, x01) - nom2 > 0))


def _leecivera_l1(v0, v1, t01):
    """Lee-Civera L1 method (triangulation.cc:437)."""
    d00 = _dot(v0, v0)
    d11 = _dot(v1, v1)
    d0t = _dot(v0, t01)
    d1t = _dot(v1, t01)
    # project the less-certain ray onto the other's epipolar plane
    use0 = d0t * d0t * d11 > d1t * d1t * d00
    n1 = jnp.cross(v1, t01)
    v0_fix = v0 - n1 * (_dot(v0, n1) / _dot(n1, n1))[..., None]
    n0 = jnp.cross(v0, t01)
    v1_fix = v1 - n0 * (_dot(v1, n0) / _dot(n0, n0))[..., None]
    v0n = jnp.where(use0[..., None], v0_fix, v0)
    v1n = jnp.where(use0[..., None], v1, v1_fix)
    m, ok = _assume_intersect(v0n, v1n, t01)
    return _zero_where(~ok, m)


def _leecivera_linf(v0, v1, t01):
    """Lee-Civera L-infinity method (triangulation.cc:516)."""
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    na = jnp.cross(v0 + v1, t01)
    nb = jnp.cross(v0 - v1, t01)
    use_a = _dot(na, na) > _dot(nb, nb)
    n = jnp.where(use_a[..., None], na, nb)
    v0 = v0 - n * (_dot(v0, n) / _dot(n, n))[..., None]
    v1 = v1 - n * (_dot(v1, n) / _dot(n, n))[..., None]
    m, ok = _assume_intersect(v0, v1, t01)
    return _zero_where(~ok, m)


def _leecivera_mid2(v0, v1, t01):
    """Lee-Civera Mid2 (triangulation.cc:641)."""
    p = jnp.cross(v0, v1)
    p_norm2 = _dot(p, p)
    c1 = jnp.cross(v1, t01)
    c0 = jnp.cross(v0, t01)
    l0 = jnp.sqrt(_dot(c1, c1) / p_norm2)
    l1 = jnp.sqrt(_dot(c0, c0) / p_norm2)
    ok = _chirality(l0, v0, l1, v1, t01)
    m = (v0 * l0[..., None] + t01 + v1 * l1[..., None]) / 2.0
    return _zero_where(~ok, m)


def _leecivera_wmid2(v0, v1, t01):
    """Lee-Civera wMid2 (triangulation.cc:711)."""
    v0 = v0 / jnp.linalg.norm(v0, axis=-1, keepdims=True)
    v1 = v1 / jnp.linalg.norm(v1, axis=-1, keepdims=True)
    p_mag = jnp.linalg.norm(jnp.cross(v0, v1), axis=-1)
    l0 = jnp.linalg.norm(jnp.cross(v1, t01), axis=-1) / p_mag
    l1 = jnp.linalg.norm(jnp.cross(v0, t01), axis=-1) / p_mag
    ok = _chirality(l0, v0, l1, v1, t01)
    m = (v0 * (l0 * l1)[..., None] + t01 * l0[..., None]
         + v1 * (l0 * l1)[..., None]) / (l0 + l1)[..., None]
    return _zero_where(~ok, m)


def _lindstrom(v0_local, v1_local, Rt01):
    """Lindstrom's 2-iteration L2-optimal triangulation
    (triangulation.cc:215, from 'Triangulation Made Easy')."""
    R01 = Rt01[..., :3, :]
    t01 = Rt01[..., 3, :]
    # E = cross-matrix(t01) @ R01 in the reference's flattened layout
    tx, ty, tz = t01[..., 0], t01[..., 1], t01[..., 2]
    R = R01
    E = jnp.stack([
        R[..., 2, 0] * ty - R[..., 1, 0] * tz,
        R[..., 2, 1] * ty - R[..., 1, 1] * tz,
        R[..., 2, 2] * ty - R[..., 1, 2] * tz,
        R[..., 0, 0] * tz - R[..., 2, 0] * tx,
        R[..., 0, 1] * tz - R[..., 2, 1] * tx,
        R[..., 0, 2] * tz - R[..., 2, 2] * tx,
        R[..., 1, 0] * tx - R[..., 0, 0] * ty,
        R[..., 1, 1] * tx - R[..., 0, 1] * ty,
        R[..., 1, 2] * tx - R[..., 0, 2] * ty], axis=-1)

    x0 = jnp.stack([v0_local[..., 0] / v0_local[..., 2],
                    v0_local[..., 1] / v0_local[..., 2]], axis=-1)
    x1 = jnp.stack([v1_local[..., 0] / v1_local[..., 2],
                    v1_local[..., 1] / v1_local[..., 2]], axis=-1)

    n0 = E[..., 0] * x1[..., 0] + E[..., 1] * x1[..., 1] + E[..., 2]
    n1 = E[..., 3] * x1[..., 0] + E[..., 4] * x1[..., 1] + E[..., 5]
    nn0 = E[..., 0] * x0[..., 0] + E[..., 3] * x0[..., 1] + E[..., 6]
    nn1 = E[..., 1] * x0[..., 0] + E[..., 4] * x0[..., 1] + E[..., 7]
    a = (n0 * E[..., 0] * nn0 + n0 * E[..., 1] * nn1 +
         n1 * E[..., 3] * nn0 + n1 * E[..., 4] * nn1)
    b = 0.5 * (n0 * n0 + n1 * n1 + nn0 * nn0 + nn1 * nn1)
    n_2 = E[..., 6] * x1[..., 0] + E[..., 7] * x1[..., 1] + E[..., 8]
    c = n0 * x0[..., 0] + n1 * x0[..., 1] + n_2
    d = jnp.sqrt(b * b - a * c)
    lam = c / (b + d)
    dx0 = lam * n0
    dx1 = lam * n1
    dxx0 = lam * nn0
    dxx1 = lam * nn1
    n0 = n0 - E[..., 0] * dxx0 - E[..., 1] * dxx1
    n1 = n1 - E[..., 3] * dxx0 - E[..., 4] * dxx1
    nn0 = nn0 - E[..., 0] * dx0 - E[..., 3] * dx1
    nn1 = nn1 - E[..., 1] * dx0 - E[..., 4] * dx1
    bb = 0.5 * (n0 * n0 + n1 * n1 + nn0 * nn0 + nn1 * nn1)
    lam = lam / d * bb
    dx0 = lam * n0
    dx1 = lam * n1
    dxx0 = lam * nn0
    dxx1 = lam * nn1
    v0 = jnp.stack([x0[..., 0] - dx0, x0[..., 1] - dx1,
                    jnp.ones_like(dx0)], axis=-1)
    v1 = jnp.stack([x1[..., 0] - dxx0, x1[..., 1] - dxx1,
                    jnp.ones_like(dx0)], axis=-1)
    Rv1 = jnp.einsum("...ij,...j->...i", R01, v1)
    m, ok = _assume_intersect(v0, Rv1, t01)
    return _zero_where(~ok, m)


# ----------------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------------

def _public(corefn, v0, v1, t01, get_gradients, v_are_local, Rt01, out):
    v1, t01 = _parse_args(v1, t01, get_gradients, v_are_local, Rt01)
    v0 = jnp.asarray(v0)
    m = corefn(v0, v1, t01)
    if not get_gradients:
        return _fin(m, out)
    jac = lambda argnum: jnp.vectorize(
        jax.jacfwd(corefn, argnums=argnum),
        signature="(3),(3),(3)->(3,3)")(v0, v1, t01)
    return _fin((m, jac(0), jac(1), jac(2)), out)


def _fin(result, out):
    if out is None:
        return result
    import numpy as _np
    if isinstance(result, tuple):
        for o, r in zip(out, result):
            _np.copyto(_np.asarray(o), _np.asarray(r))
        return out
    _np.copyto(_np.asarray(out), _np.asarray(result))
    return out


def triangulate_geometric(v0, v1, t01=None, *, get_gradients=False,
                          v_are_local=False, Rt01=None, out=None):
    """Classic midpoint triangulation (reference: triangulation.py:61)."""
    return _public(_geometric, v0, v1, t01, get_gradients, v_are_local,
                   Rt01, out)


def triangulate_leecivera_l1(v0, v1, t01=None, *, get_gradients=False,
                             v_are_local=False, Rt01=None, out=None):
    """Lee-Civera L1 triangulation (reference: triangulation.py:206)."""
    return _public(_leecivera_l1, v0, v1, t01, get_gradients, v_are_local,
                   Rt01, out)


def triangulate_leecivera_linf(v0, v1, t01=None, *, get_gradients=False,
                               v_are_local=False, Rt01=None, out=None):
    """Lee-Civera L-infinity triangulation (reference: triangulation.py:356)."""
    return _public(_leecivera_linf, v0, v1, t01, get_gradients, v_are_local,
                   Rt01, out)


def triangulate_leecivera_mid2(v0, v1, t01=None, *, get_gradients=False,
                               v_are_local=False, Rt01=None, out=None):
    """Lee-Civera Mid2 triangulation (reference: triangulation.py:507).
    The recommended method (and the one used in triangulated-point solves)."""
    return _public(_leecivera_mid2, v0, v1, t01, get_gradients, v_are_local,
                   Rt01, out)


def triangulate_leecivera_wmid2(v0, v1, t01=None, *, get_gradients=False,
                                v_are_local=False, Rt01=None, out=None):
    """Lee-Civera wMid2 triangulation (reference: triangulation.py:653)."""
    return _public(_leecivera_wmid2, v0, v1, t01, get_gradients, v_are_local,
                   Rt01, out)


def triangulate_lindstrom(v0, v1, Rt01, *, get_gradients=False, out=None):
    """Lindstrom-optimal L2 triangulation.  v0/v1 are in their LOCAL camera
    coordinates (unlike the other methods; reference: triangulation.py:799)."""
    v0 = jnp.asarray(v0)
    v1 = jnp.asarray(v1)
    Rt01 = jnp.asarray(Rt01)
    m = _lindstrom(v0, v1, Rt01)
    if not get_gradients:
        return _fin(m, out)
    j0 = jnp.vectorize(jax.jacfwd(_lindstrom, argnums=0),
                       signature="(3),(3),(4,3)->(3,3)")(v0, v1, Rt01)
    j1 = jnp.vectorize(jax.jacfwd(_lindstrom, argnums=1),
                       signature="(3),(3),(4,3)->(3,3)")(v0, v1, Rt01)
    jRt = jnp.vectorize(jax.jacfwd(_lindstrom, argnums=2),
                        signature="(3),(3),(4,3)->(3,4,3)")(v0, v1, Rt01)
    return _fin((m, j0, j1, jRt), out)


def _angle_error_small(v0, v1):
    """Small-angle error between two rays: th ~ sqrt(2 (1 - |cos th|))
    (reference: triangulation.cc angle_error__assume_small).  The tiny
    epsilon keeps the sqrt differentiable at perfect convergence."""
    costh = _dot(v0, v1) / jnp.sqrt(_dot(v0, v0) * _dot(v1, v1))
    costh = jnp.abs(costh)
    th_sq = jnp.maximum(2.0 - 2.0 * costh, 0.0)
    return jnp.sqrt(th_sq + 1e-24)


def _sigmoid_knee(x, knee):
    """Smooth 0..1 ramp over [0, knee] (reference: triangulation.cc:900)."""
    a = 2.0 / (knee * knee)
    b = 2.0 / knee
    dx = x - knee / 2.0
    lower = a * dx * dx + b * dx + 0.5
    upper = -a * dx * dx + b * dx + 0.5
    mid = jnp.where(x < knee / 2.0, lower, upper)
    return jnp.where(x <= 0.0, 0.0, jnp.where(x >= knee, 1.0, mid))


def _chirality_worsenings(l0, v0, l1, v1, t01):
    x_nom = l1[..., None] * v1 + t01 - l0[..., None] * v0
    x0 = l1[..., None] * v1 + t01 + l0[..., None] * v0
    x1 = -l1[..., None] * v1 + t01 - l0[..., None] * v0
    x01 = -l1[..., None] * v1 + t01 + l0[..., None] * v0
    nom2 = _dot(x_nom, x_nom)
    return (_dot(x0, x0) - nom2, _dot(x1, x1) - nom2,
            _dot(x01, x01) - nom2)


def _triangulated_error(v0, v1, t01):
    """The scalar ray-divergence measurement used by triangulated-point
    solves (reference: triangulation.cc _mrcal_triangulated_error):
    2x the small-angle error between v0 and the mid2 reconstruction, with a
    smooth divergence penalty when chirality fails."""
    p = jnp.cross(v0, v1)
    p_norm2 = _dot(p, p)
    l0 = jnp.sqrt(_dot(jnp.cross(v1, t01), jnp.cross(v1, t01)) / p_norm2)
    l1 = jnp.sqrt(_dot(jnp.cross(v0, t01), jnp.cross(v0, t01)) / p_norm2)
    m = (v0 * l0[..., None] + t01 + v1 * l1[..., None]) / 2.0
    err = _angle_error_small(v0, m) * 2.0
    w0, w1, w01 = _chirality_worsenings(l0, v0, l1, v1, t01)
    err_vanish = _angle_error_small(v0, v1)
    penalty = (_sigmoid_knee(-w0, 3.0) + _sigmoid_knee(-w1, 3.0)
               + _sigmoid_knee(-w01, 3.0))
    return err + err_vanish * penalty


def triangulate(q, models, *, stabilize_coords=True,
                method=None,
                q_calibration_stdev=None, q_observation_stdev=None,
                q_observation_stdev_correlation=0.0):
    """Triangulate N features observed in two cameras, optionally
    propagating calibration-time and observation-time noise (reference:
    triangulation.py:1616).

    q: (..., 2 cameras, 2) pixel observations, broadcasting over the
    leading dims.  models: 2 cameramodels (from the same solve when
    calibration noise is propagated).

    Return structure per the reference (triangulation.py:1803-1838):
      neither stdev:            p (...,3)
      calibration only:         p, Var_p_calibration (...,3,...,3)
      observation only:         p, Var_p_observation (...,3,3)
      both:                     p, Var_p_calibration, Var_p_observation,
                                Var_p_joint (...,3,...,3)
    A stdev of 0 skips the propagation but still returns zeros of the
    right shape.  Var_p_calibration carries the full CROSS-POINT
    correlations induced by the shared calibration; Var_p_observation is
    block-diagonal (independent per-point pixel noise).

    stabilize_coords: compensate for the motion of the camera-0 coordinate
    system under calibration noise by carrying the triangulated point
    through the (fixed-in-space) frames, like the mean-pcam uncertainty
    does (reference: triangulation.py:1263-1330)."""
    from .projections import unproject
    from .poseutils import compose_Rt, invert_Rt, rotate_point_R
    if method is None:
        method = triangulate_leecivera_mid2
    if method is triangulate_lindstrom and (
            q_calibration_stdev is not None
            or q_observation_stdev is not None):
        raise Exception(
            "Triangulation gradients not supported with "
            "method=triangulate_lindstrom (different inputs); same "
            "restriction as the reference (triangulation.py:1229)")
    q = jnp.asarray(q)
    lead = q.shape[:-2]
    m0, m1 = models
    v0_local = unproject(q[..., 0, :], *m0.intrinsics())
    v1_local = unproject(q[..., 1, :], *m1.intrinsics())
    Rt01 = compose_Rt(m0.Rt_cam_ref(), invert_Rt(m1.Rt_cam_ref()))
    v1 = rotate_point_R(Rt01[..., :3, :], v1_local)
    t01 = Rt01[..., 3, :]
    p = method(v0_local, v1, t01)

    if q_calibration_stdev is None and q_observation_stdev is None:
        return p

    dt = p.dtype
    q2 = q.reshape((-1, 2, 2))                        # (N,2,2)
    N = q2.shape[0]

    Var_obs = None
    if q_observation_stdev is not None:
        if q_observation_stdev < 0:
            raise Exception("q_observation_stdev MUST be None or >= 0")
        if q_observation_stdev == 0:
            Var_obs = np.zeros(lead + (3, 3))
        else:
            def ptri(q01):
                v0l = unproject(q01[0], *m0.intrinsics())
                v1l = unproject(q01[1], *m1.intrinsics())
                v1r = rotate_point_R(Rt01[..., :3, :], v1l)
                return method(v0l, v1r, t01)

            J = jax.vmap(jax.jacfwd(ptri))(q2)        # (N,3,2,2)
            Jf = J.reshape(N, 3, 4)
            rho = q_observation_stdev_correlation
            C = jnp.eye(4, dtype=dt)
            C = C.at[0, 2].set(rho).at[2, 0].set(rho)
            C = C.at[1, 3].set(rho).at[3, 1].set(rho)
            Var_obs = np.asarray(
                (q_observation_stdev ** 2)
                * jnp.einsum("nia,ab,njb->nij", Jf, C, Jf)
            ).reshape(lead + (3, 3))

    Var_cal = None
    if q_calibration_stdev is not None:
        if q_calibration_stdev < 0:
            raise Exception("q_calibration_stdev MUST be None or >= 0")
        if q_calibration_stdev == 0:
            Var_cal = np.zeros(lead + (3,) + lead + (3,))
        else:
            Var_cal = _triangulation_Var_calibration(
                q2, m0, m1, method, q_calibration_stdev,
                stabilize_coords=stabilize_coords)     # (N,3,N,3)
            Var_cal = Var_cal.reshape(lead + (3,) + lead + (3,))

    if Var_cal is None:
        return p, Var_obs
    if Var_obs is None:
        return p, Var_cal
    # joint = calibration (fully correlated across points) + observation
    # (independent per point) on the block diagonal
    Var_joint = Var_cal.reshape(N, 3, N, 3).copy()
    Var_joint[np.arange(N), :, np.arange(N), :] += \
        Var_obs.reshape(N, 3, 3)
    Var_joint = Var_joint.reshape(lead + (3,) + lead + (3,))
    return p, Var_cal, Var_obs, Var_joint


def _triangulation_Var_calibration(q2, m0, m1, method, q_calibration_stdev,
                                   stabilize_coords=True):
    """Propagate calibration-time noise into N triangulated points JOINTLY
    (reference: triangulation.py:1184 _triangulation_uncertainty_internal).
    Both models must come from the same solve (shared optimization_inputs);
    dp/db is computed by AD through unproject+transform+triangulate and
    pushed through Var(b) as ONE (3N, Nstate) block, so the returned
    (N,3,N,3) covariance keeps the cross-point correlations.

    stabilize_coords carries the perturbed point through the perturbed
    frames and back through the baseline frames (fixed-objects-in-space
    compensation, reference triangulation.py:1263-1330)."""
    from .optimize.layout import (spec_from_inputs, normalize_inputs,
                                  camera_extrinsics_indices)
    from .optimize.residuals import (arrays_from_inputs, params_from_arrays,
                                     pack_params, split_packed_state)
    from .model_analysis import _propagate_calibration_uncertainty
    from .poseutils import (_compose_rt2, _invert_rt, _rotate_point_r,
                            _transform_point_rt)
    from .lensmodels import unproject_core, parse_lensmodel

    kw = m0.optimization_inputs()
    if kw is None:
        raise Exception("q_calibration_stdev requires models with "
                        "optimization_inputs")
    kw = normalize_inputs(kw)
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    b0 = pack_params(params_from_arrays(arrays), spec)
    lm = parse_lensmodel(kw["lensmodel"])

    icams = []
    for m in (m0, m1):
        ici = m.icam_intrinsics() or 0
        try:
            ices = camera_extrinsics_indices(ici, **kw)
            ice = int(ices[0]) if ices.size == 1 else -2
        except ValueError:
            ice = -1
        if ice == -2:
            raise Exception("triangulate() calibration-noise propagation "
                            "needs stationary cameras (one extrinsics "
                            "index per camera)")
        icams.append((ici, ice))

    q2 = jnp.asarray(q2)
    N = q2.shape[0]
    frames0 = (jnp.asarray(np.asarray(kw["frames_rt_toref"]), b0.dtype)
               if kw.get("frames_rt_toref") is not None
               and np.asarray(kw["frames_rt_toref"]).size else None)
    stabilize = stabilize_coords and frames0 is not None \
        and spec.selections.do_optimize_frames

    def F(db):
        params = split_packed_state(b0 + db, arrays, spec)
        ext_pad = jnp.concatenate(
            [jnp.zeros((1, 6), b0.dtype), params["extrinsics"]], axis=0)
        (ici0, ice0), (ici1, ice1) = icams
        rt0 = ext_pad[ice0 + 1]
        rt1 = ext_pad[ice1 + 1]
        v0 = unproject_core(q2[:, 0, :], params["intrinsics"][ici0], lm)
        v1l = unproject_core(q2[:, 1, :], params["intrinsics"][ici1], lm)
        # camera1 -> camera0 (perturbed geometry)
        rt01 = _compose_rt2(rt0, _invert_rt(rt1))
        v1 = _rotate_point_r(rt01[..., :3], v1l)
        t01 = jnp.broadcast_to(rt01[..., 3:], v1.shape)
        p_cam = method(v0, v1, t01)                    # (N,3) perturbed
        if not stabilize:
            return p_cam
        # stabilization: perturbed cam0 -> perturbed ref -> (fixed) frames
        # -> baseline ref -> baseline cam0; mean over frames
        rt00 = jnp.asarray(
            np.asarray(kw["extrinsics_rt_fromref"]).reshape(-1, 6)[ice0]
            if ice0 >= 0 else np.zeros(6), b0.dtype)
        p_ref_p = _transform_point_rt(rt0, p_cam, inverted=True)
        p_frames = _transform_point_rt(
            params["frames"][:, None], p_ref_p[None], inverted=True)
        p_ref_0 = _transform_point_rt(frames0[:, None], p_frames)
        p_ref_0 = jnp.mean(p_ref_0, axis=0)            # (N,3)
        return _transform_point_rt(rt00, p_ref_0)

    dF = np.asarray(jax.jacrev(F)(jnp.zeros(spec.Nstate, b0.dtype)))
    # ONE covariance block over all 3N outputs -> full cross-point Var
    Var = _propagate_calibration_uncertainty(
        dF.reshape(3 * N, spec.Nstate), optimization_inputs=kw,
        observed_pixel_uncertainty=q_calibration_stdev,
        what="covariance")
    return np.asarray(Var).reshape(N, 3, N, 3)
