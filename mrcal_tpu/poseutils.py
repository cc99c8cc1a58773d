"""Pose/geometry utilities: rotations and rigid transforms, TPU-native.

This is the JAX re-design of mrcal's poseutils layer (reference:
/root/reference/poseutils.c, poseutils-uses-autodiff.cc, mrcal/poseutils.py).
The reference implements every op in C with hand-written analytic gradients
and arbitrary strides, then wraps it in generated broadcasting code.  Here
each op is a single pure jnp function that

  - broadcasts over arbitrary leading dimensions natively,
  - is jit/vmap/grad-compatible (no data-dependent control flow; singularity
    handling via jnp.where with Taylor fallbacks),
  - returns gradients on request (`get_gradients=True`) with the exact tuple
    conventions of the reference Python API (documented per-function in
    /root/reference/mrcal/poseutils.py).

Conventions (identical to the reference):
  - A rotation is either a (3,3) matrix R or a (3,) Rodrigues vector r
    (axis * angle, radians).
  - An rt transform is (6,): [r, t].  Applying to x: rotate(x) + t.
  - An Rt transform is (4,3): R on top, t in the last row.
  - Composition: rt0.rt1 maps "coords-2" to "coords-0" when rt0 maps 1->0 and
    rt1 maps 2->1.
  - Quaternions are (w,x,y,z), w first.
"""

from functools import partial

import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401  (enables x64)

__all__ = [
    "identity_R", "identity_r", "identity_Rt", "identity_rt", "identity_qt",
    "skew_symmetric",
    "r_from_R", "R_from_r", "invert_R",
    "rt_from_Rt", "Rt_from_rt", "invert_Rt", "invert_rt",
    "compose_Rt", "compose_r", "compose_rt",
    "compose_r_tinyr0_gradientr0", "compose_r_tinyr1_gradientr1",
    "compose_rt_tinyrt0_gradientrt0", "compose_rt_tinyrt1_gradientrt1",
    "rotate_point_r", "rotate_point_R",
    "transform_point_rt", "transform_point_Rt",
    "qt_from_Rt", "Rt_from_qt", "quat_from_R", "R_from_quat",
    "R_aligned_to_vector",
]


# ----------------------------------------------------------------------------
# identities
# ----------------------------------------------------------------------------

def identity_R(dtype=None):
    return jnp.eye(3, dtype=dtype or _xla.default_dtype())

def identity_r(dtype=None):
    return jnp.zeros(3, dtype=dtype or _xla.default_dtype())

def identity_Rt(dtype=None):
    return jnp.concatenate([jnp.eye(3, dtype=dtype or _xla.default_dtype()),
                            jnp.zeros((1, 3), dtype=dtype or _xla.default_dtype())],
                           axis=0)

def identity_rt(dtype=None):
    return jnp.zeros(6, dtype=dtype or _xla.default_dtype())

def identity_qt(dtype=None):
    dt = dtype or _xla.default_dtype()
    return jnp.concatenate([jnp.array([1., 0., 0., 0.], dtype=dt),
                            jnp.zeros(3, dtype=dt)])


# ----------------------------------------------------------------------------
# core rotation math (broadcast-native)
# ----------------------------------------------------------------------------

def skew_symmetric(v):
    """skew(v) @ x == cross(v, x).  v: (...,3) -> (...,3,3)"""
    v = jnp.asarray(v)
    x, y, z = v[..., 0], v[..., 1], v[..., 2]
    O = jnp.zeros_like(x)
    return jnp.stack([
        jnp.stack([O, -z,  y], axis=-1),
        jnp.stack([z,  O, -x], axis=-1),
        jnp.stack([-y, x,  O], axis=-1)], axis=-2)


def _R_from_r(r):
    """Rodrigues rotation vector -> rotation matrix.  (...,3) -> (...,3,3).

    R = I + sin(th)/th K + (1-cos(th))/th^2 K^2 with K = skew(r).
    Near th=0 the coefficient functions use their Taylor expansions so the op
    is smooth and differentiable everywhere (reference analytic treatment:
    poseutils.c rotate_point_r / R_from_r paths).
    """
    r = jnp.asarray(r)
    th2 = jnp.sum(r * r, axis=-1)
    tiny = th2 < 1e-18
    th2_safe = jnp.where(tiny, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    # a = sin(th)/th ; b = (1-cos(th))/th^2
    a = jnp.where(tiny, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(tiny, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    K = skew_symmetric(r)
    K2 = K @ K
    I = jnp.broadcast_to(jnp.eye(3, dtype=r.dtype), K.shape)
    return I + a[..., None, None] * K + b[..., None, None] * K2


def _quat_from_R(R):
    """Rotation matrix -> unit quaternion (w,x,y,z), w >= 0.  (...,3,3)->(...,4).

    Branch-free Shepperd's method: compute all four candidate quaternions from
    the four 'pivots' (trace and the three diagonal entries) and select the
    numerically best with jnp.where — robust near th=pi where the classic
    trace formula degrades (reference handles this case in
    poseutils-uses-autodiff.cc r_from_R).
    """
    R = jnp.asarray(R)
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    tr = m00 + m11 + m22

    # four candidates, each valid when its pivot is the largest
    def safe_sqrt(x):
        return jnp.sqrt(jnp.maximum(x, 1e-30))

    qw0 = safe_sqrt(1.0 + tr)                 # 2*w
    q0 = jnp.stack([qw0, (m21 - m12) / qw0, (m02 - m20) / qw0,
                    (m10 - m01) / qw0], axis=-1)

    s1 = safe_sqrt(1.0 + m00 - m11 - m22)     # 2*x
    q1 = jnp.stack([(m21 - m12) / s1, s1, (m01 + m10) / s1,
                    (m02 + m20) / s1], axis=-1)

    s2 = safe_sqrt(1.0 - m00 + m11 - m22)     # 2*y
    q2 = jnp.stack([(m02 - m20) / s2, (m01 + m10) / s2, s2,
                    (m12 + m21) / s2], axis=-1)

    s3 = safe_sqrt(1.0 - m00 - m11 + m22)     # 2*z
    q3 = jnp.stack([(m10 - m01) / s3, (m02 + m20) / s3,
                    (m12 + m21) / s3, s3], axis=-1)

    pivots = jnp.stack([tr, m00, m11, m22], axis=-1)
    best = jnp.argmax(pivots, axis=-1)
    q = jnp.where((best == 0)[..., None], q0,
        jnp.where((best == 1)[..., None], q1,
        jnp.where((best == 2)[..., None], q2, q3)))
    q = q * 0.5
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    # canonicalize sign: w >= 0
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def _r_from_quat(q):
    """Unit quaternion (w,x,y,z) -> Rodrigues vector.  (...,4)->(...,3)."""
    q = jnp.asarray(q)
    w = q[..., 0]
    v = q[..., 1:]
    normv = jnp.linalg.norm(v, axis=-1)
    # th = 2*atan2(|v|, w);  r = th * v/|v|
    th = 2.0 * jnp.arctan2(normv, w)
    tiny = normv < 1e-12
    scale = jnp.where(tiny, 2.0 / jnp.where(jnp.abs(w) < 1e-30, 1.0, w),
                      th / jnp.where(tiny, 1.0, normv))
    return v * scale[..., None]


def _r_from_R(R):
    """Rotation matrix -> Rodrigues vector. (...,3,3)->(...,3)."""
    return _r_from_quat(_quat_from_R(R))


def _quat_from_r(r):
    r = jnp.asarray(r)
    th2 = jnp.sum(r * r, axis=-1)
    tiny = th2 < 1e-18
    th = jnp.sqrt(jnp.where(tiny, 1.0, th2))
    half = 0.5 * th
    # sin(th/2)/th with Taylor fallback
    s = jnp.where(tiny, 0.5 - th2 / 48.0, jnp.sin(half) / th)
    w = jnp.where(tiny, 1.0 - th2 / 8.0, jnp.cos(half))
    return jnp.concatenate([w[..., None], r * s[..., None]], axis=-1)


def _quat_mul(q0, q1):
    w0, x0, y0, z0 = (q0[..., i] for i in range(4))
    w1, x1, y1, z1 = (q1[..., i] for i in range(4))
    return jnp.stack([
        w0 * w1 - x0 * x1 - y0 * y1 - z0 * z1,
        w0 * x1 + x0 * w1 + y0 * z1 - z0 * y1,
        w0 * y1 - x0 * z1 + y0 * w1 + z0 * x1,
        w0 * z1 + x0 * y1 - y0 * x1 + z0 * w1], axis=-1)


def _compose_r(r0, r1):
    """Rodrigues composition r01 such that R(r01) = R(r0) @ R(r1).

    Via quaternions: cheaper and more accurate than matrix round-trip, and
    smooth under AD away from th=2pi wrap.
    """
    return _r_from_quat(_quat_mul(_quat_from_r(r0), _quat_from_r(r1)))


def _rotate_point_r(r, x, inverted=False):
    """R(r) @ x without materializing R: u = x + a*(r x x) + b*(r x (r x x))."""
    r = jnp.asarray(r)
    x = jnp.asarray(x)
    if inverted:
        r = -r
    th2 = jnp.sum(r * r, axis=-1)
    tiny = th2 < 1e-18
    th2_safe = jnp.where(tiny, 1.0, th2)
    th = jnp.sqrt(th2_safe)
    a = jnp.where(tiny, 1.0 - th2 / 6.0, jnp.sin(th) / th)
    b = jnp.where(tiny, 0.5 - th2 / 24.0, (1.0 - jnp.cos(th)) / th2_safe)
    rx = jnp.cross(r, x)
    rrx = jnp.cross(r, rx)
    return x + a[..., None] * rx + b[..., None] * rrx


# ----------------------------------------------------------------------------
# broadcasting + gradient plumbing
# ----------------------------------------------------------------------------

def _finish(result, out):
    """Implement the reference's out= convention: if an out array (or tuple of
    arrays) is given, write results into it and return it."""
    if out is None:
        return result
    import numpy as np
    if isinstance(result, tuple):
        for o, res in zip(out, result):
            np.copyto(np.asarray(o), np.asarray(res))
        return out
    np.copyto(np.asarray(out), np.asarray(result))
    return out


def _vjac(core, sig_in, sig_out, argnums=0):
    """vectorized jacfwd of a core function with given gufunc signature."""
    jac = jax.jacfwd(core, argnums=argnums)
    return jnp.vectorize(jac, signature=f"{sig_in}->{sig_out}")


# ----------------------------------------------------------------------------
# public API
# ----------------------------------------------------------------------------

def R_from_r(r, *, get_gradients=False, out=None):
    """Rodrigues vector(s) -> rotation matrices.  (...,3) -> (...,3,3).

    get_gradients: also return dR/dr with shape (...,3,3,3)
    (reference: mrcal/poseutils.py:108, poseutils.c R_from_r path).
    """
    r = jnp.asarray(r)
    R = _R_from_r(r)
    if not get_gradients:
        return _finish(R, out)
    dR_dr = _vjac(_R_from_r, "(3)", "(3,3,3)")(r)
    return _finish((R, dR_dr), out)


def r_from_R(R, *, get_gradients=False, out=None):
    """Rotation matrices -> Rodrigues vectors.  (...,3,3) -> (...,3).

    get_gradients: also return dr/dR with shape (...,3,3,3)
    (reference: mrcal/poseutils.py:31).
    """
    R = jnp.asarray(R)
    r = _r_from_R(R)
    if not get_gradients:
        return _finish(r, out)
    dr_dR = _vjac(_r_from_R, "(3,3)", "(3,3,3)")(R)
    return _finish((r, dr_dR), out)


def invert_R(R, *, out=None):
    R = jnp.asarray(R)
    return _finish(jnp.swapaxes(R, -1, -2), out)


def rt_from_Rt(Rt, *, get_gradients=False, out=None):
    """(...,4,3) Rt -> (...,6) rt.  get_gradients: also dr/dR (...,3,3,3)."""
    Rt = jnp.asarray(Rt)
    r = _r_from_R(Rt[..., :3, :])
    rt = jnp.concatenate([r, Rt[..., 3, :]], axis=-1)
    if not get_gradients:
        return _finish(rt, out)
    dr_dR = _vjac(_r_from_R, "(3,3)", "(3,3,3)")(Rt[..., :3, :])
    return _finish((rt, dr_dR), out)


def Rt_from_rt(rt, *, get_gradients=False, out=None):
    """(...,6) rt -> (...,4,3) Rt.  get_gradients: also dR/dr (...,3,3,3)."""
    rt = jnp.asarray(rt)
    R = _R_from_r(rt[..., :3])
    Rt = jnp.concatenate([R, rt[..., None, 3:]], axis=-2)
    if not get_gradients:
        return _finish(Rt, out)
    dR_dr = _vjac(_R_from_r, "(3)", "(3,3,3)")(rt[..., :3])
    return _finish((Rt, dR_dr), out)


def invert_Rt(Rt, *, out=None):
    """inv([R|t]) = [R^T | -R^T t].  (...,4,3) -> (...,4,3)."""
    Rt = jnp.asarray(Rt)
    R = Rt[..., :3, :]
    t = Rt[..., 3, :]
    Rinv = jnp.swapaxes(R, -1, -2)
    tinv = -jnp.einsum("...ij,...j->...i", Rinv, t)
    return _finish(jnp.concatenate([Rinv, tinv[..., None, :]], axis=-2), out)


def _invert_rt(rt):
    r = rt[..., :3]
    t = rt[..., 3:]
    tinv = -_rotate_point_r(r, t, inverted=True)
    return jnp.concatenate([-r, tinv], axis=-1)


def invert_rt(rt, *, get_gradients=False, out=None):
    """(...,6) -> (...,6).  get_gradients: also drtout/drtin (...,6,6)."""
    rt = jnp.asarray(rt)
    rt_out = _invert_rt(rt)
    if not get_gradients:
        return _finish(rt_out, out)
    drt = _vjac(_invert_rt, "(6)", "(6,6)")(rt)
    return _finish((rt_out, drt), out)


def _compose_Rt2(Rt0, Rt1):
    R0 = Rt0[..., :3, :]
    t0 = Rt0[..., 3, :]
    R1 = Rt1[..., :3, :]
    t1 = Rt1[..., 3, :]
    R01 = R0 @ R1
    t01 = jnp.einsum("...ij,...j->...i", R0, t1) + t0
    return jnp.concatenate([R01, t01[..., None, :]], axis=-2)


def compose_Rt(*Rt, out=None, inverted0=False, inverted1=False):
    """Compose Rt transformations left-to-right.  Each (...,4,3).

    inverted0/inverted1 invert the first/second argument before composing
    (only valid with exactly 2 arguments, as in the reference).
    """
    if (inverted0 or inverted1) and len(Rt) != 2:
        raise ValueError("inverted0/inverted1 require exactly 2 transforms")
    Rts = [jnp.asarray(x) for x in Rt]
    if inverted0:
        Rts[0] = invert_Rt(Rts[0])
    if inverted1:
        Rts[1] = invert_Rt(Rts[1])
    acc = Rts[0]
    for nxt in Rts[1:]:
        acc = _compose_Rt2(acc, nxt)
    return _finish(acc, out)


def compose_r(*r, get_gradients=False, out=None,
              inverted0=False, inverted1=False):
    """Compose Rodrigues rotations left-to-right.  Each (...,3).

    get_gradients (2 args only): returns (r01, dr01/dr0, dr01/dr1), gradients
    (...,3,3) (reference: mrcal/poseutils.py:628)."""
    if (inverted0 or inverted1 or get_gradients) and len(r) != 2:
        raise ValueError("inverted/get_gradients require exactly 2 rotations")
    rs = [jnp.asarray(x) for x in r]
    if inverted0:
        rs[0] = -rs[0]
    if inverted1:
        rs[1] = -rs[1]
    acc = rs[0]
    for nxt in rs[1:]:
        acc = _compose_r(acc, nxt)
    if not get_gradients:
        return _finish(acc, out)
    dr0 = _vjac(_compose_r, "(3),(3)", "(3,3)", argnums=0)(rs[0], rs[1])
    dr1 = _vjac(_compose_r, "(3),(3)", "(3,3)", argnums=1)(rs[0], rs[1])
    if inverted0:
        dr0 = -dr0
    if inverted1:
        dr1 = -dr1
    return _finish((acc, dr0, dr1), out)


def _compose_rt2(rt0, rt1):
    r01 = _compose_r(rt0[..., :3], rt1[..., :3])
    t01 = _rotate_point_r(rt0[..., :3], rt1[..., 3:]) + rt0[..., 3:]
    return jnp.concatenate([r01, t01], axis=-1)


def compose_rt(*rt, get_gradients=False, out=None,
               inverted0=False, inverted1=False):
    """Compose rt transformations left-to-right.  Each (...,6).

    get_gradients (2 args only): returns (rt01, drt01/drt0, drt01/drt1),
    gradients (...,6,6) (reference: mrcal/poseutils.py:734)."""
    if (inverted0 or inverted1 or get_gradients) and len(rt) != 2:
        raise ValueError("inverted/get_gradients require exactly 2 transforms")
    rts = [jnp.asarray(x) for x in rt]
    if inverted0:
        rts[0] = _invert_rt(rts[0])
    if inverted1:
        rts[1] = _invert_rt(rts[1])
    acc = rts[0]
    for nxt in rts[1:]:
        acc = _compose_rt2(acc, nxt)
    if not get_gradients:
        return _finish(acc, out)
    d0 = _vjac(_compose_rt2, "(6),(6)", "(6,6)", argnums=0)(rts[0], rts[1])
    d1 = _vjac(_compose_rt2, "(6),(6)", "(6,6)", argnums=1)(rts[0], rts[1])
    if inverted0:
        dinv = _vjac(_invert_rt, "(6)", "(6,6)")(jnp.asarray(rt[0]))
        d0 = d0 @ dinv
    if inverted1:
        dinv = _vjac(_invert_rt, "(6)", "(6,6)")(jnp.asarray(rt[1]))
        d1 = d1 @ dinv
    return _finish((acc, d0, d1), out)


def compose_r_tinyr0_gradientr0(r1, *, out=None):
    """d( compose_r(r0, r1) )/dr0 evaluated at r0 = 0.  (...,3) -> (...,3,3)."""
    r1 = jnp.asarray(r1)
    f = lambda r0, r1_: _compose_r(r0, r1_)
    d = _vjac(f, "(3),(3)", "(3,3)", argnums=0)(jnp.zeros_like(r1), r1)
    return _finish(d, out)


def compose_r_tinyr1_gradientr1(r0, *, out=None):
    """d( compose_r(r0, r1) )/dr1 evaluated at r1 = 0.  (...,3) -> (...,3,3)."""
    r0 = jnp.asarray(r0)
    f = lambda r0_, r1: _compose_r(r0_, r1)
    d = _vjac(f, "(3),(3)", "(3,3)", argnums=1)(r0, jnp.zeros_like(r0))
    return _finish(d, out)


def compose_rt_tinyrt0_gradientrt0(rt1, *, out=None):
    """d( compose_rt(rt0, rt1) )/drt0 at rt0 = 0.  (...,6) -> (...,6,6).

    Used by the cross-reprojection uncertainty machinery
    (reference: doc/news-3.0.org, poseutils.c)."""
    rt1 = jnp.asarray(rt1)
    d = _vjac(_compose_rt2, "(6),(6)", "(6,6)", argnums=0)(
        jnp.zeros_like(rt1), rt1)
    return _finish(d, out)


def compose_rt_tinyrt1_gradientrt1(rt0, *, out=None):
    """d( compose_rt(rt0, rt1) )/drt1 at rt1 = 0.  (...,6) -> (...,6,6)."""
    rt0 = jnp.asarray(rt0)
    d = _vjac(_compose_rt2, "(6),(6)", "(6,6)", argnums=1)(
        rt0, jnp.zeros_like(rt0))
    return _finish(d, out)


def rotate_point_r(r, x, *, get_gradients=False, out=None, inverted=False):
    """u = R(r) x  (or R(r)^T x if inverted).  r,x: (...,3).

    get_gradients: returns (u, du/dr (...,3,3), du/dx (...,3,3))."""
    r = jnp.asarray(r)
    x = jnp.asarray(x)
    u = _rotate_point_r(r, x, inverted=inverted)
    if not get_gradients:
        return _finish(u, out)
    f = partial(_rotate_point_r, inverted=inverted)
    du_dr = _vjac(f, "(3),(3)", "(3,3)", argnums=0)(r, x)
    du_dx = _vjac(f, "(3),(3)", "(3,3)", argnums=1)(r, x)
    return _finish((u, du_dr, du_dx), out)


def rotate_point_R(R, x, *, get_gradients=False, out=None, inverted=False):
    """u = R x (or R^T x).  R: (...,3,3), x: (...,3).

    get_gradients: returns (u, du/dR (...,3,3,3), du/dx (...,3,3))."""
    R = jnp.asarray(R)
    x = jnp.asarray(x)

    def f(R_, x_):
        R_ = jnp.swapaxes(R_, -1, -2) if inverted else R_
        return jnp.einsum("...ij,...j->...i", R_, x_)

    u = f(R, x)
    if not get_gradients:
        return _finish(u, out)
    du_dR = _vjac(f, "(3,3),(3)", "(3,3,3)", argnums=0)(R, x)
    du_dx = _vjac(f, "(3,3),(3)", "(3,3)", argnums=1)(R, x)
    return _finish((u, du_dR, du_dx), out)


def _transform_point_rt(rt, x, inverted=False):
    if inverted:
        return _rotate_point_r(rt[..., :3], x - rt[..., 3:], inverted=True)
    return _rotate_point_r(rt[..., :3], x) + rt[..., 3:]


def transform_point_rt(rt, x, *, get_gradients=False, out=None,
                       inverted=False):
    """u = R(rt[:3]) x + rt[3:]  (inverse transform if inverted).

    get_gradients: returns (u, du/drt (...,3,6), du/dx (...,3,3))."""
    rt = jnp.asarray(rt)
    x = jnp.asarray(x)
    u = _transform_point_rt(rt, x, inverted=inverted)
    if not get_gradients:
        return _finish(u, out)
    f = partial(_transform_point_rt, inverted=inverted)
    du_drt = _vjac(f, "(6),(3)", "(3,6)", argnums=0)(rt, x)
    du_dx = _vjac(f, "(6),(3)", "(3,3)", argnums=1)(rt, x)
    return _finish((u, du_drt, du_dx), out)


def _transform_point_Rt(Rt, x, inverted=False):
    R = Rt[..., :3, :]
    t = Rt[..., 3, :]
    if inverted:
        return jnp.einsum("...ji,...j->...i", R, x - t)
    return jnp.einsum("...ij,...j->...i", R, x) + t


def transform_point_Rt(Rt, x, *, get_gradients=False, out=None,
                       inverted=False):
    """u = R x + t with Rt = [R; t] (...,4,3).

    get_gradients: returns (u, du/dRt (...,3,4,3), du/dx (...,3,3))."""
    Rt = jnp.asarray(Rt)
    x = jnp.asarray(x)
    u = _transform_point_Rt(Rt, x, inverted=inverted)
    if not get_gradients:
        return _finish(u, out)
    f = partial(_transform_point_Rt, inverted=inverted)
    du_dRt = _vjac(f, "(4,3),(3)", "(3,4,3)", argnums=0)(Rt, x)
    du_dx = _vjac(f, "(4,3),(3)", "(3,3)", argnums=1)(Rt, x)
    return _finish((u, du_dRt, du_dx), out)


# ----------------------------------------------------------------------------
# quaternions
# ----------------------------------------------------------------------------

def quat_from_R(R, *, out=None):
    """(...,3,3) -> unit quaternion (...,4), (w,x,y,z), w>=0."""
    return _finish(_quat_from_R(jnp.asarray(R)), out)


def R_from_quat(q, *, out=None):
    """(...,4) (w,x,y,z) -> (...,3,3)."""
    q = jnp.asarray(q)
    q = q / jnp.linalg.norm(q, axis=-1, keepdims=True)
    w, x, y, z = (q[..., i] for i in range(4))
    R = jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], axis=-1),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], axis=-1),
    ], axis=-2)
    return _finish(R, out)


def qt_from_Rt(Rt, *, out=None):
    """(...,4,3) Rt -> (...,7) qt = [quaternion(wxyz), t]."""
    Rt = jnp.asarray(Rt)
    q = _quat_from_R(Rt[..., :3, :])
    return _finish(jnp.concatenate([q, Rt[..., 3, :]], axis=-1), out)


def Rt_from_qt(qt, *, out=None):
    """(...,7) qt -> (...,4,3) Rt."""
    qt = jnp.asarray(qt)
    R = R_from_quat(qt[..., :4])
    return _finish(jnp.concatenate([R, qt[..., None, 4:]], axis=-2), out)


# ----------------------------------------------------------------------------
# alignment
# ----------------------------------------------------------------------------

def R_aligned_to_vector(v):
    """An orthonormal R whose 3rd row is v/|v| (reference: poseutils.c
    mrcal_R_aligned_to_vector).  The other two rows complete an arbitrary but
    deterministic right-handed basis."""
    v = jnp.asarray(v)
    z = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    # pick the world axis least aligned with z as the seed for row 0
    seed = jnp.where((jnp.abs(z[..., 0]) < 0.9)[..., None],
                     jnp.broadcast_to(jnp.array([1., 0., 0.], v.dtype), z.shape),
                     jnp.broadcast_to(jnp.array([0., 1., 0.], v.dtype), z.shape))
    x = seed - z * jnp.sum(seed * z, axis=-1, keepdims=True)
    x = x / jnp.linalg.norm(x, axis=-1, keepdims=True)
    y = jnp.cross(z, x)
    return jnp.stack([x, y, z], axis=-2)
