"""Lens model registry + projection kernels, TPU-native.

Re-design of mrcal's lens-model machinery (reference: /root/reference/mrcal.c
lines 47-360 registry, 903-3012 projection kernels; types.h:33-181).  The
reference is an X-macro C table with hand-derived gradients; here each model
is one pure jnp projection function `q = project(v, intrinsics)`, broadcast-
native and differentiable by JAX, registered in a plain dict.

Intrinsics vector layouts are identical to the reference:
  - all models with a core: [fx, fy, cx, cy, <distortions...>]
  - OPENCV*: distortions in OpenCV order k1,k2,p1,p2[,k3[,k4,k5,k6[,s1..s4]]]
  - CAHVOR:  alpha, beta, r0, r1, r2                 (mrcal.c:1100-1110)
  - CAHVORE: alpha, beta, r0, r1, r2, e0, e1, e2 + linearity config
  - SPLINED_STEREOGRAPHIC_order=O_Nx=NX_Ny=NY_fov_x_deg=F:
      core + 2*Nx*Ny B-spline control points, layout (Ny, Nx, 2), x-surface
      interleaved with y-surface (mrcal.c:2076-2298)
"""

import re
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401


# ----------------------------------------------------------------------------
# registry / parsing
# ----------------------------------------------------------------------------

# family -> (num_params or None if dynamic, metadata dict)
_FAMILIES = {
    "LENSMODEL_PINHOLE":       (4,  dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_STEREOGRAPHIC": (4,  dict(has_core=True,  can_project_behind_camera=True,  has_gradients=True, noncentral=False)),
    "LENSMODEL_LONLAT":        (4,  dict(has_core=True,  can_project_behind_camera=True,  has_gradients=True, noncentral=False)),
    "LENSMODEL_LATLON":        (4,  dict(has_core=True,  can_project_behind_camera=True,  has_gradients=True, noncentral=False)),
    "LENSMODEL_OPENCV4":       (8,  dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_OPENCV5":       (9,  dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_OPENCV8":       (12, dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_OPENCV12":      (16, dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_CAHVOR":        (9,  dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=False)),
    "LENSMODEL_CAHVORE":       (12, dict(has_core=True,  can_project_behind_camera=False, has_gradients=True, noncentral=True)),
    "LENSMODEL_SPLINED_STEREOGRAPHIC":
                               (None, dict(has_core=True, can_project_behind_camera=True, has_gradients=True, noncentral=False)),
}

_CONFIG_FIELDS = {
    "LENSMODEL_CAHVORE": [("linearity", float)],
    "LENSMODEL_SPLINED_STEREOGRAPHIC":
        [("order", int), ("Nx", int), ("Ny", int), ("fov_x_deg", int)],
}


@dataclass(frozen=True)
class LensModel:
    """A parsed lens model: family + configuration.  Hashable, so it can be a
    static argument under jit."""
    family: str
    order: Optional[int] = None
    Nx: Optional[int] = None
    Ny: Optional[int] = None
    fov_x_deg: Optional[int] = None
    linearity: Optional[float] = None

    @property
    def name(self):
        if self.family == "LENSMODEL_SPLINED_STEREOGRAPHIC":
            return (f"{self.family}_order={self.order}_Nx={self.Nx}"
                    f"_Ny={self.Ny}_fov_x_deg={self.fov_x_deg}")
        if self.family == "LENSMODEL_CAHVORE":
            return f"{self.family}_linearity={self.linearity:.2f}"
        return self.family

    @property
    def num_params(self):
        n, _ = _FAMILIES[self.family]
        if n is not None:
            return n
        return 4 + 2 * self.Nx * self.Ny

    @property
    def metadata(self):
        _, meta = _FAMILIES[self.family]
        return dict(meta)

    # --- splined-model helpers (mrcal.c:1904-1956) ---
    @property
    def segments_per_u(self):
        import math
        assert self.family == "LENSMODEL_SPLINED_STEREOGRAPHIC"
        margin = 1 if self.order == 2 else 2
        th_edge_x = self.fov_x_deg / 2.0 * math.pi / 180.0
        u_edge_x = math.tan(th_edge_x / 2.0) * 2.0
        return (self.Nx - 1 - margin) / (u_edge_x * 2.0)


def parse_lensmodel(name):
    """Parse a mrcal lens-model name string (incl. config suffix) into a
    LensModel (reference parse: mrcal.c:92-254)."""
    if isinstance(name, LensModel):
        return name
    # longest known family that prefixes the name
    family = None
    for fam in sorted(_FAMILIES, key=len, reverse=True):
        if name == fam or name.startswith(fam + "_"):
            family = fam
            break
    if family is None:
        raise ValueError(f"Unknown lens model family in '{name}'")
    cfgstr = name[len(family):]
    cfg = {}
    if cfgstr:
        if not re.fullmatch(r"(?:_[A-Za-z_]+=[0-9.eE+-]+)+", cfgstr):
            raise ValueError(f"Could not parse lens model config in '{name}'")
        for kv in re.finditer(r"_?([A-Za-z_]+?)=([0-9.eE+-]+)", cfgstr):
            cfg[kv.group(1)] = kv.group(2)
    fields = _CONFIG_FIELDS.get(family, [])
    expected = {f[0] for f in fields}
    if set(cfg) != expected:
        raise ValueError(
            f"Lens model '{name}': expected config fields {sorted(expected)}, "
            f"got {sorted(cfg)}")
    kwargs = {fname: ftype(cfg[fname]) for fname, ftype in fields}
    lm = LensModel(family=family, **kwargs)
    if family == "LENSMODEL_SPLINED_STEREOGRAPHIC":
        if lm.order not in (2, 3):
            raise ValueError("spline order must be 2 or 3")
        if lm.Nx < lm.order + 1 or lm.Ny < lm.order + 1:
            raise ValueError("spline grid too small for the given order")
    return lm


def supported_lensmodels():
    """Tuple of supported lens model families (configured families shown with
    placeholder config, matching mrcal.supported_lensmodels())."""
    out = []
    for fam in _FAMILIES:
        if fam in _CONFIG_FIELDS:
            out.append(fam + "_" +
                       "_".join(f"{f}=..." for f, _ in _CONFIG_FIELDS[fam]))
        else:
            out.append(fam)
    return tuple(out)


def lensmodel_num_params(lensmodel):
    return parse_lensmodel(lensmodel).num_params


def lensmodel_metadata_and_config(lensmodel):
    lm = parse_lensmodel(lensmodel)
    out = lm.metadata
    for fname, _ in _CONFIG_FIELDS.get(lm.family, []):
        out[fname] = getattr(lm, fname)
    return out


def knots_for_splined_models(lensmodel):
    """Return (ux, uy): knot locations in normalized stereographic coords
    (reference: mrcal.c:1967-1999)."""
    lm = parse_lensmodel(lensmodel)
    if lm.family != "LENSMODEL_SPLINED_STEREOGRAPHIC":
        raise ValueError("knots_for_splined_models requires a "
                         "LENSMODEL_SPLINED_STEREOGRAPHIC model")
    spu = lm.segments_per_u
    ux = (jnp.arange(lm.Nx, dtype=_xla.default_dtype()) - (lm.Nx - 1) / 2.0) / spu
    uy = (jnp.arange(lm.Ny, dtype=_xla.default_dtype()) - (lm.Ny - 1) / 2.0) / spu
    return ux, uy


# ----------------------------------------------------------------------------
# projection kernels (pure jnp; v: (...,3), intrinsics: (...,Nparams))
# ----------------------------------------------------------------------------

def _core(intrinsics):
    return (intrinsics[..., 0], intrinsics[..., 1],
            intrinsics[..., 2], intrinsics[..., 3])


def _project_pinhole_core(v, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    iz = 1.0 / v[..., 2]
    return jnp.stack([v[..., 0] * iz * fx + cx,
                      v[..., 1] * iz * fy + cy], axis=-1)


def _unproject_pinhole_core(q, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    return jnp.stack([(q[..., 0] - cx) / fx,
                      (q[..., 1] - cy) / fy,
                      jnp.ones_like(q[..., 0])], axis=-1)


def stereographic_uv(v):
    """Normalized stereographic projection u = 2 xy/(|p|+z).  (...,3)->(...,2)."""
    mag = jnp.linalg.norm(v, axis=-1)
    scale = 2.0 / (mag + v[..., 2])
    return v[..., :2] * scale[..., None]


def stereographic_v_from_uv(u):
    """Inverse of stereographic_uv, returning a non-unit vector
    [u, 1 - |u|^2/4] (reference: mrcal.c mrcal_unproject_stereographic)."""
    norm2u = jnp.sum(u * u, axis=-1)
    return jnp.concatenate([u, (1.0 - norm2u / 4.0)[..., None]], axis=-1)


def _project_stereographic_core(v, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    u = stereographic_uv(v)
    return jnp.stack([u[..., 0] * fx + cx, u[..., 1] * fy + cy], axis=-1)


def _unproject_stereographic_core(q, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    u = jnp.stack([(q[..., 0] - cx) / fx, (q[..., 1] - cy) / fy], axis=-1)
    return stereographic_v_from_uv(u)


def _project_lonlat_core(v, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    mag = jnp.linalg.norm(v, axis=-1)
    lon = jnp.arctan2(v[..., 0], v[..., 2])
    lat = jnp.arcsin(v[..., 1] / mag)
    return jnp.stack([lon * fx + cx, lat * fy + cy], axis=-1)


def _unproject_lonlat_core(q, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    lon = (q[..., 0] - cx) / fx
    lat = (q[..., 1] - cy) / fy
    clat = jnp.cos(lat)
    return jnp.stack([clat * jnp.sin(lon), jnp.sin(lat),
                      clat * jnp.cos(lon)], axis=-1)


def _project_latlon_core(v, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    mag = jnp.linalg.norm(v, axis=-1)
    lat = jnp.arcsin(v[..., 0] / mag)
    lon = jnp.arctan2(v[..., 1], v[..., 2])
    return jnp.stack([lat * fx + cx, lon * fy + cy], axis=-1)


def _unproject_latlon_core(q, intrinsics):
    fx, fy, cx, cy = _core(intrinsics)
    lat = (q[..., 0] - cx) / fx
    lon = (q[..., 1] - cy) / fy
    clat = jnp.cos(lat)
    return jnp.stack([jnp.sin(lat), clat * jnp.sin(lon),
                      clat * jnp.cos(lon)], axis=-1)


def _project_opencv_core(v, intrinsics, nparams):
    """OpenCV projectPoints distortion model (reference behavior:
    /root/reference/opencv.c:50 _mrcal_project_internal_opencv).
    Distortion order after the core: k1,k2,p1,p2[,k3[,k4,k5,k6[,s1,s2,s3,s4]]]."""
    fx, fy, cx, cy = _core(intrinsics)
    d = intrinsics[..., 4:]
    z = v[..., 2]
    x = v[..., 0] / z
    y = v[..., 1] / z
    r2 = x * x + y * y
    r4 = r2 * r2
    r6 = r4 * r2

    k1 = d[..., 0]
    k2 = d[..., 1]
    p1 = d[..., 2]
    p2 = d[..., 3]
    num = 1.0 + k1 * r2 + k2 * r4
    den = jnp.ones_like(r2)
    if nparams >= 9:
        num = num + d[..., 4] * r6                       # k3
    if nparams >= 12:
        den = den + d[..., 5] * r2 + d[..., 6] * r4 + d[..., 7] * r6
    radial = num / den
    xy = x * y
    xd = x * radial + 2.0 * p1 * xy + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * xy
    if nparams >= 16:                                     # thin prism s1..s4
        xd = xd + d[..., 8] * r2 + d[..., 9] * r4
        yd = yd + d[..., 10] * r2 + d[..., 11] * r4
    return jnp.stack([xd * fx + cx, yd * fy + cy], axis=-1)


def _project_cahvor_core(v, intrinsics, linearity=None):
    """CAHVOR projection (reference math: mrcal.c:1068-1180 project_cahvor).
    CAHVORE when linearity is not None (mrcal.c / cahvore.cc).

    intrinsics after core: alpha, beta, r0, r1, r2 [, e0, e1, e2]."""
    alpha = intrinsics[..., 4]
    beta = intrinsics[..., 5]
    r0 = intrinsics[..., 6]
    r1 = intrinsics[..., 7]
    r2 = intrinsics[..., 8]

    sa, ca = jnp.sin(alpha), jnp.cos(alpha)
    sb, cb = jnp.sin(beta), jnp.cos(beta)
    # optical axis; o(0,0) = +z, cartesian gradients (no gimbal lock at center)
    o = jnp.stack([sa * cb, sb, ca * cb], axis=-1)

    if linearity is None:
        # CAHVOR: mu = r0 + r1 tau + r2 tau^2, tau = |p|^2/omega^2 - 1
        norm2p = jnp.sum(v * v, axis=-1)
        omega = jnp.sum(v * o, axis=-1)
        tau = norm2p / (omega * omega) - 1.0
        mu = r0 + tau * (r1 + tau * r2)
        p_dist = v + mu[..., None] * (v - omega[..., None] * o)
    else:
        # CAHVORE (exact reference math: cahvore.cc:21
        # _project_cahvore_internals).  Noncentral model: the ray's
        # off-axis angle theta solves a transcendental equation involving
        # the pupil terms e0,e1,e2 (Newton, fixed iterations for jit);
        # then the linearity warp chi and the CAHVOR-style radial term.
        e0 = intrinsics[..., 9]
        e1 = intrinsics[..., 10]
        e2 = intrinsics[..., 11]
        zeta = jnp.sum(v * o, axis=-1)
        ll = v - zeta[..., None] * o
        l = jnp.linalg.norm(ll, axis=-1)
        theta0 = jnp.arctan2(l, zeta)

        def newton_step(_, theta):
            sth = jnp.sin(theta)
            cth = jnp.cos(theta)
            th2 = theta * theta
            th3 = theta * th2
            th4 = theta * th3
            upsilon = (zeta * cth + l * sth
                       + (cth - 1.0) * (e0 + e1 * th2 + e2 * th4)
                       - (theta - sth) * (2.0 * e1 * theta
                                          + 4.0 * e2 * th3))
            dtheta = (zeta * sth - l * cth
                      - (theta - sth) * (e0 + e1 * th2 + e2 * th4)) / upsilon
            return theta - dtheta

        # reference iterates up to 100x with early exit; 20 fixed
        # iterations keep this jit-stable (converges in ~3)
        theta = jax.lax.fori_loop(0, 20, newton_step, theta0)
        lin = linearity
        if lin < -1e-15:
            chi = jnp.sin(theta * lin) / lin
        elif lin > 1e-15:
            chi = jnp.tan(theta * lin) / lin
        else:
            chi = theta
        chi2 = chi * chi
        chi4 = chi2 * chi2
        chi_safe = jnp.where(jnp.abs(chi) < 1e-12, 1.0, chi)
        zetap = l / chi_safe
        mu = r0 + r1 * chi2 + r2 * chi4
        p_dist_big = zetap[..., None] * o + (mu + 1.0)[..., None] * ll
        # theta ~ 0: pdistorted = p (reference: cahvore.cc theta<=1e-8)
        p_dist = jnp.where((theta > 1e-8)[..., None], p_dist_big, v)

    return _project_pinhole_core(p_dist, intrinsics)


# --- splined stereographic ---------------------------------------------------

def _bspline_weights_cubic(t):
    """Uniform cubic B-spline basis on t in [0,1] (mrcal.c:903-916)."""
    t2 = t * t
    t3 = t2 * t
    A = (-t3 + 3 * t2 - 3 * t + 1) / 6.0
    B = (3 * t3 / 2 - 3 * t2 + 2) / 3.0
    C = (-3 * t3 + 3 * t2 + 3 * t + 1) / 6.0
    D = t3 / 6.0
    return jnp.stack([A, B, C, D], axis=-1)


def _bspline_weights_quadratic(t):
    """Uniform quadratic B-spline basis on t in [-1/2,1/2] (mrcal.c:986-996)."""
    t2 = t * t
    A = (4 * t2 - 4 * t + 1) / 8.0
    B = (3 - 4 * t2) / 4.0
    C = (4 * t2 + 4 * t + 1) / 8.0
    return jnp.stack([A, B, C], axis=-1)


def splined_window_index(u, lm):
    """Compute the spline window origin (ix0,iy0) and local coords for a
    normalized stereographic point u.  Returns (ix0, iy0, tx, ty), with
    ix0/iy0 int32 clamped exactly as the reference (mrcal.c:2176-2226)."""
    spu = lm.segments_per_u
    ix = u[..., 0] * spu + (lm.Nx - 1) / 2.0
    iy = u[..., 1] * spu + (lm.Ny - 1) / 2.0
    if lm.order == 3:
        ix0 = jnp.clip(jnp.floor(ix).astype(jnp.int32), 1, lm.Nx - 3)
        iy0 = jnp.clip(jnp.floor(iy).astype(jnp.int32), 1, lm.Ny - 3)
    else:
        ix0 = jnp.clip(jnp.floor(ix + 0.5).astype(jnp.int32), 1, lm.Nx - 2)
        iy0 = jnp.clip(jnp.floor(iy + 0.5).astype(jnp.int32), 1, lm.Ny - 2)
    return ix0, iy0, ix - ix0, iy - iy0


def splined_deltau(u, coeffs, lm):
    """Evaluate the spline correction surface deltau(u).

    u: (...,2) normalized stereographic coords
    coeffs: (..., Ny, Nx, 2) control points (x-surface = [...,0])
    Returns deltau: (...,2).

    Pure gather + weighted sum: maps to TPU as vectorized dynamic-slice; AD
    through the gather yields the sparse-window intrinsics gradient
    (reference: sample_bspline_surface_cubic, mrcal.c:940-975)."""
    ix0, iy0, tx, ty = splined_window_index(u, lm)
    R = lm.order + 1  # window side length
    wx = (_bspline_weights_cubic(tx) if lm.order == 3
          else _bspline_weights_quadratic(tx))        # (...,R)
    wy = (_bspline_weights_cubic(ty) if lm.order == 3
          else _bspline_weights_quadratic(ty))        # (...,R)
    offs = jnp.arange(R, dtype=jnp.int32)
    ixw = ix0[..., None] - 1 + offs                    # (...,R)
    iyw = iy0[..., None] - 1 + offs                    # (...,R)
    # gather window: (...,R,R,2)
    window = coeffs[..., iyw[..., :, None], ixw[..., None, :], :] \
        if coeffs.ndim == 3 else _gather_window_batched(coeffs, iyw, ixw)
    return jnp.einsum("...i,...j,...ijk->...k", wy, wx, window)


def _gather_window_batched(coeffs, iyw, ixw):
    # coeffs has leading batch dims matching u's: gather per batch element
    return jnp.take_along_axis(
        jnp.take_along_axis(
            coeffs, iyw[..., :, None, None], axis=-3),
        ixw[..., None, :, None], axis=-2)


def _project_splined_core(v, intrinsics, lm):
    """Splined-stereographic projection: q = (u + deltau(u)) * f + c
    (reference: _project_point_splined, mrcal.c:2076-2298)."""
    fx, fy, cx, cy = _core(intrinsics)
    u = stereographic_uv(v)
    coeffs = intrinsics[..., 4:].reshape(intrinsics.shape[:-1] + (lm.Ny, lm.Nx, 2))
    du = splined_deltau(u, coeffs, lm)
    return jnp.stack([(u[..., 0] + du[..., 0]) * fx + cx,
                      (u[..., 1] + du[..., 1]) * fy + cy], axis=-1)


# ----------------------------------------------------------------------------
# dispatch
# ----------------------------------------------------------------------------

def project_core(v, intrinsics, lensmodel):
    """q = project(v).  v: (...,3), intrinsics: (...,Nparams) -> q: (...,2).

    Pure jnp; family dispatch is static (lensmodel is a python value)."""
    lm = parse_lensmodel(lensmodel)
    v = jnp.asarray(v)
    intrinsics = jnp.asarray(intrinsics)
    fam = lm.family
    if fam == "LENSMODEL_PINHOLE":
        return _project_pinhole_core(v, intrinsics)
    if fam == "LENSMODEL_STEREOGRAPHIC":
        return _project_stereographic_core(v, intrinsics)
    if fam == "LENSMODEL_LONLAT":
        return _project_lonlat_core(v, intrinsics)
    if fam == "LENSMODEL_LATLON":
        return _project_latlon_core(v, intrinsics)
    if fam.startswith("LENSMODEL_OPENCV"):
        return _project_opencv_core(v, intrinsics, lm.num_params)
    if fam == "LENSMODEL_CAHVOR":
        return _project_cahvor_core(v, intrinsics)
    if fam == "LENSMODEL_CAHVORE":
        return _project_cahvor_core(v, intrinsics, linearity=lm.linearity)
    if fam == "LENSMODEL_SPLINED_STEREOGRAPHIC":
        return _project_splined_core(v, intrinsics, lm)
    raise ValueError(f"Unknown lens model {lm.name}")


_CLOSED_FORM_UNPROJECT = {
    "LENSMODEL_PINHOLE": _unproject_pinhole_core,
    "LENSMODEL_STEREOGRAPHIC": _unproject_stereographic_core,
    "LENSMODEL_LONLAT": _unproject_lonlat_core,
    "LENSMODEL_LATLON": _unproject_latlon_core,
}


def unproject_core(q, intrinsics, lensmodel, iterations=25):
    """v = unproject(q): observation vector with v_z=1 normalization for
    central models.  Models without closed-form inverses use a Newton solve
    in normalized stereographic coordinates, exactly the reference approach
    (mrcal.c:3114-3245 mrcal_unproject) but with a fixed iteration count so
    the whole thing jits.

    Returns (...,3).  For closed-form models the reference's (non-unit)
    conventions are preserved."""
    lm = parse_lensmodel(lensmodel)
    q = jnp.asarray(q)
    intrinsics = jnp.asarray(intrinsics)
    if lm.family in _CLOSED_FORM_UNPROJECT:
        return _CLOSED_FORM_UNPROJECT[lm.family](q, intrinsics)

    # Newton/GN in normalized stereographic space: find u with
    # project(v(u)) == q.  Initial guess: treat the camera as stereographic
    # with the same fxycxy core.
    def solve_one(q1, intr1):
        def body(u, _):
            r = project_core(stereographic_v_from_uv(u), intr1, lm) - q1
            J = jax.jacfwd(
                lambda uu: project_core(stereographic_v_from_uv(uu), intr1, lm))(u)
            JtJ = J.T @ J + jnp.eye(2, dtype=u.dtype) * 1e-12
            # closed-form 2x2 solve: TPU XLA has no f64 LuDecomposition
            # (and Cramer beats a general solve at this size anyway)
            g = J.T @ r
            det = JtJ[0, 0] * JtJ[1, 1] - JtJ[0, 1] * JtJ[1, 0]
            du = jnp.stack([JtJ[1, 1] * g[0] - JtJ[0, 1] * g[1],
                            JtJ[0, 0] * g[1] - JtJ[1, 0] * g[0]]) / det
            return u - du, None
        u0_1 = jnp.stack([(q1[0] - intr1[2]) / intr1[0],
                          (q1[1] - intr1[3]) / intr1[1]])
        u, _ = jax.lax.scan(body, u0_1, None, length=iterations)
        return stereographic_v_from_uv(u)

    # broadcast q against intrinsics
    bshape = jnp.broadcast_shapes(q.shape[:-1], intrinsics.shape[:-1])
    qb = jnp.broadcast_to(q, bshape + (2,)).reshape(-1, 2)
    ib = jnp.broadcast_to(intrinsics, bshape + (intrinsics.shape[-1],)
                          ).reshape(-1, intrinsics.shape[-1])
    v = jax.vmap(solve_one)(qb, ib)
    return v.reshape(bshape + (3,))
