"""The residual machine: mrcal's optimizer_callback as one pure JAX function.

Reference semantics (bit-parity targets):
  - board loop: mrcal.c:4604-4898 (2 weighted-pixel-error measurements per
    corner; weight<0 marks outliers -> 0 residual, 0 gradient)
  - point loop: mrcal.c:4900-5195 (2 measurements; weight<=0 -> outlier)
  - regularization: mrcal.c:5655-5955
  - measurement order: boards -> points -> triangulated -> regularization
  - board geometry: grid spacing*(x,y), z = warp_x*4 xr(1-xr) + warp_y*4
    yr(1-yr), xr=x/(W-1) (mrcal.c:2792-2818)
  - joint transform: rt_cam_ref compose rt_ref_frame (mrcal.c:2656-2680)

Everything is vectorized over observations (gather + broadcast, no Python
loops over data), so it jits once per problem shape and shards over the
observation axis.
"""

import numpy as np
import jax
import jax.numpy as jnp

from .. import _xla
from ..lensmodels import project_core
from ..poseutils import _compose_rt2, _transform_point_rt
from .layout import ProblemSpec, spec_from_inputs


# ----------------------------------------------------------------------------
# inputs normalization
# ----------------------------------------------------------------------------

def arrays_from_inputs(**kw):
    """Extract the dynamic arrays from mrcal-style optimization_inputs.
    Returns a dict of jnp arrays (f64) + int32 index arrays."""
    from .layout import normalize_inputs
    kw = normalize_inputs(kw)
    dt = _xla.default_dtype()

    def arr(name, shape_tail, dtype=dt):
        a = kw.get(name)
        if a is None:
            return jnp.zeros((0,) + shape_tail, dtype=dtype)
        return jnp.asarray(a, dtype=dtype)

    out = dict(
        intrinsics=jnp.asarray(kw["intrinsics"], dtype=dt),
        extrinsics=arr("extrinsics_rt_fromref", (6,)),
        frames=arr("frames_rt_toref", (6,)),
        points=arr("points", (3,)),
        calobject_warp=(jnp.zeros(2, dtype=dt)
                        if kw.get("calobject_warp") is None
                        else jnp.asarray(kw["calobject_warp"], dtype=dt)),
        observations_board=arr("observations_board", (0, 0, 3)),
        indices_board=(jnp.zeros((0, 3), jnp.int32)
                       if kw.get("indices_frame_camintrinsics_camextrinsics")
                       is None else
                       jnp.asarray(kw["indices_frame_camintrinsics_camextrinsics"],
                                   dtype=jnp.int32)),
        observations_point=arr("observations_point", (3,)),
        indices_point=(jnp.zeros((0, 3), jnp.int32)
                       if kw.get("indices_point_camintrinsics_camextrinsics")
                       is None else
                       jnp.asarray(kw["indices_point_camintrinsics_camextrinsics"],
                                   dtype=jnp.int32)),
        observations_point_triangulated=arr(
            "observations_point_triangulated", (3,)),
        indices_triangulated=(
            jnp.zeros((0, 3), jnp.int32)
            if kw.get("indices_point_triangulated_camintrinsics_camextrinsics")
            is None else
            jnp.asarray(
                kw["indices_point_triangulated_camintrinsics_camextrinsics"],
                dtype=jnp.int32)),
    )
    # Pre-unproject the triangulated-point pixel observations into direction
    # vectors using the FIXED intrinsics (triangulated solves require
    # do_optimize_intrinsics*=False; reference: mrcal.c:6260-6275 and
    # mrcal-pywrap.c fill_c_observations_point_triangulated)
    if out["observations_point_triangulated"].shape[0]:
        from ..lensmodels import unproject_core, parse_lensmodel
        lm = parse_lensmodel(kw["lensmodel"])
        q = out["observations_point_triangulated"][:, :2]
        ici = out["indices_triangulated"][:, 1]
        v = unproject_core(q, out["intrinsics"][ici], lm)
        out["px_triangulated"] = \
            v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    else:
        out["px_triangulated"] = jnp.zeros((0, 3), dt)
    return out


def params_from_arrays(arrays):
    """The optimizable parameter pytree, in real (unpacked) units."""
    return dict(intrinsics=arrays["intrinsics"],
                extrinsics=arrays["extrinsics"],
                frames=arrays["frames"],
                points=arrays["points"],
                calobject_warp=arrays["calobject_warp"])


# ----------------------------------------------------------------------------
# board geometry
# ----------------------------------------------------------------------------

def board_points_ref(spec: ProblemSpec, calobject_warp, dtype=None):
    """Calibration-object grid in board coords, with parabolic warp
    (mrcal.c:2792-2818).  -> (H, W, 3)"""
    H = spec.calibration_object_height_n
    W = spec.calibration_object_width_n
    dtype = dtype or calobject_warp.dtype
    y = jnp.arange(H, dtype=dtype)
    x = jnp.arange(W, dtype=dtype)
    xg, yg = jnp.meshgrid(x, y)            # (H,W)
    xr = xg / (W - 1)
    yr = yg / (H - 1)
    z = (calobject_warp[0] * 4.0 * xr * (1.0 - xr) +
         calobject_warp[1] * 4.0 * yr * (1.0 - yr))
    s = spec.calibration_object_spacing
    return jnp.stack([xg * s, yg * s, z], axis=-1)


# ----------------------------------------------------------------------------
# residual blocks
# ----------------------------------------------------------------------------

def _ext_padded(extrinsics):
    """Prepend an identity row so icam_extrinsics=-1 (camera at the
    reference) indexes row 0 with no branching."""
    return jnp.concatenate(
        [jnp.zeros((1, 6), extrinsics.dtype), extrinsics], axis=0)


def residuals_board(params, arrays, spec: ProblemSpec):
    """Weighted board reprojection residuals -> (Nobs, H, W, 2)."""
    if spec.Nobservations_board == 0:
        return jnp.zeros((0,), params["intrinsics"].dtype)
    obs = arrays["observations_board"]                    # (Nobs,H,W,3)
    idx = arrays["indices_board"]                         # (Nobs,3)
    iframe, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]

    rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]   # (Nobs,6)
    rt_ref_frame = params["frames"][iframe]                   # (Nobs,6)
    rt_joint = _compose_rt2(rt_cam_ref, rt_ref_frame)         # (Nobs,6)

    pts = board_points_ref(spec, params["calobject_warp"])    # (H,W,3)
    p_cam = _transform_point_rt(rt_joint[:, None, None, :], pts[None])
    intr = params["intrinsics"][ici][:, None, None, :]        # (Nobs,1,1,Ni)
    q = project_core(p_cam, intr, spec.lensmodel)             # (Nobs,H,W,2)

    w = obs[..., 2]
    factor = jnp.maximum(w, 0.0)          # weight<0 -> outlier -> 0
    return (q - obs[..., :2]) * factor[..., None]


def residuals_point(params, arrays, spec: ProblemSpec):
    """Point-observation residuals -> (Nobs_point, 2)."""
    if spec.Nobservations_point == 0:
        return jnp.zeros((0, 2), params["intrinsics"].dtype)
    obs = arrays["observations_point"]                    # (Nobs,3) qx qy w
    idx = arrays["indices_point"]
    ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]

    p_ref = params["points"][ipt]                         # (Nobs,3)
    rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]
    p_cam = _transform_point_rt(rt_cam_ref, p_ref)
    q = project_core(p_cam, params["intrinsics"][ici], spec.lensmodel)

    w = obs[..., 2]
    factor = jnp.where(w > 0.0, w, 0.0)   # weight<=0 -> outlier (mrcal.c:4918)
    return (q - obs[..., :2]) * factor[..., None]


def _knot_direction_weights(spec: ProblemSpec, dtype):
    """Per-knot radial direction unit vectors + anisotropy factors for
    splined-model regularization (mrcal.c:5738-5785).  Computed with numpy at
    trace time (static)."""
    Nx, Ny = spec.lensmodel.Nx, spec.lensmodel.Ny
    ix, iy = np.meshgrid(np.arange(Nx), np.arange(Ny))
    ux = (2 * ix - Nx + 1).astype(np.float64)
    uy = (2 * iy - Ny + 1).astype(np.float64)
    center = (ux == 0) & (uy == 0)
    mag = np.sqrt(ux * ux + uy * uy)
    mag[center] = 1.0
    ux = ux / mag
    uy = uy / mag
    ux[center] = 1.0
    uy[center] = 0.0
    extra = np.where(center, 1.0, 10.0)
    return (jnp.asarray(ux, dtype), jnp.asarray(uy, dtype),
            jnp.asarray(extra, dtype))


def residuals_regularization(params, arrays, spec: ProblemSpec):
    """Regularization measurements, exactly the reference's scheme
    (mrcal.c:5655-5955) -> (Nreg,)."""
    s = spec.selections
    dt = params["intrinsics"].dtype
    nominal_pixel_error = 0.1
    parts = []

    if s.do_apply_regularization and s.do_optimize_intrinsics_distortions \
            and spec.Ndistortions > 0:
        intr = params["intrinsics"]
        if spec.is_splined:
            scale = nominal_pixel_error / 10.0
            Nx, Ny = spec.lensmodel.Nx, spec.lensmodel.Ny
            du = intr[:, 4:].reshape(spec.Ncameras_intrinsics, Ny, Nx, 2)
            ux, uy, extra = _knot_direction_weights(spec, dt)
            err_rad = scale * (du[..., 0] * ux + du[..., 1] * uy)
            err_tan = scale * extra * (du[..., 0] * uy - du[..., 1] * ux)
            # order per camera: iy, ix, [radial, tangential]
            parts.append(jnp.stack([err_rad, err_tan], axis=-1).reshape(-1))
        else:
            scale = nominal_pixel_error / 1.0
            scale_here = np.full(spec.Ndistortions, scale)
            if (spec.lensmodel.family.startswith("LENSMODEL_OPENCV")
                    and spec.Nintrinsics >= 12):
                # rational-denominator coefficients k4,k5,k6 regularized 5x
                # harder (mrcal.c:5812-5835)
                scale_here[5:8] = scale * 5.0
            scale_here = jnp.asarray(scale_here, dt)
            parts.append((intr[:, spec.Ncore:] * scale_here).reshape(-1))

    if s.do_apply_regularization and spec.has_core \
            and s.do_optimize_intrinsics_core:
        # NOTE: the reference uses imagersizes[0] (camera 0 width) for the
        # scale of ALL cameras (mrcal.c:5858), but per-camera center targets
        W0 = spec.imagersizes[0][0]
        scale = nominal_pixel_error / (W0 * 0.1)
        targets = np.asarray([( (w - 1) * 0.5, (h - 1) * 0.5)
                              for w, h in spec.imagersizes], dtype=np.float64)
        cxy = params["intrinsics"][:, 2:4]
        parts.append((scale * (cxy - jnp.asarray(targets, dt))).reshape(-1))

    if (s.do_apply_regularization_unity_cam01 and s.do_optimize_extrinsics
            and spec.Ncameras_extrinsics > 0):
        scale = nominal_pixel_error / 0.01
        t0 = params["extrinsics"][0, 3:]
        parts.append((scale * (jnp.sum(t0 * t0) - 1.0))[None])

    if not parts:
        return jnp.zeros((0,), dt)
    return jnp.concatenate(parts)


def residuals_triangulated(params, arrays, spec: ProblemSpec):
    """Triangulated-point pairwise ray-divergence measurements
    (reference: mrcal.c:5196-5654).  One SCALAR measurement per observation
    pair within each set; requires fixed intrinsics (the observation pixel
    coords are pre-unprojected into direction vectors px).
    Returns (Npairs,)."""
    if not spec.num_measurements_points_triangulated:
        return jnp.zeros((0,), params["intrinsics"].dtype)
    from ..triangulation import _triangulated_error
    from .layout import triangulated_pair_indices
    from ..poseutils import _rotate_point_r

    px = arrays["px_triangulated"]                      # (N,3) direction vecs
    idx = arrays["indices_triangulated"]                # (N,3)
    w = arrays["observations_point_triangulated"][:, 2]
    ice = idx[:, 2]
    i0, i1 = triangulated_pair_indices(spec.triangulated_set_sizes)
    i0 = jnp.asarray(i0)
    i1 = jnp.asarray(i1)

    ext_pad = _ext_padded(params["extrinsics"])
    rt_0r = ext_pad[ice[i0] + 1]                        # (Npairs,6)
    rt_1r = ext_pad[ice[i1] + 1]
    v0 = px[i0]
    v1 = px[i1]
    # v0 in the ref frame; camera-0 origin in the ref frame
    v0_ref = _rotate_point_r(rt_0r[:, :3], v0, inverted=True)
    t_r0 = -_rotate_point_r(rt_0r[:, :3], rt_0r[:, 3:], inverted=True)
    # ... and into camera-1 coords
    v0_cam1 = _rotate_point_r(rt_1r[:, :3], v0_ref)
    t_10 = _rotate_point_r(rt_1r[:, :3], t_r0) + rt_1r[:, 3:]
    err = _triangulated_error(v1, v0_cam1, t_10)
    # either observation marked outlier (weight<=0) kills the measurement
    valid = (w[i0] > 0) & (w[i1] > 0)
    return jnp.where(valid, err, 0.0)


def residuals_full(params, arrays, spec: ProblemSpec):
    """The complete measurement vector x, ordering identical to the reference
    (boards -> points -> triangulated -> regularization)."""
    xb = residuals_board(params, arrays, spec).reshape(-1)
    xp = residuals_point(params, arrays, spec).reshape(-1)
    xt = residuals_triangulated(params, arrays, spec)
    xr = residuals_regularization(params, arrays, spec)
    return jnp.concatenate([xb, xp, xt, xr])


# ----------------------------------------------------------------------------
# packed-state interface
# ----------------------------------------------------------------------------

def split_packed_state(b, arrays, spec: ProblemSpec):
    """Unpack a packed state vector b into the full parameter pytree,
    filling non-optimized parts from `arrays`.  Pure/traceable."""
    dt = b.dtype
    scales = jnp.asarray(spec.scales(), dt)
    bu = b * scales
    s = spec.selections
    params = dict(params_from_arrays(arrays))

    i = 0
    n = spec.num_states_intrinsics
    if n:
        per = spec.Nintrinsics_state_per_cam
        blk = bu[i:i + n].reshape(spec.Ncameras_intrinsics, per)
        intr = params["intrinsics"]
        j = 0
        if spec.Ncore_state:
            intr = intr.at[:, :4].set(blk[:, :4])
            j = 4
        if s.do_optimize_intrinsics_distortions:
            intr = intr.at[:, spec.Ncore:].set(blk[:, j:])
        params["intrinsics"] = intr
        i += n
    n = spec.num_states_extrinsics
    if n:
        params["extrinsics"] = bu[i:i + n].reshape(-1, 6)
        i += n
    n = spec.num_states_frames
    if n:
        params["frames"] = bu[i:i + n].reshape(-1, 6)
        i += n
    n = spec.num_states_points
    if n:
        pts = bu[i:i + n].reshape(-1, 3)
        params["points"] = jnp.concatenate(
            [pts, params["points"][spec.Npoints_variable:]], axis=0) \
            if spec.Npoints_fixed else pts
        i += n
    if spec.num_states_calobject_warp:
        params["calobject_warp"] = bu[i:i + 2]
        i += 2
    assert i == spec.Nstate
    return params


def pack_params(params, spec: ProblemSpec):
    """Extract the packed state vector from a parameter pytree."""
    s = spec.selections
    parts = []
    if spec.num_states_intrinsics:
        cols = []
        if spec.Ncore_state:
            cols.append(params["intrinsics"][:, :4])
        if s.do_optimize_intrinsics_distortions:
            cols.append(params["intrinsics"][:, spec.Ncore:])
        parts.append(jnp.concatenate(cols, axis=1).reshape(-1))
    if spec.num_states_extrinsics:
        parts.append(params["extrinsics"].reshape(-1))
    if spec.num_states_frames:
        parts.append(params["frames"].reshape(-1))
    if spec.num_states_points:
        parts.append(params["points"][:spec.Npoints_variable].reshape(-1))
    if spec.num_states_calobject_warp:
        parts.append(params["calobject_warp"])
    b = jnp.concatenate(parts) if parts else jnp.zeros((0,))
    return b / jnp.asarray(spec.scales(), b.dtype)


def residuals_from_packed(b, arrays, spec: ProblemSpec):
    return residuals_full(split_packed_state(b, arrays, spec), arrays, spec)


# ----------------------------------------------------------------------------
# public optimizer_callback
# ----------------------------------------------------------------------------

def optimizer_callback(no_jacobian=False, no_factorization=True, **kw):
    """One cost evaluation: returns (b_packed, x, J) with J a scipy CSR
    matrix of shape (Nmeasurements, Nstate) in packed coordinates —
    API-compatible with mrcal.optimizer_callback (mrcal-pywrap.c:1631).

    The Jacobian here is assembled from AD (reverse-mode over the packed
    state); the values match the reference's analytic CSR entries."""
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    params = params_from_arrays(arrays)
    b = pack_params(params, spec)
    x = residuals_from_packed(b, arrays, spec)

    if no_jacobian:
        return np.asarray(b), np.asarray(x), None

    import scipy.sparse
    Jdense = jax.jacrev(lambda bb: residuals_from_packed(bb, arrays, spec))(b)
    J = scipy.sparse.csr_matrix(np.asarray(Jdense))
    return np.asarray(b), np.asarray(x), J


# ----------------------------------------------------------------------------
# cross-reprojection machinery (reference: uncertainty.c N9)
# ----------------------------------------------------------------------------

def residuals_cross(rt_cc, b, arrays, spec: ProblemSpec,
                    rt_cam_star_ref=None):
    """Observation residuals with a rigid reference perturbation inserted
    between every camera and frame transform (reference:
    uncertainty.c:22-130).

    Two flavors (mrcal.h:611-644):
      - 'ccp' (rt_cam_star_ref given): rt_ref_ref* is the conjugate of
        rt_cam*_cam* (=rt_cc, expressed in the query camera's frame);
      - 'rrp' (rt_cam_star_ref=None): rt_cc IS rt_ref_ref* directly.

    Returns the boards+points measurement rows only (the rows Jcross is
    built from)."""
    from ..poseutils import _invert_rt
    params = split_packed_state(b, arrays, spec)
    if rt_cam_star_ref is None:
        rt_ref_refp = rt_cc
    else:
        # rt_ref_ref* = rt_ref_cam* . rt_cam*_cam*' . rt_cam*_ref
        rt_ref_refp = _compose_rt2(
            _invert_rt(rt_cam_star_ref),
            _compose_rt2(rt_cc, rt_cam_star_ref))

    parts = []
    if spec.Nobservations_board:
        obs = arrays["observations_board"]
        idx = arrays["indices_board"]
        iframe, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]
        rt_ref_frame = _compose_rt2(
            jnp.broadcast_to(rt_ref_refp, (idx.shape[0], 6)),
            params["frames"][iframe])
        rt_joint = _compose_rt2(rt_cam_ref, rt_ref_frame)
        pts = board_points_ref(spec, params["calobject_warp"])
        p_cam = _transform_point_rt(rt_joint[:, None, None, :], pts[None])
        intr = params["intrinsics"][ici][:, None, None, :]
        q = project_core(p_cam, intr, spec.lensmodel)
        w = jnp.maximum(obs[..., 2], 0.0)
        parts.append(((q - obs[..., :2]) * w[..., None]).reshape(-1))
    if spec.Nobservations_point:
        obs = arrays["observations_point"]
        idx = arrays["indices_point"]
        ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        p_ref = _transform_point_rt(rt_ref_refp, params["points"][ipt])
        rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]
        p_cam = _transform_point_rt(rt_cam_ref, p_ref)
        q = project_core(p_cam, params["intrinsics"][ici], spec.lensmodel)
        w = jnp.where(obs[..., 2] > 0.0, obs[..., 2], 0.0)
        parts.append(((q - obs[..., :2]) * w[..., None]).reshape(-1))
    if not parts:
        return jnp.zeros((0,), b.dtype)
    return jnp.concatenate(parts)


def drt_cross_reprojection__dbpacked(icam_intrinsics=0, **kw):
    """Kpacked (6, Nstate): the linear map from packed state perturbations
    to the implied rigid transform of the query camera's frame
    (reference: uncertainty.c:798 _mrcal_drt_cross_reprojection__dbpacked).

    Flavors (mrcal.h:636-644): icam_intrinsics >= 0 reports
    drt_cam*_cam*/dbpacked for THAT camera ('ccp'); icam_intrinsics < 0
    reports drt_ref_ref*/dbpacked ('rrp').

      Kpacked = -inv(Jcross_t Jcross) Jcross_t J_packed[frames,points,cw]

    The ccp flavor fits rt_cam*_cam* to the QUERY CAMERA's measurement rows
    only (reference: uncertainty.c:1189-1198 skips other cameras'
    measurements); the rrp flavor uses every row.
    """
    import jax
    from .layout import (spec_from_inputs, normalize_inputs,
                         camera_extrinsics_indices)
    kw = normalize_inputs(kw)
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    params = params_from_arrays(arrays)
    b = pack_params(params, spec)

    row_mask = None
    if icam_intrinsics is None or icam_intrinsics < 0:
        rt_csr = None                               # 'rrp' flavor
    else:
        ices = camera_extrinsics_indices(icam_intrinsics, **kw)
        if ices.size != 1:
            raise NotImplementedError(
                f"cross-reprojection-ccp: camera {icam_intrinsics} is "
                f"observed under {ices.size} extrinsics indices {ices} "
                "(moving camera); only stationary cameras are supported "
                "for the ccp flavor. Use method='mean-pcam'.")
        icam_e = int(ices[0])
        rt_csr = (params["extrinsics"][icam_e] if icam_e >= 0
                  else jnp.zeros(6, b.dtype))
        # row mask over the boards+points measurement rows: the ccp fit
        # uses only the query camera's observations
        masks = []
        if spec.Nobservations_board:
            per_obs = np.asarray(arrays["indices_board"])[:, 1] \
                == icam_intrinsics
            rows_per = 2 * spec.calibration_object_height_n * \
                spec.calibration_object_width_n
            masks.append(np.repeat(per_obs, rows_per))
        if spec.Nobservations_point:
            per_obs = np.asarray(arrays["indices_point"])[:, 1] \
                == icam_intrinsics
            masks.append(np.repeat(per_obs, 2))
        if masks:
            row_mask = jnp.asarray(np.concatenate(masks), b.dtype)

    Jcross = jax.jacfwd(
        lambda rt: residuals_cross(rt, b, arrays, spec, rt_csr))(
        jnp.zeros(6, b.dtype))                     # (Nmeas_obs, 6)
    if row_mask is not None:
        # masking Jcross alone masks both JcT_Jc and JcT_J (the mask is
        # idempotent: Jc' = M Jc gives Jc'^T Jc' = Jc^T M Jc and
        # Jc'^T J = Jc^T M J)
        Jcross = Jcross * row_mask[:, None]

    # dense packed Jacobian of the measurement rows.  The columns kept are
    # the PERTURBED quantities of the cross-reprojection data flow
    # (doc/uncertainty-cross-reprojection.org):
    #   rrp: x_cross_0 = x* + J_[frames,points,cw] db
    #   ccp: x_cross_0 = x* + J_[extrinsics,frames,points,cw] db
    # (the ccp flow is T_cc+ T_c+r+ T_r+f+: extrinsics are perturbed too)
    Jdense = jax.jacrev(lambda bb: residuals_from_packed(bb, arrays, spec))(b)
    Nobs_meas = spec.measurement_index_points_triangulated0
    col0 = (spec.state_index_frames0 if rt_csr is None
            else spec.state_index_extrinsics0)
    J_fpcw = jnp.asarray(Jdense)[:Nobs_meas].at[:, :col0].set(0.0)

    JcT_Jc = Jcross.T @ Jcross
    JcT_J = Jcross.T @ J_fpcw
    # SPD solve via Cholesky: TPU XLA has no f64 LuDecomposition
    L = jnp.linalg.cholesky(JcT_Jc)
    return np.asarray(-jax.scipy.linalg.cho_solve((L, True), JcT_J))
