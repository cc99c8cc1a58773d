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

def _sparse_jacobian(b, arrays, spec: ProblemSpec):
    """The packed-coordinate measurement Jacobian as a scipy CSR matrix,
    assembled from PER-OBSERVATION AD block Jacobians plus the state
    layout's column indices — the dense (Nmeasurements, Nstate) matrix is
    never materialized.  Mirrors the reference's CSR block structure
    (_mrcal_num_j_nonzero, mrcal.c:743): each measurement row carries only
    its own observation's intrinsics / extrinsics / frame-or-point / warp
    blocks; splined rows carry only the (order+1)^2-knot window
    (gradient_sparse_meta_t, mrcal.c:2298-2303)."""
    import scipy.sparse
    from .solver import (_make_board_fn, _make_point_fn, _CLayout,
                         _intr_scales, _reg_per_camera, _merge_intrinsics,
                         _splined_fast_path_ok,
                         _EXT_SCALES, _FRAME_SCALES, _WARP_SCALES,
                         _POINT_SCALES)
    s = spec.selections
    dt = b.dtype
    params = split_packed_state(b, arrays, spec)
    cl = _CLayout(spec)
    Nip = spec.Nintrinsics_state_per_cam
    Npv = spec.Npoints_variable

    # packed per-camera blocks (same prep as the NE builders)
    intr_full = params["intrinsics"]
    iscales = jnp.asarray(_intr_scales(spec), dt)
    cols_i = []
    if spec.Ncore_state:
        cols_i.append(intr_full[..., :4])
    if s.do_optimize_intrinsics_distortions:
        cols_i.append(intr_full[..., spec.Ncore:])
    intr_packed = (jnp.concatenate(cols_i, axis=-1) / iscales if cols_i
                   else jnp.zeros(intr_full.shape[:-1] + (0,), dt))
    ext_packed = params["extrinsics"] / jnp.asarray(_EXT_SCALES, dt)
    ext_pad = jnp.concatenate([jnp.zeros((1, 6), dt), ext_packed], axis=0)
    frames_packed = params["frames"] / jnp.asarray(_FRAME_SCALES, dt)
    warp_packed = params["calobject_warp"] / jnp.asarray(_WARP_SCALES, dt)
    points_packed = params["points"] / jnp.asarray(_POINT_SCALES, dt)

    i_intr0 = spec.state_index_intrinsics0
    i_ext0 = spec.state_index_extrinsics0
    i_fr0 = spec.state_index_frames0
    i_pt0 = spec.state_index_points0
    i_w0 = spec.state_index_calobject_warp0

    ROWS, COLS, VALS = [], [], []

    def emit(rows, cols, vals):
        """rows/cols/vals broadcastable numpy arrays -> COO triplets."""
        rows, cols, vals = np.broadcast_arrays(rows, cols, vals)
        ROWS.append(rows.reshape(-1))
        COLS.append(cols.reshape(-1))
        VALS.append(vals.reshape(-1))

    # ---------------- board observations ----------------
    if spec.Nobservations_board:
        idx = np.asarray(arrays["indices_board"])
        ifr, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        Nobs = idx.shape[0]
        Hn = spec.calibration_object_height_n
        Wn = spec.calibration_object_width_n
        M = 2 * Hn * Wn

        if _splined_fast_path_ok(spec, None):
            # corner-level spline-window Jacobians: the intrinsics block of
            # each corner row is the 2-surface (order+1)^2 window only —
            # true reference sparsity, and no cross-corner jacrev
            # intermediate (the board-level jacrev of a splined observation
            # materializes GBs)
            Jpose, Jwin, wincols = _splined_corner_jacobians(
                spec, arrays, params, intr_packed, ext_pad, frames_packed,
                warp_packed)
            N = Nobs * Hn * Wn
            ifr_c = np.repeat(ifr, Hn * Wn)
            ice_c = np.repeat(ice, Hn * Wn)
            rows_c = (np.arange(N)[:, None, None] * 2 +
                      np.arange(2)[None, :, None])        # (N,2,1)
            emit(rows_c, np.asarray(wincols)[:, None, :] + i_intr0,
                 np.asarray(Jwin))
            if s.do_optimize_extrinsics:
                have = ice_c >= 0
                cole = i_ext0 + 6 * np.maximum(ice_c, 0)
                emit(rows_c[have], cole[have, None, None]
                     + np.arange(6)[None, None, :],
                     np.asarray(Jpose["ext"])[have])
            if s.do_optimize_frames:
                colf = i_fr0 + 6 * ifr_c
                emit(rows_c, colf[:, None, None]
                     + np.arange(6)[None, None, :],
                     np.asarray(Jpose["frame"]))
            if spec.has_calobject_warp:
                emit(rows_c, i_w0 + np.arange(2)[None, None, :],
                     np.asarray(Jpose["warp"]))
        else:
            board_fn = _make_board_fn(spec)
            blocks = dict(
                intr=intr_packed[ici],
                ext=ext_pad[ice + 1],
                frame=frames_packed[ifr],
                warp=jnp.broadcast_to(warp_packed, (Nobs, 2)))
            obs = arrays["observations_board"]
            ifx = intr_full[ici]
            use_fwd = (Nip + 14) < M
            jacf = jax.jacfwd if use_fwd else jax.jacrev
            J = jax.vmap(jacf(board_fn), in_axes=(0, 0, 0, None))(
                blocks, obs, ifx, params["calobject_warp"])
            rows_o = (np.arange(Nobs)[:, None, None] * M +
                      np.arange(M)[None, :, None])        # (Nobs,M,1)
            if Nip:
                coli = i_intr0 + Nip * ici
                emit(rows_o, coli[:, None, None]
                     + np.arange(Nip)[None, None, :],
                     np.asarray(J["intr"]))
            if s.do_optimize_extrinsics:
                have = ice >= 0
                cole = i_ext0 + 6 * np.maximum(ice, 0)
                emit(rows_o[have], cole[have, None, None]
                     + np.arange(6)[None, None, :],
                     np.asarray(J["ext"])[have])
            if s.do_optimize_frames:
                colf = i_fr0 + 6 * ifr
                emit(rows_o, colf[:, None, None]
                     + np.arange(6)[None, None, :],
                     np.asarray(J["frame"]))
            if spec.has_calobject_warp:
                emit(rows_o, i_w0 + np.arange(2)[None, None, :],
                     np.asarray(J["warp"]))

    # ---------------- point observations ----------------
    if spec.Nobservations_point:
        point_fn = _make_point_fn(spec)
        idx = np.asarray(arrays["indices_point"])
        ipt, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        Np = idx.shape[0]
        blocks = dict(intr=intr_packed[ici], ext=ext_pad[ice + 1],
                      point=points_packed[ipt])
        obs = arrays["observations_point"]
        ifx = intr_full[ici]
        J = jax.vmap(jax.jacrev(point_fn))(blocks, obs, ifx)
        r0 = spec.measurement_index_points0
        rows_p = (r0 + np.arange(Np)[:, None, None] * 2 +
                  np.arange(2)[None, :, None])
        if Nip:
            coli = i_intr0 + Nip * ici
            emit(rows_p, coli[:, None, None] + np.arange(Nip)[None, None, :],
                 np.asarray(J["intr"]))
        if s.do_optimize_extrinsics:
            have = ice >= 0
            cole = i_ext0 + 6 * np.maximum(ice, 0)
            emit(rows_p[have], cole[have, None, None]
                 + np.arange(6)[None, None, :],
                 np.asarray(J["ext"])[have])
        if s.do_optimize_frames and Npv:
            have = ipt < Npv
            colp = i_pt0 + 3 * np.minimum(ipt, max(Npv - 1, 0))
            emit(rows_p[have], colp[have, None, None]
                 + np.arange(3)[None, None, :],
                 np.asarray(J["point"])[have])

    # ---------------- triangulated pairs ----------------
    if spec.num_measurements_points_triangulated \
            and s.do_optimize_extrinsics and spec.Ncameras_extrinsics:
        from ..triangulation import _triangulated_error
        from ..poseutils import _rotate_point_r
        from .layout import triangulated_pair_indices
        px = arrays["px_triangulated"]
        idxt = np.asarray(arrays["indices_triangulated"])
        w = arrays["observations_point_triangulated"][:, 2]
        i0, i1 = triangulated_pair_indices(spec.triangulated_set_sizes)
        ice0 = idxt[i0, 2]
        ice1 = idxt[i1, 2]

        def tri_fn(e0p, e1p, v0_1, v1_1, valid):
            sc = jnp.asarray(_EXT_SCALES, dt)
            rt_0r = e0p * sc
            rt_1r = e1p * sc
            v0_ref = _rotate_point_r(rt_0r[:3], v0_1, inverted=True)
            t_r0 = -_rotate_point_r(rt_0r[:3], rt_0r[3:], inverted=True)
            v0_cam1 = _rotate_point_r(rt_1r[:3], v0_ref)
            t_10 = _rotate_point_r(rt_1r[:3], t_r0) + rt_1r[3:]
            return _triangulated_error(v1_1, v0_cam1, t_10) * valid

        valid = jnp.asarray(((np.asarray(w)[i0] > 0)
                             & (np.asarray(w)[i1] > 0)), dt)
        e0g = ext_pad[jnp.asarray(ice0) + 1]
        e1g = ext_pad[jnp.asarray(ice1) + 1]
        J0, J1 = jax.vmap(jax.grad(tri_fn, argnums=(0, 1)))(
            e0g, e1g, px[jnp.asarray(i0)], px[jnp.asarray(i1)], valid)
        r0 = spec.measurement_index_points_triangulated0
        rows_t = r0 + np.arange(len(i0))[:, None]
        for Jk, icek in ((np.asarray(J0), ice0), (np.asarray(J1), ice1)):
            have = icek >= 0
            cole = i_ext0 + 6 * np.maximum(icek, 0)
            emit(rows_t[have], cole[have, None] + np.arange(6)[None, :],
                 Jk[have])

    # ---------------- regularization ----------------
    if spec.num_measurements_regularization:
        r0 = spec.measurement_index_regularization0

        def reg_fn(st, fx, tg):
            return _reg_per_camera(_merge_intrinsics(st, fx, spec), spec,
                                   dt, tg)

        targets = jnp.asarray(
            [[(w_ - 1) * 0.5, (h_ - 1) * 0.5]
             for w_, h_ in spec.imagersizes]
            or np.zeros((spec.Ncameras_intrinsics, 2)), dt)
        if Nip:
            Jreg = np.asarray(jax.vmap(jax.jacrev(reg_fn))(
                intr_packed, intr_full, targets))         # (Nci,nterms,Nip)
            ndist = (spec.Ndistortions
                     if (s.do_apply_regularization
                         and s.do_optimize_intrinsics_distortions) else 0)
            ncp = Jreg.shape[1] - ndist
            Nci = spec.Ncameras_intrinsics
            # entry-by-entry with a nonzero mask: reference reg rows carry
            # single diagonal entries, not dense intrinsics blocks
            for ci in range(Nci):
                coli = i_intr0 + Nip * ci
                blk = Jreg[ci]
                for k in range(ndist):
                    nz = np.nonzero(blk[k])[0]
                    emit(np.full(len(nz), r0 + ci * ndist + k),
                         coli + nz, blk[k, nz])
                for k in range(ncp):
                    nz = np.nonzero(blk[ndist + k])[0]
                    emit(np.full(len(nz), r0 + Nci * ndist + ci * ncp + k),
                         coli + nz, blk[ndist + k, nz])
        if (s.do_apply_regularization_unity_cam01
                and s.do_optimize_extrinsics
                and spec.Ncameras_extrinsics > 0):
            from . import layout as _lay

            def unity_fn(e0p):
                t0 = e0p[3:] * _lay.SCALE_TRANSLATION_CAMERA
                return (0.1 / 0.01) * (jnp.sum(t0 * t0) - 1.0)

            Ju = np.asarray(jax.grad(unity_fn)(ext_packed[0]))
            nz = np.nonzero(Ju)[0]
            emit(np.full(len(nz), spec.Nmeasurements - 1),
                 i_ext0 + nz, Ju[nz])

    if ROWS:
        rows = np.concatenate(ROWS)
        cols = np.concatenate(COLS)
        vals = np.concatenate(VALS)
    else:
        rows = cols = np.zeros(0, np.int64)
        vals = np.zeros(0, np.float64)
    J = scipy.sparse.coo_matrix(
        (vals, (rows, cols)),
        shape=(spec.Nmeasurements, spec.Nstate)).tocsr()
    J.sum_duplicates()
    J.sort_indices()
    return J


def _splined_corner_jacobians(spec, arrays, params, intr_packed, ext_pad,
                              frames_packed, warp_packed):
    """Per-corner pose-block and spline-window Jacobians for the standard
    splined configuration (core locked).  Returns (Jpose dict of (N,2,*),
    Jwin (N,2,2R^2), wincols (N,2R^2) int)."""
    from .solver import (_corner_residual_machinery)
    return _corner_residual_machinery(spec, arrays, params, intr_packed,
                                      ext_pad, frames_packed, warp_packed)


def optimizer_callback(no_jacobian=False, no_factorization=True, **kw):
    """One cost evaluation: returns (b_packed, x, J) with J a scipy CSR
    matrix of shape (Nmeasurements, Nstate) in packed coordinates —
    API-compatible with mrcal.optimizer_callback (mrcal-pywrap.c:1631).

    J is assembled SPARSELY from per-observation AD block Jacobians
    (_sparse_jacobian) — the dense matrix is never formed, so splined /
    SfM-scale problems stay within memory (reference nnz structure:
    _mrcal_num_j_nonzero, mrcal.c:743).  MRCAL_TPU_DENSE_J=1 forces the
    old dense-jacrev path (debugging)."""
    import os as _os
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    params = params_from_arrays(arrays)
    b = pack_params(params, spec)
    x = residuals_from_packed(b, arrays, spec)

    if no_jacobian:
        return np.asarray(b), np.asarray(x), None

    if _os.environ.get("MRCAL_TPU_DENSE_J"):
        import scipy.sparse
        Jdense = jax.jacrev(
            lambda bb: residuals_from_packed(bb, arrays, spec))(b)
        J = scipy.sparse.csr_matrix(np.asarray(Jdense))
    else:
        J = _sparse_jacobian(b, arrays, spec)
    return np.asarray(b), np.asarray(x), J


# ----------------------------------------------------------------------------
# cross-reprojection machinery (reference: uncertainty.c N9)
# ----------------------------------------------------------------------------

def residuals_cross(rt_cc, b, arrays, spec: ProblemSpec,
                    rt_cam_star_ref=None, ccp_per_observation=False):
    """Observation residuals with a rigid reference perturbation inserted
    between every camera and frame transform (reference:
    uncertainty.c:22-130).

    Flavors (mrcal.h:611-644):
      - 'ccp' stationary (rt_cam_star_ref given): rt_ref_ref* is the
        conjugate of rt_cam*_cam* (=rt_cc) by the query camera's single
        extrinsics;
      - 'ccp' general (ccp_per_observation=True): each observation row
        conjugates rt_cc by ITS OWN extrinsics — the reference's
        uncertainty.c accumulates Jcross per measurement row from that
        row's own extrinsics block (uncertainty.c:1189-1260), which is
        exactly this: it handles MOVING cameras (one camera observed
        under many extrinsics).  For a stationary camera the query rows
        reduce to the conjugate form, so the flavors agree wherever the
        ccp row mask is nonzero;
      - 'rrp' (neither given): rt_cc IS rt_ref_ref* directly.

    Returns the boards+points measurement rows only (the rows Jcross is
    built from)."""
    from ..poseutils import _invert_rt
    params = split_packed_state(b, arrays, spec)
    if ccp_per_observation:
        rt_ref_refp = None       # computed per observation row below
    elif rt_cam_star_ref is None:
        rt_ref_refp = rt_cc
    else:
        # rt_ref_ref* = rt_ref_cam* . rt_cam*_cam*' . rt_cam*_ref
        rt_ref_refp = _compose_rt2(
            _invert_rt(rt_cam_star_ref),
            _compose_rt2(rt_cc, rt_cam_star_ref))

    def _rt_rr_rows(rt_cam_ref_rows):
        """Per-row rt_ref_ref*: conjugate rt_cc by each row's own
        extrinsics (identity for rows of the reference camera)."""
        if not ccp_per_observation:
            return jnp.broadcast_to(rt_ref_refp,
                                    rt_cam_ref_rows.shape[:-1] + (6,))
        return _compose_rt2(
            _invert_rt(rt_cam_ref_rows),
            _compose_rt2(jnp.broadcast_to(rt_cc,
                                          rt_cam_ref_rows.shape[:-1] + (6,)),
                         rt_cam_ref_rows))

    parts = []
    if spec.Nobservations_board:
        obs = arrays["observations_board"]
        idx = arrays["indices_board"]
        iframe, ici, ice = idx[:, 0], idx[:, 1], idx[:, 2]
        rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]
        rt_ref_frame = _compose_rt2(
            _rt_rr_rows(rt_cam_ref),
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
        rt_cam_ref = _ext_padded(params["extrinsics"])[ice + 1]
        p_ref = _transform_point_rt(_rt_rr_rows(rt_cam_ref),
                                    params["points"][ipt])
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
    from .layout import spec_from_inputs, normalize_inputs
    kw = normalize_inputs(kw)
    spec = spec_from_inputs(**kw)
    arrays = arrays_from_inputs(**kw)
    params = params_from_arrays(arrays)
    b = pack_params(params, spec)

    row_mask = None
    ccp = not (icam_intrinsics is None or icam_intrinsics < 0)
    if ccp:
        # 'ccp' flavor: each measurement row of the query camera
        # conjugates the perturbation by ITS OWN extrinsics — this is the
        # reference's per-row Jcross accumulation (uncertainty.c:
        # 1189-1260) and handles MOVING cameras (a camera observed under
        # several extrinsics indices) with no special-casing.
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
        lambda rt: residuals_cross(rt, b, arrays, spec,
                                   ccp_per_observation=ccp))(
        jnp.zeros(6, b.dtype))                     # (Nmeas_obs, 6)
    if row_mask is not None:
        # masking Jcross alone masks both JcT_Jc and JcT_J (the mask is
        # idempotent: Jc' = M Jc gives Jc'^T Jc' = Jc^T M Jc and
        # Jc'^T J = Jc^T M J)
        Jcross = Jcross * row_mask[:, None]

    # sparse packed Jacobian of the measurement rows.  The columns kept are
    # the PERTURBED quantities of the cross-reprojection data flow
    # (doc/uncertainty-cross-reprojection.org):
    #   rrp: x_cross_0 = x* + J_[frames,points,cw] db
    #   ccp: x_cross_0 = x* + J_[extrinsics,frames,points,cw] db
    # (the ccp flow is T_cc+ T_c+r+ T_r+f+: extrinsics are perturbed too)
    Nobs_meas = spec.measurement_index_points_triangulated0
    col0 = (spec.state_index_extrinsics0 if ccp
            else spec.state_index_frames0)
    Jsp = _sparse_jacobian(b, arrays, spec)[:Nobs_meas]
    JcT_J = np.asarray((Jsp.T @ np.asarray(Jcross)).T)    # (6, Nstate)
    JcT_J[:, :col0] = 0.0

    JcT_Jc = Jcross.T @ Jcross
    # SPD solve via Cholesky: TPU XLA has no f64 LuDecomposition
    L = jnp.linalg.cholesky(JcT_Jc)
    return np.asarray(-jax.scipy.linalg.cho_solve(
        (L, True), jnp.asarray(JcT_J)))
