"""Model analysis: uncertainty quantification and model diffing.

Reference: /root/reference/mrcal/model_analysis.py.  The reference leans on
CHOLMOD factorization solves (solve_xt_JtJ_bt); here the same linear algebra
runs as dense/block operations in JAX — calibration problems have a few
thousand states, well within dense-Cholesky territory on the MXU.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

from . import _xla  # noqa: F401
from . import poseutils
from .projections import project, unproject


# ----------------------------------------------------------------------------
# noise-level estimation (reference: model_analysis.py:491)
# ----------------------------------------------------------------------------

def _observed_pixel_uncertainty_from_inputs(optimization_inputs, x=None):
    """Estimate the pixel-observation noise from the residuals at the
    optimum: sigma = sqrt( E[x^2] ) over inlier board+point measurements."""
    from .optimize import optimizer_callback
    from .optimize.layout import spec_from_inputs, normalize_inputs
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)
    if x is None:
        _, x, _ = optimizer_callback(no_jacobian=True, **kw)
    x = np.asarray(x)

    parts = []
    if spec.Nobservations_board:
        xb = x[:spec.num_measurements_boards]
        w = np.asarray(kw["observations_board"])[..., 2].reshape(-1)
        mask = np.repeat(w > 0, 2)
        parts.append(xb[mask])
    if spec.Nobservations_point:
        xp = x[spec.measurement_index_points0:
               spec.measurement_index_points0 + spec.num_measurements_points]
        w = np.asarray(kw["observations_point"])[:, 2]
        parts.append(xp[np.repeat(w > 0, 2)])
    r = np.concatenate(parts) if parts else np.zeros(0)
    if r.size == 0:
        raise Exception("No inlier measurements; cannot estimate noise")
    # Var(x) ~ sigma^2; the residuals are weighted, weights ~1 for inliers
    return float(np.sqrt(np.mean(r * r)))


# ----------------------------------------------------------------------------
# covariance propagation core (reference: model_analysis.py:560)
# ----------------------------------------------------------------------------

def _propagate_calibration_uncertainty(dF_dbpacked=None,
                                       x=None, J=None, factorization=None,
                                       optimization_inputs=None,
                                       observed_pixel_uncertainty=None,
                                       what="covariance"):
    """Var(F) = sigma^2 dF/db inv(JtJ) Jobs_t Jobs inv(JtJ) dF/db_t
    (derivation: reference model_analysis.py:617-680).

    dF_dbpacked: (..., N, Nstate).  Returns (..., N, N) covariance (or
    worst-direction stdev / rms-stdev scalars per `what`)."""
    from .optimize import optimizer_callback
    from .optimize.layout import spec_from_inputs, normalize_inputs
    if optimization_inputs is None:
        raise Exception("optimization_inputs is required")
    kw = normalize_inputs(optimization_inputs)
    spec = spec_from_inputs(**kw)

    if J is None:
        _, x, J = optimizer_callback(**kw)

    if observed_pixel_uncertainty is None:
        observed_pixel_uncertainty = \
            _observed_pixel_uncertainty_from_inputs(kw, x=x)

    # observation rows (not regularization)
    Nobs_meas = spec.measurement_index_regularization0
    if hasattr(J, "tocsr") and spec.Nstate > 4096:
        # SfM scale: keep everything sparse — O(nnz) memory like the
        # reference's CHOLMOD path (uncertainty.c / solve_xt_JtJ_bt)
        from .factorization import CHOLMOD_factorization
        Jcsr = J.tocsr()
        Jobs = Jcsr[:Nobs_meas]
        fac = CHOLMOD_factorization(Jcsr)

        def solve_JtJ(B):
            return fac.solve_xt_JtJ_bt(np.asarray(B).T).T
    else:
        Jd = np.asarray(J.todense()) if hasattr(J, "todense") \
            else np.asarray(J)
        Jobs = Jd[:Nobs_meas]
        JtJ = Jd.T @ Jd
        # inv(JtJ) Jobs_t Jobs inv(JtJ), computed via Cholesky solves
        L = np.linalg.cholesky(JtJ)

        def solve_JtJ(B):
            y = np.linalg.solve(L, B)
            return np.linalg.solve(L.T, y)

    dF = np.asarray(dF_dbpacked)
    if dF.ndim == 1:
        dF = dF[None]
    lead = dF.shape[:-2]          # (...,)
    n = dF.shape[-2]              # rows per covariance block (e.g. 2)
    dF2 = dF.reshape(-1, dF.shape[-1])
    A = solve_JtJ(dF2.T)                    # (Nstate, M*n)
    M = np.asarray(Jobs @ A)                # (Nmeas_obs, M*n)
    M = M.reshape(Nobs_meas, -1, n)         # (Nmeas_obs, M, n)
    Var = np.einsum("mia,mib->iab", M, M) * observed_pixel_uncertainty ** 2
    Var = Var.reshape(lead + (n, n)) if lead else Var[0]
    if what == "covariance":
        return Var
    l = np.linalg.eigvalsh(Var)
    if what == "worstdirection-stdev":
        return np.sqrt(np.maximum(l[..., -1], 0))
    if what == "rms-stdev":
        return np.sqrt(np.maximum(np.mean(l, axis=-1), 0))
    raise Exception(f"Unknown what='{what}'")


def worst_direction_stdev(cov):
    """sqrt of the largest eigenvalue of each (...,2,2) or (...,3,3) block
    (reference: model_analysis.py:398)."""
    cov = jnp.asarray(cov)
    l = jnp.linalg.eigvalsh(cov)
    return jnp.sqrt(jnp.maximum(l[..., -1], 0))


# ----------------------------------------------------------------------------
# projection uncertainty (reference: model_analysis.py:1192)
# ----------------------------------------------------------------------------

def projection_uncertainty(p_cam, model, *,
                           method="mean-pcam",
                           atinfinity=False,
                           what="covariance",
                           observed_pixel_uncertainty=None):
    """Uncertainty of the projection of p_cam (camera coords) induced by the
    calibration-time noise (reference: model_analysis.py:1192).

    Methods: 'mean-pcam' (mrcal<3.0 default) and 'cross-reprojection-ccp'
    (mrcal>=3.0 default: the implied rigid reference perturbation
    rt_cam*_cam* = Kpacked db is propagated; reference:
    model_analysis.py:1265-1410 + uncertainty.c)."""
    if method == "cross-reprojection-ccp":
        return _projection_uncertainty_ccp(
            p_cam, model, atinfinity=atinfinity, what=what,
            observed_pixel_uncertainty=observed_pixel_uncertainty)
    if method not in ("mean-pcam", "cross-reprojection-rrp-Jfp"):
        raise NotImplementedError(
            f"projection_uncertainty method='{method}' "
            "(have: mean-pcam, cross-reprojection-ccp, "
            "cross-reprojection-rrp-Jfp)")

    from .optimize.layout import spec_from_inputs, normalize_inputs
    from .optimize.residuals import pack_params  # noqa: F401
    kw = model.optimization_inputs()
    if kw is None:
        raise Exception("The model has no optimization_inputs; cannot "
                        "compute uncertainty")
    kw = normalize_inputs(kw)
    spec = spec_from_inputs(**kw)
    icam_i = model.icam_intrinsics()
    from .optimize.layout import camera_extrinsics_indices
    # ALL the extrinsics under which this camera was observed.  A stationary
    # camera gives one index; a MOVING camera a consecutive block — the
    # perturbed projections are averaged over the block like the reference
    # (model_analysis.py:937-1110 divides by Ncameras_extrinsics).
    try:
        ices = camera_extrinsics_indices(icam_i, **kw)
    except ValueError:
        ices = np.array([-1])
    if method == "cross-reprojection-rrp-Jfp" and ices.size != 1:
        raise NotImplementedError(
            "cross-reprojection-rrp-Jfp handles stationary cameras only "
            "(the reference has the same restriction, "
            "model_analysis.py:901-903); use method='mean-pcam'")

    p_cam = jnp.asarray(p_cam, dtype=jnp.float64)
    dt = p_cam.dtype
    lensmodel = kw["lensmodel"]

    # For cross-reprojection-rrp-Jfp: the state perturbation implies a rigid
    # motion of the REFERENCE frame, rt_ref_ref* = Kpacked_rrp db
    # (uncertainty.c rrp flavor, icam_intrinsics<0); the query point rides
    # that motion: pref* = T^-1(rt_ref_ref*) pref
    # (reference: model_analysis.py:873-936 _dq_db__Kunpacked_rrp).
    Kp_rrp = None
    if method == "cross-reprojection-rrp-Jfp":
        from .optimize.residuals import drt_cross_reprojection__dbpacked
        Kp_rrp = jnp.asarray(
            drt_cross_reprojection__dbpacked(icam_intrinsics=-1, **kw))

    # F(b) = project( T_cam_ref(b) . mean_f( T_ref_frame_f(b) .
    #                 T_frame_ref0 . T_ref0_cam0 . p_cam ), intrinsics(b) )
    # For mean-pcam: p is anchored to the frames; each frame "carries" the
    # point, and we average the perturbed projections over frames
    # (reference: model_analysis.py:873-1020, the 'mean-pcam' branch).
    def _tx(rt, x, inverted=False):
        """transform, or rotate-only when propagating at infinity
        (translations are irrelevant for directions; reference
        model_analysis atinfinity semantics)."""
        if atinfinity:
            return poseutils._rotate_point_r(rt[..., :3], x,
                                             inverted=inverted)
        return poseutils._transform_point_rt(rt, x, inverted=inverted)

    lead_shape = np.asarray(p_cam).shape[:-1]
    p_flat = p_cam.reshape(-1, 3)                          # (Nq, 3)

    def F(b_packed_delta):
        """q* as a function of the packed-state perturbation: each query
        point is carried through every (extrinsics e, frame f) combination
        of the perturbed solution; the perturbed camera-frame points are
        averaged over both axes (reference mean-pcam math,
        model_analysis.py:985-1110)."""
        from .optimize.residuals import split_packed_state, arrays_from_inputs
        from .optimize.residuals import pack_params, params_from_arrays
        arrays = arrays_from_inputs(**kw)
        params0 = params_from_arrays(arrays)
        b0 = pack_params(params0, spec)
        params = split_packed_state(b0 + b_packed_delta, arrays, spec)
        intr_p = params["intrinsics"][icam_i]

        ice_j = jnp.asarray(np.maximum(ices, 0))
        at_ref = jnp.asarray((ices < 0)[:, None].astype(np.float64))
        if spec.Ncameras_extrinsics:
            ext0 = jnp.asarray(
                np.asarray(kw["extrinsics_rt_fromref"]).reshape(-1, 6), dt)
            rt_cam_ref0 = ext0[ice_j] * (1.0 - at_ref)     # (Ne, 6)
            rt_cam_ref_p = params["extrinsics"][ice_j] * (1.0 - at_ref)
        else:
            rt_cam_ref0 = jnp.zeros((len(ices), 6), dt)
            rt_cam_ref_p = jnp.zeros((len(ices), 6), dt)

        # query points in the unperturbed ref frame, per extrinsics:
        # (Ne, Nq, 3)
        p_ref0 = _tx(rt_cam_ref0[:, None], p_flat[None], inverted=True)
        if Kp_rrp is not None:
            rt_rr = Kp_rrp @ b_packed_delta        # rt_ref_ref*
            p_ref_p = _tx(jnp.broadcast_to(rt_rr, p_ref0.shape[:-1] + (6,)),
                          p_ref0, inverted=True)
        elif spec.Nframes:
            # carry through each (unperturbed -> perturbed) frame, average
            rt_f0 = jnp.asarray(np.asarray(kw["frames_rt_toref"]), dt)
            # (Nframes, Ne, Nq, 3)
            p_frames = _tx(rt_f0[:, None, None], p_ref0[None],
                           inverted=True)
            p_ref_p = _tx(params["frames"][:, None, None], p_frames)
            p_ref_p = jnp.mean(p_ref_p, axis=0)            # (Ne, Nq, 3)
        else:
            p_ref_p = p_ref0
        p_cam_p = _tx(rt_cam_ref_p[:, None], p_ref_p)      # (Ne, Nq, 3)
        p_cam_p = jnp.mean(p_cam_p, axis=0)                # (Nq, 3)
        from .lensmodels import project_core, parse_lensmodel
        return project_core(p_cam_p, intr_p, parse_lensmodel(lensmodel))

    b_zero = jnp.zeros(spec.Nstate, dt)
    q0 = F(b_zero).reshape(lead_shape + (2,))
    dF_db = np.asarray(jax.jacrev(F)(b_zero)).reshape(
        np.asarray(q0).shape[:-1] + (2, spec.Nstate))
    Var = _propagate_calibration_uncertainty(
        dF_db, optimization_inputs=kw,
        observed_pixel_uncertainty=observed_pixel_uncertainty,
        what="covariance")
    Var = np.asarray(Var).reshape(np.asarray(q0).shape[:-1] + (2, 2))
    if what == "covariance":
        return Var if Var.shape[:-2] else Var.reshape(2, 2)
    if what == "worstdirection-stdev":
        return np.asarray(worst_direction_stdev(Var))
    if what == "rms-stdev":
        l = np.linalg.eigvalsh(Var)
        return np.sqrt(np.mean(l, axis=-1))
    raise Exception(f"Unknown what='{what}'")


def _projection_uncertainty_ccp(p_cam, model, *, atinfinity, what,
                                observed_pixel_uncertainty):
    """cross-reprojection-ccp: dq/db = dq/dintrinsics (own columns)
    + dq/d(rt_cam*_cam*) Kpacked, with Kpacked from the cross-reprojection
    solve (reference: model_analysis.py:1317-1410)."""
    from .optimize.layout import spec_from_inputs, normalize_inputs
    from .optimize.residuals import drt_cross_reprojection__dbpacked
    from .poseutils import skew_symmetric
    from .projections import project as _project

    kw = model.optimization_inputs()
    if kw is None:
        raise Exception("The model has no optimization_inputs")
    kw = normalize_inputs(kw)
    spec = spec_from_inputs(**kw)
    icam = model.icam_intrinsics() or 0
    lensmodel = kw["lensmodel"]
    intr = np.asarray(kw["intrinsics"])[icam]

    Kpacked = drt_cross_reprojection__dbpacked(icam_intrinsics=icam, **kw)

    p_cam = np.asarray(p_cam, dtype=np.float64)
    lead = p_cam.shape[:-1]
    p2 = p_cam.reshape(-1, 3)
    _, dq_dpcam, dq_dintr = _project(p2, lensmodel, intr, get_gradients=True)
    dq_dpcam = np.asarray(dq_dpcam)          # (N,2,3)
    dq_dintr = np.asarray(dq_dintr)          # (N,2,Nintr)

    N = len(p2)
    dq_db = np.zeros((N, 2, spec.Nstate))
    # intrinsics columns (packed: multiply by the per-variable scales)
    if spec.Nintrinsics_state_per_cam:
        from .optimize.solver import _intr_scales
        i0 = spec.state_index_intrinsics0 + \
            icam * spec.Nintrinsics_state_per_cam
        cols = []
        if spec.Ncore_state:
            cols.append(dq_dintr[..., :4])
        if spec.selections.do_optimize_intrinsics_distortions:
            cols.append(dq_dintr[..., spec.Ncore:])
        dq_dintr_state = np.concatenate(cols, axis=-1) * _intr_scales(spec)
        dq_db[..., i0:i0 + spec.Nintrinsics_state_per_cam] = dq_dintr_state

    # rigid-perturbation columns via Kpacked
    dpcamp_dr = np.asarray(skew_symmetric(p2))          # (N,3,3)
    dq_dr = np.einsum("nij,njk->nik", dq_dpcam, dpcamp_dr)
    dq_db += np.einsum("nik,km->nim", dq_dr, Kpacked[:3, :])
    if not atinfinity:
        dq_db -= np.einsum("nik,km->nim", dq_dpcam, Kpacked[3:, :])

    Var = _propagate_calibration_uncertainty(
        dq_db, optimization_inputs=kw,
        observed_pixel_uncertainty=observed_pixel_uncertainty,
        what="covariance")
    Var = np.asarray(Var).reshape(lead + (2, 2))
    if what == "covariance":
        return Var if lead else Var.reshape(2, 2)
    l = np.linalg.eigvalsh(Var)
    if what == "worstdirection-stdev":
        return np.sqrt(np.maximum(l[..., -1], 0))
    if what == "rms-stdev":
        return np.sqrt(np.maximum(np.mean(l, axis=-1), 0))
    raise Exception(f"Unknown what='{what}'")


# ----------------------------------------------------------------------------
# model diffing (reference: model_analysis.py:27, :1520)
# ----------------------------------------------------------------------------

def implied_Rt10__from_unprojections(q0, p0, v1,
                                     *, weights=None,
                                     atinfinity=True,
                                     focus_center=None, focus_radius=1e8):
    """Find the implied transform Rt10 that best maps unprojections p0 (in
    camera-0 coords) to observation directions v1 of camera 1
    (reference: model_analysis.py:27).  Procrustes fit."""
    from .utils import align_procrustes_vectors_R01, \
        align_procrustes_points_Rt01
    p0 = jnp.asarray(p0)
    v1 = jnp.asarray(v1)
    if weights is None:
        weights = jnp.ones(p0.shape[:-1])
    if focus_center is not None:
        q0 = jnp.asarray(q0)
        r2 = jnp.sum((q0 - jnp.asarray(focus_center)) ** 2, axis=-1)
        weights = weights * (r2 <= focus_radius ** 2)
    if atinfinity:
        R10 = align_procrustes_vectors_R01(v1.reshape(-1, 3),
                                           p0.reshape(-1, 3),
                                           weights.reshape(-1))
        return jnp.concatenate([R10, jnp.zeros((1, 3), p0.dtype)], axis=0)
    # finite distance: a point-procrustes of unit v1 against range-d p0 is
    # WRONG (the centroid shift absorbs the range).  Like the reference
    # (model_analysis.py:217-246 residual_jacobian_rt + least_squares), fit
    # rt minimizing the angular mismatch th2 = 2(1-cos) between
    # transform(rt, p0) and v1, Huber-robustified at 5deg
    return _fit_implied_rt_finite(p0.reshape(-1, 3), v1.reshape(-1, 3),
                                  weights.reshape(-1))


@functools.partial(jax.jit, static_argnames=("niter",))
def _fit_implied_rt_finite(p0, v1, weights, niter=200):
    """Levenberg-Marquardt fit of the implied camera0->camera1 transform
    at a finite distance (reference model_analysis.py:217-246,378: residual
    x = w*th2 with th2 ~ angle^2 between transform_point_rt(rt,p0) and v1,
    huber loss with f_scale=(5deg)^2, seeded near identity).  Weights are
    normalized to mean 1 and ratio-clipped; LM accept/reject damping keeps
    the ill-conditioned directions (e.g. weights concentrated in a small
    region leave the along-ray translation barely observable) stable."""
    finite = (jnp.all(jnp.isfinite(p0), axis=-1)
              & jnp.all(jnp.isfinite(v1), axis=-1)
              & jnp.isfinite(weights))
    w = jnp.where(finite, weights, 0.0)
    p0 = jnp.nan_to_num(p0)
    v1 = jnp.nan_to_num(v1)
    # normalize + clip: only RELATIVE weights matter for the optimum, and
    # extreme ratios make the normal equations numerically rank-deficient
    nnz = jnp.maximum(jnp.sum(w > 0), 1)
    w = w / jnp.maximum(jnp.sum(w) / nnz, 1e-300)
    w = jnp.minimum(w, 1e3)
    f_scale = (5.0 * jnp.pi / 180.0) ** 2

    def th2_of(rt):
        p = poseutils.transform_point_rt(rt, p0)
        mag = jnp.linalg.norm(p, axis=-1)
        inner = jnp.sum(p * v1, axis=-1)
        return 2.0 * (1.0 - inner / jnp.maximum(mag, 1e-30))

    def resid(rt):
        # huber IRLS form: w * th2 with influence capped beyond f_scale.
        # stop_gradient on the weight: the IRLS linearization holds the
        # weight FIXED per iteration (scipy least_squares loss='huber'
        # semantics); differentiating through it biases the GN step near
        # the huber transition
        th2 = th2_of(rt)
        w_h = w * jnp.minimum(1.0, f_scale / jnp.maximum(jnp.abs(th2),
                                                         1e-30)) ** 0.5
        return th2 * jax.lax.stop_gradient(w_h)

    def cost(rt):
        return jnp.sum(resid(rt) ** 2)

    def body(state):
        rt, lam, E, it, stalled = state
        x = resid(rt)
        J = jax.jacfwd(resid)(rt)
        H = J.T @ J
        damp = (lam * jnp.trace(H) / 6.0 + 1e-300) \
            * jnp.eye(6, dtype=H.dtype)
        step = jnp.linalg.solve(H + damp, J.T @ x)
        rt_new = jnp.nan_to_num(rt - step)
        E_new = cost(rt_new)
        accept = E_new <= E
        # stagnation: accepted relative improvement below ~gtol AND a tiny
        # step (reference iterates scipy least_squares to gtol; a fixed
        # iteration count under-converges large genuine relative poses)
        rel_impr = (E - E_new) / jnp.maximum(E, 1e-300)
        stalled = accept & (rel_impr < 1e-12) & \
            (jnp.max(jnp.abs(step)) < 1e-10)
        rt = jnp.where(accept, rt_new, rt)
        E = jnp.where(accept, E_new, E)
        lam = jnp.where(accept, jnp.maximum(lam * 0.3, 1e-12), lam * 10.0)
        return rt, lam, E, it + 1, stalled

    def cond(state):
        rt, lam, E, it, stalled = state
        return (~stalled) & (it < niter) & (lam < 1e8)

    rt0 = jnp.zeros(6, p0.dtype)
    rt, _, _, _, _ = jax.lax.while_loop(
        cond, body, (rt0, jnp.asarray(1e-6, p0.dtype), cost(rt0),
                     jnp.asarray(0, jnp.int32), jnp.asarray(False)))
    return poseutils.Rt_from_rt(rt)


def projection_diff(models, *, gridn_width=60, gridn_height=None,
                    distance=None, use_uncertainties=False,
                    intrinsics_only=False,
                    focus_center=None, focus_radius=-1,
                    implied_Rt10=None):
    """Difference in projection between N models (reference:
    model_analysis.py:1520).  Returns (difflen, diff, q0, implied_Rt10).

    len(models)==2: difflen/diff are the magnitude/vector of the q1-q0
    mismatch after compensating the implied transform.  len(models)>2
    (reference :1858-1914): each model i>0 is compared against model 0,
    difflen = RMS over the pairs, diff is None, and the returned Rt10
    stacks the (N-1) implied transforms.  intrinsics_only=True skips the
    implied-transform fit (identity geometry)."""
    from .utils import sample_imager_unproject
    if len(models) < 2:
        raise Exception("projection_diff needs at least 2 models")
    if len(models) > 2 and implied_Rt10 is not None:
        raise Exception("implied_Rt10 may be given only with 2 models")
    W, H = models[0].imagersize()
    lens0, intr0 = models[0].intrinsics()
    v0, q0 = sample_imager_unproject(gridn_width, gridn_height, W, H,
                                     lens0, intr0, normalize=True)
    atinfinity = distance is None
    d = 1.0 if atinfinity else distance
    p0 = v0 * d

    def stdev_grid(m):
        """worstdirection-stdev of each grid point's projection, used to
        weight the implied-transform fit (reference :1818-1829: w =
        (1/(unc0*unc1))^2).  Needs optimization_inputs in the model."""
        if m.optimization_inputs() is None:
            raise LookupError("no optimization_inputs")
        v = unproject(q0, *m.intrinsics(), normalize=True)
        return projection_uncertainty(
            np.asarray(v) * (d if not atinfinity else 1.0), m,
            atinfinity=atinfinity, what="worstdirection-stdev")

    unc0 = None
    if use_uncertainties and not intrinsics_only:
        try:
            unc0 = np.asarray(stdev_grid(models[0]))
        except Exception as e:
            import sys
            print("WARNING: projection_diff() couldn't use uncertainties;"
                  f" falling back on the unweighted fit: {e}",
                  file=sys.stderr)

    def pair_Rt10_q1(m1, Rt10=None):
        lens1, intr1 = m1.intrinsics()
        if Rt10 is None:
            if intrinsics_only:
                Rt10 = jnp.concatenate(
                    [jnp.eye(3), jnp.zeros((1, 3))], axis=0)
            else:
                weights = None
                if unc0 is not None:
                    try:
                        w = 1.0 / (unc0 * np.asarray(stdev_grid(m1)))
                        weights = jnp.asarray(w * w)
                    except Exception as e:
                        import sys
                        print("WARNING: projection_diff() couldn't use "
                              "uncertainties for this pair; falling back "
                              f"on the unweighted fit: {e}",
                              file=sys.stderr)
                v1 = unproject(q0, lens1, intr1, normalize=True)
                Rt10 = implied_Rt10__from_unprojections(
                    q0, p0, v1, atinfinity=atinfinity, weights=weights,
                    focus_center=focus_center,
                    focus_radius=(focus_radius if focus_radius >= 0
                                  else 1e8))
        q1 = project(poseutils.transform_point_Rt(Rt10, p0), lens1, intr1)
        return Rt10, q1

    if len(models) == 2:
        Rt10, q1 = pair_Rt10_q1(models[1], implied_Rt10)
        diff = q1 - q0
        difflen = jnp.linalg.norm(diff, axis=-1)
        return difflen, diff, q0, Rt10

    pairs = [pair_Rt10_q1(m) for m in models[1:]]
    Rt10 = jnp.stack([p[0] for p in pairs])          # (N-1, 4, 3)
    norm2 = jnp.stack([jnp.sum((p[1] - q0) ** 2, axis=-1) for p in pairs])
    difflen = jnp.sqrt(jnp.mean(norm2, axis=0))
    return difflen, None, q0, Rt10


def stereo_pair_diff(model_pairs, *, gridn_width=60, gridn_height=None,
                     distance=None):
    """Mismatch of the camera0->camera1 reprojection between two pairs of
    models (reference: model_analysis.py:1931).  Returns
    (difflen, diff, q0)."""
    from .utils import sample_imager_unproject
    if len(model_pairs) != 2 or any(len(p) != 2 for p in model_pairs):
        raise Exception("model_pairs must be 2 pairs of 2 models")
    W, H = model_pairs[0][0].imagersize()
    q0 = None
    q1s = []
    # distance=None means AT INFINITY: zero the pair translation (only the
    # relative rotation matters for directions) and use unit range — exact,
    # not a large-number approximation (reference model_analysis.py:2044)
    atinfinity = distance is None
    d = 1.0 if atinfinity else distance
    for m0, m1 in model_pairs:
        v0, q0 = sample_imager_unproject(gridn_width, gridn_height, W, H,
                                         *m0.intrinsics(), normalize=True)
        p0 = jnp.asarray(v0) * d
        Rt10 = np.asarray(
            poseutils.compose_Rt(m1.Rt_cam_ref(), m0.Rt_ref_cam()))
        if atinfinity:
            Rt10 = Rt10.copy()
            Rt10[3, :] = 0.0
        p1 = poseutils.transform_point_Rt(jnp.asarray(Rt10), p0)
        q1s.append(np.asarray(project(p1, *m1.intrinsics())))
    diff = q1s[1] - q1s[0]
    difflen = np.linalg.norm(diff, axis=-1)
    return difflen, diff, np.asarray(q0)


def is_within_valid_intrinsics_region(q, model):
    """Which pixel coords q fall inside the model's valid-intrinsics region
    (reference: model_analysis.py:2106)."""
    region = model.valid_intrinsics_region()
    if region is None:
        return None
    from matplotlib.path import Path
    q = np.asarray(q)
    path = Path(np.asarray(region))
    return path.contains_points(q.reshape(-1, 2)).reshape(q.shape[:-1])


def model_resolution__deg_pixel(model, gridn_width=40, gridn_height=None):
    """Angular resolution over the imager (reference: model_analysis.py:2152).
    Returns worst-case deg/pixel at each gridpoint."""
    from .utils import sample_imager
    W, H = model.imagersize()
    q = sample_imager(gridn_width, gridn_height, W, H)
    _, dv_dq, _ = unproject(q, *model.intrinsics(), normalize=True,
                            get_gradients=True)
    # singular values of dv/dq give rad/pixel
    s = jnp.linalg.svd(dv_dq, compute_uv=False)
    return np.asarray(s[..., 0]) * 180.0 / np.pi
