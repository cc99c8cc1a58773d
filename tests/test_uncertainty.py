"""Statistical validation of projection uncertainty (reduced-sample version
of the reference's test-projection-uncertainty.py): the PREDICTED Var(q)
must match the EMPIRICAL distribution of reprojections over many re-solved
noisy calibrations."""

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene

SIGMA = 0.3


@pytest.fixture(scope="module")
def calibrated():
    scene = make_scene(Ncameras=1, Nframes=20, model="LENSMODEL_OPENCV4",
                       seed=4)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    # make observations perfect reprojections of the truth, then add noise
    from mrcal_tpu.synthetic_data import make_perfect_observations
    oi = {k: v for k, v in oi.items() if v is not None}
    np.random.seed(10)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    oi["do_apply_outlier_rejection"] = False
    stats = mrcal.optimize(**oi)
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    return scene, oi, model


def test_observed_pixel_uncertainty_estimate(calibrated):
    scene, oi, model = calibrated
    from mrcal_tpu.model_analysis import \
        _observed_pixel_uncertainty_from_inputs
    sigma_est = _observed_pixel_uncertainty_from_inputs(oi)
    assert SIGMA * 0.8 < sigma_est < SIGMA * 1.1


def test_projection_uncertainty_shape(calibrated):
    scene, oi, model = calibrated
    p = np.array([0.1, -0.05, 2.0])
    Var = mrcal.projection_uncertainty(p, model, method="mean-pcam")
    Var = np.asarray(Var)
    assert Var.shape == (2, 2)
    l = np.linalg.eigvalsh(Var)
    assert np.all(l >= 0)
    # uncertainty at the image center should be sub-pixel for this scene
    assert np.sqrt(l[-1]) < 1.0


def test_projection_uncertainty_statistical(calibrated):
    """Empirical validation: re-solve Nsamples noisy replicas; the spread of
    mean-pcam reprojections must match the predicted covariance.
    Nsamples=100 with eigenvalue-ratio gates sized to the Wishart sampling
    noise — a 1.5x variance error fails."""
    from test_uncertainty_general import _noisy_replicas, _check_var
    scene, oi, model = calibrated
    p_cam = np.array([0.15, -0.1, 2.5])

    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))

    # p_cam is tied to camera 0 (at the reference): express it in each
    # frame's coords under the BASELINE solution
    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    p_frames = np.asarray(mrcal.transform_point_rt(
        frames0, p_cam, inverted=True))          # (Nframes, 3)

    Nsamples = 100
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=99):
        # mean-pcam reprojection through the perturbed solution
        p_ref_mean = np.asarray(mrcal.transform_point_rt(
            np.asarray(oi_s["frames_rt_toref"]), p_frames)).mean(axis=0)
        qs.append(np.asarray(mrcal.project(
            p_ref_mean, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)


def test_projection_uncertainty_flavor_matrix(calibrated):
    """The reference test harness's EXPERIMENTAL empirical-reprojection
    flavors (test-projection-uncertainty.py --reproject-perturbed
    meanq / bestq / fit-boards-ref, reference :832-1090): each defines a
    different way to reproject the query point through a perturbed solve.
    All must produce an empirical spread consistent with the predicted
    Var(q) in the vanilla (board-moving, cam0-at-reference) scenario.
    One set of replicas feeds all flavors."""
    from test_uncertainty_general import _noisy_replicas, _check_var
    scene, oi, model = calibrated
    p_cam = np.array([0.15, -0.1, 2.5])
    q0 = np.asarray(mrcal.project(p_cam, oi["lensmodel"],
                                  np.asarray(oi["intrinsics"][0])))

    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))

    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    Nframes = len(frames0)
    # p_cam expressed in each frame's coords under the baseline solution
    p_frames = np.asarray(mrcal.transform_point_rt(
        frames0, p_cam, inverted=True))                    # (Nframes, 3)

    # baseline board-corner cloud in ref coords (for fit-boards-ref)
    Nh, Nw = np.asarray(oi["observations_board"]).shape[1:3]
    obj0 = np.asarray(mrcal.ref_calibration_object(
        Nw, Nh, oi["calibration_object_spacing"],
        calobject_warp=np.asarray(oi["calobject_warp"])))  # (Nh, Nw, 3)
    corners0 = np.asarray(mrcal.transform_point_rt(
        frames0[:, None, None, :], obj0[None])).reshape(-1, 3)

    Nsamples = 100
    q_meanq = np.zeros((Nsamples, 2))
    q_allframes = np.zeros((Nsamples, Nframes, 2))
    q_fitboards = np.zeros((Nsamples, 2))
    for s, oi_s in enumerate(_noisy_replicas(oi, Nsamples, seed=55)):
        frames_s = np.asarray(oi_s["frames_rt_toref"])
        intr_s = np.asarray(oi_s["intrinsics"][0])
        # reproject through EVERY frame's perturbed pose
        p_ref_all = np.asarray(mrcal.transform_point_rt(
            frames_s, p_frames))                           # (Nframes, 3)
        q_all = np.asarray(mrcal.project(
            p_ref_all, oi["lensmodel"], intr_s))           # (Nframes, 2)
        q_allframes[s] = q_all
        q_meanq[s] = q_all.mean(axis=0)
        # fit-boards-ref: procrustes-align the perturbed board-corner
        # cloud to the baseline's, reproject through the implied Rt
        obj_s = np.asarray(mrcal.ref_calibration_object(
            Nw, Nh, oi["calibration_object_spacing"],
            calobject_warp=np.asarray(oi_s["calobject_warp"])))
        corners_s = np.asarray(mrcal.transform_point_rt(
            frames_s[:, None, None, :], obj_s[None])).reshape(-1, 3)
        Rt_refs_refb = np.asarray(
            mrcal.align_procrustes_points_Rt01(corners_s, corners0))
        p_ref_s = np.asarray(mrcal.transform_point_Rt(Rt_refs_refb, p_cam))
        q_fitboards[s] = np.asarray(mrcal.project(
            p_ref_s, oi["lensmodel"], intr_s))

    # meanq is a second-order variation of mean-pcam (mean of projections
    # vs projection of the mean): must match the prediction tightly
    _check_var(Var_pred, np.cov(q_meanq.T), Nsamples)

    # fit-boards-ref LOWER-BOUNDS the prediction: the 6-dof procrustes fit
    # over ALL Nframes*Nh*Nw corners pins the perturbed reference frame far
    # more tightly than the per-point frame average the prediction models,
    # cancelling most of the common reference-drift component (measured
    # ~4x smaller here; the reference marks this flavor obsolete,
    # test-projection-uncertainty.py:1013)
    r_fit = np.trace(np.cov(q_fitboards.T)) / np.trace(Var_pred)
    assert 0.02 < r_fit < 1.2, r_fit

    # bestq UPPER-BOUNDS: ONE frame chosen across all trials (the one
    # whose reprojections stay closest to q0 overall, reference :955-965)
    # carries that frame's independent pose noise on top of the common
    # component (measured ~2.7x here)
    i_best = np.argmin(
        ((q_allframes - q0) ** 2).sum(axis=-1).sum(axis=0))
    r_best = np.trace(np.cov(q_allframes[:, i_best].T)) / np.trace(Var_pred)
    assert 1.0 < r_best < 8.0, r_best


def test_projection_diff_same_model(calibrated):
    scene, oi, model = calibrated
    difflen, diff, q0, Rt10 = mrcal.projection_diff(
        (model, model), gridn_width=20, distance=None)
    assert float(np.max(np.asarray(difflen))) < 1e-6


def test_projection_diff_same_model_finite_distance(calibrated):
    """Finite-distance diff of a model against itself must be ~0: the
    implied-Rt fit is an ANGULAR least-squares, not a point procrustes of
    unit vectors vs range-d points (which silently produced 1000+ px
    diffs; regression guard)."""
    scene, oi, model = calibrated
    difflen, diff, q0, Rt10 = mrcal.projection_diff(
        (model, model), gridn_width=20, distance=5.0)
    assert float(np.median(np.asarray(difflen))) < 1e-3
    # the implied transform is ~identity
    assert np.allclose(np.asarray(Rt10)[:3], np.eye(3), atol=1e-4)
    assert np.linalg.norm(np.asarray(Rt10)[3]) < 1e-3


def test_projection_diff_shifted_intrinsics(calibrated):
    scene, oi, model = calibrated
    m2 = mrcal.cameramodel(model)
    lm, intr = m2.intrinsics()
    intr2 = np.array(intr)
    intr2[2] += 5.0     # shift cx: a yaw-compensable difference... partly
    m2.intrinsics((lm, intr2), imagersize=m2.imagersize())
    difflen, diff, q0, Rt10 = mrcal.projection_diff(
        (model, m2), gridn_width=20, distance=None)
    # the implied rotation compensates most of the cx shift
    assert float(np.median(np.asarray(difflen))) < 2.0
    # intrinsics_only skips the compensation: the raw cx shift shows
    difflen_io, _, _, Rt_io = mrcal.projection_diff(
        (model, m2), gridn_width=20, distance=None, intrinsics_only=True)
    assert np.allclose(np.asarray(Rt_io)[:3], np.eye(3))
    assert abs(float(np.median(np.asarray(difflen_io))) - 5.0) < 0.5


def test_projection_diff_use_uncertainties(calibrated):
    """use_uncertainties=True weights the implied-transform fit by
    1/(unc0*unc1)^2 (reference :1818-1829); a self-diff must stay ~0 and a
    model without optimization_inputs must fall back with a warning."""
    scene, oi, model = calibrated
    difflen, _, _, _ = mrcal.projection_diff(
        (model, model), gridn_width=12, distance=4.0,
        use_uncertainties=True)
    assert float(np.median(np.asarray(difflen))) < 1e-3
    # no optimization_inputs -> unweighted fallback, still ~0
    m_bare = mrcal.cameramodel(intrinsics=model.intrinsics(),
                               imagersize=model.imagersize())
    difflen, _, _, _ = mrcal.projection_diff(
        (m_bare, m_bare), gridn_width=12, distance=4.0,
        use_uncertainties=True)
    assert float(np.median(np.asarray(difflen))) < 1e-3


def test_projection_diff_nmodels(calibrated):
    """N>2 models: difflen is the RMS over pairwise-vs-model0 diffs, diff
    is None, Rt10 stacks N-1 transforms (reference :1858-1914)."""
    scene, oi, model = calibrated
    m2 = mrcal.cameramodel(model)
    lm, intr = m2.intrinsics()
    i2 = np.array(intr)
    i2[2] += 3.0
    m2.intrinsics((lm, i2), imagersize=m2.imagersize())
    difflen, diff, q0, Rt10 = mrcal.projection_diff(
        (model, model, m2), gridn_width=16, distance=None)
    assert diff is None
    assert np.asarray(Rt10).shape == (2, 4, 3)
    # pair (model,model) contributes 0; RMS = pairwise/sqrt(2)
    d2, _, _, _ = mrcal.projection_diff((model, m2), gridn_width=16,
                                        distance=None)
    assert np.allclose(np.asarray(difflen),
                       np.asarray(d2) / np.sqrt(2.0), atol=1e-6)


def test_projection_uncertainty_ccp(calibrated):
    """Statistical validation of cross-reprojection-ccp: the prediction must
    match the empirical spread of the ccp-defined reprojection over
    re-solved noisy calibrations.  (ccp is intentionally TIGHTER than
    mean-pcam -- it is the mrcal>=3.0 default because mean-pcam
    overestimates; so we do not compare the two against each other.)"""
    scene, oi, model = calibrated
    p_cam = np.array([0.15, -0.1, 2.5])

    Var_ccp = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))
    assert Var_ccp.shape == (2, 2)
    l_pred = np.linalg.eigvalsh(Var_ccp)
    assert np.all(l_pred > 0)

    from mrcal_tpu.optimize.layout import spec_from_inputs, normalize_inputs
    from mrcal_tpu.optimize.residuals import (
        drt_cross_reprojection__dbpacked, arrays_from_inputs,
        params_from_arrays, pack_params)
    from mrcal_tpu.synthetic_data import make_perfect_observations
    import mrcal_tpu.poseutils as pu

    from test_uncertainty_general import _noisy_replicas, _check_var
    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    K = drt_cross_reprojection__dbpacked(icam_intrinsics=0, **kw)
    arrays = arrays_from_inputs(**kw)
    b0 = np.asarray(pack_params(params_from_arrays(arrays), spec))

    Nsamples = 100
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=77):
        arrays_s = arrays_from_inputs(**normalize_inputs(oi_s))
        b_s = np.asarray(pack_params(params_from_arrays(arrays_s), spec))
        rt_cc = K @ (b_s - b0)
        p_star = np.asarray(pu.transform_point_rt(
            pu.invert_rt(rt_cc), p_cam))
        qs.append(np.asarray(mrcal.project(
            p_star, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_ccp, np.cov(np.array(qs).T), Nsamples)


def test_projection_uncertainty_rrp_jfp(calibrated):
    """cross-reprojection-rrp-Jfp (experimental in the reference,
    model_analysis.py:1170) must closely agree with the ccp flavor for a
    stationary single-camera scene: both propagate the same implied rigid
    reference motion, expressed in different frames."""
    scene, oi, model = calibrated
    p_cam = np.array([0.15, -0.1, 2.5])
    Var_rrp = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-rrp-Jfp",
        observed_pixel_uncertainty=SIGMA))
    Var_ccp = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))
    assert Var_rrp.shape == (2, 2)
    l_rrp = np.linalg.eigvalsh(Var_rrp)
    l_ccp = np.linalg.eigvalsh(Var_ccp)
    assert np.all(l_rrp > 0)
    # camera-0-at-reference, stationary camera: ccp and rrp coincide up to
    # numerical conditioning of the cross solves
    for a, c in zip(l_rrp, l_ccp):
        assert 0.7 < a / c < 1.4, (l_rrp, l_ccp)

    # at infinity too
    v = p_cam / np.linalg.norm(p_cam)
    Vi_rrp = np.asarray(mrcal.projection_uncertainty(
        v, model, method="cross-reprojection-rrp-Jfp", atinfinity=True,
        observed_pixel_uncertainty=SIGMA))
    li = np.linalg.eigvalsh(Vi_rrp)
    assert np.all(li >= 0) and np.sqrt(li[-1]) < 1.0


def test_projection_uncertainty_atinfinity(calibrated):
    scene, oi, model = calibrated
    v = np.array([0.05, -0.02, 1.0])
    for method in ("mean-pcam", "cross-reprojection-ccp"):
        Var = np.asarray(mrcal.projection_uncertainty(
            v, model, method=method, atinfinity=True,
            observed_pixel_uncertainty=SIGMA))
        l = np.linalg.eigvalsh(Var)
        assert np.all(l >= 0), method
        assert np.sqrt(l[-1]) < 2.0, method


def test_uncertainty_broadcasting(calibrated):
    """projection_uncertainty must broadcast over leading dims of p_cam
    (mirrors test-uncertainty-broadcasting.py)."""
    scene, oi, model = calibrated
    p = np.array([[0.1, -0.05, 2.0],
                  [0.3, 0.1, 3.0],
                  [-0.2, 0.0, 1.5]])
    for method in ("mean-pcam", "cross-reprojection-ccp"):
        Var = np.asarray(mrcal.projection_uncertainty(
            p, model, method=method, observed_pixel_uncertainty=SIGMA))
        assert Var.shape == (3, 2, 2), method
        # matches the per-point computation
        Var0 = np.asarray(mrcal.projection_uncertainty(
            p[1], model, method=method, observed_pixel_uncertainty=SIGMA))
        assert np.allclose(Var[1], Var0, rtol=1e-6), method
        w = np.asarray(mrcal.projection_uncertainty(
            p, model, method=method, what="worstdirection-stdev",
            observed_pixel_uncertainty=SIGMA))
        assert w.shape == (3,)


def test_projection_uncertainty_splined_statistical():
    from mrcal_tpu.synthetic_data import make_perfect_observations
    """Splined-model scenario (regularization on, core locked): the
    mean-pcam prediction must match the empirical spread over re-solved
    noisy replicas.  Mirrors test-projection-uncertainty.py --model
    splined."""
    from test_uncertainty_general import _noisy_replicas, _check_var
    MODEL = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=9_Ny=7_fov_x_deg=120"
    Nknots2 = 2 * 9 * 7
    np.random.seed(3)
    imagersize = np.array([800, 600])
    intr_true = np.concatenate([
        np.array([420., 419., (imagersize[0] - 1) / 2,
                  (imagersize[1] - 1) / 2]),
        np.random.randn(Nknots2) * 2e-3])
    m = mrcal.cameramodel(intrinsics=(MODEL, intr_true),
                          imagersize=imagersize, rt_cam_ref=np.zeros(6))
    q, Rt_ref_boardref = mrcal.synthesize_board_observations(
        [m], object_width_n=10, object_height_n=8, object_spacing=0.08,
        calobject_warp=np.array([0.002, -0.001]),
        rt_ref_boardcenter=np.array([0., 0., 0., 0., 0., 0.9]),
        rt_ref_boardcenter__noiseradius=np.array(
            [np.pi / 5, np.pi / 5, np.pi / 8, 0.3, 0.25, 0.3]),
        Nframes=25, which="all-cameras-must-see-full-board")
    frames_true = np.array([np.asarray(mrcal.rt_from_Rt(Rt))
                            for Rt in Rt_ref_boardref])
    obs = np.concatenate([q[:, 0], np.ones(q[:, 0].shape[:-1] + (1,))],
                         axis=-1)
    oi = dict(
        do_optimize_intrinsics_core=False,
        intrinsics=intr_true[None].copy(),
        extrinsics_rt_fromref=np.zeros((0, 6)),
        frames_rt_toref=frames_true.copy(),
        observations_board=obs,
        indices_frame_camintrinsics_camextrinsics=np.array(
            [[f, 0, -1] for f in range(len(obs))], dtype=np.int32),
        lensmodel=MODEL,
        imagersizes=imagersize[None],
        calobject_warp=np.array([0.002, -0.001]),
        calibration_object_spacing=0.08,
        do_apply_outlier_rejection=False,
    )
    np.random.seed(12)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    mrcal.optimize(**oi)
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)

    p_cam = np.array([0.1, -0.05, 2.0])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))
    assert Var_pred.shape == (2, 2)

    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    p_frames = np.asarray(mrcal.transform_point_rt(
        frames0, p_cam, inverted=True))

    Nsamples = 50
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=42):
        p_ref_mean = np.asarray(mrcal.transform_point_rt(
            np.asarray(oi_s["frames_rt_toref"]), p_frames)).mean(axis=0)
        qs.append(np.asarray(mrcal.project(
            p_ref_mean, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)
