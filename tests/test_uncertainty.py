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
    mean-pcam reprojections must match the predicted covariance."""
    scene, oi, model = calibrated
    p_cam = np.array([0.15, -0.1, 2.5])

    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))

    # baseline solution state
    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    intr0 = np.asarray(oi["intrinsics"]).copy()

    # perfect observations at the SOLVED optimum (self-consistent baseline)
    from mrcal_tpu.synthetic_data import make_perfect_observations
    oi_perfect = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                  for k, v in oi.items()}
    make_perfect_observations(oi_perfect)
    obs_perfect = np.asarray(oi_perfect["observations_board"]).copy()

    # p_cam is tied to camera 0 (at the reference): express it in each
    # frame's coords under the BASELINE solution
    p_frames = np.asarray(mrcal.transform_point_rt(
        frames0, p_cam, inverted=True))          # (Nframes, 3)

    Nsamples = 30
    qs = []
    np.random.seed(99)
    for s in range(Nsamples):
        oi_s = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                for k, v in oi_perfect.items()}
        oi_s["observations_board"] = obs_perfect + np.concatenate(
            [np.random.randn(*obs_perfect[..., :2].shape) * SIGMA,
             np.zeros(obs_perfect.shape[:-1] + (1,))], axis=-1)
        mrcal.optimize(**oi_s)
        # mean-pcam reprojection through the perturbed solution
        p_ref_s = np.asarray(mrcal.transform_point_rt(
            np.asarray(oi_s["frames_rt_toref"]), p_frames))  # (Nframes,3)
        p_ref_mean = p_ref_s.mean(axis=0)
        q_s = np.asarray(mrcal.project(
            p_ref_mean, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0])))
        qs.append(q_s)
    qs = np.array(qs)
    Var_emp = np.cov(qs.T)

    # eigenvalue comparison with generous sampling tolerance
    l_pred = np.linalg.eigvalsh(Var_pred)
    l_emp = np.linalg.eigvalsh(Var_emp)
    assert np.all(l_pred > 0)
    for lp, le in zip(l_pred, l_emp):
        assert 0.4 < le / lp < 2.5, (l_pred, l_emp)
    # total variance within 50%
    assert 0.5 < np.trace(Var_emp) / np.trace(Var_pred) < 2.0


def test_projection_diff_same_model(calibrated):
    scene, oi, model = calibrated
    difflen, diff, q0, Rt10 = mrcal.projection_diff(
        (model, model), gridn_width=20, distance=None)
    assert float(np.max(np.asarray(difflen))) < 1e-6


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

    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    K = drt_cross_reprojection__dbpacked(icam_intrinsics=0, **kw)
    arrays = arrays_from_inputs(**kw)
    b0 = np.asarray(pack_params(params_from_arrays(arrays), spec))

    oi_perfect = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                  for k, v in oi.items()}
    make_perfect_observations(oi_perfect)
    obs_perfect = np.asarray(oi_perfect["observations_board"]).copy()

    qs = []
    np.random.seed(77)
    for s in range(20):
        oi_s = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                for k, v in oi_perfect.items()}
        oi_s["observations_board"] = obs_perfect + np.concatenate(
            [np.random.randn(*obs_perfect[..., :2].shape) * SIGMA,
             np.zeros(obs_perfect.shape[:-1] + (1,))], axis=-1)
        mrcal.optimize(**oi_s)
        arrays_s = arrays_from_inputs(**normalize_inputs(oi_s))
        b_s = np.asarray(pack_params(params_from_arrays(arrays_s), spec))
        rt_cc = K @ (b_s - b0)
        p_star = np.asarray(pu.transform_point_rt(
            pu.invert_rt(rt_cc), p_cam))
        qs.append(np.asarray(mrcal.project(
            p_star, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    Var_emp = np.cov(np.array(qs).T)
    l_emp = np.linalg.eigvalsh(Var_emp)
    # generous bounds: 20 samples of a 2x2 covariance
    assert 0.25 < np.trace(Var_emp) / np.trace(Var_ccp) < 4.0, \
        (l_pred, l_emp)


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
