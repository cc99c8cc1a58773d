"""General-query projection uncertainty: cameras that are NOT at the
reference (icam_extrinsics >= 0) and MOVING cameras (one physical camera
observed under a block of extrinsics indices).

Mirrors the general path of the reference (model_analysis.py:1192-1410 and
the --moving axis of test/test-projection-uncertainty.py): predictions are
validated statistically against re-solved noisy replicas.
"""

import numpy as np
import pytest

import mrcal_tpu as mrcal
from mrcal_tpu.optimize.layout import (spec_from_inputs, normalize_inputs,
                                       camera_extrinsics_indices)
from mrcal_tpu.optimize.residuals import (drt_cross_reprojection__dbpacked,
                                          arrays_from_inputs,
                                          params_from_arrays, pack_params)
import mrcal_tpu.poseutils as pu
from mrcal_tpu.synthetic_data import make_perfect_observations

from test_calibration import make_scene, optimization_inputs_from_scene

SIGMA = 0.3


def _noisy_replicas(oi, Nsamples, seed, sigma=SIGMA):
    """Yield optimization_inputs replicas with fresh pixel noise on top of
    PERFECT observations of the solved optimum."""
    oi_perfect = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                  for k, v in oi.items()}
    make_perfect_observations(oi_perfect)
    obs_perfect = np.asarray(oi_perfect["observations_board"]).copy()
    rng = np.random.default_rng(seed)
    for _ in range(Nsamples):
        oi_s = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                for k, v in oi_perfect.items()}
        oi_s["observations_board"] = obs_perfect + np.concatenate(
            [rng.normal(0.0, sigma, obs_perfect[..., :2].shape),
             np.zeros(obs_perfect.shape[:-1] + (1,))], axis=-1)
        mrcal.optimize(**oi_s)
        yield oi_s


def _check_var(Var_pred, Var_emp, Nsamples):
    """Eigenvalue-ratio gates sized to the Wishart sampling noise of
    Nsamples 2-vectors (~sqrt(2/N) relative 1-sigma per eigenvalue)."""
    l_pred = np.sort(np.linalg.eigvalsh(Var_pred))
    l_emp = np.sort(np.linalg.eigvalsh(Var_emp))
    assert np.all(l_pred > 0)
    s = np.sqrt(2.0 / Nsamples)
    lo, hi = max(1 - 4 * s, 0.45), 1 + 5 * s
    for lp, le in zip(l_pred, l_emp):
        assert lo < le / lp < hi, (l_pred, l_emp)
    tr = np.trace(Var_emp) / np.trace(Var_pred)
    assert 1 - 3 * s < tr < 1 + 3.5 * s, (l_pred, l_emp)


# ----------------------------------------------------------------------------
# camera with extrinsics (not at the reference)
# ----------------------------------------------------------------------------

@pytest.fixture(scope="module")
def calibrated2():
    scene = make_scene(Ncameras=2, Nframes=14, model="LENSMODEL_OPENCV4",
                       seed=4)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    oi = {k: v for k, v in oi.items() if v is not None}
    np.random.seed(10)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    oi["do_apply_outlier_rejection"] = False
    mrcal.optimize(**oi)
    return oi


def test_extrinsics_indices(calibrated2):
    oi = calibrated2
    assert camera_extrinsics_indices(0, **oi).tolist() == [-1]
    assert camera_extrinsics_indices(1, **oi).tolist() == [0]


def test_cam1_mean_pcam_statistical(calibrated2):
    """Query camera 1 (has extrinsics): the mean-pcam prediction must match
    the empirical spread of the mean-pcam reprojection over re-solved noisy
    replicas."""
    oi = calibrated2
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=1)
    p_cam = np.array([0.15, -0.1, 2.5])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))

    ext0 = np.asarray(oi["extrinsics_rt_fromref"])[0].copy()
    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    p_ref0 = np.asarray(pu.transform_point_rt(ext0, p_cam, inverted=True))
    p_frames = np.asarray(pu.transform_point_rt(
        frames0, p_ref0, inverted=True))            # (Nframes,3)

    Nsamples = 100
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=99):
        p_ref_s = np.asarray(pu.transform_point_rt(
            np.asarray(oi_s["frames_rt_toref"]), p_frames)).mean(axis=0)
        p_cam_s = np.asarray(pu.transform_point_rt(
            np.asarray(oi_s["extrinsics_rt_fromref"])[0], p_ref_s))
        qs.append(np.asarray(mrcal.project(
            p_cam_s, oi["lensmodel"], np.asarray(oi_s["intrinsics"][1]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)


def test_cam1_ccp_statistical(calibrated2):
    """Query camera 1 with cross-reprojection-ccp: K = drt_cam*_cam*/db is
    fit to camera 1's rows with the extrinsics among the perturbed
    quantities (doc/uncertainty-cross-reprojection.org ccp flavor); the
    prediction must match the empirical ccp-defined spread."""
    oi = calibrated2
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=1)
    p_cam = np.array([0.15, -0.1, 2.5])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))

    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    K = drt_cross_reprojection__dbpacked(icam_intrinsics=1, **kw)
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
            p_star, oi["lensmodel"], np.asarray(oi_s["intrinsics"][1]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)


# ----------------------------------------------------------------------------
# moving camera: one physical camera, extrinsics block 0..Nposes-1, a single
# FIXED frame defines the world (reference test-projection-uncertainty.py
# "--moving camera --ref frame0" scenario)
# ----------------------------------------------------------------------------

@pytest.fixture(scope="module")
def calibrated_moving():
    # build from a stationary-camera scene by relabeling: board moving
    # w.r.t. a fixed camera == camera moving w.r.t. a fixed board with
    # rt_cam_ref'[i] = compose(rt_cam_ref, rt_ref_frame[i]); the pixel
    # observations are IDENTICAL
    scene = make_scene(Ncameras=1, Nframes=12, model="LENSMODEL_OPENCV4",
                       seed=6)
    Nposes = scene["frames_true"].shape[0]
    ext_moving = np.array(pu.compose_rt(
        np.zeros(6), scene["frames_true"]))          # camera0 at reference
    idx = np.array([[0, 0, i] for i in range(Nposes)], dtype=np.int32)
    oi = dict(
        intrinsics=scene["intrinsics_true"].copy(),
        extrinsics_rt_fromref=ext_moving,
        frames_rt_toref=np.zeros((1, 6)),
        observations_board=scene["observations"].copy(),
        indices_frame_camintrinsics_camextrinsics=idx,
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        calobject_warp=scene["warp"].copy(),
        calibration_object_spacing=scene["spacing"],
        do_optimize_intrinsics_core=True,
        do_optimize_intrinsics_distortions=True,
        do_optimize_extrinsics=True,
        do_optimize_frames=False,          # the fixed frame IS the gauge
        do_optimize_calobject_warp=False,
        do_apply_regularization=True,
        do_apply_outlier_rejection=False,
    )
    np.random.seed(11)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < 2 * SIGMA
    return oi


def test_moving_extrinsics_block(calibrated_moving):
    oi = calibrated_moving
    ices = camera_extrinsics_indices(0, **oi)
    assert ices.tolist() == list(range(len(oi["extrinsics_rt_fromref"])))


def test_moving_mean_pcam_statistical(calibrated_moving):
    """Moving camera: the mean-pcam prediction averages the perturbed
    projections over the extrinsics block (reference model_analysis.py
    divides by Ncameras_extrinsics); validate against re-solved replicas."""
    oi = calibrated_moving
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    p_cam = np.array([0.1, -0.05, 2.0])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))
    assert Var_pred.shape == (2, 2)

    ext0 = np.asarray(oi["extrinsics_rt_fromref"]).copy()
    # baseline ref-frame points, one per camera pose
    p_ref0 = np.asarray(pu.transform_point_rt(ext0, p_cam, inverted=True))

    Nsamples = 100
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=55):
        # frames are fixed: the perturbed solution moves only the
        # extrinsics and intrinsics
        p_cam_s = np.asarray(pu.transform_point_rt(
            np.asarray(oi_s["extrinsics_rt_fromref"]), p_ref0)).mean(axis=0)
        qs.append(np.asarray(mrcal.project(
            p_cam_s, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)


def test_moving_ccp_statistical(calibrated_moving):
    """Moving camera with cross-reprojection-ccp: each measurement row
    conjugates the perturbation by ITS OWN extrinsics (the reference's
    per-row Jcross accumulation, uncertainty.c:1189-1260), so one
    rt_cam*_cam* is fit to the whole extrinsics block.  Validate the
    prediction against the ccp-defined spread over re-solved noisy
    replicas (b_s from REAL re-solves; K maps the state perturbation to
    the implied camera motion)."""
    oi = calibrated_moving
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    p_cam = np.array([0.1, -0.05, 2.0])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))
    assert Var_pred.shape == (2, 2)
    assert np.all(np.linalg.eigvalsh(Var_pred) > 0)

    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    K = drt_cross_reprojection__dbpacked(icam_intrinsics=0, **kw)
    arrays = arrays_from_inputs(**kw)
    b0 = np.asarray(pack_params(params_from_arrays(arrays), spec))

    Nsamples = 100
    qs = []
    for oi_s in _noisy_replicas(oi, Nsamples, seed=33):
        arrays_s = arrays_from_inputs(**normalize_inputs(oi_s))
        b_s = np.asarray(pack_params(params_from_arrays(arrays_s), spec))
        rt_cc = K @ (b_s - b0)
        p_star = np.asarray(pu.transform_point_rt(
            pu.invert_rt(rt_cc), p_cam))
        qs.append(np.asarray(mrcal.project(
            p_star, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), Nsamples)
