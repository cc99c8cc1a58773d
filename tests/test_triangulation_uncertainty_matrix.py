"""Triangulation-uncertainty scenario matrix (reduced-sample port of the
reference's test-triangulation-uncertainty.py sweep, reference
test.sh:66-74):

    {stabilize-coords, not} x {fixed cam0, fixed frames}
        x {observation noise, calibration noise}             (8 cells)
  + {correlation 0.1, 0.9} x {near, far point}               (4 cells)

Each cell statistically validates the PREDICTED Var(p) from
mrcal.triangulate(q_calibration_stdev=... / q_observation_stdev=...)
against the EMPIRICAL spread of triangulations under that noise:
observation noise re-triangulates with correlated pixel noise
(cheap, Nsamples=300); calibration noise re-solves noisy calibrations
(Nsamples=25) and re-triangulates through the perturbed models.
Eigenvalue-ratio gates sized to the sample count."""

import numpy as np
import pytest

import mrcal_tpu as mrcal
import mrcal_tpu.poseutils as pu

from test_calibration import make_scene, optimization_inputs_from_scene
from test_uncertainty_general import _noisy_replicas
from mrcal_tpu.synthetic_data import make_perfect_observations

SIGMA = 0.3
N_OBS = 300
N_CAL = 25


def _check_var3(Var_pred, Var_emp, Nsamples):
    l_pred = np.sort(np.linalg.eigvalsh(np.asarray(Var_pred)))
    l_emp = np.sort(np.linalg.eigvalsh(np.asarray(Var_emp)))
    assert np.all(l_pred > 0)
    s = np.sqrt(2.0 / Nsamples)
    lo, hi = max(1 - 4 * s, 0.4), 1 + 6 * s
    for lp, le in zip(l_pred, l_emp):
        assert lo < le / lp < hi, (l_pred, l_emp)
    tr = np.trace(np.asarray(Var_emp)) / np.trace(np.asarray(Var_pred))
    assert max(1 - 3.5 * s, 0.45) < tr < 1 + 4 * s, (l_pred, l_emp)


def _solved_scene(fixed, seed=21):
    """3-camera solved scene.  fixed='cam0': camera 0 at the reference,
    frames optimized (the default calibration gauge).  fixed='frames':
    every camera has extrinsics and the frames are FIXED in space (the
    reference's --fixed frames gauge)."""
    scene = make_scene(Ncameras=3, Nframes=12, model="LENSMODEL_OPENCV4",
                       W=6, H=5, seed=seed)
    oi = {k: v for k, v in
          optimization_inputs_from_scene(scene, perturb=False).items()
          if v is not None}
    if fixed == "frames":
        idx = np.asarray(oi["indices_frame_camintrinsics_camextrinsics"])
        idx = idx.copy()
        idx[:, 2] = idx[:, 1]              # every camera has extrinsics
        oi["indices_frame_camintrinsics_camextrinsics"] = idx
        ext = np.asarray(oi["extrinsics_rt_fromref"])
        oi["extrinsics_rt_fromref"] = np.vstack([np.zeros((1, 6)), ext])
        oi["do_optimize_frames"] = False
        oi["do_optimize_calobject_warp"] = False
    oi["do_apply_outlier_rejection"] = False
    oi["device_loop"] = False              # replicas re-solve many times
    np.random.seed(seed + 1)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < 2 * SIGMA
    return oi


def _models_from(oi, icams=(2, 1)):
    """cameramodels for the query pair, extrinsics wired from the solve
    (the reference's --cameras 2 1: neither is the reference camera)."""
    idx = np.asarray(oi["indices_frame_camintrinsics_camextrinsics"])
    out = []
    for ic in icams:
        m = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=ic)
        ice = int(idx[idx[:, 1] == ic][0, 2])
        if ice >= 0:
            m.extrinsics_rt_fromref(
                np.asarray(oi["extrinsics_rt_fromref"])[ice])
        return_rt = m.extrinsics_rt_fromref()
        assert return_rt is not None
        out.append(m)
    return out


def _q_of(p_cam0_frame_of_A, models):
    """Pixel observations of a point given in the FIRST query camera's
    coords."""
    mA, mB = models
    p_ref = np.asarray(pu.transform_point_rt(
        mA.extrinsics_rt_fromref(), p_cam0_frame_of_A, inverted=True))
    qs = []
    for m in models:
        p_c = np.asarray(pu.transform_point_rt(
            m.extrinsics_rt_fromref(), p_ref))
        qs.append(np.asarray(mrcal.project(p_c, *m.intrinsics())))
    return np.stack(qs)


def _correlated_qnoise(rng, sigma, rho, n):
    """(n, 2 cameras, 2) pixel noise with inter-camera correlation rho."""
    common = rng.normal(0, 1, (n, 1, 2))
    indiv = rng.normal(0, 1, (n, 2, 2))
    return sigma * (np.sqrt(rho) * common + np.sqrt(1 - rho) * indiv)


@pytest.mark.parametrize("stabilize", [True, False])
@pytest.mark.parametrize("fixed", ["cam0", "frames"])
def test_observation_noise_cell(stabilize, fixed):
    oi = _solved_scene(fixed)
    models = _models_from(oi)
    p = np.array([-0.4, 0.0, 2.0])
    q0 = _q_of(p, models)
    rho = 0.6
    pred = mrcal.triangulate(q0, models, stabilize_coords=stabilize,
                             q_observation_stdev=0.5,
                             q_observation_stdev_correlation=rho)
    p0, Var_obs = (np.asarray(pred[0]), np.asarray(pred[1]))
    rng = np.random.default_rng(7)
    qs = q0[None] + _correlated_qnoise(rng, 0.5, rho, N_OBS)
    ps = np.asarray(mrcal.triangulate(qs, models,
                                      stabilize_coords=stabilize))
    _check_var3(Var_obs, np.cov((ps - p0[None]).T), N_OBS)


def _stabilize_point(p_cam, models_s, oi_s, models0, oi0):
    """Map a replica's cam0-coords triangulation into the BASELINE cam0
    frame through the (fixed-in-space) calibration objects: perturbed
    cam -> perturbed ref -> each perturbed frame -> baseline frames ->
    mean -> baseline cam.  This is the quantity whose variance
    triangulate(stabilize_coords=True) PREDICTS — the returned point
    itself is always plain camera-0 coords (same convention as the
    reference, triangulation.py:1263-1330)."""
    rt_s = np.asarray(models_s[0].extrinsics_rt_fromref())
    rt_0 = np.asarray(models0[0].extrinsics_rt_fromref())
    frames_s = np.asarray(oi_s["frames_rt_toref"])
    frames_0 = np.asarray(oi0["frames_rt_toref"])
    p_ref_s = np.asarray(pu.transform_point_rt(rt_s, p_cam,
                                               inverted=True))
    p_frames = np.asarray(pu.transform_point_rt(frames_s, p_ref_s,
                                                inverted=True))
    p_ref_0 = np.asarray(pu.transform_point_rt(frames_0,
                                               p_frames)).mean(axis=0)
    return np.asarray(pu.transform_point_rt(rt_0, p_ref_0))


@pytest.mark.parametrize("stabilize", [True, False])
@pytest.mark.parametrize("fixed", ["cam0", "frames"])
def test_calibration_noise_cell(stabilize, fixed):
    oi = _solved_scene(fixed)
    models = _models_from(oi)
    p = np.array([-0.4, 0.0, 2.0])
    q0 = _q_of(p, models)
    pred = mrcal.triangulate(q0, models, stabilize_coords=stabilize,
                             q_calibration_stdev=SIGMA)
    p0, Var_cal = (np.asarray(pred[0]), np.asarray(pred[1]))

    # with frames FIXED in the solve there is nothing to stabilize
    # against (the prediction falls back to the raw cam0 point, like
    # the reference); the empirical must then use the raw point too
    do_stab = stabilize and bool(
        oi.get("do_optimize_frames", True))

    ps = []
    for oi_s in _noisy_replicas(oi, N_CAL, seed=31):
        models_s = _models_from(oi_s)
        p_s = np.asarray(mrcal.triangulate(q0, models_s))
        if do_stab:
            p_s = _stabilize_point(p_s, models_s, oi_s, models, oi)
        ps.append(p_s)
    ps = np.array(ps)
    _check_var3(Var_cal, np.cov((ps - p0[None]).T), N_CAL)


@pytest.mark.parametrize("rho", [0.1, 0.9])
@pytest.mark.parametrize("point", ["near", "far"])
def test_correlation_range_cell(rho, point):
    """Both noise kinds predicted; the OBSERVATION component validated
    empirically across correlation x range (the reference's second BASE,
    test.sh:71-74)."""
    oi = _solved_scene("cam0", seed=33)
    models = _models_from(oi, icams=(1, 0))
    p = np.array([-0.2, 0.0, 1.5]) if point == "near" else \
        np.array([-1.5, 0.0, 8.0])
    q0 = _q_of(p, models)
    pred = mrcal.triangulate(q0, models, stabilize_coords=True,
                             q_calibration_stdev=SIGMA,
                             q_observation_stdev=0.5,
                             q_observation_stdev_correlation=rho)
    p0, Var_cal, Var_obs, Var_joint = (np.asarray(v) for v in pred)
    assert np.allclose(Var_joint, Var_cal + Var_obs, rtol=1e-6)
    assert np.all(np.linalg.eigvalsh(Var_cal) > -1e-12)
    rng = np.random.default_rng(11)
    qs = q0[None] + _correlated_qnoise(rng, 0.5, rho, N_OBS)
    ps = np.asarray(mrcal.triangulate(qs, models, stabilize_coords=True))
    _check_var3(Var_obs, np.cov((ps - p0[None]).T), N_OBS)
