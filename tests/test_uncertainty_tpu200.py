"""Reference-scale statistical uncertainty validation ON TPU.

The reference's test-projection-uncertainty.py re-solves hundreds of
noisy calibrations; the CPU-CI versions here (test_uncertainty*.py) run
Nsamples=100 replicas one at a time.  This file is the FULL-POWER
version: 200 replicas solved as ONE optimize_batch program on the
accelerator (the serving mode makes them cost ~a quarter second each),
with the eigenvalue gates correspondingly tightened (sqrt(2/N) Wishart
noise).  Validates:

  - projection_uncertainty method='mean-pcam' (cam at the reference)
  - projection_uncertainty method='cross-reprojection--rrp-empirical'
  - triangulate(..., q_calibration_stdev=...) calibration-noise variance

Skipped on the CPU backend: 200 batched f64 re-solves take ~an hour
there, and the CI-sized tests already cover the semantics.  The
measured numbers are recorded in doc/uncertainty.md.
"""

import numpy as np
import pytest

import jax

import mrcal_tpu as mrcal
from mrcal_tpu.synthetic_data import make_perfect_observations

from test_calibration import make_scene, optimization_inputs_from_scene
from test_uncertainty_general import _check_var

pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="reference-scale replica count needs the accelerator "
           "(optimize_batch serving mode); CPU CI runs the Nsamples=100 "
           "versions in test_uncertainty*.py")

SIGMA = 0.3
NSAMPLES = 200


@pytest.fixture(scope="module")
def batch_solved():
    scene = make_scene(Ncameras=2, Nframes=16, model="LENSMODEL_OPENCV4",
                       seed=6)
    oi = {k: v for k, v in
          optimization_inputs_from_scene(scene, perturb=False).items()
          if v is not None}
    np.random.seed(11)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    oi["do_apply_outlier_rejection"] = False
    mrcal.optimize(**oi)

    # perfect observations of the SOLVED optimum + fresh noise per replica
    oi_perfect = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                  for k, v in oi.items()}
    make_perfect_observations(oi_perfect)
    obs_perfect = np.asarray(oi_perfect["observations_board"]).copy()
    rng = np.random.default_rng(42)
    replicas = []
    for _ in range(NSAMPLES):
        oi_s = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
                for k, v in oi_perfect.items()}
        oi_s["observations_board"] = obs_perfect + np.concatenate(
            [rng.normal(0.0, SIGMA, obs_perfect[..., :2].shape),
             np.zeros(obs_perfect.shape[:-1] + (1,))], axis=-1)
        replicas.append(oi_s)
    stats = mrcal.optimize_batch(replicas)
    assert all(s["rms_reproj_error__pixels"] < 1.0 for s in stats)
    return oi, replicas, stats


def test_mean_pcam_200(batch_solved):
    oi, replicas, stats = batch_solved
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    p_cam = np.array([0.12, -0.08, 2.2])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))

    frames0 = np.asarray(oi["frames_rt_toref"])
    p_frames = np.asarray(mrcal.transform_point_rt(
        frames0, p_cam, inverted=True))
    qs = []
    for oi_s in replicas:
        p_ref_mean = np.asarray(mrcal.transform_point_rt(
            np.asarray(oi_s["frames_rt_toref"]), p_frames)).mean(axis=0)
        qs.append(np.asarray(mrcal.project(
            p_ref_mean, oi["lensmodel"],
            np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), NSAMPLES)


def test_ccp_200(batch_solved):
    """cross-reprojection-ccp at 200 replicas (the same empirical
    definition as test_projection_uncertainty_ccp, via the K matrix)."""
    from mrcal_tpu.optimize.layout import (spec_from_inputs,
                                           normalize_inputs)
    from mrcal_tpu.optimize.residuals import (
        drt_cross_reprojection__dbpacked, arrays_from_inputs,
        params_from_arrays, pack_params)
    import mrcal_tpu.poseutils as pu

    oi, replicas, stats = batch_solved
    model = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    p_cam = np.array([0.12, -0.08, 2.2])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))

    kw = normalize_inputs(oi)
    spec = spec_from_inputs(**kw)
    K = drt_cross_reprojection__dbpacked(icam_intrinsics=0, **kw)
    arrays = arrays_from_inputs(**kw)
    b0 = np.asarray(pack_params(params_from_arrays(arrays), spec))
    qs = []
    for oi_s in replicas:
        arrays_s = arrays_from_inputs(**normalize_inputs(oi_s))
        b_s = np.asarray(pack_params(params_from_arrays(arrays_s), spec))
        rt_cc = K @ (b_s - b0)
        p_star = np.asarray(pu.transform_point_rt(
            pu.invert_rt(rt_cc), p_cam))
        qs.append(np.asarray(mrcal.project(
            p_star, oi["lensmodel"], np.asarray(oi_s["intrinsics"][0]))))
    _check_var(Var_pred, np.cov(np.array(qs).T), NSAMPLES)


def test_triangulate_calibration_variance_200(batch_solved):
    oi, replicas, stats = batch_solved
    models = [mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=i)
              for i in range(2)]
    # a well-conditioned point in front of both cameras
    p_true = np.array([0.1, 0.05, 2.0])
    q = np.stack([
        np.asarray(mrcal.project(
            np.asarray(mrcal.transform_point_rt(
                m.extrinsics_rt_fromref(), p_true)),
            oi["lensmodel"], m.intrinsics()[1])) for m in models])
    p0, Var_pred = mrcal.triangulate(
        q, models, q_calibration_stdev=SIGMA, stabilize_coords=False)
    Var_pred = np.asarray(Var_pred).reshape(3, 3)

    ps = []
    for oi_s in replicas:
        ms = [mrcal.cameramodel(optimization_inputs=oi_s,
                                icam_intrinsics=i) for i in range(2)]
        ps.append(np.asarray(mrcal.triangulate(q, ms)).reshape(3))
    Var_emp = np.cov(np.array(ps).T)
    l_pred = np.sort(np.linalg.eigvalsh(Var_pred))
    l_emp = np.sort(np.linalg.eigvalsh(Var_emp))
    s = np.sqrt(2.0 / NSAMPLES)
    # the dominant (depth) eigenvalue is what matters; the small ones
    # sit near the numerical floor of the prediction
    assert 1 - 5 * s < l_emp[-1] / l_pred[-1] < 1 + 6 * s, \
        (l_pred, l_emp)
    tr = np.trace(Var_emp) / np.trace(Var_pred)
    assert 1 - 5 * s < tr < 1 + 6 * s, (l_pred, l_emp)
