"""Parameterized uncertainty scenario matrix (reduced-sample port of the
reference's test-projection-uncertainty.py sweep, reference
test/test-projection-uncertainty.py:266-278 / test.sh:50-64):

    {OPENCV4, OPENCV8, SPLINED} x Ncameras {1,2,4} x {fixed, moving}

Each cell statistically validates the mean-pcam prediction against the
empirical spread of re-solved noisy calibrations (the eigenvalue-ratio
gates of test_uncertainty_general._check_var), and sanity-checks the
production cross-reprojection-ccp flavor on the same solve.  Nsamples is
reduced vs the reference (25 vs 200+) to keep CI wall-clock sane; the
gates scale with the Wishart noise of the sample count.

The moving-camera cells relabel the board-moving scene camera-moving
(identical pixels; see test_uncertainty_general.calibrated_moving).
"""

import numpy as np
import pytest

import mrcal_tpu as mrcal
import mrcal_tpu.poseutils as pu

from test_calibration import make_scene, optimization_inputs_from_scene
from test_uncertainty_general import _noisy_replicas, _check_var
from mrcal_tpu.synthetic_data import make_perfect_observations

SIGMA = 0.3
NSAMPLES = 25
SPLINED = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=9_Ny=7_fov_x_deg=120"


def _make_cell_oi(model, Ncameras, moving, seed):
    """Solved optimization_inputs for one scenario cell."""
    if model == SPLINED:
        # splined scenes need a wide-FOV-appropriate core and a LOCKED
        # core (the reference locks it too: redundant with the surface)
        scene = _make_splined_scene(Ncameras, seed)
    else:
        scene = make_scene(Ncameras=Ncameras, Nframes=12, model=model,
                           W=6, H=5, seed=seed)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    oi = {k: v for k, v in oi.items() if v is not None}
    if model == SPLINED:
        oi["do_optimize_intrinsics_core"] = False
    oi["do_apply_outlier_rejection"] = False
    # the replicas re-solve dozens of times: the host-loop solver avoids
    # paying the big while_loop compile once per cell shape
    oi["device_loop"] = False

    if moving:
        # board-moving w.r.t. fixed cameras == cameras moving w.r.t. a
        # fixed board; pixels identical.  Only the Ncameras=1 relabeling
        # is well-defined here (the reference's --moving is also a single
        # moving camera rig).
        assert Ncameras == 1
        frames = np.asarray(oi["frames_rt_toref"])
        oi["extrinsics_rt_fromref"] = np.array(
            pu.compose_rt(np.zeros(6), frames))
        oi["indices_frame_camintrinsics_camextrinsics"] = np.array(
            [[0, 0, i] for i in range(len(frames))], dtype=np.int32)
        oi["frames_rt_toref"] = np.zeros((1, 6))
        oi["do_optimize_frames"] = False       # the fixed frame = gauge
        oi["do_optimize_calobject_warp"] = False

    np.random.seed(seed + 1)
    make_perfect_observations(oi, observed_pixel_uncertainty=SIGMA)
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < 2 * SIGMA
    return oi


def _make_splined_scene(Ncameras, seed):
    np.random.seed(seed)
    imagersize = np.array([800, 600])
    Nknots2 = 2 * 9 * 7
    models = []
    intr_true = []
    ext_true = np.array([[0.01 * i, -0.02 * i, 0.005 * i,
                          -0.22 * i, 0.02 * i, 0.01 * i]
                         for i in range(1, Ncameras)]).reshape(-1, 6)
    for i in range(Ncameras):
        intr = np.concatenate([
            np.array([420. + 5 * i, 419. + 5 * i,
                      (imagersize[0] - 1) / 2, (imagersize[1] - 1) / 2]),
            np.random.randn(Nknots2) * 2e-3])
        intr_true.append(intr)
        rt = np.zeros(6) if i == 0 else ext_true[i - 1]
        models.append(mrcal.cameramodel(intrinsics=(SPLINED, intr),
                                        imagersize=imagersize,
                                        rt_cam_ref=rt))
    intr_true = np.array(intr_true)
    warp = np.array([0.002, -0.001])
    q, Rt_ref_boardref = mrcal.synthesize_board_observations(
        models, object_width_n=8, object_height_n=6, object_spacing=0.08,
        calobject_warp=warp,
        rt_ref_boardcenter=np.array([0., 0., 0., 0., 0., 0.9]),
        rt_ref_boardcenter__noiseradius=np.array(
            [np.pi / 6, np.pi / 6, np.pi / 9, 0.2, 0.2, 0.3]),
        Nframes=12, which="all-cameras-must-see-full-board")
    frames_true = np.array([np.asarray(mrcal.rt_from_Rt(Rt))
                            for Rt in Rt_ref_boardref])
    Nf = q.shape[0]
    obs = np.concatenate([q, np.ones(q.shape[:-1] + (1,))],
                         axis=-1).reshape(Nf * Ncameras, 6, 8, 3)
    idx = np.array([[f, c, c - 1] for f in range(Nf)
                    for c in range(Ncameras)], dtype=np.int32)
    return dict(models=models, intrinsics_true=intr_true,
                extrinsics_true=ext_true, frames_true=frames_true,
                observations=obs, indices=idx,
                imagersizes=np.tile(imagersize, (Ncameras, 1)),
                lensmodel=SPLINED, spacing=0.08, warp=warp)


def _validate_cell(oi, icam, moving):
    """mean-pcam statistical gate + ccp sanity for one solved cell."""
    model = mrcal.cameramodel(optimization_inputs=oi,
                              icam_intrinsics=icam)
    p_cam = np.array([0.1, -0.05, 2.0])
    Var_pred = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="mean-pcam",
        observed_pixel_uncertainty=SIGMA))
    assert Var_pred.shape == (2, 2)
    assert np.all(np.linalg.eigvalsh(Var_pred) > 0)

    # the production ccp flavor must be finite/positive and of the same
    # scale (it is intentionally TIGHTER than mean-pcam)
    Var_ccp = np.asarray(mrcal.projection_uncertainty(
        p_cam, model, method="cross-reprojection-ccp",
        observed_pixel_uncertainty=SIGMA))
    l_ccp = np.linalg.eigvalsh(Var_ccp)
    assert np.all(l_ccp > 0)
    assert np.trace(Var_ccp) < 4.0 * np.trace(Var_pred)

    # empirical mean-pcam reprojection per replica
    idx = np.asarray(oi["indices_frame_camintrinsics_camextrinsics"])
    ice = int(idx[idx[:, 1] == icam][0, 2]) if not moving else None
    frames0 = np.asarray(oi["frames_rt_toref"]).copy()
    if moving:
        ext0 = np.asarray(oi["extrinsics_rt_fromref"]).copy()
        p_ref0 = np.asarray(pu.transform_point_rt(ext0, p_cam,
                                                  inverted=True))
    else:
        rt_cr = (np.zeros(6) if ice < 0 else
                 np.asarray(oi["extrinsics_rt_fromref"])[ice])
        p_ref0 = np.asarray(pu.transform_point_rt(rt_cr, p_cam,
                                                  inverted=True))
        p_frames = np.asarray(pu.transform_point_rt(
            frames0, p_ref0, inverted=True))

    qs = []
    for oi_s in _noisy_replicas(oi, NSAMPLES, seed=123):
        intr_s = np.asarray(oi_s["intrinsics"][icam])
        if moving:
            # frames fixed: only extrinsics+intrinsics move
            p_cam_s = np.asarray(pu.transform_point_rt(
                np.asarray(oi_s["extrinsics_rt_fromref"]),
                p_ref0)).mean(axis=0)
        else:
            p_ref_s = np.asarray(pu.transform_point_rt(
                np.asarray(oi_s["frames_rt_toref"]),
                p_frames)).mean(axis=0)
            if ice < 0:
                p_cam_s = p_ref_s
            else:
                p_cam_s = np.asarray(pu.transform_point_rt(
                    np.asarray(oi_s["extrinsics_rt_fromref"])[ice],
                    p_ref_s))
        qs.append(np.asarray(mrcal.project(p_cam_s, oi["lensmodel"],
                                           intr_s)))
    _check_var(Var_pred, np.cov(np.array(qs).T), NSAMPLES)


# the 9 stationary cells: every model family x rig size, querying the
# LAST camera (exercises the with-extrinsics path whenever Ncameras > 1)
@pytest.mark.parametrize("model", ["LENSMODEL_OPENCV4",
                                   "LENSMODEL_OPENCV8", SPLINED])
@pytest.mark.parametrize("Ncameras", [1, 2, 4])
def test_uncertainty_cell_fixed(model, Ncameras):
    oi = _make_cell_oi(model, Ncameras, moving=False,
                       seed=17 + Ncameras)
    _validate_cell(oi, icam=Ncameras - 1, moving=False)


# the 3 moving-camera cells (one per model family)
@pytest.mark.parametrize("model", ["LENSMODEL_OPENCV4",
                                   "LENSMODEL_OPENCV8", SPLINED])
def test_uncertainty_cell_moving(model):
    oi = _make_cell_oi(model, 1, moving=True, seed=29)
    _validate_cell(oi, icam=0, moving=True)
