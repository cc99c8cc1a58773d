"""Splined-stereographic calibration end-to-end (reduced knot grid for CI;
the reference's canonical config is order=3 Nx=30 Ny=18 fov=150)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene

MODEL = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=9_Ny=7_fov_x_deg=120"


def test_splined_calibration():
    Nknots2 = 2 * 9 * 7
    np.random.seed(0)
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
    sigma = 0.2
    np.random.seed(1)
    obs[..., :2] += np.random.randn(*obs[..., :2].shape) * sigma

    intr0 = intr_true.copy()
    intr0[4:] = 0.0         # start from pure stereographic
    # the reference locks the core for splined solves: it is redundant with
    # the spline surface (mrcal-calibrate-cameras:636-643)
    oi = dict(
        do_optimize_intrinsics_core=False,
        intrinsics=intr0[None],
        extrinsics_rt_fromref=np.zeros((0, 6)),
        frames_rt_toref=frames_true +
        np.random.randn(*frames_true.shape) * 0.01,
        observations_board=obs,
        indices_frame_camintrinsics_camextrinsics=np.array(
            [[f, 0, -1] for f in range(len(obs))], dtype=np.int32),
        lensmodel=MODEL,
        imagersizes=imagersize[None],
        calobject_warp=np.zeros(2),
        calibration_object_spacing=0.08,
    )
    stats = mrcal.optimize(**oi)
    # rms ~ noise
    assert stats["rms_reproj_error__pixels"] < sigma * 1.2
    # the core was locked; the spline surface absorbed the corrections
    assert np.allclose(oi["intrinsics"][0, :4], intr_true[:4])
    assert np.allclose(oi["calobject_warp"], [0.002, -0.001], atol=3e-3)


def test_splined_regularization_measurement_count():
    oi_min = dict(
        intrinsics=np.zeros((1, 4 + 2 * 9 * 7)),
        lensmodel=MODEL,
        imagersizes=np.array([[800, 600]]),
        observations_board=np.zeros((1, 4, 4, 3)),
        indices_frame_camintrinsics_camextrinsics=np.zeros((1, 3), np.int32),
        frames_rt_toref=np.zeros((1, 6)),
        calobject_warp=np.zeros(2),
        calibration_object_spacing=0.1,
    )
    # splined: 2 reg measurements per knot + 2 centerpixel
    assert mrcal.num_measurements_regularization(**oi_min) == 2 * 9 * 7 + 2
