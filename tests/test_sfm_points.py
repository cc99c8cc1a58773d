"""SfM with point observations: fixed and variable points in the state
(mirrors test-sfm-fixed-points.py strategy): synthesize point tracks,
perturb, optimize, verify recovery."""

import numpy as np
import pytest

import mrcal_tpu as mrcal


def make_sfm_scene(Ncameras=3, Npoints=40, Npoints_fixed=4, seed=0,
                   sigma=0.0):
    np.random.seed(seed)
    model = "LENSMODEL_PINHOLE"
    imagersize = np.array([800, 600])
    intr = np.tile(np.array([700., 700., 399.5, 299.5]), (Ncameras, 1))

    # cameras along a trajectory; camera 0 at reference
    ext_true = np.array([[0.02 * i, -0.01 * i, 0.01 * i,
                          -0.5 * i, 0.05 * i, 0.1 * i]
                         for i in range(1, Ncameras)]).reshape(-1, 6)
    # points in front of the rig
    pts_true = np.stack([np.random.uniform(-2, 2, Npoints),
                         np.random.uniform(-1.5, 1.5, Npoints),
                         np.random.uniform(4.0, 9.0, Npoints)], axis=-1)

    obs = []
    idx = []
    ext_pad = np.concatenate([np.zeros((1, 6)), ext_true], axis=0)
    for ip in range(Npoints):
        for ic in range(Ncameras):
            p_cam = np.asarray(mrcal.transform_point_rt(
                ext_pad[ic], pts_true[ip]))
            q = np.asarray(mrcal.project(p_cam, model, intr[ic]))
            if 0 <= q[0] <= imagersize[0] - 1 and \
               0 <= q[1] <= imagersize[1] - 1:
                qn = q + np.random.randn(2) * sigma
                obs.append([qn[0], qn[1], 1.0])
                idx.append([ip, ic, ic - 1])
    return dict(intrinsics=intr, extrinsics_true=ext_true,
                points_true=pts_true,
                observations_point=np.array(obs),
                indices_point=np.array(idx, dtype=np.int32),
                imagersizes=np.tile(imagersize, (Ncameras, 1)),
                lensmodel=model, Npoints_fixed=Npoints_fixed)


def test_sfm_points_recovery():
    scene = make_sfm_scene(sigma=0.0)
    np.random.seed(1)
    pts = scene["points_true"].copy()
    Nfix = scene["Npoints_fixed"]
    # perturb the variable points and extrinsics; fixed points stay at truth
    pts[:len(pts) - Nfix] += np.random.randn(len(pts) - Nfix, 3) * 0.05
    ext = scene["extrinsics_true"] + \
        np.random.randn(*scene["extrinsics_true"].shape) * 0.01

    oi = dict(
        intrinsics=scene["intrinsics"].copy(),
        extrinsics_rt_fromref=ext,
        frames_rt_toref=None,
        points=pts,
        observations_board=None,
        indices_frame_camintrinsics_camextrinsics=None,
        observations_point=scene["observations_point"].copy(),
        indices_point_camintrinsics_camextrinsics=scene["indices_point"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        calobject_warp=None,
        Npoints_fixed=scene["Npoints_fixed"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_optimize_extrinsics=True,
        do_optimize_frames=True,
        do_apply_outlier_rejection=False,
        do_apply_regularization=True,
    )
    assert mrcal.num_states(**oi) == \
        6 * len(ext) + 3 * (len(pts) - Nfix)
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < 1e-6
    # geometry recovered: fixed points anchor the gauge
    assert np.allclose(pts, scene["points_true"], atol=1e-5)
    assert np.allclose(ext, scene["extrinsics_true"], atol=1e-5)


def test_sfm_points_noisy():
    sigma = 0.2
    scene = make_sfm_scene(sigma=sigma, seed=2)
    np.random.seed(3)
    pts = scene["points_true"].copy()
    Nfix = scene["Npoints_fixed"]
    pts[:len(pts) - Nfix] += np.random.randn(len(pts) - Nfix, 3) * 0.03
    ext = scene["extrinsics_true"] + \
        np.random.randn(*scene["extrinsics_true"].shape) * 0.005
    oi = dict(
        intrinsics=scene["intrinsics"].copy(),
        extrinsics_rt_fromref=ext,
        points=pts,
        observations_point=scene["observations_point"].copy(),
        indices_point_camintrinsics_camextrinsics=scene["indices_point"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        Npoints_fixed=scene["Npoints_fixed"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_outlier_rejection=False,
    )
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < sigma * 1.2
    assert np.allclose(ext[:, 3:], scene["extrinsics_true"][:, 3:],
                       atol=0.02)


def test_surveyed_calibration():
    """Surveyed calibration (mirrors test-surveyed-calibration.py): points
    at KNOWN fixed world positions; solve intrinsics + camera pose from
    their observations."""
    np.random.seed(4)
    model = "LENSMODEL_OPENCV4"
    imagersize = np.array([800, 600])
    intr_true = np.array([750., 748., 399.5, 299.5, -0.01, 0.02, -0.001,
                          0.002])
    rt_true = np.array([0.05, -0.1, 0.02, 0.1, -0.05, 0.2])

    # surveyed target points on a wall
    pts = np.stack([np.random.uniform(-2, 2, 60),
                    np.random.uniform(-1.5, 1.5, 60),
                    np.random.uniform(3.0, 4.0, 60)], axis=-1)
    obs = []
    idx = []
    for ip, p in enumerate(pts):
        p_cam = np.asarray(mrcal.transform_point_rt(rt_true, p))
        q = np.asarray(mrcal.project(p_cam, model, intr_true))
        if 0 <= q[0] <= 799 and 0 <= q[1] <= 599:
            obs.append([q[0] + np.random.randn() * 0.2,
                        q[1] + np.random.randn() * 0.2, 1.0])
            idx.append([ip, 0, 0])
    obs = np.array(obs)
    idx = np.array(idx, dtype=np.int32)

    intr = intr_true.copy()
    intr[:2] *= 1.002
    intr[2:4] += 2.0
    intr[4:] = 0
    rt = rt_true + np.random.randn(6) * 0.01
    oi = dict(
        intrinsics=intr[None],
        extrinsics_rt_fromref=rt[None],
        points=pts.copy(),
        observations_point=obs,
        indices_point_camintrinsics_camextrinsics=idx,
        lensmodel=model,
        imagersizes=imagersize[None],
        Npoints_fixed=len(pts),           # ALL surveyed
        do_apply_outlier_rejection=False,
    )
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < 0.25
    assert np.allclose(oi["intrinsics"][0][:2], intr_true[:2], atol=2.0)
    assert np.allclose(oi["extrinsics_rt_fromref"][0][3:], rt_true[3:],
                       atol=0.01)
    # surveyed points must NOT move
    assert np.allclose(oi["points"], pts, atol=1e-12)
