"""End-to-end synthetic calibration (mirrors test-basic-calibration.py):
synthesize noiseless board observations for known cameras, seed, optimize,
verify the solver recovers the truth; then with noise, verify rms ~ noise."""

import numpy as np
import pytest

import mrcal_tpu as mrcal


def make_scene(Ncameras=1, Nframes=18, model="LENSMODEL_OPENCV4",
               W=8, H=6, spacing=0.077, warp=(0.002, -0.001), seed=0,
               rig_spacing=None):
    np.random.seed(seed)
    imagersize = np.array([800, 600])
    intr_true = []
    for i in range(Ncameras):
        fx = 750.0 + 20 * (i % 4)
        core = [fx, fx * 0.995, (imagersize[0] - 1) / 2 + 5 - 3 * (i % 4),
                (imagersize[1] - 1) / 2 - 4 + 2 * (i % 4)]
        n = mrcal.lensmodel_num_params(model)
        dist = (np.random.randn(n - 4) * 1e-2).tolist()
        intr_true.append(core + dist)
    intr_true = np.array(intr_true)

    # cameras: camera 0 at reference; others offset.  For small rigs the
    # default spread is wide; large rigs (many cameras) use a compact grid
    # so every camera can still see the full board
    if rig_spacing is None:
        rig_spacing = 0.22 if Ncameras <= 4 else 0.03
    ext_true = np.array(
        [[0.002 * i, -0.004 * i, 0.001 * i,
          -rig_spacing * ((i % 4) - 1.5), rig_spacing * ((i // 4) - 1.5),
          0.002 * i]
         for i in range(1, Ncameras)]).reshape(-1, 6)         if Ncameras > 4 else         np.array([[0.01 * i, -0.02 * i, 0.005 * i,
                   -rig_spacing * i, 0.02 * i, 0.01 * i]
                  for i in range(1, Ncameras)]).reshape(-1, 6)

    models = []
    for i in range(Ncameras):
        rt = np.zeros(6) if i == 0 else ext_true[i - 1]
        m = mrcal.cameramodel(intrinsics=(model, intr_true[i]),
                              imagersize=imagersize, rt_cam_ref=rt)
        models.append(m)

    q, Rt_ref_boardref = mrcal.synthesize_board_observations(
        models,
        object_width_n=W, object_height_n=H, object_spacing=spacing,
        calobject_warp=np.array(warp),
        rt_ref_boardcenter=np.array([0., 0., 0., 0., 0., 1.2]),
        rt_ref_boardcenter__noiseradius=np.array(
            [np.pi / 6, np.pi / 6, np.pi / 9, 0.2, 0.2, 0.4]),
        Nframes=Nframes, which="all-cameras-must-see-full-board")

    frames_true = np.array([np.asarray(mrcal.rt_from_Rt(Rt))
                            for Rt in Rt_ref_boardref])

    observations = np.concatenate(
        [q, np.ones(q.shape[:-1] + (1,))], axis=-1)   # (Nf, Nc, H, W, 3)
    # one observation per (frame, camera)
    Nf = q.shape[0]
    obs = observations.reshape(Nf * Ncameras, H, W, 3)
    idx = np.array([[f, c, c - 1] for f in range(Nf)
                    for c in range(Ncameras)], dtype=np.int32)

    return dict(models=models, intrinsics_true=intr_true,
                extrinsics_true=ext_true, frames_true=frames_true,
                observations=obs, indices=idx,
                imagersizes=np.tile(imagersize, (Ncameras, 1)),
                lensmodel=model, spacing=spacing, warp=np.array(warp))


def optimization_inputs_from_scene(scene, perturb=True, seed=1):
    np.random.seed(seed)
    intr = scene["intrinsics_true"].copy()
    ext = scene["extrinsics_true"].copy()
    frames = scene["frames_true"].copy()
    warp = scene["warp"].copy()
    if perturb:
        intr[:, :2] *= 1 + np.random.randn(*intr[:, :2].shape) * 1e-3
        intr[:, 2:4] += np.random.randn(*intr[:, 2:4].shape) * 2.0
        intr[:, 4:] = 0.0
        if ext.size:
            ext += np.random.randn(*ext.shape) * 0.01
        frames += np.random.randn(*frames.shape) * 0.01
        warp = np.zeros(2)
    return dict(
        intrinsics=intr,
        extrinsics_rt_fromref=ext,
        frames_rt_toref=frames,
        points=None,
        observations_board=scene["observations"].copy(),
        indices_frame_camintrinsics_camextrinsics=scene["indices"],
        observations_point=None,
        indices_point_camintrinsics_camextrinsics=None,
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        calobject_warp=warp,
        calibration_object_spacing=scene["spacing"],
        do_optimize_intrinsics_core=True,
        do_optimize_intrinsics_distortions=True,
        do_optimize_extrinsics=True,
        do_optimize_frames=True,
        do_optimize_calobject_warp=True,
        do_apply_regularization=True,
        do_apply_outlier_rejection=True,
    )


def test_layout_counts():
    scene = make_scene(Ncameras=2, Nframes=6)
    oi = optimization_inputs_from_scene(scene)
    Nstate = mrcal.num_states(**oi)
    # 2 cams * 8 intrinsics + 1*6 ext + 6*6 frames + 2 warp
    assert Nstate == 16 + 6 + 36 + 2
    assert mrcal.num_states_intrinsics(**oi) == 16
    assert mrcal.num_states_extrinsics(**oi) == 6
    assert mrcal.num_states_frames(**oi) == 36
    assert mrcal.num_states_calobject_warp(**oi) == 2
    Nmeas = mrcal.num_measurements(**oi)
    Nobs = len(scene["indices"])
    assert mrcal.num_measurements_boards(**oi) == Nobs * 8 * 6 * 2
    # regularization: 2 cams * (4 distortions + 2 centerpixel)
    assert mrcal.num_measurements_regularization(**oi) == 2 * (4 + 2)
    assert Nmeas == Nobs * 96 + 12
    assert mrcal.state_index_extrinsics(0, **oi) == 16
    assert mrcal.state_index_frames(2, **oi) == 16 + 6 + 12
    assert mrcal.state_index_calobject_warp(**oi) == 16 + 6 + 36
    assert mrcal.corresponding_icam_extrinsics(0, **oi) == -1
    assert mrcal.corresponding_icam_extrinsics(1, **oi) == 0


def test_callback_perfect_residuals():
    """With truth parameters and noiseless observations, board residuals
    must vanish (regularization terms need not)."""
    scene = make_scene(Ncameras=1, Nframes=5)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    b, x, J = mrcal.optimizer_callback(**oi)
    Nboard = mrcal.num_measurements_boards(**oi)
    assert np.max(np.abs(x[:Nboard])) < 1e-9
    assert b.shape == (mrcal.num_states(**oi),)
    assert x.shape == (mrcal.num_measurements(**oi),)
    assert J.shape == (len(x), len(b))


def test_callback_jacobian_vs_numeric():
    scene = make_scene(Ncameras=2, Nframes=4, W=4, H=3)
    oi = optimization_inputs_from_scene(scene, perturb=True)
    from mrcal_tpu.optimize.layout import spec_from_inputs
    from mrcal_tpu.optimize.residuals import (
        arrays_from_inputs, residuals_from_packed, params_from_arrays,
        pack_params)
    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b0 = np.asarray(pack_params(params_from_arrays(arrays), spec))
    b, x, J = mrcal.optimizer_callback(**oi)
    assert np.allclose(b, b0, atol=1e-12)
    Jd = np.asarray(J.todense())
    eps = 1e-6
    rng = np.random.default_rng(2)
    for j in rng.choice(len(b0), size=12, replace=False):
        bp = b0.copy()
        bp[j] += eps
        bm = b0.copy()
        bm[j] -= eps
        xp = np.asarray(residuals_from_packed(bp, arrays, spec))
        xm = np.asarray(residuals_from_packed(bm, arrays, spec))
        gnum = (xp - xm) / (2 * eps)
        assert np.allclose(Jd[:, j], gnum, atol=1e-4), f"state {j}"


def test_basic_calibration_single_camera():
    scene = make_scene(Ncameras=1, Nframes=18, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    stats = mrcal.optimize(**oi)
    # noiseless observations: board residuals ~0 (the total rms includes the
    # regularization measurements, like the reference's norm2_error)
    Nboard = mrcal.num_measurements_boards(**oi)
    rms_board = np.sqrt(np.mean(stats["x"][:Nboard] ** 2))
    assert rms_board < 2e-3
    assert stats["rms_reproj_error__pixels"] < 1e-3
    # intrinsics recovered (regularization introduces a small bias)
    assert np.allclose(oi["intrinsics"][0][:2],
                       scene["intrinsics_true"][0][:2], atol=0.5)
    assert np.allclose(oi["intrinsics"][0][2:4],
                       scene["intrinsics_true"][0][2:4], atol=1.0)
    assert np.allclose(oi["calobject_warp"], scene["warp"], atol=2e-4)


def test_basic_calibration_multicamera_noisy():
    sigma = 0.3
    scene = make_scene(Ncameras=2, Nframes=20, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    np.random.seed(5)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * sigma
    stats = mrcal.optimize(**oi)
    # rms ~ injected noise (reference gate: eps 2.5, test-basic-calibration)
    assert stats["rms_reproj_error__pixels"] < sigma * 1.2
    assert stats["rms_reproj_error__pixels"] > sigma * 0.5
    # extrinsics translation recovered within 5cm (reference gate)
    assert np.allclose(oi["extrinsics_rt_fromref"][0, 3:],
                       scene["extrinsics_true"][0, 3:], atol=0.05)
    assert np.allclose(oi["calobject_warp"], scene["warp"], atol=2e-3)


def test_outlier_rejection():
    scene = make_scene(Ncameras=1, Nframes=15, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    sigma = 0.2
    np.random.seed(7)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * sigma
    # corrupt a few corners badly
    oi["observations_board"][0, 0, 0, :2] += 30.0
    oi["observations_board"][3, 2, 1, :2] -= 25.0
    stats = mrcal.optimize(**oi)
    assert stats["Noutliers"] >= 2
    # the corrupted corners must be flagged (weight < 0)
    assert oi["observations_board"][0, 0, 0, 2] < 0
    assert oi["observations_board"][3, 2, 1, 2] < 0
    assert stats["rms_reproj_error__pixels"] < sigma * 1.3


def test_pack_unpack_invariance():
    """pack/unpack round trips (mirrors the reference's test-linearizations
    pack-state checks)."""
    scene = make_scene(Ncameras=2, Nframes=5)
    oi = optimization_inputs_from_scene(scene, perturb=True)
    b, x, J = mrcal.optimizer_callback(**oi)
    b_u = mrcal.unpack_state(b.copy(), **oi)
    b_p = mrcal.pack_state(b_u.copy(), **oi)
    assert np.allclose(b_p, b, rtol=1e-12)
    # J column scaling: pack then unpack restores J
    from mrcal_tpu.optimize.layout import spec_from_inputs
    spec = spec_from_inputs(**oi)
    Jd = np.asarray(J.todense())
    J2 = (Jd / spec.scales()[None, :]) * spec.scales()[None, :]
    assert np.allclose(J2, Jd, rtol=1e-12)
