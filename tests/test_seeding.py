"""Calibration seeding: PnP, pairwise poses, seed_stereographic; then the
full staged pipeline seed -> optimize converges from scratch
(mirrors the mrcal-calibrate-cameras solve_initial flow)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene


def test_monocular_pnp():
    scene = make_scene(Ncameras=1, Nframes=6, model="LENSMODEL_OPENCV4")
    models = [(scene["lensmodel"], scene["intrinsics_true"][0])]
    idx_fc = scene["indices"][:, :2]
    Rt = mrcal.estimate_monocular_calobject_poses_Rt_tocam(
        idx_fc, scene["observations"], scene["spacing"], models)
    # the recovered board pose must reproject corners accurately; compare
    # against the joint transform from truth
    for i in range(len(Rt)):
        f = idx_fc[i, 0]
        Rt_cam_frame_true = np.asarray(mrcal.Rt_from_rt(
            scene["frames_true"][f]))
        # boards are near z~1.2m: compare translations
        assert np.allclose(Rt[i][3], Rt_cam_frame_true[3], atol=0.02)


def test_seed_stereographic_multicam():
    scene = make_scene(Ncameras=2, Nframes=12, model="LENSMODEL_OPENCV4")
    intr, ext, frames = mrcal.seed_stereographic(
        imagersizes=scene["imagersizes"],
        focal_estimate=750.0,
        indices_frame_camera=scene["indices"][:, :2],
        observations=scene["observations"],
        object_spacing=scene["spacing"])
    assert intr.shape == (2, 4)
    assert ext.shape == (1, 6)
    # the seed is rough (stereographic guess, pairwise averaging): it only
    # needs to land in the convergence basin (reference tour: seed-stage RMS
    # is ~9.5 px).  Check the geometry is roughly right.
    assert np.allclose(ext[0, 3:], scene["extrinsics_true"][0, 3:],
                       atol=0.15)
    assert frames.shape == scene["frames_true"].shape
    assert np.allclose(frames[:, 3:], scene["frames_true"][:, 3:],
                       atol=0.2)


def test_full_pipeline_from_seed():
    """Seed from observations only, staged solves, full solve: the complete
    mrcal-calibrate-cameras flow without any prior knowledge."""
    scene = make_scene(Ncameras=2, Nframes=16, model="LENSMODEL_OPENCV4")
    sigma = 0.2
    obs = scene["observations"].copy()
    np.random.seed(11)
    obs[..., :2] += np.random.randn(*obs[..., :2].shape) * sigma

    intr_seed, ext_seed, frames_seed = mrcal.seed_stereographic(
        imagersizes=scene["imagersizes"], focal_estimate=700.0,
        indices_frame_camera=scene["indices"][:, :2],
        observations=obs, object_spacing=scene["spacing"])

    n = mrcal.lensmodel_num_params(scene["lensmodel"])
    intr = np.concatenate(
        [intr_seed, np.zeros((len(intr_seed), n - 4))], axis=1)
    oi = dict(
        intrinsics=intr,
        extrinsics_rt_fromref=ext_seed,
        frames_rt_toref=frames_seed,
        observations_board=obs,
        indices_frame_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        calobject_warp=np.zeros(2),
        calibration_object_spacing=scene["spacing"],
    )
    # stage 1: geometry only (intrinsics fixed at the seed)
    oi_stage1 = dict(oi, do_optimize_intrinsics_core=False,
                     do_optimize_intrinsics_distortions=False,
                     do_optimize_calobject_warp=False,
                     do_apply_outlier_rejection=False)
    mrcal.optimize(**oi_stage1)
    # stage 2: everything
    stats = mrcal.optimize(**oi)
    assert stats["rms_reproj_error__pixels"] < sigma * 1.2
    assert np.allclose(oi["intrinsics"][0, :2],
                       scene["intrinsics_true"][0, :2], atol=3.0)
    assert np.allclose(oi["extrinsics_rt_fromref"][0, 3:],
                       scene["extrinsics_true"][0, 3:], atol=0.05)
    assert np.allclose(oi["calobject_warp"], scene["warp"], atol=2e-3)


def test_compute_chessboard_corners_parsing(tmp_path):
    # build a synthetic corners.vnl
    W, H = 3, 2
    f = tmp_path / "corners.vnl"
    lines = ["# filename x y level"]
    for frame in range(2):
        for cam in range(2):
            for i in range(W * H):
                lines.append(f"frame{frame}-cam{cam}.png "
                             f"{10.0 * i} {5.0 * i} {i % 3}")
    f.write_text("\n".join(lines) + "\n")
    obs, idx_fc, paths = mrcal.compute_chessboard_corners(
        W, H, globs_per_camera=("*cam0*", "*cam1*"),
        corners_cache_vnl=str(f))
    assert obs.shape == (4, H, W, 3)
    assert idx_fc.shape == (4, 2)
    # weight = 1/2^level
    assert np.isclose(obs[0, 0, 0, 2], 1.0)
    assert np.isclose(obs[0, 0, 1, 2], 0.5)
    assert np.isclose(obs[0, 0, 2, 2], 0.25)
