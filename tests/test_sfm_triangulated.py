"""SfM with triangulated points: points NOT in the state; each observation
pair yields one ray-divergence measurement; scale fixed by the unity_cam01
regularization (mirrors test-sfm-triangulated-points.py)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal


def make_scene(Ncameras=4, Npoints=60, sigma_px=0.0, seed=0):
    np.random.seed(seed)
    model = "LENSMODEL_PINHOLE"
    W, H = 1600, 1000
    intr = np.array([[800., 800., (W - 1) / 2, (H - 1) / 2]])

    # camera trajectory: non-collinear; camera 0 at the reference
    rt_true = np.zeros((Ncameras, 6))
    for i in range(1, Ncameras):
        rt_true[i] = [0.02 * i, -0.05 * i, 0.01 * i,
                      -0.4 * i, 0.08 * np.sin(i), 0.05 * i]
    # scale gauge: |t_01| must be ~1 for unity_cam01 (reference test scales
    # the problem so that camera1 sits at distance 1)
    rt_true[1:, 3:] /= np.linalg.norm(rt_true[1, 3:])

    pts = np.stack([np.random.uniform(-4, 4, Npoints),
                    np.random.uniform(-2, 2, Npoints),
                    np.random.uniform(5.0, 20.0, Npoints)], axis=-1)

    obs = []
    idx = []
    for ip in range(Npoints):
        seen = []
        for ic in range(Ncameras):
            p_cam = np.asarray(mrcal.transform_point_rt(rt_true[ic], pts[ip]))
            q = np.asarray(mrcal.project(p_cam, model, intr[0]))
            if 0 <= q[0] <= W - 1 and 0 <= q[1] <= H - 1 and p_cam[2] > 0:
                seen.append((ic, q))
        if len(seen) >= 2:
            for ic, q in seen:
                qn = q + np.random.randn(2) * sigma_px
                obs.append([qn[0], qn[1], 1.0])
                idx.append([ip, 0, ic - 1])
    return dict(intrinsics=intr, rt_true=rt_true,
                observations=np.array(obs),
                indices=np.array(idx, dtype=np.int32),
                imagersizes=np.array([[W, H]]), lensmodel=model)


def test_measurement_count():
    scene = make_scene(Ncameras=3, Npoints=10)
    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=scene["rt_true"][1:].copy(),
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
    )
    ipt = scene["indices"][:, 0]
    _, counts = np.unique(ipt, return_counts=True)
    expected = int(sum(n * (n - 1) // 2 for n in counts))
    assert mrcal.num_measurements_points_triangulated(**oi) == expected
    assert mrcal.num_measurements_regularization(**oi) == 1  # unity_cam01


def test_triangulated_residuals_zero_at_truth():
    scene = make_scene(Ncameras=3, Npoints=15)
    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=scene["rt_true"][1:].copy(),
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=False,
    )
    b, x, J = mrcal.optimizer_callback(**oi)
    # at the truth with noiseless observations all ray pairs converge
    assert np.max(np.abs(x)) < 1e-7


def test_triangulated_outlier_rejection():
    """Corrupted observations get their weights flipped negative by the
    outlier loop (mrcal.c markOutliers triangulated branches: divergent
    pairs + >4/5 sigma culling) and the solve still recovers geometry."""
    scene = make_scene(Ncameras=4, Npoints=60, sigma_px=0.2, seed=3)
    obs = scene["observations"]
    # corrupt 3 observations of 3 different points grossly
    ipt = scene["indices"][:, 0]
    corrupted = []
    for p in (5, 17, 33):
        i = int(np.nonzero(ipt == p)[0][0])
        obs[i, :2] += (120.0, -90.0)
        corrupted.append(i)

    np.random.seed(4)
    rt_noisy = scene["rt_true"][1:].copy()
    rt_noisy[:, :3] += np.random.randn(*rt_noisy[:, :3].shape) * 0.005
    rt_noisy[:, 3:] += np.random.randn(*rt_noisy[:, 3:].shape) * 0.02

    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=rt_noisy,
        observations_point_triangulated=obs,
        indices_point_triangulated_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_optimize_extrinsics=True,
        do_optimize_frames=True,
        do_apply_outlier_rejection=True,
        do_apply_regularization=True,
        do_apply_regularization_unity_cam01=True,
    )
    stats = mrcal.optimize(**oi)

    assert stats["Noutliers_triangulated_point"] > 0
    # the corrupted observations must be among those marked (weight < 0)
    assert all(obs[i, 2] < 0 for i in corrupted), obs[corrupted, 2]
    # and not too many innocents culled alongside
    assert np.sum(obs[:, 2] < 0) < len(obs) * 0.25

    rt = np.asarray(oi["rt_cam_ref"])
    scale = np.linalg.norm(scene["rt_true"][-1, 3:]) / \
        np.linalg.norm(rt[-1, 3:])
    rt_scaled = rt.copy()
    rt_scaled[:, 3:] *= scale
    rt_err = np.asarray(mrcal.compose_rt(
        rt_scaled, scene["rt_true"][1:], inverted1=True))
    assert np.max(np.linalg.norm(rt_err[:, :3], axis=-1)) * 180 / np.pi < 2.0
    assert np.max(np.linalg.norm(rt_err[:, 3:], axis=-1)) < 0.1


def test_sfm_triangulated_solve():
    scene = make_scene(Ncameras=4, Npoints=60, sigma_px=0.3, seed=1)
    np.random.seed(2)
    rt_noisy = scene["rt_true"][1:].copy()
    rt_noisy[:, :3] += np.random.randn(*rt_noisy[:, :3].shape) * 0.01
    rt_noisy[:, 3:] += np.random.randn(*rt_noisy[:, 3:].shape) * 0.05

    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=rt_noisy,
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_optimize_extrinsics=True,
        do_optimize_frames=True,
        do_apply_outlier_rejection=False,
        do_apply_regularization=True,
        do_apply_regularization_unity_cam01=True,
    )
    stats = mrcal.optimize(**oi)

    # rescale to the true scale (5DOF solve; reference does the same)
    rt = np.asarray(oi["rt_cam_ref"])
    scale = np.linalg.norm(scene["rt_true"][-1, 3:]) / \
        np.linalg.norm(rt[-1, 3:])
    rt_scaled = rt.copy()
    rt_scaled[:, 3:] *= scale

    rt_err = np.asarray(mrcal.compose_rt(
        rt_scaled, scene["rt_true"][1:], inverted1=True))
    err_r_deg = np.linalg.norm(rt_err[:, :3], axis=-1) * 180 / np.pi
    err_t = np.linalg.norm(rt_err[:, 3:], axis=-1)
    # reference gates: rotation 2 deg, translation 0.1
    assert np.max(err_r_deg) < 2.0, err_r_deg
    assert np.max(err_t) < 0.1, err_t
