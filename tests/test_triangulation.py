"""Triangulation methods: exact recovery on clean geometry, graceful failure
on divergent rays, gradients vs numeric (mirrors test-triangulation.py)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal

# ground truth: a point, two cameras
P_TRUE = np.array([1.2, -0.5, 4.8])
T01 = np.array([0.6, 0.05, -0.02])   # camera1 origin in camera0 coords


def _rays(p=P_TRUE, t01=T01):
    v0 = p / np.linalg.norm(p)
    v1 = (p - t01) / np.linalg.norm(p - t01)
    return v0, v1


METHODS = [mrcal.triangulate_geometric,
           mrcal.triangulate_leecivera_l1,
           mrcal.triangulate_leecivera_linf,
           mrcal.triangulate_leecivera_mid2,
           mrcal.triangulate_leecivera_wmid2]


@pytest.mark.parametrize("method", METHODS)
def test_exact_intersection(method):
    v0, v1 = _rays()
    p = np.asarray(method(v0, v1, T01))
    assert np.allclose(p, P_TRUE, atol=1e-9)


def test_lindstrom_exact():
    v0, v1 = _rays()
    # lindstrom takes v1 LOCAL to camera 1 and an Rt01; use identity rotation
    Rt01 = np.concatenate([np.eye(3), T01[None]], axis=0)
    p = np.asarray(mrcal.triangulate_lindstrom(v0, v1, Rt01))
    assert np.allclose(p, P_TRUE, atol=1e-9)


@pytest.mark.parametrize("method", METHODS)
def test_divergent_rays_give_zero(method):
    v0 = np.array([0.0, 0.0, 1.0])
    v1 = np.array([0.9, 0.0, -0.5])     # pointing backwards: rays diverge
    v1 /= np.linalg.norm(v1)
    p = np.asarray(method(v0, v1, T01))
    assert np.allclose(p, 0.0)


@pytest.mark.parametrize("method", [mrcal.triangulate_geometric,
                                    mrcal.triangulate_leecivera_mid2,
                                    mrcal.triangulate_leecivera_wmid2])
def test_gradients_numeric(method):
    v0, v1 = _rays()
    p, dp_dv0, dp_dv1, dp_dt = method(v0, v1, T01, get_gradients=True)
    eps = 1e-7

    def num(f, x):
        g = np.zeros((3, 3))
        for j in range(3):
            dx = np.zeros(3)
            dx[j] = eps
            g[:, j] = (np.asarray(f(x + dx)) - np.asarray(f(x - dx))) / (2 * eps)
        return g

    assert np.allclose(np.asarray(dp_dv0),
                       num(lambda v: method(v, v1, T01), v0), atol=1e-5)
    assert np.allclose(np.asarray(dp_dv1),
                       num(lambda v: method(v0, v, T01), v1), atol=1e-5)
    assert np.allclose(np.asarray(dp_dt),
                       num(lambda t: method(v0, v1, t), T01), atol=1e-5)


def test_Rt01_and_v_are_local():
    # rotated camera 1
    r = np.array([0.1, -0.2, 0.15])
    R01 = np.asarray(mrcal.R_from_r(r))
    Rt01 = np.concatenate([R01, T01[None]], axis=0)
    v0 = P_TRUE / np.linalg.norm(P_TRUE)
    p1 = R01.T @ (P_TRUE - T01)          # point in camera-1 coords
    v1_local = p1 / np.linalg.norm(p1)
    p = np.asarray(mrcal.triangulate_leecivera_mid2(
        v0, v1_local, v_are_local=True, Rt01=Rt01))
    assert np.allclose(p, P_TRUE, atol=1e-9)


def test_broadcasting():
    v0, v1 = _rays()
    v0s = np.tile(v0, (7, 1))
    v1s = np.tile(v1, (7, 1))
    p = np.asarray(mrcal.triangulate_leecivera_mid2(v0s, v1s, T01))
    assert p.shape == (7, 3)
    assert np.allclose(p, P_TRUE, atol=1e-9)


def test_triangulate_with_models():
    intr = np.array([900., 900., 600., 400.])
    m0 = mrcal.cameramodel(
        intrinsics=("LENSMODEL_PINHOLE", intr),
        imagersize=(1200, 800), rt_cam_ref=np.zeros(6))
    m1 = mrcal.cameramodel(
        intrinsics=("LENSMODEL_PINHOLE", intr),
        imagersize=(1200, 800),
        rt_cam_ref=np.array([0., 0., 0., -T01[0], -T01[1], -T01[2]]))
    q0 = np.asarray(mrcal.project(P_TRUE, "LENSMODEL_PINHOLE", intr))
    q1 = np.asarray(mrcal.project(P_TRUE - T01, "LENSMODEL_PINHOLE", intr))
    q = np.stack([q0, q1])
    p = np.asarray(mrcal.triangulate(q, (m0, m1)))
    assert np.allclose(p, P_TRUE, atol=1e-6)
    # with observation noise propagation
    p2, Var = mrcal.triangulate(q, (m0, m1), q_observation_stdev=0.1)
    assert np.asarray(Var).shape == (3, 3)
    assert np.all(np.linalg.eigvalsh(np.asarray(Var)) >= 0)


def test_triangulate_calibration_noise(tmp_path):
    """triangulate() with q_calibration_stdev: propagate calibration-time
    noise from the models' optimization_inputs into Var(p)."""
    from test_calibration import make_scene, optimization_inputs_from_scene
    scene = make_scene(Ncameras=2, Nframes=12, model="LENSMODEL_OPENCV4")
    oi = {k: v for k, v in
          optimization_inputs_from_scene(scene, perturb=False).items()
          if v is not None}
    np.random.seed(8)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * 0.3
    oi["do_apply_outlier_rejection"] = False
    mrcal.optimize(**oi)
    m0 = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    m1 = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=1)
    m1.extrinsics_rt_fromref(oi["extrinsics_rt_fromref"][0])

    p_true = np.array([0.1, -0.2, 3.0])
    q0 = np.asarray(mrcal.project(p_true, *m0.intrinsics()))
    p1 = np.asarray(mrcal.transform_point_rt(m1.extrinsics_rt_fromref(),
                                             p_true))
    q1 = np.asarray(mrcal.project(p1, *m1.intrinsics()))
    q = np.stack([q0, q1])

    p, Var_cal, Var_obs, Var_joint = mrcal.triangulate(
        q, (m0, m1), q_calibration_stdev=0.3, q_observation_stdev=0.2)
    assert np.allclose(np.asarray(p), p_true, atol=0.05)
    for V in (Var_cal, Var_obs, Var_joint):
        assert np.asarray(V).shape == (3, 3)
        assert np.all(np.linalg.eigvalsh(np.asarray(V)) >= -1e-12)
    # the joint covariance is the sum of the two components
    assert np.allclose(np.asarray(Var_joint),
                       np.asarray(Var_cal) + np.asarray(Var_obs))
    # calibration noise must contribute
    _, Var_obs2 = mrcal.triangulate(q, (m0, m1), q_observation_stdev=0.2)
    assert np.allclose(np.asarray(Var_obs), np.asarray(Var_obs2))
    assert np.trace(np.asarray(Var_joint)) > np.trace(np.asarray(Var_obs))

    # ---- broadcasting over N points (reference triangulation.py:1616
    # broadcasts fully; Var_p_calibration keeps cross-point correlation) ----
    p_true_N = np.array([[0.1, -0.2, 3.0],
                         [-0.4, 0.1, 2.0],
                         [0.3, 0.3, 5.0]])
    qs = []
    for pt in p_true_N:
        q0 = np.asarray(mrcal.project(pt, *m0.intrinsics()))
        p1 = np.asarray(mrcal.transform_point_rt(
            m1.extrinsics_rt_fromref(), pt))
        qs.append(np.stack([q0, np.asarray(mrcal.project(
            p1, *m1.intrinsics()))]))
    qN = np.array(qs)                                  # (3,2,2)
    pN, VcalN, VobsN, VjointN = mrcal.triangulate(
        qN, (m0, m1), q_calibration_stdev=0.3, q_observation_stdev=0.2)
    assert np.asarray(pN).shape == (3, 3)
    assert np.allclose(np.asarray(pN), p_true_N, atol=0.05)
    assert np.asarray(VobsN).shape == (3, 3, 3)
    assert np.asarray(VcalN).shape == (3, 3, 3, 3)
    assert np.asarray(VjointN).shape == (3, 3, 3, 3)
    # diagonal blocks of the N-point solve match the single-point solves
    for i in range(3):
        p_i, Vc_i, Vo_i, Vj_i = mrcal.triangulate(
            qN[i], (m0, m1), q_calibration_stdev=0.3,
            q_observation_stdev=0.2)
        assert np.allclose(np.asarray(VobsN)[i], np.asarray(Vo_i),
                           rtol=1e-9, atol=1e-12)
        assert np.allclose(np.asarray(VcalN)[i, :, i, :],
                           np.asarray(Vc_i), rtol=1e-9, atol=1e-12)
    # cross-point calibration correlation is non-trivial
    off = np.asarray(VcalN)[0, :, 1, :]
    assert np.max(np.abs(off)) > 0
    # joint = cal + blockdiag(obs)
    VJ = np.asarray(VjointN).copy()
    for i in range(3):
        VJ[i, :, i, :] -= np.asarray(VobsN)[i]
    assert np.allclose(VJ, np.asarray(VcalN), rtol=1e-9, atol=1e-12)

    # stdev=0 returns zeros without propagation
    _, Vc0 = mrcal.triangulate(qN, (m0, m1), q_calibration_stdev=0)
    assert np.asarray(Vc0).shape == (3, 3, 3, 3)
    assert np.all(np.asarray(Vc0) == 0)


def test_make_tracks():
    from mrcal_tpu.synthetic_data import make_tracks
    intr = np.array([800., 800., 600., 450.])
    m = mrcal.cameramodel(intrinsics=("LENSMODEL_PINHOLE", intr),
                          imagersize=(1200, 900), rt_cam_ref=np.zeros(6))
    obs, idx, points, Rt_NED_cam = make_tracks(
        m, Nobservations_total=200, track_length=4,
        Nobservations_image=40, gridn=8, Npoint_observations_min=2,
        Ncam_observing_min=2)
    assert len(obs) >= 50
    assert obs.shape[1] == 2
    assert idx.shape == (len(obs), 2)
    # every reported track has >= 2 observations
    _, counts = np.unique(idx[:, 0], return_counts=True)
    assert np.all(counts >= 2)
    # observations reproject correctly
    for k in range(0, len(obs), 17):
        ip, ic = idx[k]
        import mrcal_tpu.poseutils as pu
        p_cam = np.asarray(pu.transform_point_Rt(
            np.asarray(pu.invert_Rt(Rt_NED_cam[ic])), points[ip]))
        q = np.asarray(mrcal.project(p_cam, *m.intrinsics()))
        assert np.allclose(q, obs[k], atol=1e-6)
