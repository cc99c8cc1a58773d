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
