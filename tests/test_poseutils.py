"""poseutils correctness: round trips, compositions, AD-vs-numeric gradients.

Mirrors the reference's test-poseutils.py strategy (analytic-vs-numeric
checks become AD-vs-numeric)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal


def numgrad(f, x, eps=1e-7):
    x = np.asarray(x, dtype=float)
    f0 = np.asarray(f(x))
    g = np.zeros(f0.shape + x.shape)
    it = np.nditer(x, flags=["multi_index"])
    for _ in it:
        idx = it.multi_index
        xp = x.copy()
        xp[idx] += eps
        xm = x.copy()
        xm[idx] -= eps
        g[(Ellipsis,) + idx] = (np.asarray(f(xp)) - np.asarray(f(xm))) / (2 * eps)
    return g


RS = [np.array([0.1, -0.2, 0.3]),
      np.array([1e-9, 2e-10, -3e-9]),
      np.array([0.0, 0.0, 0.0]),
      np.array([2.0, 1.5, -1.0]),
      np.array([np.pi - 1e-6, 0.0, 0.0]),  # near pi
      np.array([0.0, np.pi * 0.999, 0.0])]


@pytest.mark.parametrize("r", RS)
def test_R_r_roundtrip(r):
    R = np.asarray(mrcal.R_from_r(r))
    # R must be a rotation
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.isclose(np.linalg.det(R), 1.0)
    r2 = np.asarray(mrcal.r_from_R(R))
    R2 = np.asarray(mrcal.R_from_r(r2))
    assert np.allclose(R, R2, atol=1e-10)


def test_rotate_matches_matrix():
    r = np.array([0.2, -0.5, 1.1])
    x = np.array([1.0, 2.0, -0.5])
    R = np.asarray(mrcal.R_from_r(r))
    assert np.allclose(np.asarray(mrcal.rotate_point_r(r, x)), R @ x,
                       atol=1e-12)
    assert np.allclose(np.asarray(mrcal.rotate_point_r(r, x, inverted=True)),
                       R.T @ x, atol=1e-12)


def test_compose_rt():
    rt0 = np.array([0.1, 0.2, -0.3, 1.0, 2.0, 3.0])
    rt1 = np.array([-0.2, 0.1, 0.4, -1.0, 0.5, 2.0])
    rt01 = np.asarray(mrcal.compose_rt(rt0, rt1))
    x = np.array([0.3, -0.2, 1.4])
    x_a = np.asarray(mrcal.transform_point_rt(
        rt0, np.asarray(mrcal.transform_point_rt(rt1, x))))
    x_b = np.asarray(mrcal.transform_point_rt(rt01, x))
    assert np.allclose(x_a, x_b, atol=1e-10)


def test_invert_rt():
    rt = np.array([0.5, -0.1, 0.2, 3.0, -1.0, 0.5])
    rti = np.asarray(mrcal.invert_rt(rt))
    x = np.array([1.0, 2.0, 3.0])
    assert np.allclose(
        np.asarray(mrcal.transform_point_rt(
            rti, np.asarray(mrcal.transform_point_rt(rt, x)))),
        x, atol=1e-12)


def test_invert_Rt_compose_Rt():
    rt = np.array([0.5, -0.1, 0.2, 3.0, -1.0, 0.5])
    Rt = np.asarray(mrcal.Rt_from_rt(rt))
    Rti = np.asarray(mrcal.invert_Rt(Rt))
    I = np.asarray(mrcal.compose_Rt(Rt, Rti))
    assert np.allclose(I[:3], np.eye(3), atol=1e-12)
    assert np.allclose(I[3], 0, atol=1e-12)


def test_gradients_R_from_r():
    r = np.array([0.3, -0.6, 0.9])
    R, dR_dr = mrcal.R_from_r(r, get_gradients=True)
    g = numgrad(lambda rr: mrcal.R_from_r(rr), r)
    assert np.allclose(np.asarray(dR_dr), g, atol=1e-6)


def test_gradients_r_from_R():
    r = np.array([0.3, -0.6, 0.9])
    R = np.asarray(mrcal.R_from_r(r))
    rr, dr_dR = mrcal.r_from_R(R, get_gradients=True)
    assert np.allclose(np.asarray(rr), r, atol=1e-10)
    g = numgrad(lambda RR: mrcal.r_from_R(RR), R)
    assert np.allclose(np.asarray(dr_dR), g, atol=1e-5)


def test_gradients_compose_rt():
    rt0 = np.array([0.1, 0.2, -0.3, 1.0, 2.0, 3.0])
    rt1 = np.array([-0.2, 0.1, 0.4, -1.0, 0.5, 2.0])
    rt01, d0, d1 = mrcal.compose_rt(rt0, rt1, get_gradients=True)
    g0 = numgrad(lambda x: mrcal.compose_rt(x, rt1), rt0)
    g1 = numgrad(lambda x: mrcal.compose_rt(rt0, x), rt1)
    assert np.allclose(np.asarray(d0), g0, atol=1e-6)
    assert np.allclose(np.asarray(d1), g1, atol=1e-6)


def test_gradients_transform_point_rt():
    rt = np.array([0.5, -0.1, 0.2, 3.0, -1.0, 0.5])
    x = np.array([1.0, 2.0, 3.0])
    u, du_drt, du_dx = mrcal.transform_point_rt(rt, x, get_gradients=True)
    assert np.allclose(np.asarray(du_drt),
                       numgrad(lambda v: mrcal.transform_point_rt(v, x), rt),
                       atol=1e-6)
    assert np.allclose(np.asarray(du_dx),
                       numgrad(lambda v: mrcal.transform_point_rt(rt, v), x),
                       atol=1e-6)


def test_broadcasting():
    rts = np.random.randn(5, 6) * 0.5
    xs = np.random.randn(5, 3)
    out = np.asarray(mrcal.transform_point_rt(rts, xs))
    for i in range(5):
        assert np.allclose(out[i],
                           np.asarray(mrcal.transform_point_rt(rts[i], xs[i])),
                           atol=1e-12)
    # cross-broadcast: one rt, many points
    out2 = np.asarray(mrcal.transform_point_rt(rts[0], xs))
    assert out2.shape == (5, 3)


def test_quaternions():
    rt = np.array([0.5, -0.1, 0.2, 3.0, -1.0, 0.5])
    Rt = np.asarray(mrcal.Rt_from_rt(rt))
    qt = np.asarray(mrcal.qt_from_Rt(Rt))
    Rt2 = np.asarray(mrcal.Rt_from_qt(qt))
    assert np.allclose(Rt, Rt2, atol=1e-10)


def test_compose_rt_tiny_gradients():
    rt = np.array([0.5, -0.1, 0.2, 3.0, -1.0, 0.5])
    d0 = np.asarray(mrcal.compose_rt_tinyrt0_gradientrt0(rt))
    g0 = numgrad(lambda z: mrcal.compose_rt(z, rt), np.zeros(6))
    assert np.allclose(d0, g0, atol=1e-6)
    d1 = np.asarray(mrcal.compose_rt_tinyrt1_gradientrt1(rt))
    g1 = numgrad(lambda z: mrcal.compose_rt(rt, z), np.zeros(6))
    assert np.allclose(d1, g1, atol=1e-6)


def test_align_procrustes_points():
    rt_true = np.array([0.2, -0.3, 0.5, 1.0, -2.0, 0.7])
    p1 = np.random.randn(20, 3)
    p0 = np.asarray(mrcal.transform_point_rt(rt_true, p1))
    Rt01 = np.asarray(mrcal.align_procrustes_points_Rt01(p0, p1))
    assert np.allclose(Rt01, np.asarray(mrcal.Rt_from_rt(rt_true)),
                       atol=1e-9)


def test_R_aligned_to_vector():
    v = np.array([0.3, -0.5, 2.0])
    R = np.asarray(mrcal.R_aligned_to_vector(v))
    assert np.allclose(R @ R.T, np.eye(3), atol=1e-12)
    assert np.allclose(R[2], v / np.linalg.norm(v), atol=1e-12)
