"""Broadcasting conformance suite.

The reference ships test/test-broadcasting.py exercising the numpysane
broadcast + out= contract on every generated wrapper (reference
Makefile DIST_TESTS).  Our kernels broadcast through jnp.vectorize/vmap
instead of numpysane; this suite pins the LEADING-DIM broadcast
behavior of the public surface — values AND gradients — against an
explicit loop over the unbatched call.

Deliberate divergence from the reference (SURVEY.md §8.6): `out=` here
accepts a numpy array and COPIES the result into it (returning the
result), rather than the reference's zero-copy in-place write through
numpysane; in a JAX/XLA world device buffers are immutable, so in-place
semantics cannot exist.  test_out_kwarg below pins the copy contract.
"""

import numpy as np
import pytest

import mrcal_tpu as mrcal


def _loop_ref(fn, *args, nout=1):
    """Reference result: loop fn over the broadcasted leading dims."""
    shapes = [np.asarray(a).shape[:-1] for a in args]
    # trailing core dim is always 1-D here; args pre-shaped so that the
    # broadcast of the leading dims is well defined
    lead = np.broadcast_shapes(*shapes)
    outs = None
    for idx in np.ndindex(*lead):
        one = []
        for a in args:
            a = np.asarray(a)
            ai = tuple(i % s for i, s in
                       zip(idx[len(lead) - (a.ndim - 1):], a.shape[:-1]))
            one.append(a[ai])
        r = fn(*one)
        if nout == 1:
            r = (r,)
        if outs is None:
            outs = [np.zeros(lead + np.asarray(ri).shape, np.float64)
                    for ri in r]
        for o, ri in zip(outs, r):
            o[idx] = np.asarray(ri)
    return outs[0] if nout == 1 else outs


INTR_OPENCV4 = np.array([720., 715., 400.5, 299.5, -0.02, 0.01,
                         0.001, -0.0005])
MODEL_OPENCV4 = "LENSMODEL_OPENCV4"


class TestProjections:
    def test_project_leading_dims(self):
        rng = np.random.default_rng(0)
        v = rng.normal(0, 0.2, (5, 4, 3)) + [0, 0, 1.0]
        q = np.asarray(mrcal.project(v, MODEL_OPENCV4, INTR_OPENCV4))
        assert q.shape == (5, 4, 2)
        q_ref = _loop_ref(
            lambda v1: mrcal.project(v1, MODEL_OPENCV4, INTR_OPENCV4), v)
        np.testing.assert_allclose(q, q_ref, atol=1e-9)

    def test_project_broadcast_intrinsics_against_points(self):
        # points (1,4,3) x intrinsics (3,1,Ni) -> (3,4,2)
        rng = np.random.default_rng(1)
        v = rng.normal(0, 0.2, (1, 4, 3)) + [0, 0, 1.0]
        intr = np.tile(INTR_OPENCV4, (3, 1, 1))
        intr[:, 0, 0] += [0.0, 5.0, -5.0]
        q = np.asarray(mrcal.project(v, MODEL_OPENCV4, intr))
        assert q.shape == (3, 4, 2)
        for ci in range(3):
            qi = np.asarray(mrcal.project(v[0], MODEL_OPENCV4,
                                          intr[ci, 0]))
            np.testing.assert_allclose(q[ci], qi, atol=1e-9)

    def test_project_gradients_broadcast(self):
        rng = np.random.default_rng(2)
        v = rng.normal(0, 0.2, (2, 3, 3)) + [0, 0, 1.0]
        q, dq_dv, dq_di = mrcal.project(v, MODEL_OPENCV4, INTR_OPENCV4,
                                        get_gradients=True)
        assert np.asarray(q).shape == (2, 3, 2)
        assert np.asarray(dq_dv).shape == (2, 3, 2, 3)
        assert np.asarray(dq_di).shape == (2, 3, 2, len(INTR_OPENCV4))
        for i in range(2):
            for j in range(3):
                q1, dv1, di1 = mrcal.project(v[i, j], MODEL_OPENCV4,
                                             INTR_OPENCV4,
                                             get_gradients=True)
                np.testing.assert_allclose(np.asarray(dq_dv)[i, j], dv1,
                                           atol=1e-9)
                np.testing.assert_allclose(np.asarray(dq_di)[i, j], di1,
                                           atol=1e-9)

    def test_unproject_roundtrip_leading_dims(self):
        rng = np.random.default_rng(3)
        q = rng.uniform(100, 700, (4, 2, 2))
        v = np.asarray(mrcal.unproject(q, MODEL_OPENCV4, INTR_OPENCV4,
                                       normalize=True))
        assert v.shape == (4, 2, 3)
        q2 = np.asarray(mrcal.project(v, MODEL_OPENCV4, INTR_OPENCV4))
        np.testing.assert_allclose(q2, q, atol=1e-6)

    @pytest.mark.parametrize("pair", [
        (mrcal.project_pinhole, mrcal.unproject_pinhole),
        (mrcal.project_stereographic, mrcal.unproject_stereographic),
        (mrcal.project_lonlat, mrcal.unproject_lonlat),
        (mrcal.project_latlon, mrcal.unproject_latlon)])
    def test_special_pairs_leading_dims(self, pair):
        prj, unprj = pair
        fxycxy = np.array([500., 500., 320., 240.])
        rng = np.random.default_rng(4)
        v = rng.normal(0, 0.1, (3, 5, 3)) + [0, 0, 1.0]
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
        q = np.asarray(prj(v, fxycxy))
        assert q.shape == (3, 5, 2)
        v2 = np.array(unprj(q, fxycxy))
        v2 /= np.linalg.norm(v2, axis=-1, keepdims=True)
        np.testing.assert_allclose(v2, v, atol=1e-7)
        # gradient shape under broadcast
        q_, dq = prj(v, fxycxy, get_gradients=True)
        assert np.asarray(dq).shape == (3, 5, 2, 3)


class TestPoseutils:
    def test_rotate_point_r_broadcast(self):
        rng = np.random.default_rng(5)
        r = rng.normal(0, 0.5, (4, 1, 3))
        x = rng.normal(0, 1.0, (1, 6, 3))
        y = np.asarray(mrcal.rotate_point_r(r, x))
        assert y.shape == (4, 6, 3)
        for i in range(4):
            for j in range(6):
                y1 = mrcal.rotate_point_r(r[i, 0], x[0, j])
                np.testing.assert_allclose(y[i, j], np.asarray(y1),
                                           atol=1e-12)

    def test_rotate_point_r_gradients_broadcast(self):
        rng = np.random.default_rng(6)
        r = rng.normal(0, 0.5, (3, 3))
        x = rng.normal(0, 1.0, (3, 3))
        y, dy_dr, dy_dx = mrcal.rotate_point_r(r, x, get_gradients=True)
        assert np.asarray(dy_dr).shape == (3, 3, 3)
        assert np.asarray(dy_dx).shape == (3, 3, 3)
        for i in range(3):
            _, dr1, dx1 = mrcal.rotate_point_r(r[i], x[i],
                                               get_gradients=True)
            np.testing.assert_allclose(np.asarray(dy_dr)[i], dr1,
                                       atol=1e-12)

    def test_transform_point_rt_broadcast(self):
        rng = np.random.default_rng(7)
        rt = rng.normal(0, 0.4, (5, 1, 6))
        x = rng.normal(0, 1.0, (1, 3, 3))
        y = np.asarray(mrcal.transform_point_rt(rt, x))
        assert y.shape == (5, 3, 3)
        yi = np.asarray(mrcal.transform_point_rt(rt[2, 0], x[0, 1]))
        np.testing.assert_allclose(y[2, 1], yi, atol=1e-12)
        # inverted broadcast too
        yinv = np.asarray(mrcal.transform_point_rt(rt, y, inverted=True))
        np.testing.assert_allclose(yinv, np.broadcast_to(x, (5, 3, 3)),
                                   atol=1e-9)

    def test_compose_rt_broadcast(self):
        rng = np.random.default_rng(8)
        rt0 = rng.normal(0, 0.4, (4, 6))
        rt1 = rng.normal(0, 0.4, (4, 6))
        rt01 = np.asarray(mrcal.compose_rt(rt0, rt1))
        assert rt01.shape == (4, 6)
        for i in range(4):
            np.testing.assert_allclose(
                rt01[i], np.asarray(mrcal.compose_rt(rt0[i], rt1[i])),
                atol=1e-12)
        # 3-way composition broadcasts too
        rt3 = np.asarray(mrcal.compose_rt(rt0, rt1, rt1))
        assert rt3.shape == (4, 6)

    def test_conversions_broadcast(self):
        rng = np.random.default_rng(9)
        rt = rng.normal(0, 0.4, (2, 3, 6))
        Rt = np.asarray(mrcal.Rt_from_rt(rt))
        assert Rt.shape == (2, 3, 4, 3)
        rt2 = np.asarray(mrcal.rt_from_Rt(Rt))
        np.testing.assert_allclose(rt2, rt, atol=1e-9)
        R = np.asarray(mrcal.R_from_r(rt[..., :3]))
        assert R.shape == (2, 3, 3, 3)
        r2 = np.asarray(mrcal.r_from_R(R))
        np.testing.assert_allclose(r2, rt[..., :3], atol=1e-9)


class TestTriangulation:
    @pytest.mark.parametrize("fn", [
        mrcal.triangulate_geometric,
        mrcal.triangulate_leecivera_l1,
        mrcal.triangulate_leecivera_linf,
        mrcal.triangulate_leecivera_mid2,
        mrcal.triangulate_leecivera_wmid2])
    def test_leading_dims(self, fn):
        rng = np.random.default_rng(10)
        p = np.array([1.0, 2.0, 10.0]) + rng.normal(0, 0.5, (4, 7, 3))
        t01 = np.array([1.0, 0.05, -0.05])
        v0 = p / np.linalg.norm(p, axis=-1, keepdims=True)
        p1 = p - t01
        v1 = p1 / np.linalg.norm(p1, axis=-1, keepdims=True)
        out = np.asarray(fn(v0, v1, np.broadcast_to(t01, (4, 7, 3))))
        assert out.shape == (4, 7, 3)
        one = np.asarray(fn(v0[1, 2], v1[1, 2], t01))
        np.testing.assert_allclose(out[1, 2], one, atol=1e-9)
        np.testing.assert_allclose(out, p, atol=1e-6)


class TestOutKwarg:
    """The documented out= contract: numpy destination, result COPIED in
    (returning it) — NOT the reference's zero-copy in-place write."""

    def test_project_out(self):
        v = np.array([[0.1, -0.05, 1.0], [0.0, 0.02, 1.0]])
        dst = np.zeros((2, 2))
        q = mrcal.project(v, MODEL_OPENCV4, INTR_OPENCV4, out=dst)
        np.testing.assert_allclose(
            dst, np.asarray(mrcal.project(v, MODEL_OPENCV4,
                                          INTR_OPENCV4)), atol=1e-12)
        np.testing.assert_allclose(np.asarray(q), dst)

    def test_rotate_point_r_out(self):
        r = np.array([0.1, -0.2, 0.3])
        x = np.array([[1.0, 2.0, 3.0]])
        dst = np.zeros((1, 3))
        mrcal.rotate_point_r(r, x, out=dst)
        np.testing.assert_allclose(
            dst, np.asarray(mrcal.rotate_point_r(r, x)), atol=1e-12)


class TestRefCalibrationObject:
    def test_baseline_and_warp_broadcast(self):
        obj = np.asarray(mrcal.ref_calibration_object(10, 9, 5.0))
        assert obj.shape == (9, 10, 3)
        assert obj[0, 1, 0] - obj[0, 0, 0] == pytest.approx(5.0)
        assert obj[1, 0, 1] - obj[0, 0, 1] == pytest.approx(5.0)
        # broadcasted warp: (2,2) warps -> (2, 9, 10, 3)
        warps = np.array([[0.01, -0.01], [0.0, 0.02]])
        obj_w = np.asarray(mrcal.ref_calibration_object(
            10, 9, 5.0, calobject_warp=warps))
        assert obj_w.shape == (2, 9, 10, 3)
        for k in range(2):
            ow = np.asarray(mrcal.ref_calibration_object(
                10, 9, 5.0, calobject_warp=warps[k]))
            np.testing.assert_allclose(obj_w[k], ow, atol=1e-12)
