"""Lens-model projection correctness: round trips, special-model closed
forms, AD gradients vs numeric (mirrors test-projections.py strategy)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal
from mrcal_tpu.lensmodels import parse_lensmodel


# sample intrinsics per model family (plausible values)
INTRINSICS = {
    "LENSMODEL_PINHOLE": [1512., 1512., 1200., 800.],
    "LENSMODEL_STEREOGRAPHIC": [1512., 1512., 1200., 800.],
    "LENSMODEL_LONLAT": [900., 900., 1200., 800.],
    "LENSMODEL_LATLON": [900., 900., 1200., 800.],
    "LENSMODEL_OPENCV4": [1512., 1512., 1200., 800.,
                          -0.012, 0.035, -0.001, 0.002],
    "LENSMODEL_OPENCV5": [1512., 1512., 1200., 800.,
                          -0.012, 0.035, -0.001, 0.002, 0.019],
    "LENSMODEL_OPENCV8": [1512., 1512., 1200., 800.,
                          -0.012, 0.035, -0.001, 0.002, 0.019,
                          0.014, -0.056, 0.050],
    "LENSMODEL_OPENCV12": [1512., 1512., 1200., 800.,
                           -0.012, 0.035, -0.001, 0.002, 0.019,
                           0.014, -0.056, 0.050,
                           0.0005, -0.0005, 0.0002, -0.0002],
    "LENSMODEL_CAHVOR": [4842.9, 4842.5, 1970.5, 1085.5,
                         -0.001, 0.002, -0.637, 0.0052, -0.025],
}

PTS = np.array([[0.1, 0.2, 10.0],
                [-0.3, 0.1, 4.0],
                [1.5, -2.0, 8.0],
                [0.0, 0.0, 2.0]])


@pytest.mark.parametrize("model", sorted(INTRINSICS))
def test_project_unproject_roundtrip(model):
    intr = np.array(INTRINSICS[model])
    q = np.asarray(mrcal.project(PTS, model, intr))
    assert q.shape == (len(PTS), 2)
    assert np.all(np.isfinite(q))
    v = np.asarray(mrcal.unproject(q, model, intr))
    # unprojection is defined up to scale: compare normalized
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    pn = PTS / np.linalg.norm(PTS, axis=-1, keepdims=True)
    assert np.allclose(vn, pn, atol=1e-7)


def test_project_gradients_numeric():
    model = "LENSMODEL_OPENCV4"
    intr = np.array(INTRINSICS[model])
    p = np.array([0.2, -0.3, 5.0])
    q, dq_dv, dq_di = mrcal.project(p, model, intr, get_gradients=True)
    eps = 1e-6
    for j in range(3):
        dp = np.zeros(3)
        dp[j] = eps
        gnum = (np.asarray(mrcal.project(p + dp, model, intr)) -
                np.asarray(mrcal.project(p - dp, model, intr))) / (2 * eps)
        assert np.allclose(np.asarray(dq_dv)[:, j], gnum, atol=1e-5)
    for j in range(len(intr)):
        di = np.zeros(len(intr))
        di[j] = eps
        gnum = (np.asarray(mrcal.project(p, model, intr + di)) -
                np.asarray(mrcal.project(p, model, intr - di))) / (2 * eps)
        assert np.allclose(np.asarray(dq_di)[:, j], gnum, atol=1e-4)


def test_special_models_match_generic():
    for name, fn_pair in [
            ("LENSMODEL_PINHOLE",
             (mrcal.project_pinhole, mrcal.unproject_pinhole)),
            ("LENSMODEL_STEREOGRAPHIC",
             (mrcal.project_stereographic, mrcal.unproject_stereographic)),
            ("LENSMODEL_LONLAT",
             (mrcal.project_lonlat, mrcal.unproject_lonlat)),
            ("LENSMODEL_LATLON",
             (mrcal.project_latlon, mrcal.unproject_latlon))]:
        intr = np.array(INTRINSICS[name])
        proj, unproj = fn_pair
        q1 = np.asarray(proj(PTS, intr[:4]))
        q2 = np.asarray(mrcal.project(PTS, name, intr))
        assert np.allclose(q1, q2, atol=1e-9), name
        v1 = np.asarray(unproj(q1, intr[:4]))
        v2 = np.asarray(mrcal.unproject(q1, name, intr))
        assert np.allclose(v1, v2, atol=1e-9), name


def test_stereographic_behind_camera():
    intr = np.array(INTRINSICS["LENSMODEL_STEREOGRAPHIC"])
    p = np.array([0.5, 0.2, -1.0])        # behind the camera
    q = np.asarray(mrcal.project(p, "LENSMODEL_STEREOGRAPHIC", intr))
    assert np.all(np.isfinite(q))


def test_splined_model_roundtrip():
    name = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=11_Ny=8_fov_x_deg=120"
    lm = parse_lensmodel(name)
    assert lm.num_params == 4 + 2 * 11 * 8
    np.random.seed(0)
    intr = np.concatenate([
        np.array([800., 800., 600., 400.]),
        np.random.randn(2 * 11 * 8) * 1e-3])
    q = np.asarray(mrcal.project(PTS, name, intr))
    assert np.all(np.isfinite(q))
    v = np.asarray(mrcal.unproject(q, name, intr))
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    pn = PTS / np.linalg.norm(PTS, axis=-1, keepdims=True)
    assert np.allclose(vn, pn, atol=1e-7)
    # zero spline coefficients => pure stereographic
    intr0 = np.concatenate([intr[:4], np.zeros(2 * 11 * 8)])
    q_spl = np.asarray(mrcal.project(PTS, name, intr0))
    q_ster = np.asarray(mrcal.project(
        PTS, "LENSMODEL_STEREOGRAPHIC", intr0[:4]))
    assert np.allclose(q_spl, q_ster, atol=1e-9)


def test_splined_quadratic():
    name = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=2_Nx=11_Ny=8_fov_x_deg=120"
    np.random.seed(1)
    intr = np.concatenate([
        np.array([800., 800., 600., 400.]),
        np.random.randn(2 * 11 * 8) * 1e-3])
    q = np.asarray(mrcal.project(PTS, name, intr))
    v = np.asarray(mrcal.unproject(q, name, intr))
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    pn = PTS / np.linalg.norm(PTS, axis=-1, keepdims=True)
    assert np.allclose(vn, pn, atol=1e-7)


def test_splined_gradient_sparsity():
    """The intrinsics gradient of a splined projection touches only the core
    + one 4x4 window of knots (2 surfaces)."""
    name = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=11_Ny=8_fov_x_deg=120"
    intr = np.concatenate([
        np.array([800., 800., 600., 400.]), np.zeros(2 * 11 * 8)])
    p = np.array([0.1, 0.2, 5.0])
    _, _, dq_di = mrcal.project(p, name, intr, get_gradients=True)
    nnz_cols = np.any(np.abs(np.asarray(dq_di)) > 0, axis=0)
    assert nnz_cols[:2].any()           # fx
    n_spline_nnz = nnz_cols[4:].sum()
    assert n_spline_nnz <= 2 * 16       # 4x4 window, x+y surfaces


def test_lensmodel_registry():
    assert mrcal.lensmodel_num_params("LENSMODEL_OPENCV8") == 12
    assert mrcal.lensmodel_num_params(
        "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=30_Ny=18_fov_x_deg=150") \
        == 4 + 2 * 30 * 18
    meta = mrcal.lensmodel_metadata_and_config("LENSMODEL_OPENCV4")
    assert meta["has_core"] and not meta["noncentral"]
    meta = mrcal.lensmodel_metadata_and_config(
        "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=30_Ny=18_fov_x_deg=150")
    assert meta["order"] == 3 and meta["Nx"] == 30
    with pytest.raises(ValueError):
        parse_lensmodel("LENSMODEL_BOGUS")
    with pytest.raises(ValueError):
        parse_lensmodel("LENSMODEL_SPLINED_STEREOGRAPHIC_order=3")


def test_knots_for_splined_models():
    name = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=11_Ny=8_fov_x_deg=120"
    ux, uy = mrcal.knots_for_splined_models(name)
    assert len(np.asarray(ux)) == 11
    assert len(np.asarray(uy)) == 8
    # symmetric around 0
    assert np.allclose(np.asarray(ux), -np.asarray(ux)[::-1])
    # edge knot must be beyond the fov edge by the margin design
    import math
    u_edge = 2 * math.tan(120 / 2 / 2 * math.pi / 180)
    assert np.asarray(ux)[-1] > u_edge / 2


def test_broadcasting_intrinsics():
    intr = np.stack([INTRINSICS["LENSMODEL_OPENCV4"],
                     INTRINSICS["LENSMODEL_OPENCV4"]])
    intr = np.array(intr)
    intr[1, 0] *= 1.1
    q = np.asarray(mrcal.project(PTS[0], "LENSMODEL_OPENCV4", intr))
    assert q.shape == (2, 2)
    assert not np.allclose(q[0], q[1])


def test_cahvore_roundtrip():
    """CAHVORE (noncentral): projection is finite and the central unproject
    inverts it up to the pupil-displacement (noncentrality) error."""
    intr = np.array([4000., 4000., 1000., 800., 0.01, -0.02,
                     -0.3, 0.01, -0.005, 0.001, -0.002, 0.0005])
    for lin in (0.4, 0.0, -0.3):
        name = f"LENSMODEL_CAHVORE_linearity={lin:.2f}"
        pts = np.array([[0.1, 0.2, 5.0], [-0.5, 0.3, 3.0], [1.0, -1.0, 4.0]])
        q = np.asarray(mrcal.project(pts, name, intr))
        assert np.all(np.isfinite(q))
        v = np.asarray(mrcal.unproject(q, name, intr))
        vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
        pn = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
        assert np.abs(vn - pn).max() < 1e-4
    # zero pupil terms -> central model; roundtrip must be exact
    intr0 = intr.copy()
    intr0[9:] = 0.0
    name = "LENSMODEL_CAHVORE_linearity=1.00"
    pts = np.array([[0.1, 0.2, 5.0]])
    q = np.asarray(mrcal.project(pts, name, intr0))
    v = np.asarray(mrcal.unproject(q, name, intr0))
    vn = v / np.linalg.norm(v, axis=-1, keepdims=True)
    pn = pts / np.linalg.norm(pts, axis=-1, keepdims=True)
    assert np.abs(vn - pn).max() < 1e-9
    # linearity=1 with zero e must reduce to CAHVOR
    q_cahvor = np.asarray(mrcal.project(pts, "LENSMODEL_CAHVOR", intr0[:9]))
    assert np.allclose(q, q_cahvor, atol=1e-6)
