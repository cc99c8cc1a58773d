"""Detector robustness on REALISTIC imagery (round-5, VERDICT item 7).

The clean-render tests in test_detector.py prove the pipeline; real
photos add lens distortion, defocus blur, vignetting and sensor noise.
Here the chessboard is rendered THROUGH a lens model (the pinhole render
is remapped through project(unproject(...)) of an OPENCV4 and a splined
model — the same warp a real lens applies), then degraded, and the
detector must still recover every corner to sub-0.1 px rms.

The failure envelope measured by these tests is documented in
doc/recipes.md (detector section): blur sigma <= 2 px passes, sigma 3
is the documented failure point at this cell size (~28 px).
"""

import io

import numpy as np
import pytest
import scipy.ndimage as ndi

import mrcal_tpu as mrcal
from mrcal_tpu.detector import find_chessboard_corners

from test_detector import render_chessboard, grid_match_error

W_IMG, H_IMG = 480, 400
NCELLS = 11


def _base_homography(tilt=0.0):
    # board centered, ~28 px cells, mild perspective when tilt != 0
    return np.array([[28.0, 1.5, 70.0],
                     [-1.0, 27.0, 60.0],
                     [tilt, 1e-4, 1.0]])


def _distort_scene(im, corners, lensmodel, intrinsics):
    """Warp a pinhole render + its true corners through a lens model:
    distorted(q) = pinhole(project_pinhole(unproject_model(q))).
    The pinhole render is treated as the image of an ideal pinhole with
    core = the model's core."""
    core = np.asarray(intrinsics[:4], np.float64)
    H, W = im.shape
    qx, qy = np.meshgrid(np.arange(W, dtype=np.float64),
                         np.arange(H, dtype=np.float64))
    q = np.stack([qx, qy], axis=-1).reshape(-1, 2)
    v = np.asarray(mrcal.unproject(q, lensmodel, intrinsics))
    q_pin = np.asarray(mrcal.project_pinhole(
        v / v[:, 2:3], core))
    map_x = q_pin[:, 0].reshape(H, W)
    map_y = q_pin[:, 1].reshape(H, W)
    im_d = ndi.map_coordinates(im, [map_y, map_x], order=1,
                               mode="nearest")
    # true corners move the other way: q_d = project_model(v_pinhole)
    c = corners.reshape(-1, 2)
    v_c = np.asarray(mrcal.unproject_pinhole(c, core))
    q_d = np.asarray(mrcal.project(v_c, lensmodel, intrinsics))
    return im_d.astype(np.float32), q_d.reshape(corners.shape)


def _degrade(im, blur=0.0, vignette=0.0, noise=0.0, seed=0):
    out = np.asarray(im, np.float64)
    if blur:
        out = ndi.gaussian_filter(out, blur)
    if vignette:
        H, W = out.shape
        yy, xx = np.mgrid[0:H, 0:W]
        r2 = (((xx - W / 2) / (W / 2)) ** 2
              + ((yy - H / 2) / (H / 2)) ** 2)
        out = out * (1.0 - vignette * r2 / 2.0)
    if noise:
        out = out + np.random.default_rng(seed).normal(0, noise,
                                                       out.shape)
    return np.clip(out, 0, 255).astype(np.float32)


OPENCV4_INTR = np.array([420., 415., (W_IMG - 1) / 2, (H_IMG - 1) / 2,
                         -0.18, 0.06, 0.001, -0.001])
SPLINED_MODEL = ("LENSMODEL_SPLINED_STEREOGRAPHIC"
                 "_order=3_Nx=11_Ny=8_fov_x_deg=120")


def _splined_intrinsics():
    n = mrcal.lensmodel_num_params(SPLINED_MODEL)
    intr = np.zeros(n)
    intr[:4] = [420., 415., (W_IMG - 1) / 2, (H_IMG - 1) / 2]
    # a smooth, non-trivial distortion surface (~4 px of warp)
    rng = np.random.default_rng(4)
    intr[4:] = 0.01 * rng.standard_normal(n - 4)
    return intr


class TestLensDistortion:
    @pytest.mark.parametrize("lensmodel,intr", [
        ("LENSMODEL_OPENCV4", OPENCV4_INTR),
        pytest.param(SPLINED_MODEL, None, id="splined")])
    def test_distorted_perspective_board(self, lensmodel, intr):
        if intr is None:
            intr = _splined_intrinsics()
        im, corners = render_chessboard(H_IMG, W_IMG,
                                        _base_homography(tilt=3e-4),
                                        ncells=NCELLS)
        im_d, corners_d = _distort_scene(im, corners, lensmodel, intr)
        # sanity: the lens moved the corners measurably
        assert np.max(np.linalg.norm(
            (corners_d - corners).reshape(-1, 2), axis=-1)) > 1.0
        det, level = find_chessboard_corners(im_d, NCELLS - 1)
        assert det is not None
        err = grid_match_error(det, corners_d)
        assert err < 0.1, f"{lensmodel}: rms {err:.3f} px"


class TestDegradations:
    def _run(self, blur=0.0, vignette=0.0, noise=0.0):
        im, corners = render_chessboard(H_IMG, W_IMG,
                                        _base_homography(tilt=2e-4),
                                        ncells=NCELLS)
        im_d, corners_d = _distort_scene(im, corners,
                                         "LENSMODEL_OPENCV4",
                                         OPENCV4_INTR)
        im_d = _degrade(im_d, blur=blur, vignette=vignette, noise=noise)
        det, level = find_chessboard_corners(im_d, NCELLS - 1)
        if det is None:
            return None
        return grid_match_error(det, corners_d)

    @pytest.mark.parametrize("blur", [0.8, 1.5, 2.0])
    def test_blur(self, blur):
        err = self._run(blur=blur)
        assert err is not None and err < 0.1, f"blur {blur}: {err}"

    def test_vignetting(self):
        # 60% corner-to-center falloff
        err = self._run(vignette=0.6)
        assert err is not None and err < 0.1, f"vignette: {err}"

    def test_noise(self):
        err = self._run(noise=4.0)
        assert err is not None and err < 0.1, f"noise: {err}"

    def test_combined_realistic(self):
        # distortion + mild defocus + vignetting + sensor noise together
        err = self._run(blur=1.2, vignette=0.5, noise=3.0)
        assert err is not None and err < 0.1, f"combined: {err}"

    def test_failure_envelope_documented(self):
        # the DOCUMENTED failure point: heavy defocus at this cell size.
        # If this ever starts passing, tighten doc/recipes.md instead of
        # deleting the test.
        err = self._run(blur=4.0)
        assert err is None or err > 0.05


class TestCornersVnlRoundTrip:
    def test_detector_to_vnl_to_observations(self, tmp_path):
        """detect -> corners.vnl text -> compute_chessboard_corners
        parses back to the same observation array (reference
        calibration.py:24 contract)."""
        im, corners = render_chessboard(H_IMG, W_IMG,
                                        _base_homography(),
                                        ncells=NCELLS)
        det, level = find_chessboard_corners(im, NCELLS - 1)
        assert det is not None
        buf = io.StringIO()
        buf.write("# filename x y level\n")
        for x, y in det:
            buf.write(f"frame0.png {x:.5f} {y:.5f} {int(level)}\n")
        buf.seek(0)
        obs, idx_fc, paths = mrcal.compute_chessboard_corners(
            NCELLS - 1, NCELLS - 1, corners_cache_vnl=buf)
        assert obs.shape == (1, NCELLS - 1, NCELLS - 1, 3)
        assert paths == ["frame0.png"]
        np.testing.assert_allclose(
            obs[0, :, :, :2].reshape(-1, 2), det, atol=1e-4)
        # level 0 -> weight 1.0 (weight = 2**-level)
        assert np.all(obs[0, :, :, 2] > 0)
