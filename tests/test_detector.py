"""Chessboard corner detection tests (mrgingham-equivalent subsystem).

Renders synthetic chessboards with exactly-known corner positions
(supersampled projection through a homography) and checks the detector
recovers the full ordered grid to subpixel accuracy.
"""

import numpy as np
import pytest

from mrcal_tpu.detector import (chess_response, find_chessboard_corners,
                                _order_into_grid)


def render_chessboard(H_img, W_img, Hmat, ncells=11, ss=4):
    """Render a chessboard through homography Hmat (board coords in cells ->
    pixels), supersampled ss x for antialiasing.  Returns (image, corners)
    where corners are the (ncells-1)^2 INNER vertices, row-major."""
    ys, xs = np.mgrid[0:H_img * ss, 0:W_img * ss].astype(np.float64)
    xs = (xs + 0.5) / ss - 0.5
    ys = (ys + 0.5) / ss - 0.5
    # invert the homography: pixel -> board cell coords
    Hinv = np.linalg.inv(Hmat)
    w = Hinv[2, 0] * xs + Hinv[2, 1] * ys + Hinv[2, 2]
    bx = (Hinv[0, 0] * xs + Hinv[0, 1] * ys + Hinv[0, 2]) / w
    by = (Hinv[1, 0] * xs + Hinv[1, 1] * ys + Hinv[1, 2]) / w
    inside = (bx >= 0) & (bx < ncells) & (by >= 0) & (by < ncells)
    checker = ((np.floor(bx).astype(int) + np.floor(by).astype(int)) % 2)
    im = np.where(inside, np.where(checker, 40.0, 220.0), 130.0)
    im = im.reshape(H_img, ss, W_img, ss).mean(axis=(1, 3))

    ij = np.mgrid[1:ncells, 1:ncells].astype(np.float64)  # inner vertices
    by_g, bx_g = ij[0].ravel(), ij[1].ravel()
    w = Hmat[2, 0] * bx_g + Hmat[2, 1] * by_g + Hmat[2, 2]
    qx = (Hmat[0, 0] * bx_g + Hmat[0, 1] * by_g + Hmat[0, 2]) / w
    qy = (Hmat[1, 0] * bx_g + Hmat[1, 1] * by_g + Hmat[1, 2]) / w
    n = ncells - 1
    corners = np.stack([qx, qy], axis=-1).reshape(n, n, 2)
    return im.astype(np.float32), corners


def grid_match_error(detected, truth_grid):
    """RMS position error after matching detected row-major grid against the
    truth grid in the best of 8 orientations."""
    n = truth_grid.shape[0]
    det = detected.reshape(n, n, 2)
    best = np.inf
    for g in (truth_grid, truth_grid[::-1], truth_grid[:, ::-1],
              truth_grid[::-1, ::-1],
              truth_grid.transpose(1, 0, 2),
              truth_grid.transpose(1, 0, 2)[::-1],
              truth_grid.transpose(1, 0, 2)[:, ::-1],
              truth_grid.transpose(1, 0, 2)[::-1, ::-1]):
        e = np.sqrt(np.mean(np.sum((det - g) ** 2, axis=-1)))
        best = min(best, e)
    return best


def test_response_peaks_at_vertices():
    Hmat = np.array([[28.0, 1.0, 60.0],
                     [-1.5, 27.0, 50.0],
                     [0.0, 0.0, 1.0]])
    im, corners = render_chessboard(420, 420, Hmat, ncells=11)
    R = np.asarray(chess_response(im))
    # response at every true vertex should be far above the image median
    cx = np.round(corners[..., 0]).astype(int).ravel()
    cy = np.round(corners[..., 1]).astype(int).ravel()
    at_corners = R[cy, cx]
    assert np.all(at_corners > 0.25 * at_corners.max())
    # and the global max should be near SOME vertex
    iy, ix = np.unravel_index(np.argmax(R), R.shape)
    d = np.min(np.linalg.norm(corners.reshape(-1, 2)
                              - np.array([ix, iy]), axis=1))
    assert d < 3.0


def test_detect_frontal_board():
    Hmat = np.array([[30.0, 0.0, 70.0],
                     [0.0, 30.0, 55.0],
                     [0.0, 0.0, 1.0]])
    im, corners = render_chessboard(450, 480, Hmat, ncells=11)
    det, level = find_chessboard_corners(im, 10, 10)
    assert det is not None
    assert level == 0
    err = grid_match_error(det, corners)
    assert err < 0.2, f"corner RMS error {err} px"


def test_detect_perspective_board():
    # rotated + keystoned board
    Hmat = np.array([[24.0, -7.0, 160.0],
                     [6.0, 22.0, 60.0],
                     [1.2e-4, -9e-5, 1.0]])
    im, corners = render_chessboard(440, 460, Hmat, ncells=11)
    det, level = find_chessboard_corners(im, 10, 10)
    assert det is not None
    err = grid_match_error(det, corners)
    assert err < 0.35, f"corner RMS error {err} px"


def test_detect_with_noise_and_outlier_blobs():
    rng = np.random.default_rng(0)
    Hmat = np.array([[27.0, 2.0, 80.0],
                     [-2.0, 26.0, 70.0],
                     [0.0, 0.0, 1.0]])
    im, corners = render_chessboard(440, 440, Hmat, ncells=11)
    im = im + rng.normal(0, 3.0, im.shape).astype(np.float32)
    # paint a couple of distractor blobs outside the board
    im[10:25, 10:25] = 255.0
    im[400:420, 390:425] = 0.0
    det, level = find_chessboard_corners(im, 10, 10)
    assert det is not None
    err = grid_match_error(det, corners)
    assert err < 0.35, f"corner RMS error {err} px"


def test_row_major_ordering_canonical():
    """Detected grid must be row-major with rows along +x, columns along
    +y (consistent ordering across cameras, like mrgingham)."""
    Hmat = np.array([[30.0, 0.0, 70.0],
                     [0.0, 30.0, 55.0],
                     [0.0, 0.0, 1.0]])
    im, corners = render_chessboard(450, 480, Hmat, ncells=11)
    det, _ = find_chessboard_corners(im, 10, 10)
    g = det.reshape(10, 10, 2)
    assert np.all(np.diff(g[..., 0], axis=1) > 0)   # x grows along rows
    assert np.all(np.diff(g[..., 1], axis=0) > 0)   # y grows down columns
    # matches the truth grid directly, with no reorientation
    assert np.sqrt(np.mean((g - corners) ** 2)) < 0.2


def test_order_into_grid_rejects_incomplete():
    pts = np.random.default_rng(1).uniform(0, 100, (40, 2))
    assert _order_into_grid(pts, 10, 10) is None


def test_nonsquare_grid():
    Hmat = np.array([[26.0, 1.0, 60.0],
                     [-1.0, 27.0, 45.0],
                     [0.0, 0.0, 1.0]])
    # 14x10 cells -> 13x9 inner corners
    ys, xs = 10, 14
    ss = 4
    H_img, W_img = 330, 440

    ysg, xsg = np.mgrid[0:H_img * ss, 0:W_img * ss].astype(np.float64)
    xsg = (xsg + 0.5) / ss - 0.5
    ysg = (ysg + 0.5) / ss - 0.5
    Hinv = np.linalg.inv(Hmat)
    w = Hinv[2, 0] * xsg + Hinv[2, 1] * ysg + Hinv[2, 2]
    bx = (Hinv[0, 0] * xsg + Hinv[0, 1] * ysg + Hinv[0, 2]) / w
    by = (Hinv[1, 0] * xsg + Hinv[1, 1] * ysg + Hinv[1, 2]) / w
    inside = (bx >= 0) & (bx < xs) & (by >= 0) & (by < ys)
    checker = ((np.floor(bx).astype(int) + np.floor(by).astype(int)) % 2)
    im = np.where(inside, np.where(checker, 40.0, 220.0), 130.0)
    im = im.reshape(H_img, ss, W_img, ss).mean(axis=(1, 3)).astype(np.float32)

    det, level = find_chessboard_corners(im, xs - 1, ys - 1)
    assert det is not None
    assert det.shape == ((xs - 1) * (ys - 1), 2)

    ij = np.mgrid[1:ys, 1:xs].astype(np.float64)
    by_g, bx_g = ij[0].ravel(), ij[1].ravel()
    w = Hmat[2, 0] * bx_g + Hmat[2, 1] * by_g + Hmat[2, 2]
    qx = (Hmat[0, 0] * bx_g + Hmat[0, 1] * by_g + Hmat[0, 2]) / w
    qy = (Hmat[1, 0] * bx_g + Hmat[1, 1] * by_g + Hmat[1, 2]) / w
    truth = np.stack([qx, qy], axis=-1)
    err = np.sqrt(np.mean(np.sum((det - truth) ** 2, axis=-1)))
    assert err < 0.35, f"corner RMS error {err} px"


def test_end_to_end_corner_pipeline(tmp_path):
    """Images on disk -> compute_chessboard_corners with globs only (no
    corners cache): the native detector replaces the reference's mrgingham
    subprocess (reference mrcal/calibration.py:24-220)."""
    from mrcal_tpu.image import save_image
    from mrcal_tpu.calibration import compute_chessboard_corners

    Hmats = [np.array([[28.0, 1.0, 70.0],
                       [-1.0, 27.0, 60.0],
                       [0.0, 0.0, 1.0]]),
             np.array([[25.0, -4.0, 120.0],
                       [4.0, 24.0, 70.0],
                       [5e-5, -4e-5, 1.0]])]
    truths = []
    for i, Hm in enumerate(Hmats):
        im, corners = render_chessboard(430, 450, Hm, ncells=11)
        save_image(str(tmp_path / f"frame{i:03d}-cam0.png"),
                   np.clip(im, 0, 255).astype(np.uint8))
        truths.append(corners)

    obs, ifc, paths = compute_chessboard_corners(
        10, 10, globs_per_camera=(str(tmp_path / "*-cam0.png"),))
    assert obs.shape == (2, 10, 10, 3)
    assert np.all(ifc[:, 1] == 0)
    assert np.all(obs[..., 2] > 0)          # all inlier weights
    for i in range(2):
        err = grid_match_error(obs[i, :, :, :2].reshape(-1, 2), truths[i])
        assert err < 0.4, f"frame {i}: corner RMS error {err} px"
