"""Stereo rectification geometry invariants (mirrors test-stereo.py):
epipolar alignment, round-trip consistency, disparity->range."""

import numpy as np
import pytest

import mrcal_tpu as mrcal


@pytest.fixture
def models():
    intr = np.array([1100., 1100., 800., 600.],)
    m0 = mrcal.cameramodel(intrinsics=("LENSMODEL_PINHOLE", intr),
                           imagersize=(1600, 1200), rt_cam_ref=np.zeros(6))
    # camera1: 20cm to the right, slightly rotated
    m1 = mrcal.cameramodel(intrinsics=("LENSMODEL_PINHOLE", intr * 1.01),
                           imagersize=(1600, 1200),
                           rt_cam_ref=np.array([0.01, -0.02, 0.005,
                                                -0.2, 0.003, 0.01]))
    return m0, m1


def test_rectified_system_geometry(models):
    rect = mrcal.rectified_system(models, az_fov_deg=60, el_fov_deg=50)
    lm, intr = rect[0].intrinsics()
    assert lm == "LENSMODEL_LATLON"
    # identical intrinsics for the pair
    assert np.allclose(intr, rect[1].intrinsics()[1])
    # rotation-only between each raw and its rectified camera:
    for m, r in zip(models, rect):
        Rt = np.asarray(mrcal.compose_Rt(m.Rt_cam_ref(), r.Rt_ref_cam()))
        assert np.allclose(Rt[3], 0, atol=1e-9)
    # baseline purely along the rectified x axis
    Rt01 = np.asarray(mrcal.compose_Rt(rect[0].Rt_cam_ref(),
                                       rect[1].Rt_ref_cam()))
    t01 = Rt01[3]
    assert abs(t01[1]) < 1e-9 and abs(t01[2]) < 1e-9
    assert np.allclose(Rt01[:3], np.eye(3), atol=1e-9)


def test_epipolar_alignment(models):
    """A 3D point must project to the same row (el) in both rectified views."""
    rect = mrcal.rectified_system(models, az_fov_deg=60, el_fov_deg=50)
    np.random.seed(0)
    p_rect0 = np.stack([np.random.uniform(-1, 1, 20),
                        np.random.uniform(-0.8, 0.8, 20),
                        np.random.uniform(2.0, 10.0, 20)], axis=-1)
    Rt01 = np.asarray(mrcal.compose_Rt(rect[0].Rt_cam_ref(),
                                       rect[1].Rt_ref_cam()))
    p_rect1 = np.asarray(mrcal.transform_point_Rt(
        np.asarray(mrcal.invert_Rt(Rt01)), p_rect0))
    lm, intr = rect[0].intrinsics()
    q0 = np.asarray(mrcal.project(p_rect0, lm, intr))
    q1 = np.asarray(mrcal.project(p_rect1, lm, intr))
    assert np.allclose(q0[:, 1], q1[:, 1], atol=1e-9)  # same elevation row


def test_rectification_maps_consistency(models):
    """Rectified pixel -> raw pixel maps: verify against direct projection."""
    rect = mrcal.rectified_system(models, az_fov_deg=40, el_fov_deg=30)
    maps = mrcal.rectification_maps(models, rect)
    Naz, Nel = rect[0].imagersize()
    assert maps.shape == (2, Nel, Naz, 2)
    # center pixel: unproject rectified, transform, project raw
    lm, intr = rect[0].intrinsics()
    q_rect = np.array([Naz / 2.0, Nel / 2.0])
    for i, m in enumerate(models):
        v_rect = np.asarray(mrcal.unproject(q_rect, lm, intr))
        R = np.asarray(mrcal.compose_Rt(m.Rt_cam_ref(),
                                        rect[i].Rt_ref_cam()))[:3]
        v_cam = R @ v_rect
        q_raw = np.asarray(mrcal.project(v_cam, *m.intrinsics()))
        iy, ix = int(q_rect[1]), int(q_rect[0])
        # bilinear-sample the map at the center
        assert np.allclose(maps[i, iy, ix], q_raw, atol=1.0)


def test_stereo_range_roundtrip(models):
    """Project a known point into both rectified views; the disparity must
    yield the true range."""
    rect = mrcal.rectified_system(models, az_fov_deg=60, el_fov_deg=50)
    lm, intr = rect[0].intrinsics()
    p_rect0 = np.array([0.3, -0.1, 5.0])
    r_true = np.linalg.norm(p_rect0)
    Rt01 = np.asarray(mrcal.compose_Rt(rect[0].Rt_cam_ref(),
                                       rect[1].Rt_ref_cam()))
    p_rect1 = np.asarray(mrcal.transform_point_Rt(
        np.asarray(mrcal.invert_Rt(Rt01)), p_rect0))
    q0 = np.asarray(mrcal.project(p_rect0, lm, intr))
    q1 = np.asarray(mrcal.project(p_rect1, lm, intr))
    disparity = q0[0] - q1[0]
    r = float(np.asarray(mrcal.stereo_range(
        np.array([[disparity]]), rect, qrect0=np.array([[q0]]))))
    assert np.isclose(r, r_true, rtol=1e-6)


def test_stereo_unproject(models):
    rect = mrcal.rectified_system(models, az_fov_deg=60, el_fov_deg=50)
    lm, intr = rect[0].intrinsics()
    p_rect0 = np.array([0.3, -0.1, 5.0])
    q0 = np.asarray(mrcal.project(p_rect0, lm, intr))
    r_true = np.linalg.norm(p_rect0)
    p = np.asarray(mrcal.stereo_unproject(
        None, rect, ranges=np.array(r_true), qrect0=q0))
    assert np.allclose(p, p_rect0, atol=1e-9)


def test_match_feature():
    np.random.seed(0)
    from mrcal_tpu.stereo import match_feature
    img0 = (np.random.rand(120, 160) * 255).astype(np.float64)
    # image1 = image0 shifted by a known offset
    dy_true, dx_true = 3, -5
    img1 = np.roll(np.roll(img0, dy_true, axis=0), dx_true, axis=1)
    q0 = np.array([80.0, 60.0])
    q1, diag = match_feature(img0, img1, q0, search_radius1=10,
                             template_size1=15)
    assert q1 is not None
    assert np.allclose(q1, q0 + [dx_true, dy_true], atol=0.25), q1
    assert diag["score"] > 0.9


def test_stereo_matching_ncc():
    np.random.seed(1)
    from mrcal_tpu.stereo import stereo_matching_ncc
    H, W = 60, 120
    d_true = 7
    img0 = (np.random.rand(H, W) * 255).astype(np.float32)
    # shift right image LEFT by d: feature at x in im0 appears at x-d in im1
    img1 = np.roll(img0, -d_true, axis=1)
    disp = stereo_matching_ncc(img0, img1, disparity_min=0,
                               disparity_max=20, block_size=9)
    inner = disp[10:-10, 30:-30]
    good = inner[inner > 0]
    assert len(good) > 0.8 * inner.size
    assert np.abs(np.median(good) - d_true) < 0.5


def test_full_stereo_pipeline():
    """End-to-end dense stereo: synthesize a textured plane at a known
    depth, rectify, remap, NCC-match, range — recovers the plane depth
    (validates the mrcal-stereo tool's pipeline)."""
    from scipy.ndimage import zoom, gaussian_filter
    from mrcal_tpu.stereo import stereo_matching_ncc
    intr = np.array([700., 700., 399.5, 299.5])
    m0 = mrcal.cameramodel(intrinsics=("LENSMODEL_PINHOLE", intr),
                           imagersize=(800, 600), rt_cam_ref=np.zeros(6))
    m1 = mrcal.cameramodel(intrinsics=("LENSMODEL_PINHOLE", intr),
                           imagersize=(800, 600),
                           rt_cam_ref=np.array([0., 0, 0, -0.3, 0, 0]))
    np.random.seed(0)
    base = np.random.rand(80, 100)
    tex = gaussian_filter(zoom(base, (600 / 80, 800 / 100), order=1), 1.5)
    img0 = (255 * (tex - tex.min()) / np.ptp(tex)).astype(np.uint8)
    # cam1 image: remap cam0's view through the z=5 plane
    mapxy = mrcal.image_transformation_map(
        m0, m1, plane_n=np.array([0., 0, 1.]), plane_d=5.0)
    img1 = mrcal.transform_image(img0, mapxy)

    rect = mrcal.rectified_system([m0, m1], az_fov_deg=50, el_fov_deg=40)
    maps = mrcal.rectification_maps([m0, m1], rect)
    r0 = mrcal.transform_image(img0, maps[0])
    r1 = mrcal.transform_image(img1, maps[1])
    disp = stereo_matching_ncc(r0, r1, disparity_min=1, disparity_max=60,
                               block_size=11)
    ranges = np.asarray(mrcal.stereo_range(disp, rect, disparity_min=1.0))
    H, W = ranges.shape
    inner = ranges[H // 3:2 * H // 3, W // 3:2 * W // 3]
    good = inner[inner > 0]
    assert len(good) > 0.9 * inner.size
    assert abs(np.median(good) - 5.0) < 0.15
