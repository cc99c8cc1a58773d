"""Tool-level test of the mrcal-stereo executable: drive the full
pipeline (rectify -> equalize -> match -> range -> point cloud) on a
synthetic textured plane at a known depth, exercising the deepened
option surface (reference mrcal-stereo:201-463)."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import mrcal_tpu as mrcal

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _run(args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, str(TOOLS / "mrcal-stereo")] + args,
                       capture_output=True, text=True, env=env,
                       timeout=timeout)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    """Two pinhole models + a synthetic image pair viewing a z=5 plane."""
    from scipy.ndimage import zoom, gaussian_filter
    d = tmp_path_factory.mktemp("stereo")
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
    mapxy = mrcal.image_transformation_map(
        m0, m1, plane_n=np.array([0., 0, 1.]), plane_d=5.0)
    img1 = np.asarray(mrcal.transform_image(img0, mapxy)).astype(np.uint8)
    p0 = d / "cam0.cameramodel"
    p1 = d / "cam1.cameramodel"
    m0.write(str(p0))
    m1.write(str(p1))
    i0 = d / "img0.png"
    i1 = d / "img1.png"
    mrcal.save_image(str(i0), img0)
    mrcal.save_image(str(i1), img1)
    return dict(models=[str(p0), str(p1)], images=[str(i0), str(i1)],
                dir=d)


def test_stereo_tool_full_pipeline(scene, tmp_path):
    """Default census+SGM matcher with tuning knobs + range image with
    limits + PLY point cloud; the recovered median range is the plane
    depth."""
    _run(["--az-fov-deg", "50", "--el-fov-deg", "40",
          "--disparity-range", "1", "60",
          "--sgm-p1", "6", "--sgm-p2", "96", "--sgm-lr-limit", "1",
          "--range-image", "--range-image-limits", "3", "8",
          "--write-point-cloud",
          "--outdir", str(tmp_path), "--tag", "t",
          *scene["models"], *scene["images"]])
    assert (tmp_path / "t-rectified0.png").exists()
    assert (tmp_path / "t-disparity.png").exists()
    assert (tmp_path / "t-range.png").exists()
    ply = tmp_path / "t.ply"
    assert ply.exists()
    pts = np.loadtxt(str(ply), skiprows=7)
    assert len(pts) > 1000
    # the point cloud lies near the z=5 plane (rectified cam0 coords:
    # range ~ |p|; the plane is fronto-parallel at z=5)
    r = np.linalg.norm(pts, axis=-1)
    assert abs(np.median(r) - 5.0) < 0.3


def test_stereo_tool_clahe_and_already_rectified(scene, tmp_path):
    """--clahe equalization runs (numpy fallback without cv2), and
    --already-rectified skips the remap (feeding the raw pair is fine for
    an option-surface test)."""
    _run(["--az-fov-deg", "50", "--el-fov-deg", "40",
          "--disparity-range", "1", "60", "--clahe",
          "--matcher", "ncc",
          "--already-rectified",
          "--outdir", str(tmp_path), "--tag", "ar",
          *scene["models"], *scene["images"]])
    assert (tmp_path / "ar-disparity.png").exists()


def test_stereo_tool_viz_geometry(scene, tmp_path):
    _run(["--az-fov-deg", "50", "--el-fov-deg", "40",
          "--viz", "geometry",
          "--outdir", str(tmp_path), "--tag", "g",
          *scene["models"], *scene["images"]])
    assert (tmp_path / "g-geometry.png").exists()
