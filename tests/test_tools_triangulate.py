"""Tool-level tests of mrcal-triangulate: the full sensitivity report
(reference mrcal-triangulate:600-933) driven end-to-end."""

import os
import pathlib
import re
import subprocess
import sys

import numpy as np
import pytest

import mrcal_tpu as mrcal

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _run(args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, str(TOOLS / "mrcal-triangulate")] + args,
        capture_output=True, text=True, env=env, timeout=timeout)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def pair(tmp_path_factory):
    """A SOLVED two-camera pair (models carry optimization_inputs, so
    --q-calibration-stdev works, like the reference requires)."""
    from test_calibration import make_scene, optimization_inputs_from_scene
    d = tmp_path_factory.mktemp("tri")
    scene = make_scene(Ncameras=2, Nframes=12, model="LENSMODEL_OPENCV4",
                       seed=12)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    oi = {k: v for k, v in oi.items() if v is not None}
    oi["do_apply_outlier_rejection"] = False
    mrcal.optimize(**oi)
    m0 = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    m1 = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=1)
    p0 = d / "cam0.cameramodel"
    p1 = d / "cam1.cameramodel"
    m0.write(str(p0))
    m1.write(str(p1))
    # a world point 12 m out along cam0's optical axis
    p = np.asarray(mrcal.transform_point_rt(
        np.asarray(m0.extrinsics_rt_fromref()),
        np.array([0.5, -0.3, 12.0]), inverted=True))   # ref coords
    q0 = np.asarray(mrcal.project(
        np.asarray(mrcal.transform_point_rt(
            np.asarray(m0.extrinsics_rt_fromref()), p)),
        *m0.intrinsics()))
    q1 = np.asarray(mrcal.project(
        np.asarray(mrcal.transform_point_rt(
            np.asarray(m1.extrinsics_rt_fromref()), p)),
        *m1.intrinsics()))
    p_cam0 = np.asarray(mrcal.transform_point_rt(
        np.asarray(m0.extrinsics_rt_fromref()), p))
    return dict(models=[str(p0), str(p1)], q0=q0, q1=q1, p=p_cam0,
                m0=m0, m1=m1, dir=d)


def test_triangulate_report(pair, tmp_path):
    out = _run(["--range-estimate", "12.1",
                "--q-calibration-stdev", "0.3",
                "--q-observation-stdev", "0.2",
                "--viz", "uncertainty",
                "--hardcopy", str(tmp_path / "unc.png"),
                *pair["models"],
                *(f"{v}" for v in np.concatenate([pair["q0"],
                                                  pair["q1"]]))],
               )
    # range recovered
    m = re.search(r"## Range: ([0-9.]+) m", out)
    assert m and abs(float(m.group(1))
                     - np.linalg.norm(pair["p"])) < 0.05
    # the full sensitivity report is present
    for needle in ("Observed-pixel range sensitivity",
                   "Calibration yaw (rotation in epipolar plane)",
                   "Calibration yaw (cam0 y axis)",
                   "Calibration pitch (tilt of epipolar plane)",
                   "Calibration translation sensitivity",
                   "Optimized yaw",
                   "Optimized pitch",
                   "Optimized relative yaw (1 <- 0)",
                   "Uncertainty propagation: calibration-time",
                   "Uncertainty propagation: observation-time"):
        assert needle in out, f"missing report line: {needle}\n{out}"
    assert (tmp_path / "unc.png").exists()


def test_triangulate_feature_matching_plane(pair, tmp_path):
    """Images + --plane-n/--plane-d homography-guided matching."""
    from scipy.ndimage import gaussian_filter
    rngr = np.random.default_rng(3)
    m0 = mrcal.cameramodel(pair["models"][0])
    m1 = mrcal.cameramodel(pair["models"][1])
    W, H = m0.imagersize()
    img0 = gaussian_filter(rngr.random((H, W)) * 255, 1.2)
    # cam1 view of the z=12 plane
    mapxy = mrcal.image_transformation_map(
        m0, m1, plane_n=np.array([0., 0, 1.]), plane_d=12.0)
    img1 = np.asarray(mrcal.transform_image(img0, mapxy))
    i0 = tmp_path / "i0.png"
    i1 = tmp_path / "i1.png"
    mrcal.save_image(str(i0), img0.astype(np.uint8))
    mrcal.save_image(str(i1), np.asarray(img1).astype(np.uint8))
    out = _run(["--range-estimate", "12",
                "--plane-n", "0", "0", "1", "--plane-d", "12",
                "--search-radius", "12",
                *pair["models"],
                f"{pair['q0'][0]}", f"{pair['q0'][1]}",
                str(i0), str(i1)])
    assert "Feature match found at" in out
    assert "q1 - q1_perfect_at_range" in out
    m = re.search(r"## Range: ([0-9.]+) m", out)
    assert m and abs(float(m.group(1)) - 12.0) < 0.5
