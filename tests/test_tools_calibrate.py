"""Tool-level test: drive tools/mrcal-calibrate-cameras end-to-end on a
synthetic scene (mirrors the reference's test-calibration-...-tool usage),
including the --seed path."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene

TOOL = str(pathlib.Path(__file__).resolve().parent.parent /
           "tools" / "mrcal-calibrate-cameras")


def _write_corners_vnl(path, scene):
    obs = scene["observations"]          # (Nobs, H, W, 3)
    idx = scene["indices"]               # (Nobs, 3): frame, ici, ice
    lines = ["# filename x y level"]
    for i in range(len(obs)):
        frame, cam = int(idx[i, 0]), int(idx[i, 1])
        for r in obs[i].reshape(-1, 3):
            lines.append(f"frame{frame:03d}-cam{cam}.png "
                         f"{r[0]:.4f} {r[1]:.4f} 0")
    path.write_text("\n".join(lines) + "\n")


def _run_tool(args, stdin_text=None):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, TOOL] + args,
                       capture_output=True, text=True, env=env,
                       input=stdin_text, timeout=1200)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def scene2():
    return make_scene(Ncameras=2, Nframes=10, model="LENSMODEL_OPENCV4",
                      W=8, H=6, seed=13)


def test_calibrate_tool_focal_seed(tmp_path, scene2):
    scene = scene2
    vnl = tmp_path / "corners.vnl"
    _write_corners_vnl(vnl, scene)
    out = _run_tool(["--corners-cache", str(vnl),
                     "--lensmodel", "LENSMODEL_OPENCV4",
                     "--focal", "750",
                     "--object-spacing", str(scene["spacing"]),
                     "--object-width-n", "8", "--object-height-n", "6",
                     "--imagersize", "800", "600",
                     "--outdir", str(tmp_path),
                     "*cam0*", "*cam1*"])
    assert "RMS reprojection error" in out
    rms = float(out.split("RMS reprojection error:")[1].split()[0])
    assert rms < 0.1        # noiseless corners -> near-exact solve
    m0 = mrcal.cameramodel(str(tmp_path / "camera-0.cameramodel"))
    m1 = mrcal.cameramodel(str(tmp_path / "camera-1.cameramodel"))
    # recovered intrinsics close to truth
    assert np.allclose(m0.intrinsics()[1][:2],
                       scene["intrinsics_true"][0][:2], rtol=5e-3)
    # relative pose recovered
    rt10 = np.asarray(m1.extrinsics_rt_fromref())
    assert np.allclose(rt10[3:], scene["extrinsics_true"][0][3:], atol=5e-3)
    # the model file embeds the full problem
    assert m0.optimization_inputs() is not None
    # warp was solved (calobject_warp reported)
    assert "calobject_warp" in out


def test_calibrate_tool_explore(tmp_path, scene2):
    """--explore drops into a post-solve shell with models/stats and the
    show_* helpers in scope (reference mrcal-calibrate-cameras:966-1023);
    drive it non-interactively through stdin."""
    scene = scene2
    vnl = tmp_path / "corners.vnl"
    _write_corners_vnl(vnl, scene)
    out = _run_tool(["--corners-cache", str(vnl),
                     "--lensmodel", "LENSMODEL_OPENCV4",
                     "--focal", "750",
                     "--object-spacing", str(scene["spacing"]),
                     "--object-width-n", "8", "--object-height-n", "6",
                     "--imagersize", "800", "600",
                     "--outdir", str(tmp_path),
                     "--explore",
                     "*cam0*", "*cam1*"],
                    stdin_text="print('NCAM', len(models));"
                               "print('RMSOK', "
                               "stats['rms_reproj_error__pixels'] < 0.1)\n"
                               "exit()\n")
    assert "mrcal explore shell" in out
    assert "NCAM 2" in out
    assert "RMSOK True" in out


def test_calibrate_tool_model_seed(tmp_path, scene2):
    """--seed with existing models replaces --focal and skips the
    stereographic stages (reference mrcal-calibrate-cameras:494-585)."""
    scene = scene2
    vnl = tmp_path / "corners.vnl"
    _write_corners_vnl(vnl, scene)
    # seed models: the TRUTH perturbed slightly
    for i, m in enumerate(scene["models"]):
        m2 = mrcal.cameramodel(m)
        lm, intr = m2.intrinsics()
        intr = np.array(intr)
        intr[:2] *= 1.002
        m2.intrinsics((lm, intr), imagersize=m2.imagersize())
        m2.write(str(tmp_path / f"seed{i}.cameramodel"))
    out = _run_tool(["--corners-cache", str(vnl),
                     "--lensmodel", "LENSMODEL_OPENCV4",
                     "--seed", ",".join(
                         str(tmp_path / f"seed{i}.cameramodel")
                         for i in range(2)),
                     "--object-spacing", str(scene["spacing"]),
                     "--object-width-n", "8", "--object-height-n", "6",
                     "--outdir", str(tmp_path),
                     "--out-prefix", "seeded",
                     "*cam0*", "*cam1*"])
    rms = float(out.split("RMS reprojection error:")[1].split()[0])
    assert rms < 0.1
    m0 = mrcal.cameramodel(str(tmp_path / "seeded-0.cameramodel"))
    assert np.allclose(m0.intrinsics()[1][:2],
                       scene["intrinsics_true"][0][:2], rtol=5e-3)


def test_calibrate_tool_splined(tmp_path):
    """Splined solve through the tool: exercises the third staged solve
    (fxycxy reset + geometry reoptimization, reference :461-489) and the
    locked-core full solve."""
    MODEL = ("LENSMODEL_SPLINED_STEREOGRAPHIC_"
             "order=3_Nx=7_Ny=5_fov_x_deg=120")
    np.random.seed(2)
    imagersize = np.array([640, 480])
    Nknots2 = 2 * 7 * 5
    intr_true = np.concatenate([
        np.array([340., 339., (imagersize[0] - 1) / 2,
                  (imagersize[1] - 1) / 2]),
        np.random.randn(Nknots2) * 2e-3])
    m = mrcal.cameramodel(intrinsics=(MODEL, intr_true),
                          imagersize=imagersize, rt_cam_ref=np.zeros(6))
    q, Rt_ref_boardref = mrcal.synthesize_board_observations(
        [m], object_width_n=8, object_height_n=6, object_spacing=0.08,
        calobject_warp=np.array([0.001, -0.001]),
        rt_ref_boardcenter=np.array([0., 0., 0., 0., 0., 0.8]),
        rt_ref_boardcenter__noiseradius=np.array(
            [np.pi / 6, np.pi / 6, np.pi / 8, 0.25, 0.2, 0.25]),
        Nframes=12, which="all-cameras-must-see-full-board")
    obs = np.concatenate([q[:, 0], np.ones(q[:, 0].shape[:-1] + (1,))],
                         axis=-1)
    scene = dict(observations=obs,
                 indices=np.array([[f, 0, -1] for f in range(len(obs))],
                                  dtype=np.int32))
    vnl = tmp_path / "corners.vnl"
    _write_corners_vnl(vnl, scene)
    out = _run_tool(["--corners-cache", str(vnl),
                     "--lensmodel", MODEL,
                     "--focal", "340",
                     "--object-spacing", "0.08",
                     "--object-width-n", "8", "--object-height-n", "6",
                     "--imagersize", "640", "480",
                     "--outdir", str(tmp_path),
                     "--out-prefix", "splined",
                     "*cam0*"])
    rms = float(out.split("RMS reprojection error:")[1].split()[0])
    assert rms < 0.1
    m0 = mrcal.cameramodel(str(tmp_path / "splined-0.cameramodel"))
    lm, intr = m0.intrinsics()
    assert lm == MODEL
    # the third staged solve locks cxy at the image center and fx==fy
    assert intr[0] == intr[1]
    assert np.allclose(intr[2:4], (imagersize - 1) / 2.0)
