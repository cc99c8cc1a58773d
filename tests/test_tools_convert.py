"""Tool-level tests for mrcal-convert-lensmodel and mrcal-graft-models
(mirrors the reference's test-convert-lensmodel.py / test-graft-models.py):
drive the executables end-to-end on synthetic models and check the OUTPUT
models' projection behavior, not just exit codes."""

import os
import pathlib
import subprocess
import sys

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene

TOOLS = pathlib.Path(__file__).resolve().parent.parent / "tools"


def _run(tool, args, timeout=1200):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable, str(TOOLS / tool)] + args,
                       capture_output=True, text=True, env=env,
                       timeout=timeout)
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    return r.stdout


@pytest.fixture(scope="module")
def solved_model(tmp_path_factory):
    """A solved single-camera OPENCV4 model WITH optimization_inputs."""
    scene = make_scene(Ncameras=1, Nframes=10, model="LENSMODEL_OPENCV4",
                       W=8, H=6, seed=7)
    oi = optimization_inputs_from_scene(scene, perturb=False)
    oi = {k: v for k, v in oi.items() if v is not None}
    mrcal.optimize(**oi)
    m = mrcal.cameramodel(optimization_inputs=oi, icam_intrinsics=0)
    path = tmp_path_factory.mktemp("models") / "cam0.cameramodel"
    m.write(str(path))
    return str(path), m


def _median_proj_diff(m0, m1, gridn=24):
    """Median reprojection disagreement (px) over the imager at the fit
    distance, after compensating the implied rotation like the reference's
    fit quality metric (we keep it simpler: center-region diff)."""
    difflen, _, _, _ = mrcal.projection_diff((m0, m1), gridn_width=gridn,
                                             distance=10.0)
    return float(np.median(np.asarray(difflen)))


def test_convert_lensmodel_sampled(tmp_path, solved_model):
    """--sampled grid fit OPENCV4 -> OPENCV8: the richer model must
    reproduce the original's projection to sub-0.1px over the imager
    (reference test-convert-lensmodel.py checks the same property)."""
    path, m0 = solved_model
    out = tmp_path / "converted.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--sampled", "--distance", "10",
          "--outfile", str(out), "LENSMODEL_OPENCV8", path])
    m1 = mrcal.cameramodel(str(out))
    assert m1.intrinsics()[0] == "LENSMODEL_OPENCV8"
    assert _median_proj_diff(m0, m1) < 0.1


def test_convert_lensmodel_resolve(tmp_path, solved_model):
    """Default mode re-solves the embedded calibration problem under the
    new model; the result must agree with the original projection AND
    carry fresh optimization_inputs under the new lensmodel."""
    path, m0 = solved_model
    out = tmp_path / "resolved.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--outfile", str(out), "LENSMODEL_OPENCV8", path])
    m1 = mrcal.cameramodel(str(out))
    assert m1.intrinsics()[0] == "LENSMODEL_OPENCV8"
    assert _median_proj_diff(m0, m1) < 0.2
    oi1 = m1.optimization_inputs()
    assert oi1 is not None and oi1["lensmodel"] == "LENSMODEL_OPENCV8"


def test_convert_lensmodel_where_radius(tmp_path, solved_model):
    """--where/--radius restrict the --sampled fit domain (reference
    mrcal-convert-lensmodel:88-105): a small center region fit of a LEANER
    model (OPENCV8 -> OPENCV4... here OPENCV4 -> PINHOLE) must beat the
    full-imager fit INSIDE that region."""
    path, m0 = solved_model
    W, H = m0.imagersize()

    out_all = tmp_path / "all.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--sampled", "--distance", "10", "--radius", "0",
          "--outfile", str(out_all), "LENSMODEL_PINHOLE", path])
    out_ctr = tmp_path / "center.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--sampled", "--distance", "10",
          "--where", f"{(W-1)/2},{(H-1)/2}", "--radius", str(W / 5),
          "--outfile", str(out_ctr), "LENSMODEL_PINHOLE", path])

    m_all = mrcal.cameramodel(str(out_all))
    m_ctr = mrcal.cameramodel(str(out_ctr))
    # evaluate the center-region error of both fits
    v, q = mrcal.sample_imager_unproject(20, 14, W, H, *m0.intrinsics(),
                                         normalize=True)
    v = np.asarray(v).reshape(-1, 3)
    q = np.asarray(q).reshape(-1, 2)
    ctr = np.linalg.norm(q - np.array([(W-1)/2, (H-1)/2]), axis=-1) < W / 5
    err = {}
    for name, m in (("all", m_all), ("ctr", m_ctr)):
        qf = np.asarray(mrcal.project(v[ctr] * 10.0, *m.intrinsics()))
        err[name] = np.median(np.linalg.norm(qf - q[ctr], axis=-1))
    assert err["ctr"] <= err["all"] + 1e-9

    # negative radius = margin rule; just verify it runs and loads
    out_m = tmp_path / "margin.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--sampled", "--distance", "10", "--radius", str(-W / 4),
          "--outfile", str(out_m), "LENSMODEL_OPENCV8", path])
    mrcal.cameramodel(str(out_m))


def test_convert_lensmodel_multidistance_trials(tmp_path, solved_model):
    """--distance near,far + --num-trials (reference :63-82)."""
    path, m0 = solved_model
    out = tmp_path / "nf.cameramodel"
    _run("mrcal-convert-lensmodel",
         ["--sampled", "--distance", "3,1000", "--num-trials", "3",
          "--outfile", str(out), "LENSMODEL_OPENCV8", path])
    m1 = mrcal.cameramodel(str(out))
    assert _median_proj_diff(m0, m1) < 0.1


def test_graft_models(tmp_path, solved_model):
    """Output = intrinsics of A + extrinsics of B, byte-loadable."""
    path, m0 = solved_model
    mb = mrcal.cameramodel(m0)
    rt = np.array([0.01, -0.02, 0.03, 0.4, -0.5, 0.6])
    mb.extrinsics_rt_fromref(rt)
    pb = tmp_path / "b.cameramodel"
    mb.write(str(pb))
    stdout = _run("mrcal-graft-models", [path, str(pb)])
    out = tmp_path / "grafted.cameramodel"
    out.write_text(stdout)
    mg = mrcal.cameramodel(str(out))
    lm0, i0 = m0.intrinsics()
    lmg, ig = mg.intrinsics()
    assert lmg == lm0 and np.allclose(ig, i0)
    assert np.allclose(np.asarray(mg.extrinsics_rt_fromref()), rt)
