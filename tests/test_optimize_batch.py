"""optimize_batch: many same-structure problems as ONE batched device
program (the TPU serving mode).  Each problem's solution must match its
own individual optimize() run."""

import copy

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene


def _problems(B=3, seed0=50):
    out = []
    for i in range(B):
        scene = make_scene(Ncameras=1, Nframes=8, model="LENSMODEL_OPENCV4",
                           W=6, H=5, seed=seed0 + i)
        oi = {k: v for k, v in
              optimization_inputs_from_scene(scene, perturb=True).items()
              if v is not None}
        np.random.seed(seed0 + i)
        oi["observations_board"][..., :2] += \
            np.random.randn(*oi["observations_board"][..., :2].shape) * 0.2
        out.append(oi)
    return out


def test_batch_matches_individual():
    problems = _problems()
    singles = [copy.deepcopy(p) for p in problems]
    stats_b = mrcal.optimize_batch(problems)
    stats_s = [mrcal.optimize(**p) for p in singles]
    assert len(stats_b) == len(problems)
    for i, (sb, ss) in enumerate(zip(stats_b, stats_s)):
        assert np.isclose(sb["rms_reproj_error__pixels"],
                          ss["rms_reproj_error__pixels"], rtol=1e-6), i
        assert sb["Noutliers"] == ss["Noutliers"], i
        assert np.allclose(problems[i]["intrinsics"],
                           singles[i]["intrinsics"], atol=1e-6), i
        assert np.allclose(problems[i]["frames_rt_toref"],
                           singles[i]["frames_rt_toref"], atol=1e-7), i


def test_batch_outlier_rejection():
    problems = _problems(B=2, seed0=70)
    # inject a gross outlier into problem 1 only
    problems[1]["observations_board"][0, 1, 1, :2] += 40.0
    singles = [copy.deepcopy(p) for p in problems]
    stats_b = mrcal.optimize_batch(problems)
    stats_s = [mrcal.optimize(**p) for p in singles]
    assert stats_b[1]["Noutliers"] >= 1
    for i in range(2):
        assert stats_b[i]["Noutliers"] == stats_s[i]["Noutliers"], i
        assert np.isclose(stats_b[i]["rms_reproj_error__pixels"],
                          stats_s[i]["rms_reproj_error__pixels"],
                          rtol=1e-6), i


def test_batch_rejects_mismatched_structure():
    problems = _problems(B=2)
    p2 = _problems(B=1)[0]
    # different frame count -> different structure
    p2["frames_rt_toref"] = p2["frames_rt_toref"][:5]
    p2["observations_board"] = p2["observations_board"][:5]
    p2["indices_frame_camintrinsics_camextrinsics"] = \
        p2["indices_frame_camintrinsics_camextrinsics"][:5]
    with pytest.raises(ValueError):
        mrcal.optimize_batch([problems[0], p2])
