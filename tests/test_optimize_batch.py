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


def test_batch_full_stats_parity():
    """stats keys/values match optimize()'s contract: x, time_s,
    niterations_polish, b_packed."""
    problems = _problems(B=2, seed0=90)
    singles = [copy.deepcopy(p) for p in problems]
    stats_b = mrcal.optimize_batch(problems)
    stats_s = [mrcal.optimize(**p) for p in singles]
    for sb, ss in zip(stats_b, stats_s):
        for key in ("x", "b_packed", "time_s", "niterations",
                    "niterations_polish", "Noutliers",
                    "Noutliers_triangulated_point"):
            assert key in sb, key
        assert sb["x"].shape == ss["x"].shape
        # residuals at the (same) optimum agree
        assert np.allclose(sb["x"], ss["x"], atol=1e-4)
        assert np.allclose(sb["b_packed"], ss["b_packed"], atol=1e-6)
        assert sb["time_s"]  # non-empty phase dict


def test_batch_heterogeneous_visibility():
    """A fleet with per-unit visibility differences, batched via
    pad_problems_to_common_structure: padded rows contribute nothing,
    per-unit solutions match individual optimize() runs."""
    problems = _problems(B=3, seed0=110)
    # unit 1 misses 2 board views, unit 2 misses a different one
    def drop(p, which):
        keep = np.ones(len(p["indices_frame_camintrinsics_camextrinsics"]),
                       bool)
        keep[which] = False
        p["observations_board"] = p["observations_board"][keep]
        p["indices_frame_camintrinsics_camextrinsics"] = \
            p["indices_frame_camintrinsics_camextrinsics"][keep]
    drop(problems[1], [2, 5])
    drop(problems[2], [7])
    singles = [copy.deepcopy(p) for p in problems]
    padded = mrcal.pad_problems_to_common_structure(problems)
    nb = len(padded[0]["indices_frame_camintrinsics_camextrinsics"])
    for p in padded:
        assert len(p["indices_frame_camintrinsics_camextrinsics"]) == nb
    stats_b = mrcal.optimize_batch(padded)
    stats_s = [mrcal.optimize(**p) for p in singles]
    # Noutliers counts CORNERS with weight<=0: each padded view
    # contributes H*W of them
    ncorners = (padded[0]["observations_board"].shape[1]
                * padded[0]["observations_board"].shape[2])
    npad = [0, 2 * ncorners, 1 * ncorners]
    for i, (sb, ss) in enumerate(zip(stats_b, stats_s)):
        # padding rows count as outliers (weight<=0); net them out
        assert sb["Noutliers"] - npad[i] == ss["Noutliers"], i
        # padding rows are zero residuals: total E matches the
        # unpadded individual solve
        assert np.isclose(float(np.sum(sb["x"] ** 2)),
                          float(np.sum(ss["x"] ** 2)), rtol=1e-6), i
        # the actual state solutions match the individual runs
        assert np.allclose(padded[i]["intrinsics"],
                           singles[i]["intrinsics"], atol=1e-5), i
        assert np.allclose(padded[i]["frames_rt_toref"],
                           singles[i]["frames_rt_toref"], atol=1e-6), i


def test_batch_triangulated_outlier_rejection():
    """Triangulated-point problems batch, and the divergent-pair /
    sigma outlier logic runs per problem (mrcal.c:6430-6481 semantics)."""
    import test_sfm_triangulated as tst
    scene = tst.make_scene(Ncameras=4, Npoints=60, sigma_px=0.05, seed=3)
    base = dict(
        intrinsics=scene["intrinsics"],
        extrinsics_rt_fromref=scene["rt_true"][1:].copy(),
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene[
            "indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
        do_apply_outlier_rejection=True,
    )
    problems = []
    for k in range(2):
        p = copy.deepcopy(base)
        rng = np.random.default_rng(k)
        p["extrinsics_rt_fromref"] = np.asarray(
            p["extrinsics_rt_fromref"]) + rng.normal(0, 1e-3, (3, 6))
        problems.append(p)
    # corrupt one observation pair of problem 0 hard
    problems[0]["observations_point_triangulated"][4, :2] += 80.0
    singles = [copy.deepcopy(p) for p in problems]
    stats_b = mrcal.optimize_batch(problems)
    stats_s = [mrcal.optimize(**p) for p in singles]
    assert stats_b[0]["Noutliers_triangulated_point"] >= 1
    for i in range(2):
        assert stats_b[i]["Noutliers_triangulated_point"] == \
            stats_s[i]["Noutliers_triangulated_point"], i
        assert np.isclose(stats_b[i]["rms_reproj_error__pixels"],
                          stats_s[i]["rms_reproj_error__pixels"],
                          rtol=1e-5, atol=1e-7), i
