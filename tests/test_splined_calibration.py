"""Splined-stereographic calibration end-to-end (reduced knot grid for CI;
the reference's canonical config is order=3 Nx=30 Ny=18 fov=150)."""

import numpy as np
import pytest

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene

MODEL = "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=9_Ny=7_fov_x_deg=120"


def test_splined_calibration():
    Nknots2 = 2 * 9 * 7
    np.random.seed(0)
    imagersize = np.array([800, 600])
    intr_true = np.concatenate([
        np.array([420., 419., (imagersize[0] - 1) / 2,
                  (imagersize[1] - 1) / 2]),
        np.random.randn(Nknots2) * 2e-3])

    m = mrcal.cameramodel(intrinsics=(MODEL, intr_true),
                          imagersize=imagersize, rt_cam_ref=np.zeros(6))
    q, Rt_ref_boardref = mrcal.synthesize_board_observations(
        [m], object_width_n=10, object_height_n=8, object_spacing=0.08,
        calobject_warp=np.array([0.002, -0.001]),
        rt_ref_boardcenter=np.array([0., 0., 0., 0., 0., 0.9]),
        rt_ref_boardcenter__noiseradius=np.array(
            [np.pi / 5, np.pi / 5, np.pi / 8, 0.3, 0.25, 0.3]),
        Nframes=25, which="all-cameras-must-see-full-board")
    frames_true = np.array([np.asarray(mrcal.rt_from_Rt(Rt))
                            for Rt in Rt_ref_boardref])
    obs = np.concatenate([q[:, 0], np.ones(q[:, 0].shape[:-1] + (1,))],
                         axis=-1)
    sigma = 0.2
    np.random.seed(1)
    obs[..., :2] += np.random.randn(*obs[..., :2].shape) * sigma

    intr0 = intr_true.copy()
    intr0[4:] = 0.0         # start from pure stereographic
    # the reference locks the core for splined solves: it is redundant with
    # the spline surface (mrcal-calibrate-cameras:636-643)
    oi = dict(
        do_optimize_intrinsics_core=False,
        intrinsics=intr0[None],
        extrinsics_rt_fromref=np.zeros((0, 6)),
        frames_rt_toref=frames_true +
        np.random.randn(*frames_true.shape) * 0.01,
        observations_board=obs,
        indices_frame_camintrinsics_camextrinsics=np.array(
            [[f, 0, -1] for f in range(len(obs))], dtype=np.int32),
        lensmodel=MODEL,
        imagersizes=imagersize[None],
        calobject_warp=np.zeros(2),
        calibration_object_spacing=0.08,
    )
    stats = mrcal.optimize(**oi)
    # rms ~ noise
    assert stats["rms_reproj_error__pixels"] < sigma * 1.2
    # the core was locked; the spline surface absorbed the corrections
    assert np.allclose(oi["intrinsics"][0, :4], intr_true[:4])
    assert np.allclose(oi["calobject_warp"], [0.002, -0.001], atol=3e-3)


def test_splined_regularization_measurement_count():
    oi_min = dict(
        intrinsics=np.zeros((1, 4 + 2 * 9 * 7)),
        lensmodel=MODEL,
        imagersizes=np.array([[800, 600]]),
        observations_board=np.zeros((1, 4, 4, 3)),
        indices_frame_camintrinsics_camextrinsics=np.zeros((1, 3), np.int32),
        frames_rt_toref=np.zeros((1, 6)),
        calobject_warp=np.zeros(2),
        calibration_object_spacing=0.1,
    )
    # splined: 2 reg measurements per knot + 2 centerpixel
    assert mrcal.num_measurements_regularization(**oi_min) == 2 * 9 * 7 + 2


def test_splined_sparse_assembly_matches_generic():
    """The sparse spline-window normal-equation assembly must match the
    generic dense-Jacobian path to machine precision (incl. outliers and
    weighted corners)."""
    import jax
    from mrcal_tpu.optimize.layout import spec_from_inputs
    from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                              params_from_arrays, pack_params)
    from mrcal_tpu.optimize import solver as S

    np.random.seed(0)
    Nk2 = 2 * 9 * 7
    intr = np.concatenate([[420., 419., 399.5, 299.5],
                           np.random.randn(Nk2) * 2e-3])[None]
    Nframes = 5
    frames = np.concatenate(
        [np.random.randn(Nframes, 3) * 0.3,
         np.array([[0.02, -0.03, 0.9]]) + np.random.randn(Nframes, 3) * 0.1],
        axis=1)
    H, W = 6, 8
    oi = dict(intrinsics=intr, extrinsics_rt_fromref=np.zeros((0, 6)),
              frames_rt_toref=frames,
              observations_board=np.zeros((Nframes, H, W, 3)),
              indices_frame_camintrinsics_camextrinsics=np.array(
                  [[f, 0, -1] for f in range(Nframes)], np.int32),
              lensmodel=MODEL, imagersizes=np.array([[800, 600]]),
              calobject_warp=np.array([0.002, -0.001]),
              calibration_object_spacing=0.08,
              do_optimize_intrinsics_core=False)
    oi["observations_board"][..., 2] = 1.0
    from mrcal_tpu.synthetic_data import make_perfect_observations
    make_perfect_observations(oi, observed_pixel_uncertainty=0.3)
    oi["observations_board"][0, 0, 0, 2] = -1.0      # outlier
    oi["observations_board"][2, 3, 4, 2] = 0.5       # downweighted

    spec = spec_from_inputs(**oi)
    assert S._splined_fast_path_ok(spec, None)
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    static_idx = dict(board=np.asarray(arrays["indices_board"]),
                      point=np.asarray(arrays["indices_point"]))
    # bypass the dispatch to build BOTH paths
    spec_generic = spec
    ne_s = jax.tree.map(np.asarray, S.build_normal_equations_splined(
        spec, arrays, static_idx)(b0, arrays))
    # generic: construct without the fast path by calling the inner builder
    import unittest.mock as mock
    with mock.patch.object(S, "_splined_fast_path_ok",
                           lambda *a, **k: False):
        ne_g = jax.tree.map(np.asarray, S.build_normal_equations(
            spec, arrays, static_idx)(b0, arrays))
    for k in ne_g:
        a, b = ne_g[k], ne_s[k]
        assert a.shape == b.shape, k
        if a.size:
            scale = max(1.0, np.abs(a).max())
            assert np.abs(a - b).max() / scale < 1e-12, k
