"""Mixed-precision solve: f32 LM phase + f64 polish must land at the same
optimum as the pure-f64 solve (the TPU production path)."""

import numpy as np

import mrcal_tpu as mrcal

from test_calibration import make_scene, optimization_inputs_from_scene


def test_mixed_precision_matches_f64():
    scene = make_scene(Ncameras=2, Nframes=14, model="LENSMODEL_OPENCV4")
    oi64 = optimization_inputs_from_scene(scene, perturb=True)
    np.random.seed(21)
    noise = np.random.randn(*oi64["observations_board"][..., :2].shape) * 0.25
    oi64["observations_board"][..., :2] += noise

    oimx = {k: (np.array(v) if isinstance(v, np.ndarray) else v)
            for k, v in oi64.items()}

    stats64 = mrcal.optimize(**oi64)
    statsmx = mrcal.optimize(mixed_precision=True, **oimx)

    # same optimum to f64-polish accuracy (reference gate: drms < 1e-6 px)
    drms = abs(stats64["rms_reproj_error__pixels"]
               - statsmx["rms_reproj_error__pixels"])
    assert drms < 1e-6, drms
    assert np.allclose(oi64["intrinsics"], oimx["intrinsics"], atol=1e-4)
    assert np.allclose(oi64["extrinsics_rt_fromref"],
                       oimx["extrinsics_rt_fromref"], atol=1e-6)


def test_device_resident_lm_matches_host():
    """lm_solve_device (lax.while_loop, zero host round trips) must land at
    the same optimum as the host-loop solver."""
    from mrcal_tpu.optimize.layout import spec_from_inputs
    from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                              params_from_arrays, pack_params)
    from mrcal_tpu.optimize.solver import lm_solve, lm_solve_device
    scene = make_scene(Ncameras=1, Nframes=10, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    np.random.seed(31)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * 0.2
    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    b_host, E_host, _, _ = lm_solve(spec, arrays, b0)
    b_dev, E_dev, niter, ne_dev = lm_solve_device(spec, arrays, b0)
    assert ne_dev["x_board"].size == spec.Nobservations_board * \
        spec.calibration_object_width_n * \
        spec.calibration_object_height_n * 2
    assert np.isclose(E_host, E_dev, rtol=1e-9)
    assert np.allclose(np.asarray(b_host), np.asarray(b_dev), atol=1e-6)
    assert niter > 0
