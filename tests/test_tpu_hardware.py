"""TPU-hardware regression tests for the three BENCH configs that
kernel-faulted the worker in round 2 (splined_30x18, sfm_triangulated,
rig16cam).  Each runs a SHORT device-resident solve of the real problem
shape on the actual chip, so worker crashes surface here before the
benchmark.

Run ONE AT A TIME with the TPU backend kept (the axon tunnel serializes
clients):

    MRCAL_TPU_TEST_TPU=1 python -m pytest tests/test_tpu_hardware.py -q

Skipped entirely on the CPU backend (the default test configuration).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mrcal_tpu as mrcal

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


pytestmark = pytest.mark.skipif(
    jax.default_backend() == "cpu",
    reason="TPU-hardware regression tests need the real chip "
           "(MRCAL_TPU_TEST_TPU=1)")


def _short_solve(mk_kwargs, max_iterations=25):
    from __graft_entry__ import _make_problem
    from mrcal_tpu.optimize.solver import lm_solve_device
    oi, spec, arrays, b0 = _make_problem(**mk_kwargs)
    b, E, it, ne = lm_solve_device(spec, arrays, b0,
                                   max_iterations=max_iterations,
                                   dtype=jnp.float32, quiet=True)
    assert np.isfinite(E)
    assert it >= 1
    assert np.all(np.isfinite(np.asarray(b)))
    return E, it


def test_splined_30x18_device_solve():
    splined = ("LENSMODEL_SPLINED_STEREOGRAPHIC"
               "_order=3_Nx=30_Ny=18_fov_x_deg=150")
    _short_solve(dict(Ncameras=1, Nframes=84, model=splined, W=14, H=14,
                      do_optimize_intrinsics_core=False))


def test_rig16cam_device_solve():
    _short_solve(dict(Ncameras=16, Nframes=40, model="LENSMODEL_OPENCV8",
                      W=14, H=14))


def test_sfm_triangulated_device_solve():
    from bench import _sfm_config
    from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                              params_from_arrays,
                                              pack_params)
    from mrcal_tpu.optimize.solver import lm_solve_device
    cfg = _sfm_config()
    oi, spec = cfg["oi"], cfg["spec"]
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    b, E, it, ne = lm_solve_device(spec, arrays, b0, max_iterations=25,
                                   dtype=jnp.float32, quiet=True)
    assert np.isfinite(E)
    assert np.all(np.isfinite(np.asarray(b)))
