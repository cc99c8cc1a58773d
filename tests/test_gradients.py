"""Exhaustive gradient matrix: the AD measurement Jacobian vs central
finite differences, for EVERY optimizable lensmodel family x a matrix of
problem_selections subsets — the reference's test-gradients.c:27-42 +
test-gradients.py strategy.  Cheap insurance against silent AD or
state-masking regressions (e.g. a do_optimize_* flag leaking gradient
into a locked block).

CPU-fast: small problems, and the numeric check probes a random subset of
state columns rather than the full Nstate (the comparison is per-column,
so a subset catches structural errors with the same power).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import mrcal_tpu as mrcal
from mrcal_tpu.optimize import optimizer_callback
from mrcal_tpu.optimize.layout import spec_from_inputs
from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                          params_from_arrays, pack_params,
                                          residuals_from_packed)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from __graft_entry__ import _make_problem  # noqa: E402


def _check_gradients(oi, ncols=25, seed=0, step=1e-5, atol=5e-6):
    """Compare optimizer_callback's J against central differences over a
    random subset of state columns (the shared comparator behind
    optimize(check_gradient=True))."""
    from mrcal_tpu.optimize.solver import _fd_column_errors
    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b = np.asarray(pack_params(params_from_arrays(arrays), spec))
    _, x, J = optimizer_callback(**oi)
    assert J.shape == (spec.Nmeasurements, spec.Nstate)

    rng = np.random.default_rng(seed)
    cols = rng.permutation(spec.Nstate)[:min(ncols, spec.Nstate)]
    for j, err, scale in _fd_column_errors(spec, arrays, b, cols,
                                           step=step, J=J):
        assert err / scale < atol, \
            f"column {j}: max |J_ad - J_fd| = {err:.3e} (scale {scale:.1e})"
    return spec


MODELS = [
    "LENSMODEL_PINHOLE",
    "LENSMODEL_STEREOGRAPHIC",
    "LENSMODEL_OPENCV4",
    "LENSMODEL_OPENCV5",
    "LENSMODEL_OPENCV8",
    "LENSMODEL_OPENCV12",
    "LENSMODEL_CAHVOR",
    "LENSMODEL_CAHVORE_linearity=0.37",
    "LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx=9_Ny=7_fov_x_deg=120",
    "LENSMODEL_SPLINED_STEREOGRAPHIC_order=2_Nx=9_Ny=7_fov_x_deg=120",
]


@pytest.mark.parametrize("model", MODELS)
def test_gradients_per_lensmodel(model):
    """Every optimizable model family, default selections (CAHVOR/CAHVORE
    in-solve included — the reference checks these via test-gradients.c)."""
    kw = {}
    if "SPLINED" in model:
        kw["do_optimize_intrinsics_core"] = False
    oi, spec, arrays, b0 = _make_problem(
        Ncameras=2, Nframes=3, model=model, W=4, H=3, **kw)
    _check_gradients(oi)


# reference test-gradients.c:27-42 iterates these selection subsets
SELECTIONS = [
    dict(),
    dict(do_optimize_intrinsics_core=False),
    dict(do_optimize_intrinsics_distortions=False),
    dict(do_optimize_intrinsics_core=False,
         do_optimize_intrinsics_distortions=False),
    dict(do_optimize_extrinsics=False),
    dict(do_optimize_frames=False),
    dict(do_optimize_extrinsics=False, do_optimize_frames=False),
    dict(do_optimize_calobject_warp=False),
    dict(do_apply_regularization=False),
]


@pytest.mark.parametrize("sel", SELECTIONS,
                         ids=["-".join(k.replace("do_", "").replace(
                             "optimize_", "").replace("apply_", "")
                             for k in s) or "all" for s in SELECTIONS])
def test_gradients_selection_matrix(sel):
    """Every problem_selections subset on LENSMODEL_OPENCV8."""
    oi, spec, arrays, b0 = _make_problem(
        Ncameras=2, Nframes=3, model="LENSMODEL_OPENCV8", W=4, H=3, **sel)
    spec = _check_gradients(oi, seed=3)
    assert spec.Nstate > 0


def test_gradients_points_and_triangulated():
    """Point observations (with fixed points) and triangulated pairs."""
    from test_sfm_points import make_sfm_scene
    scene = make_sfm_scene(sigma=0.1)
    oi = dict(
        intrinsics=scene["intrinsics"],
        extrinsics_rt_fromref=scene["extrinsics_true"].copy(),
        points=scene["points_true"].copy(),
        observations_point=scene["observations_point"],
        indices_point_camintrinsics_camextrinsics=scene["indices_point"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        Npoints_fixed=scene["Npoints_fixed"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
    )
    _check_gradients(oi, seed=5)

    from test_sfm_triangulated import make_scene
    tri = make_scene(Ncameras=3, Npoints=20, sigma_px=0.2, seed=7)
    oi = dict(
        intrinsics=tri["intrinsics"],
        rt_cam_ref=tri["rt_true"][1:].copy(),
        observations_point_triangulated=tri["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=tri[
            "indices"],
        lensmodel=tri["lensmodel"],
        imagersizes=tri["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
    )
    # triangulated ray-divergence residuals have tiny gradients (~1e-3)
    # and clamp kinks (divergence guards): central differences near a
    # kink are one-sided-wrong at any step, so tolerate a bit more
    _check_gradients(oi, seed=9, atol=3e-5)


def test_optimize_check_gradient_mode():
    """optimize(check_gradient=True) verifies the Jacobian and returns
    WITHOUT solving (reference mrcal.c:6601-6605 semantics)."""
    oi, spec, arrays, b0 = _make_problem(Ncameras=2, Nframes=4, W=4, H=3)
    intr_before = np.array(oi["intrinsics"])
    s = mrcal.optimize(**oi, check_gradient=True)
    assert s["check_gradient"] is True
    assert s["worst_relative_error"] < 1e-5
    assert s["ncols_checked"] == spec.Nstate
    # no solve happened: inputs untouched
    assert np.array_equal(np.array(oi["intrinsics"]), intr_before)
