"""optimizer_callback's sparse block-assembled Jacobian vs the dense
jacrev reference path (reference CSR semantics: mrcal-pywrap.c:1631,
_mrcal_num_j_nonzero mrcal.c:743).  The sparse path must be numerically
identical; its point is O(nnz) memory on splined/SfM-scale problems."""

import os

import numpy as np
import pytest

import mrcal_tpu as mrcal
from mrcal_tpu.optimize import optimizer_callback

import sys
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from __graft_entry__ import _make_problem  # noqa: E402


def _both(oi):
    b1, x1, J1 = optimizer_callback(**oi)
    os.environ["MRCAL_TPU_DENSE_J"] = "1"
    try:
        b2, x2, J2 = optimizer_callback(**oi)
    finally:
        del os.environ["MRCAL_TPU_DENSE_J"]
    assert np.allclose(b1, b2, atol=1e-14)
    assert np.allclose(x1, x2, atol=1e-13)
    return J1, J2


@pytest.mark.parametrize("mk", [
    dict(Ncameras=2, Nframes=8),
    dict(Ncameras=1, Nframes=6, model="LENSMODEL_PINHOLE"),
    dict(Ncameras=2, Nframes=6, do_optimize_extrinsics=False),
    dict(Ncameras=2, Nframes=6, do_optimize_frames=False),
    dict(Ncameras=2, Nframes=6, do_optimize_intrinsics_distortions=False),
    dict(Ncameras=1, Nframes=6,
         model="LENSMODEL_SPLINED_STEREOGRAPHIC"
               "_order=3_Nx=11_Ny=8_fov_x_deg=120",
         do_optimize_intrinsics_core=False),
    dict(Ncameras=1, Nframes=6,
         model="LENSMODEL_SPLINED_STEREOGRAPHIC"
               "_order=2_Nx=11_Ny=8_fov_x_deg=120",
         do_optimize_intrinsics_core=False),
])
def test_board_configs(mk):
    oi, spec, arrays, b0 = _make_problem(**mk)
    J1, J2 = _both(oi)
    assert J1.shape == (spec.Nmeasurements, spec.Nstate) == J2.shape
    d = abs(J1 - J2)
    assert (d.max() if d.nnz else 0.0) < 1e-11
    # sparse path must not materialize dense: nnz far below the full size
    if spec.Nstate > 60:
        assert J1.nnz < 0.6 * spec.Nmeasurements * spec.Nstate


def test_point_observations():
    from test_sfm_points import make_sfm_scene
    scene = make_sfm_scene(sigma=0.2)
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
    J1, J2 = _both(oi)
    d = abs(J1 - J2)
    assert (d.max() if d.nnz else 0.0) < 1e-11


def test_triangulated_observations():
    from test_sfm_triangulated import make_scene
    scene = make_scene(Ncameras=4, Npoints=30, sigma_px=0.2, seed=5)
    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=scene["rt_true"][1:].copy(),
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene[
            "indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
    )
    J1, J2 = _both(oi)
    d = abs(J1 - J2)
    assert (d.max() if d.nnz else 0.0) < 1e-11


def test_splined_canonical_memory():
    """The canonical 30x18 splined problem's J assembles sparsely: nnz is
    ~50 entries/row, not Nstate=1586/row (dense would be 431 MB f64)."""
    splined = ("LENSMODEL_SPLINED_STEREOGRAPHIC"
               "_order=3_Nx=30_Ny=18_fov_x_deg=150")
    oi, spec, arrays, b0 = _make_problem(
        Ncameras=1, Nframes=84, model=splined, W=14, H=14,
        do_optimize_intrinsics_core=False)
    b, x, J = optimizer_callback(**oi)
    assert J.shape == (spec.Nmeasurements, spec.Nstate)
    assert spec.Nstate > 1500
    # board rows: 32-entry window + 6 frame + 2 warp
    assert J.nnz < 60 * spec.Nmeasurements
    # spot-check a few rows against AD of the full residual vector
    import jax
    from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                              residuals_from_packed)
    import jax.numpy as jnp
    arrays = arrays_from_inputs(**oi)
    rows = [0, 1, 393, 20000]
    for i in rows:
        gi = jax.grad(lambda bb: residuals_from_packed(
            bb, arrays, spec)[i])(jnp.asarray(b))
        assert np.allclose(np.asarray(gi), J[i].toarray()[0], atol=1e-9)
