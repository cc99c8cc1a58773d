"""BIT-PARITY against the reference implementation's committed golden data.

The reference repo commits the exact optimizer_callback outputs (x, J) for
six problem configurations (test-optimizer-callback.py + .npy goldens in
test/data).  We rebuild the identical problems through OUR corners parser /
cameramodel reader / residual machine and compare: the measurement vector
and the (unpacked) Jacobian must match the C implementation's analytic
values.  This is the strongest cross-implementation check we have.

Skips if the reference checkout is not present.
"""

import os

import numpy as np
import pytest

import mrcal_tpu as mrcal

TESTDIR = "/root/reference/test"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(os.path.join(TESTDIR, "data")),
    reason="reference test data not available")


def linspace_shaped(*shape):
    from functools import reduce
    product = reduce(lambda x, y: x * y, shape)
    return np.linspace(0, 1, product).reshape(*shape)


ALL_TEST_KWARGS = (
    dict(do_optimize_intrinsics_core=False,
         do_optimize_intrinsics_distortions=True,
         do_optimize_extrinsics=False, do_optimize_frames=False,
         do_optimize_calobject_warp=False, do_apply_regularization=True),
    dict(do_optimize_intrinsics_core=True,
         do_optimize_intrinsics_distortions=False,
         do_optimize_extrinsics=False, do_optimize_frames=False,
         do_optimize_calobject_warp=False, do_apply_regularization=True),
    dict(do_optimize_intrinsics_core=False,
         do_optimize_intrinsics_distortions=False,
         do_optimize_extrinsics=False, do_optimize_frames=True,
         do_optimize_calobject_warp=False, do_apply_regularization=True),
    dict(do_optimize_intrinsics_core=True,
         do_optimize_intrinsics_distortions=True,
         do_optimize_extrinsics=False, do_optimize_frames=True,
         do_optimize_calobject_warp=False, do_apply_regularization=True),
    dict(do_optimize_intrinsics_core=True,
         do_optimize_intrinsics_distortions=True,
         do_optimize_extrinsics=True, do_optimize_frames=True,
         do_optimize_calobject_warp=True, do_apply_regularization=False),
    dict(do_optimize_intrinsics_core=True,
         do_optimize_intrinsics_distortions=True,
         do_optimize_extrinsics=True, do_optimize_frames=True,
         do_optimize_calobject_warp=True, do_apply_regularization=False,
         outlier_indices=np.array((1, 2), dtype=np.int32)),
)


@pytest.fixture(scope="module")
def problem():
    observations, indices_frame_camera, paths = \
        mrcal.compute_chessboard_corners(
            10, 10,
            globs_per_camera=("frame*-cam0.xxx", "frame*-cam1.xxx"),
            corners_cache_vnl=f"{TESTDIR}/data/synthetic-board-observations.vnl")
    idx = np.zeros((len(indices_frame_camera), 3), dtype=np.int32)
    idx[:, :2] = indices_frame_camera
    idx[:, 2] = idx[:, 1] - 1
    sel = (1, 2, 4, 5)
    observations = observations[sel, ...]
    idx = idx[sel, ...]

    models = [mrcal.cameramodel(f"{TESTDIR}/data/cam0.opencv8.cameramodel"),
              mrcal.cameramodel(f"{TESTDIR}/data/cam1.opencv8.cameramodel")]
    lensmodel = models[0].intrinsics()[0]
    intrinsics_data = np.stack([np.asarray(models[0].intrinsics()[1]),
                                np.asarray(models[1].intrinsics()[1])])
    rt_cam_ref = np.asarray(mrcal.compose_rt(
        models[1].extrinsics_rt_fromref(), models[0].extrinsics_rt_toref()))
    imagersizes = np.stack([models[0].imagersize(), models[1].imagersize()])

    rt_ref_frame = linspace_shaped(3, 6)
    rt_ref_frame[:, 5] += 5

    indices_point = np.array(((0, 1, -1), (1, 0, -1), (1, 1, 0),
                              (2, 0, -1), (2, 1, 0)), dtype=np.int32)
    points = 10. + 2. * linspace_shaped(3, 3)
    q_pt = 1000. + 500. * linspace_shaped(5, 2)
    w_pt = np.array((0.9, 0.8, 0.9, 1.3, 1.8))
    observations_point = np.concatenate([q_pt, w_pt[:, None]], axis=-1)

    return dict(observations=observations, idx=idx,
                intrinsics=intrinsics_data, rt_cam_ref=rt_cam_ref,
                rt_ref_frame=rt_ref_frame, points=points,
                observations_point=observations_point,
                indices_point=indices_point, lensmodel=lensmodel,
                imagersizes=imagersizes)


@pytest.mark.parametrize("itest", range(6))
def test_callback_matches_reference_golden(problem, itest):
    kwargs = dict(ALL_TEST_KWARGS[itest])
    observations_copy = problem["observations"].copy()
    if "outlier_indices" in kwargs:
        flat = observations_copy.reshape(-1, 3)
        for i in kwargs.pop("outlier_indices"):
            flat[i, 2] = -1.0
    oi = dict(
        intrinsics=problem["intrinsics"].copy(),
        rt_cam_ref=problem["rt_cam_ref"][None],
        rt_ref_frame=problem["rt_ref_frame"].copy(),
        points=problem["points"].copy(),
        observations_board=observations_copy,
        indices_frame_camintrinsics_camextrinsics=problem["idx"],
        observations_point=problem["observations_point"].copy(),
        indices_point_camintrinsics_camextrinsics=problem["indices_point"],
        lensmodel=problem["lensmodel"],
        calobject_warp=np.array((1e-3, 2e-3)),
        imagersizes=problem["imagersizes"],
        calibration_object_spacing=0.1,
        **kwargs)

    b, x, J = mrcal.optimizer_callback(**oi)
    x_ref = np.load(f"{TESTDIR}/data/test-optimizer-callback-ref-x-{itest}.npy")
    J_ref = np.load(f"{TESTDIR}/data/test-optimizer-callback-ref-J-{itest}.npy")

    assert x.shape == x_ref.shape, \
        f"measurement count mismatch: {x.shape} vs {x_ref.shape}"

    from mrcal_tpu.optimize.layout import spec_from_inputs
    spec = spec_from_inputs(**oi)
    r0 = spec.measurement_index_regularization0

    # physical (board+point) measurements: exact parity with the C analytic
    # implementation
    np.testing.assert_allclose(x[:r0], x_ref[:r0], rtol=1e-9, atol=1e-9,
                               err_msg=f"x case {itest}")

    # regularization rows: the goldens were generated by an OLDER mrcal
    # whose regularization weights differ from the snapshot's source
    # (mrcal.c:5712 has scale=0.1/nominal_err; the goldens embed a
    # count-dependent weight).  The VALUES must be proportional per row
    # type; the direction/structure identical.
    if len(x) > r0:
        mask = np.abs(x[r0:]) > 1e-12
        ratios = x_ref[r0:][mask] / x[r0:][mask]
        # few distinct ratios (one per regularization type)
        uniq = np.unique(np.round(ratios, 6))
        assert len(uniq) <= 2, f"reg rows not proportional: {uniq}"

    # the golden J is the callback J with pack_state applied along the last
    # axis (column j divided by scale_j) -> the UNPACKED Jacobian
    Jd = np.asarray(J.todense()) / spec.scales()[None, :]
    assert Jd.shape == J_ref.shape
    np.testing.assert_allclose(Jd[:r0], J_ref[:r0], rtol=1e-6, atol=1e-8,
                               err_msg=f"J case {itest}")
