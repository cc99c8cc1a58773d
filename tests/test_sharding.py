"""Sharded-vs-unsharded parity: the same synthetic scene solved on a
1-device and an 8-device (virtual CPU) mesh must agree to fp tolerance
(SURVEY §4: the multi-host test strategy)."""

import numpy as np
import jax
import pytest

import mrcal_tpu as mrcal
from mrcal_tpu.optimize.layout import spec_from_inputs
from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                          params_from_arrays, pack_params)
from mrcal_tpu.parallel import make_mesh, sharded_lm_solve
from mrcal_tpu.parallel.sharding import (sharded_normal_equations,
                                         _padded_shard_arrays)

from test_calibration import make_scene, optimization_inputs_from_scene


@pytest.fixture(scope="module")
def problem():
    scene = make_scene(Ncameras=2, Nframes=10, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    np.random.seed(3)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * 0.2
    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    return scene, oi, spec, arrays, b0


def test_normal_equations_match_across_mesh_sizes(problem):
    scene, oi, spec, arrays, b0 = problem
    nes = []
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        ne_fn = sharded_normal_equations(spec, mesh)(arrays)
        shard_args = _padded_shard_arrays(arrays, ndev)
        ne = ne_fn(b0, *shard_args)
        nes.append(jax.tree.map(np.asarray, ne))
    for k in nes[0]:
        assert np.allclose(nes[0][k], nes[1][k], rtol=1e-9, atol=1e-9), k


def test_sharded_solve_matches_unsharded(problem):
    """The host-loop (legacy/debug) sharded LM converges to the same
    optimum as the production unsharded device solver on every mesh
    size.  The converged COST is compared, not the trajectory: the
    host-loop's accept/reject control is chaotic in the final flat
    valley (fp-level NE differences between mesh sizes bifurcate the
    last accepted step before its lambda-pump exit — round-5 probe:
    identical NE blocks to 1e-9 at every probed state, yet one mesh
    terminated 1.5e-4 higher in E after sliding 0.67 packed units
    along the gauge-flat direction).  The PRODUCTION device path has a
    tight trajectory-parity test below."""
    from mrcal_tpu.optimize.solver import lm_solve_device
    scene, oi, spec, arrays, b0 = problem
    _, E_u, _, _ = lm_solve_device(spec, arrays, b0, max_iterations=200)
    E_u = float(E_u)
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        _, E = sharded_lm_solve(spec, arrays, b0, mesh,
                                max_iterations=200)
        assert np.isclose(float(E), E_u, rtol=1e-3), (ndev, E, E_u)


def test_production_sharded_device_solve_matches_unsharded(problem):
    """The PRODUCTION mesh path (device-resident while_loop + psum per
    iteration) against the single-chip device solver: same trajectory."""
    scene, oi, spec, arrays, b0 = problem
    from mrcal_tpu.optimize.solver import lm_solve_device
    from mrcal_tpu.parallel import sharded_lm_solve_device

    b_u, E_u, it_u, ne_u = lm_solve_device(spec, arrays, b0,
                                           max_iterations=40)
    mesh = make_mesh(8)
    b_s, E_s, it_s, ne_s = sharded_lm_solve_device(spec, arrays, b0, mesh,
                                                   max_iterations=40)
    assert np.isclose(E_u, E_s, rtol=1e-10)
    assert np.allclose(np.asarray(b_u), np.asarray(b_s), atol=1e-9)
    # residual-vector contract identical (outlier rejection consumes these)
    for k in ("x_board", "x_point", "x_tri", "x_reg"):
        assert np.asarray(ne_s[k]).shape == np.asarray(ne_u[k]).shape, k
        assert np.allclose(np.asarray(ne_s[k]), np.asarray(ne_u[k]),
                           atol=1e-9), k


def test_optimize_mesh_kwarg(problem):
    """optimize(..., mesh=8) — the production API — matches the unsharded
    production solve including outlier rejection and writeback."""
    import copy
    scene, oi, spec, arrays, b0 = problem
    oi1 = copy.deepcopy(oi)
    oi2 = copy.deepcopy(oi)
    s1 = mrcal.optimize(**oi1)
    s2 = mrcal.optimize(**oi2, mesh=8)
    assert np.isclose(s1["rms_reproj_error__pixels"],
                      s2["rms_reproj_error__pixels"], rtol=1e-9)
    assert s1["Noutliers"] == s2["Noutliers"]
    assert np.allclose(oi1["intrinsics"], oi2["intrinsics"], atol=1e-7)
    assert np.allclose(oi1["extrinsics_rt_fromref"],
                       oi2["extrinsics_rt_fromref"], atol=1e-9)


def test_sharded_solve_agrees_with_host_solver(problem):
    scene, oi, spec, arrays, b0 = problem
    from mrcal_tpu.optimize.solver import lm_solve
    b_host, E_host, _, _ = lm_solve(spec, arrays, b0, max_iterations=40)
    mesh = make_mesh(8)
    b_mesh, E_mesh = sharded_lm_solve(spec, arrays, b0, mesh,
                                      max_iterations=40)
    # both should land at the same optimum (paths may differ slightly)
    assert np.isclose(E_host, E_mesh, rtol=1e-6)
    assert np.allclose(np.asarray(b_host), np.asarray(b_mesh), atol=1e-4)


def test_16_camera_rig_sharded():
    """BASELINE config 5: a 16-camera synthetic rig, observations sharded
    over the 8-device mesh, solved to convergence; uncertainty propagation
    runs on the result."""
    scene = make_scene(Ncameras=16, Nframes=6, model="LENSMODEL_OPENCV4",
                       seed=6)
    oi = optimization_inputs_from_scene(scene, perturb=True)
    np.random.seed(16)
    oi["observations_board"][..., :2] += \
        np.random.randn(*oi["observations_board"][..., :2].shape) * 0.2
    spec = spec_from_inputs(**oi)
    assert spec.Ncameras_intrinsics == 16
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)

    mesh = make_mesh(8)
    b_mesh, E_mesh = sharded_lm_solve(spec, arrays, b0, mesh,
                                      max_iterations=40)
    from mrcal_tpu.optimize.solver import lm_solve
    b_host, E_host, _, _ = lm_solve(spec, arrays, b0, max_iterations=40)
    assert np.isclose(E_host, E_mesh, rtol=1e-6)
    assert np.allclose(np.asarray(b_host), np.asarray(b_mesh), atol=1e-4)

    # rms ~ noise on the sharded solution
    Nboard = spec.num_measurements_boards
    rms = np.sqrt(E_mesh / spec.Nmeasurements)
    assert rms < 0.3

    # uncertainty propagation on the converged 16-camera solution
    from mrcal_tpu.optimize.residuals import split_packed_state
    import jax.numpy as jnp
    params = split_packed_state(jnp.asarray(b_mesh), arrays, spec)
    oi_solved = dict(oi)
    oi_solved["intrinsics"] = np.asarray(params["intrinsics"])
    oi_solved["extrinsics_rt_fromref"] = np.asarray(params["extrinsics"])
    oi_solved["frames_rt_toref"] = np.asarray(params["frames"])
    oi_solved["calobject_warp"] = np.asarray(params["calobject_warp"])
    oi_clean = {k: v for k, v in oi_solved.items() if v is not None}
    m = mrcal.cameramodel(optimization_inputs=oi_clean, icam_intrinsics=3)
    Var = np.asarray(mrcal.projection_uncertainty(
        np.array([0.05, -0.02, 1.5]), m, method="mean-pcam",
        observed_pixel_uncertainty=0.2))
    l = np.linalg.eigvalsh(Var)
    assert np.all(l > 0)
    assert np.sqrt(l[-1]) < 2.0


def _make_splined_problem(Nx=30, Ny=18, Nframes=14, seed=7):
    """A canonical-class splined scene (30x18 knot grid by default — the
    blueprint's hardest problem, doc/tour-initial-calibration.org:647)."""
    import mrcal_tpu as mrcal
    MODEL = (f"LENSMODEL_SPLINED_STEREOGRAPHIC_order=3_Nx={Nx}_Ny={Ny}"
             "_fov_x_deg=150")
    Nknots2 = 2 * Nx * Ny
    np.random.seed(seed)
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
        Nframes=Nframes, which="all-cameras-must-see-full-board")
    frames_true = np.array([np.asarray(mrcal.rt_from_Rt(Rt))
                            for Rt in Rt_ref_boardref])
    obs = np.concatenate([q[:, 0], np.ones(q[:, 0].shape[:-1] + (1,))],
                         axis=-1)
    np.random.seed(seed + 1)
    obs[..., :2] += np.random.randn(*obs[..., :2].shape) * 0.2
    intr0 = intr_true.copy()
    intr0[4:] = 0.0
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
    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    return oi, spec, arrays, b0


def test_sharded_splined_solve(monkeypatch):
    """The canonical-class splined config (30x18 knot grid) on the
    8-device mesh through the SHARDED MXU spline-window assembly
    (_local_normal_equations_splined): parity with the single-chip device
    solver.  This is the blueprint's long-axis scaling story for its
    hardest problem (SURVEY §2.4/§5.7)."""
    monkeypatch.setenv("MRCAL_TPU_SPLINED_SPARSE", "1")
    oi, spec, arrays, b0 = _make_splined_problem()
    from mrcal_tpu.optimize.solver import (lm_solve_device,
                                           _use_splined_sparse)
    from mrcal_tpu.parallel import sharded_lm_solve_device
    assert _use_splined_sparse(spec)

    b_u, E_u, it_u, ne_u = lm_solve_device(spec, arrays, b0,
                                           max_iterations=12)
    mesh = make_mesh(8)
    b_s, E_s, it_s, ne_s = sharded_lm_solve_device(spec, arrays, b0, mesh,
                                                   max_iterations=12)
    assert np.isclose(E_u, E_s, rtol=1e-10)
    assert np.allclose(np.asarray(b_u), np.asarray(b_s), atol=1e-8)
    # residual-vector contract identical (outlier rejection consumes it)
    for k in ("x_board", "x_reg"):
        assert np.asarray(ne_s[k]).shape == np.asarray(ne_u[k]).shape, k
        assert np.allclose(np.asarray(ne_s[k]), np.asarray(ne_u[k]),
                           atol=1e-9), k


def test_sharded_splined_lazy_hessian(monkeypatch):
    """The lazy-Hessian while_loop body (stale H between refreshes, the
    real-TPU default for splined f32) over the SHARDED ne_fn: the
    lax.cond gradient branch wraps a shard_map'd psum — verify the
    combination compiles and matches the single-chip lazy solver
    exactly (it is only reachable on accelerator meshes in production,
    so force it here via MRCAL_TPU_LAZY_H)."""
    monkeypatch.setenv("MRCAL_TPU_SPLINED_SPARSE", "1")
    monkeypatch.setenv("MRCAL_TPU_LAZY_H", "4")
    oi, spec, arrays, b0 = _make_splined_problem(Nx=12, Ny=9, Nframes=10,
                                                 seed=13)
    from mrcal_tpu.optimize.solver import lm_solve_device
    from mrcal_tpu.parallel import sharded_lm_solve_device
    b_u, E_u, it_u, ne_u = lm_solve_device(spec, arrays, b0,
                                           max_iterations=10)
    mesh = make_mesh(8)
    b_s, E_s, it_s, ne_s = sharded_lm_solve_device(
        spec, arrays, b0, mesh, max_iterations=10)
    assert it_u == it_s
    assert np.isclose(E_u, E_s, rtol=1e-10)
    assert np.allclose(np.asarray(b_u), np.asarray(b_s), atol=1e-8)


def test_optimize_mesh_splined(monkeypatch):
    """optimize(mesh=8) end-to-end on a splined problem (reduced knot grid
    for runtime) matches the unsharded optimize, outlier loop included."""
    import copy
    monkeypatch.setenv("MRCAL_TPU_SPLINED_SPARSE", "1")
    oi, spec, arrays, b0 = _make_splined_problem(Nx=12, Ny=9, Nframes=10,
                                                 seed=11)
    oi1 = copy.deepcopy(oi)
    oi2 = copy.deepcopy(oi)
    s1 = mrcal.optimize(**oi1)
    s2 = mrcal.optimize(**oi2, mesh=8)
    assert np.isclose(s1["rms_reproj_error__pixels"],
                      s2["rms_reproj_error__pixels"], rtol=1e-7)
    assert s1["Noutliers"] == s2["Noutliers"]
    assert np.allclose(oi1["intrinsics"], oi2["intrinsics"], atol=1e-6)


def test_sharded_triangulated_solve():
    """Triangulated-point measurements in the sharded path: pair axis
    sharded over the mesh; matches the host solver."""
    from test_sfm_triangulated import make_scene as make_tri_scene
    scene = make_tri_scene(Ncameras=4, Npoints=40, sigma_px=0.3, seed=3)
    np.random.seed(4)
    rt_noisy = scene["rt_true"][1:].copy()
    rt_noisy[:, :3] += np.random.randn(*rt_noisy[:, :3].shape) * 0.005
    rt_noisy[:, 3:] += np.random.randn(*rt_noisy[:, 3:].shape) * 0.02
    oi = dict(
        intrinsics=scene["intrinsics"],
        rt_cam_ref=rt_noisy,
        observations_point_triangulated=scene["observations"],
        indices_point_triangulated_camintrinsics_camextrinsics=scene["indices"],
        lensmodel=scene["lensmodel"],
        imagersizes=scene["imagersizes"],
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
    )
    spec = spec_from_inputs(**oi)
    assert spec.num_measurements_points_triangulated > 0
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)

    from mrcal_tpu.optimize.solver import lm_solve
    b_host, E_host, _, _ = lm_solve(spec, arrays, b0, max_iterations=40)
    mesh = make_mesh(8)
    b_mesh, E_mesh = sharded_lm_solve(spec, arrays, b0, mesh,
                                      max_iterations=40)
    assert np.isclose(E_host, E_mesh, rtol=1e-6)
    assert np.allclose(np.asarray(b_host), np.asarray(b_mesh), atol=1e-5)

    # production device-resident path on the pair-sharded problem
    from mrcal_tpu.optimize.solver import lm_solve_device
    from mrcal_tpu.parallel import sharded_lm_solve_device
    b_u, E_u, _, ne_u = lm_solve_device(spec, arrays, b0, max_iterations=40)
    b_s, E_s, _, ne_s = sharded_lm_solve_device(spec, arrays, b0, mesh,
                                                max_iterations=40)
    assert np.isclose(E_u, E_s, rtol=1e-10)
    assert np.allclose(np.asarray(b_u), np.asarray(b_s), atol=1e-8)
    assert np.allclose(np.asarray(ne_s["x_tri"]), np.asarray(ne_u["x_tri"]),
                       atol=1e-9)
