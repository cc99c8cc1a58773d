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
    scene, oi, spec, arrays, b0 = problem
    results = []
    for ndev in (1, 8):
        mesh = make_mesh(ndev)
        b, E = sharded_lm_solve(spec, arrays, b0, mesh, max_iterations=30)
        results.append((np.asarray(b), E))
    b1, E1 = results[0]
    b8, E8 = results[1]
    assert np.isclose(E1, E8, rtol=1e-8)
    assert np.allclose(b1, b8, atol=1e-7)


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
