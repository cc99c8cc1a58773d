"""Parity of the two unsharded normal-equation assemblies.

build_normal_equations has two equivalent camera-block assemblies: the
static per-(ici,ice)-pair slice loop and the one-hot pair contraction
(_pair_block/_pair_gvec; default for many-camera rigs, round 5 — 22%
faster rig16cam assembly on the v5e).  They must produce identical
blocks on a problem exercising boards + points + multiple cameras +
camera-at-reference + fixed points.
"""

import os

import numpy as np
import jax
import pytest

import mrcal_tpu as mrcal
from mrcal_tpu.optimize.layout import spec_from_inputs
from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                          params_from_arrays, pack_params)
from mrcal_tpu.optimize import solver as S

from test_calibration import make_scene, optimization_inputs_from_scene


@pytest.mark.parametrize("with_points", [False, True])
def test_pair_onehot_matches_pair_loop(with_points, monkeypatch):
    scene = make_scene(Ncameras=3, Nframes=6, model="LENSMODEL_OPENCV4")
    oi = optimization_inputs_from_scene(scene, perturb=True)
    if with_points:
        # add a few point observations (2 variable + 1 fixed point)
        rng = np.random.default_rng(7)
        pts = np.array([[0.2, 0.1, 3.0], [-0.3, 0.2, 4.0],
                        [0.0, -0.1, 5.0]])
        obs_p = []
        idx_p = []
        for ipt in range(3):
            for ici in range(3):
                q = np.asarray(mrcal.project(
                    np.asarray(mrcal.transform_point_rt(
                        np.r_[np.zeros(3), np.zeros(3)]
                        if ici == 0 else oi["extrinsics_rt_fromref"][ici - 1],
                        pts[ipt])),
                    oi["lensmodel"], oi["intrinsics"][ici]))
                obs_p.append([q[0] + rng.normal(0, 0.1),
                              q[1] + rng.normal(0, 0.1), 1.0])
                idx_p.append([ipt, ici, ici - 1])
        oi["points"] = pts.copy()
        oi["observations_point"] = np.asarray(obs_p)
        oi["indices_point_camintrinsics_camextrinsics"] = \
            np.asarray(idx_p, dtype=np.int32)
        oi["Npoints_fixed"] = 1
        oi["point_min_range"] = 0.1
        oi["point_max_range"] = 100.0

    spec = spec_from_inputs(**oi)
    arrays = arrays_from_inputs(**oi)
    b0 = pack_params(params_from_arrays(arrays), spec)
    static_idx = dict(board=np.asarray(arrays["indices_board"]),
                      point=np.asarray(arrays["indices_point"]))

    nes = {}
    for mode in ("0", "1"):
        monkeypatch.setenv("MRCAL_TPU_PAIR_ONEHOT", mode)
        ne_fn = jax.jit(S.build_normal_equations(spec, None, static_idx))
        nes[mode] = jax.tree.map(np.asarray, ne_fn(b0, arrays))

    for k in nes["0"]:
        a, b = nes["0"][k], nes["1"][k]
        assert a.shape == b.shape, k
        if not a.size:
            continue
        scale = max(np.max(np.abs(a)), 1e-30)
        assert np.max(np.abs(a - b)) / scale < 1e-12, \
            (k, np.max(np.abs(a - b)) / scale)
