"""Segmented device-loop execution (solver._run_device_lm_chunked) must be
mathematically IDENTICAL to one long while_loop: the full LM state is
carried on device between bounded dispatches.  Force tiny segments on CPU
and compare against the single-shot path."""

import os
import subprocess
import sys

import numpy as np
import pytest

_SCRIPT = r"""
import os
import numpy as np
import mrcal_tpu as mrcal
import jax.numpy as jnp
from __graft_entry__ import _make_problem
from mrcal_tpu.optimize.solver import lm_solve_device

oi, spec, arrays, b0 = _make_problem(Ncameras=2, Nframes=10)
b, E, it, ne = lm_solve_device(spec, arrays, b0, max_iterations=100)
print("RESULT", repr(float(E)), it)
np.save(os.environ["OUT_B"], np.asarray(b))
"""


def _run(env_extra, out_b):
    env = dict(os.environ, JAX_PLATFORMS="cpu", OUT_B=out_b, **env_extra)
    r = subprocess.run([sys.executable, "-c", _SCRIPT],
                       capture_output=True, text=True, env=env,
                       cwd=os.path.join(os.path.dirname(__file__), ".."),
                       timeout=900)
    assert r.returncode == 0, r.stderr
    line = [l for l in r.stdout.splitlines() if l.startswith("RESULT")][0]
    _, E, it = line.split()
    return float(eval(E)), int(it), np.load(out_b)


def test_chunked_equals_single_shot(tmp_path):
    # single shot (chunking off)
    E1, it1, b1 = _run({"MRCAL_TPU_DEVICE_CHUNK": "0"},
                       str(tmp_path / "b1.npy"))
    # forced 7-iteration segments: many resume cycles
    E2, it2, b2 = _run({"MRCAL_TPU_DEVICE_CHUNK": "7"},
                       str(tmp_path / "b2.npy"))
    assert it1 == it2
    assert E1 == E2
    assert np.array_equal(b1, b2)
