"""Benchmark: LM-iteration throughput on the canonical calibration scene.

Scene: the documentation-tour shape (BASELINE.md) — one camera,
LENSMODEL_OPENCV8, 84 frames of a 14x14-corner chessboard =>
Nstate = 12 + 84*6 + 2 = 518, Nmeas = 84*14*14*2 + 10 = 32,938.

Metric: full LM iterations/s (normal-equation build from per-observation
AD Jacobian blocks + Schur-reduced damped solve), on whatever device jax
provides (TPU under the driver; CPU otherwise).  The iteration runs in f32
-- the production mixed-precision pipeline (f32 LM phase + f64 polish,
verified in tests/test_mixed_precision.py to land within 1e-6 px of the
pure-f64 optimum; f64 is software-emulated on TPU and ~9x slower).

vs_baseline: ratio against the single-threaded C reference
(mrcal_optimize + libdogleg/CHOLMOD).  The C stack is not runnable in this
container; we use 20 it/s as the documented conservative estimate for this
problem size on a modern x86 core (CHOLMOD factorization of a 518-state
33k-measurement problem plus the analytic-callback cost per iteration).
"""

import json
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import mrcal_tpu  # noqa: F401  (enables x64)
    from __graft_entry__ import _make_problem
    from mrcal_tpu.optimize.solver import (build_normal_equations,
                                           schur_step, _delta_to_b)

    oi, spec, arrays, b0 = _make_problem(
        Ncameras=1, Nframes=84, model="LENSMODEL_OPENCV8", W=14, H=14)

    static_idx = dict(board=np.asarray(arrays["indices_board"]),
                      point=np.asarray(arrays["indices_point"]))
    ne_fn = build_normal_equations(spec, arrays, static_idx)
    import jax.numpy as jnp

    from mrcal_tpu.optimize.solver import _cast_arrays
    arrays32 = _cast_arrays(arrays, jnp.float32)

    @jax.jit
    def lm_step(b, lam):
        ne = ne_fn(b, arrays32)
        dc, df, dp = schur_step(ne, lam, spec)
        db = _delta_to_b(dc, df, dp, spec)
        return b + db, ne["E"]

    b = jnp.asarray(b0, jnp.float32)
    # warmup / compile
    b1, E = lm_step(b, 1e-4)
    b1.block_until_ready()

    niter = 20
    t0 = time.perf_counter()
    bb = b
    for _ in range(niter):
        bb, E = lm_step(bb, 1e-4)
    bb.block_until_ready()
    dt = time.perf_counter() - t0

    its_per_s = niter / dt
    baseline_c_its_per_s = 20.0
    print(json.dumps({
        "metric": "lm_iterations_per_s__opencv8_84frames_14x14",
        "value": round(its_per_s, 3),
        "unit": "iterations/s",
        "vs_baseline": round(its_per_s / baseline_c_its_per_s, 3),
    }))


if __name__ == "__main__":
    main()
