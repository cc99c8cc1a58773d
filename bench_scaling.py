"""Multi-device scaling harness for the sharded bundle adjustment.

Measures the PRODUCTION multi-chip path — sharded_lm_solve_device, the
device-resident trust-region LM while_loop with observation-sharded
normal equations and one psum'd block reduction per iteration (the same
graph optimize(..., mesh=...) runs) — on meshes of 1/2/4/8 devices, plus
the legacy per-step host-loop path for reference.

On a virtual CPU mesh (the default in this container: one real TPU chip
only) the devices share host cores, so the numbers validate FUNCTION
(identical results, collectives correct) rather than speedup; on a real
multi-chip TPU slice the same harness measures scaling efficiency
(BASELINE north star: >=80% to 4 hosts).

Usage: JAX_PLATFORMS=cpu python bench_scaling.py [out.json]
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    except Exception:
        pass
    import jax.numpy as jnp
    import mrcal_tpu  # noqa: F401
    from __graft_entry__ import _make_problem
    from mrcal_tpu.parallel import make_mesh, sharded_lm_solve_device
    from mrcal_tpu.parallel.sharding import (sharded_lm_step,
                                             _padded_shard_arrays)

    oi, spec, arrays, b0 = _make_problem(
        Ncameras=2, Nframes=32, model="LENSMODEL_OPENCV8", W=10, H=10)
    b0 = jnp.asarray(b0)
    NITER = 40

    records = []
    n_avail = len(jax.devices())
    for ndev in (1, 2, 4, 8):
        if ndev > n_avail:
            break
        mesh = make_mesh(ndev)

        # production: device-resident while_loop, fixed NITER iterations
        # (thresholds off) -> per-LM-iteration wall time
        b, E, it, ne = sharded_lm_solve_device(
            spec, arrays, b0, mesh, max_iterations=NITER,
            update_threshold=0.0, ftol=0.0)           # warmup/compile
        t0 = time.perf_counter()
        b, E, it, ne = sharded_lm_solve_device(
            spec, arrays, b0, mesh, max_iterations=NITER,
            update_threshold=0.0, ftol=0.0)
        dt_device = (time.perf_counter() - t0) / max(it, 1) * 1e3

        # legacy host-loop step (2 NE evals + 2 dispatches per LM iter)
        step = sharded_lm_step(spec, mesh)(arrays)
        shard_args = _padded_shard_arrays(arrays, ndev)
        out = step(b0, *shard_args, 1e-4)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = step(b0, *shard_args, 1e-4)
        jax.block_until_ready(out)
        dt_step = (time.perf_counter() - t0) / n * 1e3

        rec = {"n_devices": ndev,
               "ms_per_lm_iteration_device_loop": round(dt_device, 3),
               "ms_per_step_host_loop": round(dt_step, 3),
               "E": float(E), "niter": int(it)}
        records.append(rec)
        print(json.dumps(rec))

    summary = {"records": records,
               "note": "virtual CPU devices share host cores; efficiency "
                       "numbers need real chips",
               "nmeas": int(spec.Nmeasurements),
               "nstate": int(spec.Nstate)}
    if len(records) > 1:
        d1 = records[0]["ms_per_lm_iteration_device_loop"]
        dn = records[-1]["ms_per_lm_iteration_device_loop"]
        nmax = records[-1]["n_devices"]
        summary["scaling_efficiency_to_%d" % nmax] = round(
            d1 / (dn * nmax), 3)
        print(json.dumps({k: v for k, v in summary.items()
                          if k != "records"}))

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
