"""Multi-device scaling harness for the sharded bundle adjustment.

Runs the observation-sharded LM step on meshes of 1/2/4/8 devices and
reports per-iteration wall time.  On a virtual CPU mesh (the default in
this container: one real TPU chip only) the devices share host cores, so
the numbers validate FUNCTION (identical results, collectives correct)
rather than speedup; on a real multi-chip TPU slice the same harness
measures scaling efficiency (BASELINE north star: >=80% to 4 hosts).

Usage: JAX_PLATFORMS=cpu python bench_scaling.py
"""

import json
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
    from mrcal_tpu.parallel import make_mesh
    from mrcal_tpu.parallel.sharding import (sharded_lm_step,
                                             _padded_shard_arrays)

    oi, spec, arrays, b0 = _make_problem(
        Ncameras=2, Nframes=32, model="LENSMODEL_OPENCV8", W=10, H=10)
    b0 = jnp.asarray(b0)

    results = {}
    n_avail = len(jax.devices())
    for ndev in (1, 2, 4, 8):
        if ndev > n_avail:
            break
        mesh = make_mesh(ndev)
        step = sharded_lm_step(spec, mesh)(arrays)
        shard_args = _padded_shard_arrays(arrays, ndev)
        out = step(b0, *shard_args, 1e-4)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        n = 5
        for _ in range(n):
            out = step(b0, *shard_args, 1e-4)
        jax.block_until_ready(out)
        results[ndev] = (time.perf_counter() - t0) / n * 1e3
        E = float(out[1])
        print(json.dumps({"n_devices": ndev,
                          "ms_per_iteration": round(results[ndev], 2),
                          "E": E}))

    if 1 in results and len(results) > 1:
        nmax = max(results)
        eff = results[1] / (results[nmax] * nmax)
        print(json.dumps({"scaling_efficiency_to_%d" % nmax: round(eff, 3),
                          "note": "virtual CPU devices share host cores; "
                          "real efficiency needs real chips"}))


if __name__ == "__main__":
    main()
