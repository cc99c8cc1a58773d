"""Multi-device scaling harness + scaling EVIDENCE TRAIL for the sharded
bundle adjustment.

Measures the PRODUCTION multi-chip path — sharded_lm_solve_device, the
device-resident trust-region LM while_loop with observation-sharded
normal equations and one psum'd block reduction per iteration (the same
graph optimize(..., mesh=...) runs) — on meshes of 1/2/4/8 devices, and
emits the analysis the efficiency claim rests on:

  1. per-iteration COLLECTIVE VOLUME (bytes all-reduced) per BASELINE
     config, from the block shapes (parallel.sharding.
     collective_bytes_per_iteration);
  2. an HLO AUDIT of the compiled while_loop confirming how many
     all-reduce ops run per LM iteration (the design says: one fused
     block reduction; XLA may split it per leaf — the audit counts what
     is actually in the executable);
  3. a COMPUTE/COMM MODEL predicting scaling efficiency on a real v5e
     topology from the measured single-chip iteration times and public
     ICI bandwidth numbers, with every assumption stated in the output.

On a virtual CPU mesh (the default in this container: one real TPU chip
only) the measured times validate FUNCTION (identical results,
collectives correct), not speedup — the model is the falsifiable
prediction for the first real multi-chip run.

Usage: JAX_PLATFORMS=cpu python bench_scaling.py [out.json]
"""

import json
import re
import sys
import time

import numpy as np

# ---------------------------------------------------------------------------
# v5e topology assumptions for the comm model (public numbers; see
# jax-ml.github.io/scaling-book "TPU v5e": 2D torus, 4 ICI links/chip,
# ~4.5e10 B/s per link per direction; 8 chips/host, hosts in the same pod
# reached over ICI).  A ring all-reduce of B bytes over N devices moves
# 2*B*(N-1)/N per device.
# ---------------------------------------------------------------------------
ICI_BW_BYTES_S = 4.5e10          # per link, per direction
ICI_LAT_S = 1e-6                 # per ring step
# measured single-chip iteration times (round 5, v5e, f32, single
# run() dispatch of the device while_loop, warm cache)
MEASURED_MS_PER_ITER = {
    "opencv8_1cam": 0.19, "opencv8_4cam": 0.66, "splined_30x18": 2.24,
    "sfm_triangulated": 0.40, "rig16cam": 1.34,
}
# replicated (non-sharded) per-iteration work: the Schur solve.  From
# the round-5 xprof HLO profiles of the sustained solves: opencv8_1cam
# schur ops (frame-block solves + reduced 14x14 Cholesky + dus) sum to
# ~0.07 ms; splined_30x18's 1082-wide reduced Cholesky + triangular
# solves ~0.30 ms; others scaled by reduced-system size (Cholesky ~
# Nc^3 + Cf reduction ~ Nf*6*Nc^2).
SERIAL_MS = {
    "opencv8_1cam": 0.07, "opencv8_4cam": 0.13, "splined_30x18": 0.30,
    "sfm_triangulated": 0.06, "rig16cam": 0.22,
}


def allreduce_time_s(nbytes, n_devices):
    if n_devices <= 1:
        return 0.0
    return (2.0 * nbytes * (n_devices - 1) / n_devices / ICI_BW_BYTES_S
            + ICI_LAT_S * 2 * (n_devices - 1))


def efficiency_model(name, nbytes, n_devices):
    """Predicted scaling efficiency: t1 / (N * tN) with
    tN = parallel/N + serial + allreduce."""
    t1 = MEASURED_MS_PER_ITER[name] * 1e-3
    serial = SERIAL_MS[name] * 1e-3
    par = max(t1 - serial, 0.0)
    tN = par / n_devices + serial + allreduce_time_s(nbytes, n_devices)
    return t1 / (n_devices * tN)


def baseline_config_specs():
    """ProblemSpecs of the five BASELINE configs (shapes only; no solve)."""
    from bench import _CONFIG_THUNKS
    out = {}
    for name, thunk in _CONFIG_THUNKS:
        out[name] = thunk()["spec"]
    return out


def tpu_mesh1_overhead(out_path=None):
    """Measured on the REAL chip: the production sharded path at mesh=1
    vs the unsharded device loop — the shard_map/psum machinery's
    per-iteration overhead with zero actual communication.  Run WITHOUT
    JAX_PLATFORMS=cpu (uses whatever single device jax provides)."""
    import jax
    import jax.numpy as jnp
    import mrcal_tpu  # noqa: F401
    from bench import _CONFIG_THUNKS, _perturbed_oi
    from mrcal_tpu.parallel import make_mesh, sharded_lm_solve_device
    from mrcal_tpu.optimize.solver import lm_solve_device
    from mrcal_tpu.optimize.layout import spec_from_inputs
    from mrcal_tpu.optimize.residuals import (arrays_from_inputs,
                                              params_from_arrays,
                                              pack_params)
    out = {"device": str(jax.devices()[0]), "configs": {}}
    NIT = 500
    for name in ("opencv8_1cam", "rig16cam"):
        cfg = dict(_CONFIG_THUNKS)[name]()
        oi = _perturbed_oi(cfg["oi"], seed=100, perturb_intrinsics=True)
        spec = spec_from_inputs(**oi)
        arrays = arrays_from_inputs(**oi)
        b0 = jnp.asarray(pack_params(params_from_arrays(arrays), spec))
        mesh = make_mesh(1)
        rec = {}
        for label, run in (
            ("unsharded", lambda: lm_solve_device(
                spec, arrays, b0, max_iterations=NIT,
                update_threshold=0.0, ftol=0.0, dtype=jnp.float32,
                quiet=True)),
            ("mesh1_sharded", lambda: sharded_lm_solve_device(
                spec, arrays, b0, mesh, max_iterations=NIT,
                update_threshold=0.0, ftol=0.0, dtype=jnp.float32,
                quiet=True))):
            run()                                    # warmup/compile
            t0 = time.perf_counter()
            _, _, it, _ = run()
            dt = (time.perf_counter() - t0) / max(int(it), 1) * 1e3
            rec[label + "_ms_per_iter"] = round(dt, 4)
        rec["overhead_pct"] = round(
            100.0 * (rec["mesh1_sharded_ms_per_iter"]
                     / rec["unsharded_ms_per_iter"] - 1.0), 1)
        out["configs"][name] = rec
        print(json.dumps({name: rec}))
    if out_path:
        try:
            with open(out_path) as f:
                merged = json.load(f)
        except (OSError, ValueError):
            merged = {}
        merged["mesh1_overhead_real_chip"] = out
        with open(out_path, "w") as f:
            json.dump(merged, f, indent=1)
    return out


def main():
    if "--tpu-mesh1" in sys.argv:
        args = [a for a in sys.argv[1:] if not a.startswith("--")]
        tpu_mesh1_overhead(args[0] if args else None)
        return
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
    from mrcal_tpu.parallel.sharding import (
        collective_bytes_per_iteration, _make_sharded_ne_fn,
        _shard_arrays_for_device_solver)
    from mrcal_tpu.optimize.solver import _make_device_lm, lm_solve_device

    oi, spec, arrays, b0 = _make_problem(
        Ncameras=2, Nframes=32, model="LENSMODEL_OPENCV8", W=10, H=10)
    b0 = jnp.asarray(b0)
    NITER = 40

    # single-chip unsharded device loop: the shard_map-overhead reference
    lm_solve_device(spec, arrays, b0, max_iterations=NITER,
                    update_threshold=0.0, ftol=0.0)      # warmup
    t0 = time.perf_counter()
    _, _, it_u, _ = lm_solve_device(spec, arrays, b0, max_iterations=NITER,
                                    update_threshold=0.0, ftol=0.0)
    dt_unsharded = (time.perf_counter() - t0) / max(it_u, 1) * 1e3

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

        rec = {"n_devices": ndev,
               "ms_per_lm_iteration_device_loop": round(dt_device, 3),
               "E": float(E), "niter": int(it)}
        records.append(rec)
        print(json.dumps(rec))

    # ---- HLO audit: all-reduce ops per LM iteration in the compiled
    # while_loop body (the executable that optimize(mesh=...) runs)
    mesh = make_mesh(min(8, n_avail))
    solve = _make_device_lm(spec, _make_sharded_ne_fn(spec, mesh))
    rep, sh = _shard_arrays_for_device_solver(arrays, mesh.devices.size)
    state = solve.start(b0, (rep, sh), jnp.asarray(1e-4, b0.dtype))
    lowered = solve.run.lower(state, (rep, sh),
                              jnp.asarray(NITER, jnp.int32),
                              jnp.asarray(0.0, b0.dtype),
                              jnp.asarray(0.0, b0.dtype))
    hlo = lowered.compile().as_text()
    n_allreduce = len(re.findall(r"all-reduce(?:-start)?\(", hlo))
    # bytes actually moved: ALL operand shapes of each (possibly
    # tuple-shaped) all-reduce instruction
    ar_bytes = 0
    for line in hlo.splitlines():
        if not re.search(r"all-reduce(?:-start)?\(", line):
            continue
        # shapes live between '=' and the 'all-reduce(' (or
        # 'all-reduce-start(') call:
        #   %all-reduce.1 = (f64[], f64[8,6,32]{2,1,0}, ...) all-reduce(
        shape_part = re.split(r"all-reduce(?:-start)?\(",
                              line)[0].split("=", 1)[-1]
        for bits, dims in re.findall(r"\bf(\d+)\[([\d,]*)\]", shape_part):
            n = 1
            for d in dims.split(","):
                if d:
                    n *= int(d)
            ar_bytes += n * int(bits) // 8
    hlo_audit = {
        "all_reduce_ops_in_while_body": n_allreduce,
        "all_reduce_bytes_total": ar_bytes,
        "note": "one NE evaluation per LM iteration; XLA may split the "
                "block-dict psum into one all-reduce per leaf (<=9) or "
                "fuse them; the residual rows are NOT reduced "
                "(out_specs P(axis))",
    }
    print(json.dumps(hlo_audit))

    # ---- collective volume + efficiency model for the BASELINE configs
    configs = {}
    for name, cspec in baseline_config_specs().items():
        nbytes32, breakdown = collective_bytes_per_iteration(
            cspec, np.float32)
        pred = {f"efficiency_n{n}": round(efficiency_model(
                    name, nbytes32, n), 3)
                for n in (2, 4, 8, 16, 32)}
        # how much BIGGER (observation count) this problem shape must be
        # for >=80% efficiency at 32 chips: parallel work scales with
        # Nobs, the serial Schur solve + all-reduce do not.
        # eff = P/(P + N*(s+ar)) >= 0.8  =>  P >= 4*N*(s+ar)
        t1 = MEASURED_MS_PER_ITER[name] * 1e-3
        par = max(t1 - SERIAL_MS[name] * 1e-3, 1e-9)
        need = 4 * 32 * (SERIAL_MS[name] * 1e-3
                         + allreduce_time_s(nbytes32, 32))
        pred["nmeas_scale_for_80pct_n32"] = round(need / par, 1)
        configs[name] = {
            "collective_bytes_per_iteration_f32": int(nbytes32),
            "collective_breakdown_bytes": {k: int(v) for k, v in
                                           breakdown.items()},
            "allreduce_ms_n8": round(
                allreduce_time_s(nbytes32, 8) * 1e3, 4),
            "measured_single_chip_ms_per_iter": MEASURED_MS_PER_ITER[name],
            "serial_schur_ms_assumed": SERIAL_MS[name],
            "predicted": pred,
        }
        print(json.dumps({name: configs[name]["predicted"]}))

    summary = {
        "records": records,
        "ms_per_lm_iteration_unsharded_single_chip": round(dt_unsharded, 3),
        "note": "virtual CPU devices share host cores; measured times "
                "validate function, not speedup.  The 'predicted' "
                "efficiencies are the falsifiable claim for real v5e "
                "hardware, from the compute/comm model below.",
        "model_assumptions": {
            "ici_bw_bytes_s_per_link_per_dir": ICI_BW_BYTES_S,
            "ici_latency_s_per_ring_step": ICI_LAT_S,
            "allreduce": "ring: 2*B*(N-1)/N per device + latency",
            "single_chip_ms_source": "round-5 single-dispatch device while_loop, warm cache (v5e, f32)",
            "serial_ms_source": "round-5 xprof HLO profiles "
                                "(schur ops summed) scaled by reduced-"
                                "system size",
            "topology": "v5e 2D torus, 8 chips/host; 4 hosts = 32 chips "
                        "on ICI within one pod",
        },
        "hlo_audit": hlo_audit,
        "configs": configs,
        "nmeas": int(spec.Nmeasurements),
        "nstate": int(spec.Nstate),
    }
    if len(records) > 1:
        d1 = records[0]["ms_per_lm_iteration_device_loop"]
        dn = records[-1]["ms_per_lm_iteration_device_loop"]
        nmax = records[-1]["n_devices"]
        summary["scaling_efficiency_to_%d" % nmax] = round(
            d1 / (dn * nmax), 3)
        print(json.dumps({k: v for k, v in summary.items()
                          if k not in ("records", "configs")}))

    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            json.dump(summary, f, indent=1)


if __name__ == "__main__":
    main()
