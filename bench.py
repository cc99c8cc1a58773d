"""Benchmark: LM-iteration throughput of the PRODUCTION optimize() path on
every BASELINE.json config.

Configs (BASELINE.json "configs"):
  1. opencv8_1cam     single camera, LENSMODEL_OPENCV8, 84 frames of a
                      14x14 board (the documentation-tour shape).
  2. opencv8_4cam     4-camera joint calibration w/ extrinsics +
                      calobject_warp, 84 frames (336 board observations).
  3. splined_30x18    LENSMODEL_SPLINED_STEREOGRAPHIC order=3 Nx=30 Ny=18
                      fov=150 (canonical splined config), 84 frames,
                      core locked, regularization on.
  4. sfm_triangulated SfM with triangulated points: 8-camera trajectory,
                      500 points, ray-divergence measurements, scale fixed
                      by unity_cam01 regularization.
  5. rig16cam         16-camera rig, 40 frames seen by all cameras (640
                      board observations).  The observation axis of this
                      problem is what shards over a mesh (see
                      bench_scaling.py / dryrun_multichip); here it runs
                      on whatever single device jax provides.

Metric per config: full LM iterations/s of a plain mrcal_tpu.optimize(**oi)
call — the production path: device-resident lax.while_loop trust-region LM,
mixed precision on accelerators (f32 device phase + f64 device polish,
verified <1e-6 px of pure f64 in tests/test_mixed_precision.py).  The solve
starts from a strongly perturbed state so it runs long enough to amortize
the one-time dispatch latency (~25 ms over the axon device tunnel).

vs_baseline: ratio against the single-threaded C reference
(mrcal_optimize + libdogleg/CHOLMOD).  The C stack is not runnable in this
container (no SuiteSparse/libdogleg); we model its per-iteration cost as
    t_iter ~ t_callback + t_factorize
calibrated at 20 it/s for config 1 (50 ms/iter for 33k measurements /
518 states on a modern x86 core — conservative) and scaled per config by
measurement count, with an extra 2x callback penalty for splined models
(B-spline surface evaluation + much larger intrinsics block in the
factorization).  Estimates are deliberately generous to the C reference.

Output: ONE JSON line.  Headline keys (metric/value/unit/vs_baseline) are
config 1 — comparable with BENCH_r01.json — plus a "configs" dict holding
{value, unit, vs_baseline, niter, nmeas, nstate, rms} for all five.
"""

import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


# conservative single-threaded C-reference estimates, it/s (see module doc)
_C_EST_CAL = 20.0 * 33000.0   # it/s * Nmeas for board problems
_SPLINED_PENALTY = 2.0


def _perturbed_oi(oi, seed=1, scale=1e-2, perturb_intrinsics=False):
    """Deep-copy optimization_inputs with the GEOMETRY arrays perturbed so
    the solve sustains many LM iterations.  Per-quantity scales keep the
    start inside the basin of attraction (a warp perturbation of 1e-2 m is
    10x the SCALE_CALOBJECT_WARP and traps multi-camera solves in local
    minima; the convergence runs start intrinsics at the optimum like a
    real staged pipeline).  perturb_intrinsics=True additionally shifts
    focal/center by ~0.2% — the SUSTAINED-throughput runs use it so the
    solves run long enough to amortize dispatch."""
    import copy
    oi = copy.deepcopy(oi)
    rng = np.random.default_rng(seed)
    scales = {"extrinsics_rt_fromref": scale, "rt_cam_ref": scale,
              "frames_rt_toref": scale, "rt_ref_frame": scale,
              "points": scale, "calobject_warp": 1e-3}
    for k, s in scales.items():
        a = oi.get(k)
        if a is not None and np.asarray(a).size:
            a = np.asarray(a, dtype=np.float64)
            oi[k] = a + rng.normal(0.0, s, a.shape)
    if perturb_intrinsics:
        a = np.asarray(oi["intrinsics"], np.float64)
        oi["intrinsics"] = a * (1 + rng.normal(0.0, 2e-3, a.shape))
    return oi


def _measured_baseline(name, spec=None):
    """Measured C-reference it/s from bench_baseline_c.py's artifact
    (the real compiled reference optimizer_callback + measured
    factorization of the actual JtJ), if present AND measured on the
    same problem shape — a stale measurement against a changed scene
    must not masquerade as 'measured'.  Returns (its, band, True) or
    (None, None, False)."""
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "baseline_c_measured.json")
    try:
        with open(path) as f:
            cfgs = json.load(f)["configs"]
        c = cfgs[name]
        if spec is not None and \
                (int(c["Nmeas"]) != int(spec.Nmeasurements)
                 or int(c["Nstate"]) != int(spec.Nstate)):
            _log(f"[{name}] baseline_c_measured.json is for "
                 f"Nmeas={c['Nmeas']}/Nstate={c['Nstate']} but the scene "
                 f"is {spec.Nmeasurements}/{spec.Nstate}; re-run "
                 "bench_baseline_c.py (falling back to the modeled "
                 "estimate)")
            return None, None, False
        return (float(c["iterations_per_s"]),
                list(c["iterations_per_s_band"]), True)
    except (OSError, KeyError, ValueError):
        return None, None, False


def _board_config(name, rms_gate, **mk):
    from __graft_entry__ import _make_problem
    from mrcal_tpu.optimize.layout import spec_from_inputs

    oi, spec, arrays, b0 = _make_problem(**mk)
    oi["do_apply_outlier_rejection"] = False
    baseline, band, measured = _measured_baseline(name, spec)
    if baseline is None:
        baseline = _C_EST_CAL / spec.Nmeasurements
        if spec.is_splined:
            baseline /= _SPLINED_PENALTY
    return dict(name=name, oi=oi, spec=spec, baseline=baseline,
                baseline_band=band, baseline_measured=measured,
                rms_gate=rms_gate)


def _sfm_config():
    import mrcal_tpu as mrcal
    from mrcal_tpu.optimize.layout import spec_from_inputs

    np.random.seed(0)
    Ncameras, Npoints = 8, 500
    model = "LENSMODEL_PINHOLE"
    W, H = 1600, 1000
    intr = np.array([[800., 800., (W - 1) / 2, (H - 1) / 2]])
    rt_true = np.zeros((Ncameras, 6))
    for i in range(1, Ncameras):
        rt_true[i] = [0.02 * i, -0.05 * i, 0.01 * i,
                      -0.4 * i, 0.08 * np.sin(i), 0.05 * i]
    rt_true[1:, 3:] /= np.linalg.norm(rt_true[1, 3:])
    pts = np.stack([np.random.uniform(-6, 6, Npoints),
                    np.random.uniform(-3, 3, Npoints),
                    np.random.uniform(5.0, 25.0, Npoints)], axis=-1)
    # vectorized synthesis: ONE batched transform+project dispatch instead
    # of Npoints*Ncameras host-loop calls (each ~25 ms over the tunnel)
    p_cam = np.asarray(mrcal.transform_point_rt(
        rt_true[:, None, :], pts[None, :, :]))         # (Ncam, Npts, 3)
    q_all = np.asarray(mrcal.project(p_cam, model, intr[0]))
    vis = ((q_all[..., 0] >= 0) & (q_all[..., 0] <= W - 1)
           & (q_all[..., 1] >= 0) & (q_all[..., 1] <= H - 1)
           & (p_cam[..., 2] > 0))                      # (Ncam, Npts)
    nseen = vis.sum(axis=0)
    obs, idx = [], []
    for ip in np.nonzero(nseen >= 2)[0]:
        for ic in np.nonzero(vis[:, ip])[0]:
            q = q_all[ic, ip]
            obs.append([q[0] + np.random.randn() * 0.1,
                        q[1] + np.random.randn() * 0.1, 1.0])
            idx.append([ip, 0, ic - 1])
    oi = dict(
        intrinsics=intr,
        extrinsics_rt_fromref=rt_true[1:].copy(),
        observations_point_triangulated=np.array(obs),
        indices_point_triangulated_camintrinsics_camextrinsics=np.array(
            idx, dtype=np.int32),
        lensmodel=model,
        imagersizes=np.array([[W, H]]),
        do_optimize_intrinsics_core=False,
        do_optimize_intrinsics_distortions=False,
        do_apply_regularization_unity_cam01=True,
        do_apply_outlier_rejection=False,
    )
    spec = spec_from_inputs(**oi)
    baseline, band, measured = _measured_baseline("sfm_triangulated", spec)
    if baseline is None:
        baseline = _C_EST_CAL / max(spec.Nmeasurements, 1)
    return dict(name="sfm_triangulated", oi=oi, spec=spec, baseline=baseline,
                baseline_band=band, baseline_measured=measured,
                rms_gate=0.5)


def _run_config(cfg):
    import mrcal_tpu as mrcal
    spec = cfg["spec"]

    # perturbed starts; warmup and measured runs share shapes/dtypes so the
    # measured calls reuse the compiled executables
    oi_warm = _perturbed_oi(cfg["oi"], seed=1)
    oi_conv = _perturbed_oi(cfg["oi"], seed=1)
    oi_sus = _perturbed_oi(cfg["oi"], seed=1)

    _log(f"[{cfg['name']}] Nmeas={spec.Nmeasurements} "
         f"Nstate={spec.Nstate} compiling/warmup ...")
    t0 = time.perf_counter()
    mrcal.optimize(**oi_warm, update_threshold=1e-7, max_iterations=2000)
    # ... and the f32-only sustained path: its readback/cast graphs
    # differ from the mixed-precision ones (f32 vs f64 dtypes), and a
    # first-call compile through the remote helper (~2.5 s) must not
    # land inside the measured run
    mrcal.optimize(**_perturbed_oi(cfg["oi"], seed=99,
                                   perturb_intrinsics=True),
                   precision="f32", update_threshold=0.0, ftol=0.0,
                   max_iterations=64)
    _log(f"[{cfg['name']}] warmup {time.perf_counter() - t0:.1f}s; "
         "measuring ...")

    # 1. CONVERGENCE: plain production solve (mixed precision on
    #    accelerators), default thresholds — what a user gets
    t0 = time.perf_counter()
    stats = mrcal.optimize(**oi_conv, update_threshold=1e-7,
                           max_iterations=2000)
    conv_s = time.perf_counter() - t0
    niter_conv = max(int(stats["niterations"]), 1)
    rms = float(stats["rms_reproj_error__pixels"])
    assert rms < cfg["rms_gate"], \
        f"{cfg['name']}: solve did not converge (rms {rms})"

    # 2. SUSTAINED LM throughput: the same production entry point forced
    #    to run long (f32 phase only, thresholds off) so the ~25 ms
    #    dispatch over the device tunnel amortizes over many iterations —
    #    this is the iteration-for-iteration comparison with the C solver.
    #    Aggregate fresh-seed solves until enough iterations accumulate.
    niter_s = 0
    dt = 0.0
    seed = 100
    while niter_s < 600 and seed < 140:
        oi_sus = _perturbed_oi(cfg["oi"], seed=seed,
                               perturb_intrinsics=True)
        seed += 1
        t0 = time.perf_counter()
        stats_s = mrcal.optimize(**oi_sus, precision="f32",
                                 update_threshold=0.0, ftol=0.0,
                                 max_iterations=1000)
        dt += time.perf_counter() - t0
        niter_s += max(int(stats_s["niterations"]), 1)
    its = niter_s / dt
    _log(f"[{cfg['name']}] sustained {niter_s} it in {dt:.3f}s = "
         f"{its:.1f} it/s | convergence {niter_conv} it "
         f"({stats['niterations_polish']} f64-polish) in {conv_s:.3f}s "
         f"(rms {rms:.3f} px)")
    vs_band = ([round(its / b, 3) for b in cfg["baseline_band"][::-1]]
               if cfg.get("baseline_band") else None)
    return dict(value=round(its, 3), unit="iterations/s",
                vs_baseline=round(its / cfg["baseline"], 3),
                baseline_c=round(cfg["baseline"], 3),
                baseline_measured=bool(cfg.get("baseline_measured")),
                vs_baseline_band=vs_band,
                niter_sustained=niter_s,
                convergence_s=round(conv_s, 4), niter=niter_conv,
                niter_polish=int(stats["niterations_polish"]),
                nmeas=int(spec.Nmeasurements),
                nstate=int(spec.Nstate), rms_px=round(rms, 4))


def _rig16_frames(Nframes):
    """Board poses visible to the whole 4x4 rig: mild tilts, 1.2-1.6 m
    out, modest lateral sweep."""
    rng = np.random.default_rng(7)
    return np.concatenate([
        rng.normal(0.0, 0.1, (Nframes, 3)),
        np.array([[0.25, 0.2, 1.4]]) + rng.normal(0.0, 0.12, (Nframes, 3)),
    ], axis=1)


_SPLINED_MODEL = ("LENSMODEL_SPLINED_STEREOGRAPHIC"
                  "_order=3_Nx=30_Ny=18_fov_x_deg=150")

_CONFIG_THUNKS = [
    ("opencv8_1cam", lambda: _board_config(
        "opencv8_1cam", 0.5, Ncameras=1, Nframes=84,
        model="LENSMODEL_OPENCV8", W=14, H=14)),
    ("opencv8_4cam", lambda: _board_config(
        "opencv8_4cam", 0.5, Ncameras=4, Nframes=84,
        model="LENSMODEL_OPENCV8", W=14, H=14)),
    ("splined_30x18", lambda: _board_config(
        "splined_30x18", 0.5, Ncameras=1, Nframes=84,
        model=_SPLINED_MODEL, W=14, H=14,
        do_optimize_intrinsics_core=False)),
    ("sfm_triangulated", _sfm_config),
    ("rig16cam", lambda: _board_config(
        "rig16cam", 0.5, Ncameras=16, Nframes=40,
        model="LENSMODEL_OPENCV8", W=14, H=14,
        # a physical 4x4 rig: cameras on a 0.15 m grid, all facing the
        # board (the default linear layout strings 16 cameras along a 3 m
        # baseline where the far ones cannot plausibly see the board),
        # and TAME board poses (the default +-0.9 rad random tilts swing
        # board corners to z~0 for the outer rig cameras: 'perfect'
        # observations at |q|~1e5 px make the basin microscopic and the
        # perturbed solve falls out of it)
        extrinsics_rt_fromref=np.array(
            [[0.01 * (i % 4), 0.01 * (i // 4), 0.0,
              -0.15 * (i % 4), -0.15 * (i // 4), 0.0]
             for i in range(1, 16)]),
        frames_rt_toref=_rig16_frames(40))),
]

# generous per-config wall-clock: a COLD compile of the full while_loop
# solver graph through the remote helper takes ~6+ min; warm-cache runs
# are far faster (.jax_cache is persistent)
_CONFIG_TIMEOUT_S = int(os.environ.get("MRCAL_TPU_BENCH_TIMEOUT", 3000))


def _run_one_config_subprocess(name):
    """Run a single named config in a CHILD python process.  A TPU worker
    crash (kernel fault) takes the whole jax client down with it and the
    dead worker poisons every subsequent dispatch from that process — so
    each config gets its own process and therefore its own fresh worker
    connection.  Returns the parsed per-config result dict."""
    import subprocess
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
        out_path = f.name
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__),
             "--config", name, "--out", out_path],
            timeout=_CONFIG_TIMEOUT_S, cwd=os.path.dirname(
                os.path.abspath(__file__)) or ".")
        if proc.returncode != 0:
            return dict(error=f"bench subprocess exited rc={proc.returncode}")
        with open(out_path) as f:
            return json.load(f)
    except subprocess.TimeoutExpired:
        return dict(error=f"timeout after {_CONFIG_TIMEOUT_S}s")
    except Exception as e:
        return dict(error=f"{type(e).__name__}: {e}")
    finally:
        try:
            os.unlink(out_path)
        except OSError:
            pass


def _child_main(name, out_path):
    """--config mode: build + run ONE config, write its JSON to out_path.
    Config construction runs inside the try as well: scene synthesis
    dispatches device calls and can itself fail."""
    import mrcal_tpu  # noqa: F401  (enables x64, compile cache)
    try:
        mk = dict(_CONFIG_THUNKS)[name]
        result = _run_config(mk())
    except Exception as e:
        _log(f"[{name}] FAILED: {type(e).__name__}: {e}")
        result = dict(error=f"{type(e).__name__}: {e}")
    with open(out_path, "w") as f:
        json.dump(result, f)


def main():
    if "--config" in sys.argv:
        i = sys.argv.index("--config")
        name = sys.argv[i + 1]
        out_path = sys.argv[sys.argv.index("--out") + 1]
        _child_main(name, out_path)
        return

    only = os.environ.get("MRCAL_TPU_BENCH_CONFIGS")
    names = set(only.split(",")) if only else None

    results = {}
    for name, _ in _CONFIG_THUNKS:
        if names is not None and name not in names:
            continue
        results[name] = _run_one_config_subprocess(name)
        if "error" in results[name]:
            _log(f"[{name}] FAILED: {results[name]['error']}")

    ok = {k: v for k, v in results.items() if "error" not in v}
    head = ok.get("opencv8_1cam",
                  next(iter(ok.values())) if ok else
                  dict(value=0.0, vs_baseline=0.0))
    all_measured = bool(ok) and all(v.get("baseline_measured")
                                    for v in ok.values())
    print(json.dumps({
        "metric": "lm_iterations_per_s__opencv8_84frames_14x14",
        "value": head["value"],
        "unit": "iterations/s",
        "vs_baseline": head["vs_baseline"],
        # baseline_is_estimate=false means every config's vs_baseline
        # divides by the MEASURED C reference (bench_baseline_c.py: the
        # reference's own optimizer_callback compiled from
        # /root/reference at -O3 -march=native, plus a measured sparse/
        # dense factorization of the actual JtJ; per-config uncertainty
        # in vs_baseline_band).  Falls back to the modeled estimate only
        # if baseline_c_measured.json is absent.
        "baseline_is_estimate": not all_measured,
        "baseline_source": ("baseline_c_measured.json" if all_measured
                            else "modeled estimate"),
        "configs": results,
    }))


if __name__ == "__main__":
    main()
