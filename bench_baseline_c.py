"""MEASURED C-reference baseline for the five BASELINE configs.

The reference's solve loop is libdogleg trust-region LM: every iteration
evaluates `optimizer_callback` (residuals + CSR Jacobian, mrcal.c:4445)
and — on accepted steps — factorizes JtJ with CHOLMOD and back-solves.
libdogleg/CHOLMOD cannot be built in this container (no sources, no
network), so this harness measures the two dominant pieces separately,
with the REAL reference code for the dominant one:

  t_callback   measured by baseline_c/baseline_driver (the reference's
               own mrcal.c compiled from /root/reference with
               -O3 -march=native -ffast-math; stub dogleg.h for types);
  t_factorize  measured in scipy on the ACTUAL JtJ (from the CSR Jt the
               driver writes): sparse splu with best fill-reducing
               ordering, and dense LAPACK Cholesky; the MINIMUM of the
               two is used (generous to the reference — CHOLMOD's
               supernodal Cholesky would land between them);
  t_solve      two triangular solves per iteration (dogleg needs the GN
               step; further trust-region subproblems reuse it).

Per-iteration model: t_iter = t_callback + t_factorize + t_solve, with
an error band [t_callback (reject iterations: no factorization),
t_callback + 2*t_factorize + 4*t_solve] published per config.

Output: baseline_c_measured.json, which bench.py uses for vs_baseline
(baseline_is_estimate=false) when present.

Usage:  python bench_baseline_c.py          # builds driver if needed
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
CDIR = os.path.join(HERE, "baseline_c")
REF = "/root/reference"


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def build_driver():
    """Compile the reference sources + driver (cached on mtime)."""
    drv = os.path.join(CDIR, "baseline_driver")
    src = os.path.join(CDIR, "baseline_driver.c")
    if os.path.exists(drv) and \
            os.path.getmtime(drv) >= os.path.getmtime(src):
        return drv
    gen = os.path.join(CDIR, "gen", "minimath")
    os.makedirs(gen, exist_ok=True)
    mm = os.path.join(gen, "minimath_generated.h")
    if not os.path.exists(mm):
        env = dict(os.environ,
                   PERL5LIB=os.path.join(CDIR, "perl_shim"))
        # write-to-temp + rename: a failed perl run must not leave an
        # empty header that poisons every later (cached) build
        tmp = mm + ".tmp"
        try:
            with open(tmp, "w") as f:
                subprocess.run(
                    ["perl", f"{REF}/minimath/minimath_generate.pl"],
                    stdout=f, env=env, check=True)
            os.replace(tmp, mm)
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
    flags = ["-O3", "-march=native", "-ffast-math", "-include", "stddef.h",
             "-I", os.path.join(CDIR, "stub"), "-I", REF,
             "-I", gen]
    objs = []
    for f, cc in (("mrcal.c", "gcc"), ("poseutils.c", "gcc"),
                  ("poseutils-opencv.c", "gcc"), ("opencv.c", "gcc"),
                  ("poseutils-uses-autodiff.cc", "g++"),
                  ("cahvore.cc", "g++"), ("triangulation.cc", "g++"),
                  ("baseline_driver.c", "gcc")):
        src_f = (os.path.join(CDIR, f) if f == "baseline_driver.c"
                 else os.path.join(REF, f))
        obj = os.path.join(CDIR, os.path.splitext(f)[0] + ".o")
        subprocess.run([cc, *flags, "-c", src_f, "-o", obj], check=True)
        objs.append(obj)
    subprocess.run(["g++", "-o", drv, *objs, "-lm",
                    "/lib/x86_64-linux-gnu/liblapack.so.3"], check=True)
    return drv


def _dump_problem(oi, spec, path):
    """Binary problem dump consumed by baseline_driver.c."""
    import mrcal_tpu  # noqa: F401  (normalizes below need it importable)
    from mrcal_tpu.optimize.layout import normalize_inputs
    kw = normalize_inputs(dict(oi))
    s = spec.selections

    obs_b = np.asarray(kw.get("observations_board")
                       if kw.get("observations_board") is not None
                       else np.zeros((0, 1, 1, 3)), np.float64)
    idx_b = np.asarray(kw.get("indices_frame_camintrinsics_camextrinsics")
                       if kw.get("indices_frame_camintrinsics_camextrinsics")
                       is not None else np.zeros((0, 3)), np.int32)
    Nobs_b = len(idx_b)
    Hn = obs_b.shape[1] if Nobs_b else 1
    Wn = obs_b.shape[2] if Nobs_b else 1

    # triangulated observations (config 4): px = unprojected directions
    obs_tri_rows = []
    idx_t = kw.get("indices_point_triangulated_camintrinsics_camextrinsics")
    if idx_t is not None and len(np.asarray(idx_t)):
        idx_t = np.asarray(idx_t, np.int32)
        w_t = np.asarray(kw["observations_point_triangulated"])[:, 2]
        from mrcal_tpu.optimize.residuals import arrays_from_inputs
        arrays = arrays_from_inputs(**kw)
        px = np.asarray(arrays["px_triangulated"], np.float64)
        ipoint = idx_t[:, 0]
        last = np.zeros(len(idx_t), np.int32)
        last[:-1] = (ipoint[1:] != ipoint[:-1]).astype(np.int32)
        last[-1] = 1
        for k in range(len(idx_t)):
            obs_tri_rows.append(
                (int(idx_t[k, 1]), int(idx_t[k, 2]), int(last[k]),
                 int(w_t[k] <= 0), px[k]))
    Nobs_tri = len(obs_tri_rows)

    name = spec.lensmodel.name.encode()
    ext = np.asarray(kw.get("extrinsics_rt_fromref")
                     if kw.get("extrinsics_rt_fromref") is not None
                     else np.zeros((0, 6)), np.float64)
    frames = np.asarray(kw.get("frames_rt_toref")
                        if kw.get("frames_rt_toref") is not None
                        else np.zeros((0, 6)), np.float64)
    points = np.asarray(kw.get("points")
                        if kw.get("points") is not None
                        else np.zeros((0, 3)), np.float64)
    warp = np.asarray(kw.get("calobject_warp")
                      if kw.get("calobject_warp") is not None
                      else np.zeros(2), np.float64)

    with open(path, "wb") as f:
        hdr = np.array([0x6d726361, spec.Ncameras_intrinsics,
                        spec.Ncameras_extrinsics, spec.Nframes,
                        spec.Npoints, spec.Npoints_fixed,
                        Nobs_b, spec.Nobservations_point, Wn, Hn,
                        len(name), Nobs_tri], np.int32)
        hdr.tofile(f)
        np.array([s.do_optimize_intrinsics_core,
                  s.do_optimize_intrinsics_distortions,
                  s.do_optimize_extrinsics, s.do_optimize_frames,
                  s.do_optimize_calobject_warp,
                  s.do_apply_regularization,
                  s.do_apply_outlier_rejection,
                  s.do_apply_regularization_unity_cam01],
                 np.int32).tofile(f)
        f.write(name)
        np.float64(spec.calibration_object_spacing
                   if spec.calibration_object_spacing else 0.0).tofile(f)
        np.asarray(spec.imagersizes, np.int32).tofile(f)
        np.asarray(kw["intrinsics"], np.float64).tofile(f)
        ext.tofile(f)
        frames.tofile(f)
        points.tofile(f)
        warp.tofile(f)
        obs_b.tofile(f)
        idx_b.tofile(f)
        for ici, ice, last, outlier, px in obs_tri_rows:
            np.array([ici, ice, last, outlier], np.int32).tofile(f)
            np.asarray(px, np.float64).tofile(f)


def time_factorization(prefix, Nstate, Nmeas, Nnz):
    """Sparse + dense factorization of the actual JtJ; returns times."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    import scipy.linalg as sla
    p = np.fromfile(prefix + ".p", np.int32, Nmeas + 1)
    i = np.fromfile(prefix + ".i", np.int32, Nnz)
    v = np.fromfile(prefix + ".v", np.float64, Nnz)
    Jt = sp.csr_matrix((v, i, p), shape=(Nmeas, Nstate)).T.tocsc()
    J = Jt.T.tocsr()
    JtJ = (Jt @ J).tocsc()
    # the real JtJ spans ~16 orders on the diagonal (OPENCV8 rational
    # terms); Marquardt-style relative jitter keeps the factorization
    # PD without changing its cost
    diag = JtJ.diagonal()
    JtJ = JtJ + sp.diags(1e-8 * np.maximum(diag, diag.max() * 1e-12))

    def best_of(fn, n=5):
        ts = []
        for _ in range(n):
            t0 = time.perf_counter()
            r = fn()
            ts.append(time.perf_counter() - t0)
        return min(ts), r

    t_splu, lu = best_of(lambda: spla.splu(JtJ))
    t_splu_mmd, lu_mmd = best_of(
        lambda: spla.splu(JtJ, permc_spec="MMD_AT_PLUS_A"))
    rhs = np.ones(Nstate)
    t_solve_sp, _ = best_of(lambda: lu.solve(rhs))
    dense_ok = Nstate <= 4000
    if dense_ok:
        A = JtJ.toarray()
        t_chol, cf = best_of(lambda: sla.cho_factor(A))
        t_solve_d, _ = best_of(lambda: sla.cho_solve(cf, rhs))
    else:
        t_chol, t_solve_d = np.inf, np.inf

    # FLOP-bound on ANY sparse Cholesky of this system: the best
    # elimination found (fewest-fill L between COLAMD and MMD) costs
    # sum_col nnz(L_col)^2 flops; divide by the machine's measured
    # single-core dense-Cholesky rate (its best case).  CHOLMOD cannot
    # beat this, so it bounds the reference's factorization from below
    # (and the vs_baseline band from above).
    L_nnz_cols = np.minimum(np.diff(lu.L.tocsc().indptr),
                            np.diff(lu_mmd.L.tocsc().indptr))
    chol_flops = float(np.sum(L_nnz_cols.astype(np.float64) ** 2))
    n_rate = min(Nstate, 1500)
    Ar = np.eye(n_rate) * n_rate + np.random.default_rng(0).normal(
        0, 0.01, (n_rate, n_rate))
    Ar = Ar @ Ar.T
    t_rate, _ = best_of(lambda: sla.cho_factor(Ar.copy()))
    gflops = (n_rate ** 3 / 3.0) / t_rate / 1e9
    t_fact_lo = chol_flops / (gflops * 1e9)
    return dict(t_splu_s=t_splu, t_splu_mmd_s=t_splu_mmd,
                t_dense_chol_s=t_chol,
                t_factorize_s=min(t_splu, t_splu_mmd, t_chol),
                t_factorize_flop_bound_s=t_fact_lo,
                dense_chol_gflops=gflops,
                t_solve_s=min(t_solve_sp, t_solve_d),
                jtj_nnz=int(JtJ.nnz))


def main():
    # scene synthesis only needs the CPU backend; never touch the TPU
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    drv = build_driver()
    sys.path[:0] = [HERE]
    from bench import _CONFIG_THUNKS, _perturbed_oi

    out = {"hardware": "container x86 CPU, single thread (like the "
                       "reference's own solve loop)",
           "method": "see module docstring: measured reference "
                     "optimizer_callback + measured scipy factorization "
                     "of the actual JtJ",
           "configs": {}}
    tmp = "/tmp/mrcal_baseline_c"
    os.makedirs(tmp, exist_ok=True)
    for name, thunk in _CONFIG_THUNKS:
        cfg = thunk()
        oi = _perturbed_oi(cfg["oi"], seed=1)
        dump = os.path.join(tmp, name + ".bin")
        prefix = os.path.join(tmp, name)
        _dump_problem(oi, cfg["spec"], dump)
        nrep = "20"
        r = subprocess.run([drv, dump, prefix, nrep],
                           capture_output=True, text=True, check=True)
        d = json.loads(r.stdout)
        fac = time_factorization(prefix, d["Nstate"], d["Nmeas"], d["Nnz"])
        t_cb = d["t_callback_with_J_s"]
        t_iter = t_cb + fac["t_factorize_s"] + fac["t_solve_s"]
        # band: [the best-possible factorization (FLOP bound of the
        #        best elimination found, clamped by the measurement),
        #        2 factorizations + 4 solves per iteration]
        t_lo = t_cb + min(fac["t_factorize_flop_bound_s"],
                          fac["t_factorize_s"])
        t_hi = t_cb + 2 * fac["t_factorize_s"] + 4 * fac["t_solve_s"]
        out["configs"][name] = dict(
            t_callback_s=round(t_cb, 6),
            t_callback_no_J_s=round(d["t_callback_no_J_s"], 6),
            **{k: (round(v, 6) if np.isfinite(v) else None)
               for k, v in fac.items() if k.startswith("t_")},
            jtj_nnz=fac["jtj_nnz"],
            Nstate=d["Nstate"], Nmeas=d["Nmeas"], Nnz=d["Nnz"],
            t_iteration_s=round(t_iter, 6),
            iterations_per_s=round(1.0 / t_iter, 3),
            iterations_per_s_band=[round(1.0 / t_hi, 3),
                                   round(1.0 / t_lo, 3)],
        )
        _log(f"[{name}] callback {t_cb*1e3:.2f} ms  factorize "
             f"{fac['t_factorize_s']*1e3:.2f} ms  -> "
             f"{1.0/t_iter:.1f} it/s  "
             f"band [{1.0/t_hi:.1f}, {1.0/t_lo:.1f}]")
    path = os.path.join(HERE, "baseline_c_measured.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["configs"]))
    _log(f"wrote {path}")


if __name__ == "__main__":
    main()
