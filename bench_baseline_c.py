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
an error band [t_callback + best-possible factorization (structural
FLOP bound: block-elimination update work + fill-reduced Schur-system
factorization, priced at the machine's measured dense-Cholesky rate),
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


def _structural_flop_bound(JtJ, Nstate, elim, gflops):
    """FLOP lower bound on ANY sparse Cholesky of this system that
    respects its block structure: (a) eliminating each frame/point block
    costs a rank-b symmetric update over the reduced rows it couples to
    (kf), (b) the reduced camera/knot system that elimination CREATES
    (original pattern + one clique per eliminated block) must itself be
    factored — costed at the best fill-reducing ordering found.  All
    flops are priced at the machine's measured DENSE single-core
    Cholesky rate (its best case; real supernodal code runs slower).

    The round-4 bound priced only a whole-system symbolic L and ignored
    the update work entirely — for the splined config that made the
    'best possible C' 10x faster than anything executable and blew the
    vs_baseline band to [1.3, 12.2].  This bound is ~2.9 ms of update
    work + ~2.6 ms of reduced-system work for that config, against a
    28.3 ms best MEASURED factorization."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    if not elim:
        return None                    # no eliminable blocks: keep the
    #                                    whole-system symbolic bound
    keep = np.ones(Nstate, bool)
    for off, bs, cnt in elim.values():
        keep[off:off + bs * cnt] = False
    ridx = np.nonzero(keep)[0]
    rpos = -np.ones(Nstate, np.int64)
    rpos[ridx] = np.arange(len(ridx))
    Ac = JtJ.tocsc()
    nred = len(ridx)
    # reduced pattern = original reduced block + a clique per block
    pat = np.zeros((nred, nred), bool)
    sub = Ac[ridx][:, ridx].tocoo()
    pat[sub.row, sub.col] = True
    upd_flops = 0.0
    for off, bs, cnt in elim.values():
        for k in range(cnt):
            j0 = off + bs * k
            rows = np.unique(sp.find(Ac[:, j0:j0 + bs])[0])
            cr = rpos[rows]
            cr = cr[cr >= 0].astype(np.int64)     # coupled reduced rows
            kf = len(cr)
            # bs eliminated columns, each with ~kf sub-diagonal nonzeros:
            # same sum-nnz(Lcol)^2 convention as the dense n^3/3 rate
            upd_flops += bs * kf * kf + kf * bs * bs + bs ** 3 / 3.0
            pat[np.ix_(cr, cr)] = True
    # best-ordering symbolic Cholesky of the reduced pattern
    vals = sp.csc_matrix(pat.astype(np.float64))
    vals = vals + sp.diags(np.full(nred, nred * 4.0))
    red_flops = np.inf
    for spec_ in ("COLAMD", "MMD_AT_PLUS_A"):
        try:
            lu = spla.splu(vals, permc_spec=spec_)
            nnzL = np.diff(lu.L.tocsc().indptr).astype(np.float64)
            red_flops = min(red_flops, float(np.sum(nnzL ** 2)))
        except Exception:
            pass
    if not np.isfinite(red_flops):
        red_flops = nred ** 3 / 3.0
    return (upd_flops + red_flops) / (gflops * 1e9)


def time_factorization(prefix, Nstate, Nmeas, Nnz, elim=None):
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

    # FLOP-bound on ANY sparse Cholesky of this system, priced at the
    # machine's measured single-core dense-Cholesky rate (its best
    # case).  With eliminable frame/point blocks the STRUCTURAL bound
    # (_structural_flop_bound) applies: block-elimination update work +
    # the fill-reduced factorization of the reduced system it creates.
    # Without them, the whole-system symbolic-L bound.  CHOLMOD cannot
    # beat either, so this bounds the reference's factorization from
    # below (and the vs_baseline band from above).
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
    t_struct = _structural_flop_bound(JtJ, Nstate, elim or {}, gflops)
    if t_struct is not None:
        # the structural bound is the tighter (larger) honest bound:
        # the whole-system symbolic-L bound prices SuperLU's L, which
        # under-counts the update work of the real elimination
        t_fact_lo = max(t_fact_lo, t_struct)
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
        spec = cfg["spec"]
        off_f = spec.num_states_intrinsics + spec.num_states_extrinsics
        elim = {}
        if spec.num_states_frames:
            elim["frames"] = (off_f, 6, spec.Nframes)
        if spec.num_states_points:
            elim["points"] = (off_f + spec.num_states_frames, 3,
                              spec.Npoints_variable)
        fac = time_factorization(prefix, d["Nstate"], d["Nmeas"],
                                 d["Nnz"], elim=elim)
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
