/* Timing driver for the REFERENCE C optimizer_callback.
 *
 * Purpose: a MEASURED per-iteration baseline for the reference
 * (mrcal_optimize = libdogleg trust-region LM, whose per-iteration cost
 * is one optimizer_callback evaluation + one CHOLMOD factorization of
 * JtJ + a few sparse solves).  libdogleg/CHOLMOD are not in this
 * container, so bench_baseline_c.py measures the two pieces:
 *   - THIS driver times the real compiled optimizer_callback (the
 *     reference's own mrcal.c:4445, built from /root/reference sources
 *     with -O3 -march=native -ffast-math);
 *   - the Python side times a sparse Cholesky of the actual JtJ built
 *     from the CSR Jt this driver writes out.
 *
 * Input: a binary problem dump (see bench_baseline_c.py _dump_problem).
 * Output: one JSON line with per-call times; CSR Jt + x written to
 * argv[2].{x,p,i,v} for the factorization timing.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <time.h>
#include <stdbool.h>
#include <stddef.h>

#include <dogleg.h>   /* the stub: cholmod_sparse layout */
#include "mrcal.h"
#include "internal.h"

static double now_s(void)
{
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return (double)ts.tv_sec + 1e-9 * (double)ts.tv_nsec;
}

static void read_exact(void *dst, size_t n, FILE *fp)
{
    if (fread(dst, 1, n, fp) != n)
    {
        fprintf(stderr, "short read\n");
        exit(1);
    }
}

int main(int argc, char **argv)
{
    if (argc < 4)
    {
        fprintf(stderr,
                "usage: %s problem.bin out_prefix Nrepeats\n", argv[0]);
        return 1;
    }
    FILE *fp = fopen(argv[1], "rb");
    if (!fp) { perror("open dump"); return 1; }
    const char *out_prefix = argv[2];
    int Nrepeat = atoi(argv[3]);

    int32_t hdr[12];
    read_exact(hdr, sizeof(hdr), fp);
    if (hdr[0] != 0x6d726361) { fprintf(stderr, "bad magic\n"); return 1; }
    int Nci = hdr[1], Nce = hdr[2], Nframes = hdr[3], Npoints = hdr[4],
        Npoints_fixed = hdr[5], Nobs_board = hdr[6], Nobs_point = hdr[7],
        Wn = hdr[8], Hn = hdr[9], name_len = hdr[10], Nobs_tri = hdr[11];
    if (name_len < 1 || name_len > 500)
    {
        fprintf(stderr, "bad lensmodel-name length %d in dump\n",
                name_len);
        return 1;
    }
    int32_t sel[8];
    read_exact(sel, sizeof(sel), fp);
    char name[512];
    read_exact(name, (size_t)name_len, fp);
    name[name_len] = 0;
    double spacing;
    read_exact(&spacing, sizeof(double), fp);

    mrcal_lensmodel_t lensmodel;
    if (!mrcal_lensmodel_from_name(&lensmodel, name))
    {
        fprintf(stderr, "bad lensmodel '%s'\n", name);
        return 1;
    }
    int Nintr = mrcal_lensmodel_num_params(&lensmodel);

    int *imagersizes = malloc(sizeof(int) * 2 * (size_t)Nci);
    read_exact(imagersizes, sizeof(int32_t) * 2 * (size_t)Nci, fp);
    double *intrinsics = malloc(sizeof(double) * (size_t)Nci * Nintr);
    read_exact(intrinsics, sizeof(double) * (size_t)Nci * Nintr, fp);
    mrcal_pose_t *extrinsics = malloc(sizeof(mrcal_pose_t) * (Nce ? Nce : 1));
    read_exact(extrinsics, sizeof(double) * 6 * (size_t)Nce, fp);
    mrcal_pose_t *frames = malloc(sizeof(mrcal_pose_t) * (Nframes ? Nframes : 1));
    read_exact(frames, sizeof(double) * 6 * (size_t)Nframes, fp);
    mrcal_point3_t *points = malloc(sizeof(mrcal_point3_t) * (Npoints ? Npoints : 1));
    read_exact(points, sizeof(double) * 3 * (size_t)Npoints, fp);
    mrcal_calobject_warp_t warp;
    read_exact(&warp, sizeof(double) * 2, fp);

    size_t n_obs_pool = (size_t)Nobs_board * Hn * Wn;
    mrcal_point3_t *obs_pool =
        malloc(sizeof(mrcal_point3_t) * (n_obs_pool ? n_obs_pool : 1));
    read_exact(obs_pool, sizeof(double) * 3 * n_obs_pool, fp);
    int32_t *idx = malloc(sizeof(int32_t) * 3 * (size_t)(Nobs_board ? Nobs_board : 1));
    read_exact(idx, sizeof(int32_t) * 3 * (size_t)Nobs_board, fp);

    mrcal_observation_board_t *obs_board =
        malloc(sizeof(mrcal_observation_board_t) * (Nobs_board ? Nobs_board : 1));
    for (int i = 0; i < Nobs_board; i++)
    {
        obs_board[i].iframe          = idx[3 * i + 0];
        obs_board[i].icam.intrinsics = idx[3 * i + 1];
        obs_board[i].icam.extrinsics = idx[3 * i + 2];
    }

    /* triangulated observations: ici, ice, last_in_set, outlier, px[3] */
    mrcal_observation_point_triangulated_t *obs_tri = NULL;
    if (Nobs_tri)
    {
        obs_tri = malloc(sizeof(*obs_tri) * (size_t)Nobs_tri);
        for (int i = 0; i < Nobs_tri; i++)
        {
            int32_t ti[4];
            double px[3];
            read_exact(ti, sizeof(ti), fp);
            read_exact(px, sizeof(px), fp);
            obs_tri[i].icam.intrinsics = ti[0];
            obs_tri[i].icam.extrinsics = ti[1];
            obs_tri[i].last_in_set     = ti[2];
            obs_tri[i].outlier         = ti[3];
            obs_tri[i].px.x = px[0];
            obs_tri[i].px.y = px[1];
            obs_tri[i].px.z = px[2];
        }
    }
    fclose(fp);

    mrcal_problem_selections_t selections = {
        .do_optimize_intrinsics_core        = sel[0],
        .do_optimize_intrinsics_distortions = sel[1],
        .do_optimize_extrinsics             = sel[2],
        .do_optimize_frames                 = sel[3],
        .do_optimize_calobject_warp         = sel[4],
        .do_apply_regularization            = sel[5],
        .do_apply_outlier_rejection         = sel[6],
        .do_apply_regularization_unity_cam01 = sel[7],
    };
    mrcal_problem_constants_t constants = {};

    int Nstate = mrcal_num_states(Nci, Nce, Nframes, Npoints, Npoints_fixed,
                                  Nobs_board, selections, &lensmodel);
    int Nmeas = mrcal_num_measurements(Nobs_board, Nobs_point,
                                       obs_tri, Nobs_tri,
                                       Wn, Hn, Nci, Nce, Nframes,
                                       Npoints, Npoints_fixed,
                                       selections, &lensmodel);
    int Nnz = _mrcal_num_j_nonzero(Nobs_board, Nobs_point,
                                   obs_tri, Nobs_tri,
                                   Wn, Hn, Nci, Nce, Nframes,
                                   Npoints, Npoints_fixed,
                                   obs_board, NULL,
                                   selections, &lensmodel);

    double *b_packed = malloc(sizeof(double) * (size_t)Nstate);
    double *x        = malloc(sizeof(double) * (size_t)Nmeas);
    int    *Jrowptr  = malloc(sizeof(int) * ((size_t)Nmeas + 1));
    int    *Jcolidx  = malloc(sizeof(int) * (size_t)Nnz);
    double *Jval     = malloc(sizeof(double) * (size_t)Nnz);
    cholmod_sparse Jt = {
        .nrow = (size_t)Nstate, .ncol = (size_t)Nmeas,
        .nzmax = (size_t)Nnz,
        .p = Jrowptr, .i = Jcolidx, .x = Jval,
    };

#define CALL(JT)                                                         \
    mrcal_optimizer_callback(b_packed, Nstate * (int)sizeof(double),     \
                             x, Nmeas * (int)sizeof(double), (JT),       \
                             intrinsics, extrinsics, frames, points,     \
                             &warp, Nci, Nce, Nframes, Npoints,          \
                             Npoints_fixed, obs_board, NULL,             \
                             Nobs_board, Nobs_point,                     \
                             obs_tri, Nobs_tri,                          \
                             obs_pool, NULL, &lensmodel, imagersizes,    \
                             selections, &constants, spacing, Wn, Hn,    \
                             false)

    if (!CALL(&Jt))
    {
        fprintf(stderr, "optimizer_callback failed\n");
        return 1;
    }

    /* time with Jacobian (what every libdogleg iteration evaluates) */
    double t0 = now_s();
    for (int i = 0; i < Nrepeat; i++) CALL(&Jt);
    double t_with_J = (now_s() - t0) / Nrepeat;

    /* time without Jacobian (for reference) */
    t0 = now_s();
    for (int i = 0; i < Nrepeat; i++) CALL(NULL);
    double t_no_J = (now_s() - t0) / Nrepeat;

    /* dump CSR Jt + x for the Python factorization timing */
    char path[1024];
    FILE *out;
    snprintf(path, sizeof(path), "%s.meta", out_prefix);
    out = fopen(path, "w");
    fprintf(out, "{\"Nstate\": %d, \"Nmeas\": %d, \"Nnz\": %d}\n",
            Nstate, Nmeas, Nnz);
    fclose(out);
#define DUMP(suffix, ptr, nbytes)                                        \
    do {                                                                 \
        snprintf(path, sizeof(path), "%s.%s", out_prefix, suffix);       \
        out = fopen(path, "wb");                                         \
        fwrite((ptr), 1, (nbytes), out);                                 \
        fclose(out);                                                     \
    } while (0)
    DUMP("x", x, sizeof(double) * (size_t)Nmeas);
    DUMP("p", Jrowptr, sizeof(int) * ((size_t)Nmeas + 1));
    DUMP("i", Jcolidx, sizeof(int) * (size_t)Nnz);
    DUMP("v", Jval, sizeof(double) * (size_t)Nnz);

    printf("{\"t_callback_with_J_s\": %.6e, \"t_callback_no_J_s\": %.6e, "
           "\"Nstate\": %d, \"Nmeas\": %d, \"Nnz\": %d}\n",
           t_with_J, t_no_J, Nstate, Nmeas, Nnz);
    return 0;
}
