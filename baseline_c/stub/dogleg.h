/* Minimal stand-in for libdogleg's public header, JUST enough to compile
   the reference's mrcal.c in this container (no libdogleg/CHOLMOD here).

   Purpose: build the reference's own optimizer_callback -- the hot
   function of its solve loop (mrcal.c:4445) -- so bench_baseline_c.py can
   MEASURE the C per-iteration cost on the BASELINE scenes instead of
   modeling it.  The dogleg driver entry points are stubbed to abort:
   only mrcal_optimizer_callback() is exercised, which touches none of
   them at runtime.

   The declarations mirror libdogleg's public API (dogleg.h of
   https://github.com/dkogan/libdogleg) structurally; only the fields
   mrcal.c actually references exist here. */
#pragma once
#include <stdlib.h>
#include <stdio.h>

/* CHOLMOD stand-in: mrcal.c's callback only reads Jt->p / Jt->i / Jt->x.
   The struct TAG must match CHOLMOD's (mrcal.h forward-declares
   `struct cholmod_sparse_struct`). */
typedef struct cholmod_sparse_struct
{
    size_t nrow, ncol, nzmax;
    void *p;   /* column pointers (int) */
    void *i;   /* row indices (int)     */
    void *x;   /* values (double)       */
    int stype, itype, xtype, dtype, sorted, packed;
} cholmod_sparse;

#define DOGLEG_DEBUG_VNLOG (1 << 30)

typedef struct
{
    int    dogleg_debug;
    double Jt_x_threshold;
    double update_threshold;
    double trustregion_threshold;
    int    max_iterations;
    double trustregion0;
    double trustregion_decrease_factor;
    double trustregion_decrease_threshold;
    double trustregion_increase_factor;
    double trustregion_increase_threshold;
} dogleg_parameters2_t;

typedef struct
{
    double *p;   /* current packed state  */
    double *x;   /* current residuals     */
    /* (libdogleg has much more; mrcal.c reads only p and x) */
} dogleg_operatingPoint_t;

typedef struct
{
    dogleg_operatingPoint_t *beforeStep;
    dogleg_operatingPoint_t *afterStep;
} dogleg_solverContext_t;

typedef void(dogleg_callback_t)(const double *p, double *x,
                                cholmod_sparse *Jt, void *cookie);
typedef void(dogleg_callback_dense_t)(const double *p, double *x,
                                      double *J, void *cookie);
typedef double(dogleg_getOutliernessScale_callback_t)(void);

static inline void dogleg_getDefaultParameters(dogleg_parameters2_t *p)
{
    p->dogleg_debug = 0;
    p->Jt_x_threshold = 1e-8;
    p->update_threshold = 1e-8;
    p->trustregion_threshold = 1e-8;
    p->max_iterations = 100;
    p->trustregion0 = 1e3;
    p->trustregion_decrease_factor = 0.1;
    p->trustregion_decrease_threshold = 0.25;
    p->trustregion_increase_factor = 2.0;
    p->trustregion_increase_threshold = 0.75;
}

#define _DOGLEG_STUB_ABORT(name)                                        \
    do {                                                                \
        fprintf(stderr, "dogleg stub: %s called; libdogleg is not "     \
                        "available in this container\n", name);         \
        abort();                                                        \
    } while (0)

static inline double dogleg_optimize2(
    double *p, unsigned int Nstate, unsigned int Nmeas,
    unsigned int NJnnz, dogleg_callback_t *f, void *cookie,
    const dogleg_parameters2_t *parameters,
    dogleg_solverContext_t **returnContext)
{
    (void)p; (void)Nstate; (void)Nmeas; (void)NJnnz; (void)f;
    (void)cookie; (void)parameters; (void)returnContext;
    _DOGLEG_STUB_ABORT("dogleg_optimize2");
    return -1.0;
}

static inline double dogleg_optimize_dense2(
    double *p, unsigned int Nstate, unsigned int Nmeas,
    dogleg_callback_dense_t *f, void *cookie,
    const dogleg_parameters2_t *parameters,
    dogleg_solverContext_t **returnContext)
{
    (void)p; (void)Nstate; (void)Nmeas; (void)f; (void)cookie;
    (void)parameters; (void)returnContext;
    _DOGLEG_STUB_ABORT("dogleg_optimize_dense2");
    return -1.0;
}

static inline void dogleg_freeContext(dogleg_solverContext_t **ctx)
{
    (void)ctx;
}

static inline void dogleg_testGradient(
    unsigned int ivar, const double *p, unsigned int Nstate,
    unsigned int Nmeas, unsigned int NJnnz, dogleg_callback_t *f,
    void *cookie)
{
    (void)ivar; (void)p; (void)Nstate; (void)Nmeas; (void)NJnnz;
    (void)f; (void)cookie;
    _DOGLEG_STUB_ABORT("dogleg_testGradient");
}

static inline void dogleg_markOutliers(void) { _DOGLEG_STUB_ABORT("dogleg_markOutliers"); }
static inline void dogleg_reportOutliers(
    dogleg_getOutliernessScale_callback_t *getScale, double *scale,
    unsigned int Nfeature_measurements, unsigned int Nfeatures,
    unsigned int Noutliers, dogleg_operatingPoint_t *point,
    dogleg_solverContext_t *ctx)
{
    (void)getScale; (void)scale; (void)Nfeature_measurements;
    (void)Nfeatures; (void)Noutliers; (void)point; (void)ctx;
    _DOGLEG_STUB_ABORT("dogleg_reportOutliers");
}
