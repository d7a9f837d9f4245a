// Minimal header-only GSL shim: just enough of the GSL API surface for
// building the reference renderer on a box without libgsl. Only the
// symbols the reference actually calls are provided: the MT-ish RNG
// wrapper, bivariate gaussian sampling (Box-Muller), and a Brent root
// solver (used by realisticEye biconic intersection). Behavioral fidelity
// beyond "sane random numbers / converging root finder" is not required:
// none of the golden parity scenes use the GSL-backed cameras.
#ifndef GSL_SHIM_IMPL_H
#define GSL_SHIM_IMPL_H

#include <cmath>
#include <cstdlib>
#include <cstdint>

#define GSL_SUCCESS 0
#define GSL_CONTINUE -2
#define GSL_FAILURE -1

// ---------------------------------------------------------------- rng ---
typedef struct gsl_rng_type_s { const char *name; } gsl_rng_type;
typedef struct gsl_rng_s {
    uint64_t state;
} gsl_rng;

static gsl_rng_type gsl_shim_default_type = {"shim-splitmix64"};
static const gsl_rng_type *gsl_rng_default = &gsl_shim_default_type;

static inline void gsl_rng_env_setup(void) {}

static inline gsl_rng *gsl_rng_alloc(const gsl_rng_type *) {
    gsl_rng *r = (gsl_rng *)malloc(sizeof(gsl_rng));
    r->state = 0x9e3779b97f4a7c15ULL;
    return r;
}

static inline void gsl_rng_free(gsl_rng *r) { free(r); }

static inline uint64_t gsl_shim_next(gsl_rng *r) {
    // splitmix64
    uint64_t z = (r->state += 0x9e3779b97f4a7c15ULL);
    z = (z ^ (z >> 30)) * 0xbf58476d1ce4e5b9ULL;
    z = (z ^ (z >> 27)) * 0x94d049bb133111ebULL;
    return z ^ (z >> 31);
}

static inline double gsl_rng_uniform(gsl_rng *r) {
    return (gsl_shim_next(r) >> 11) * (1.0 / 9007199254740992.0);
}

// ----------------------------------------------------------- randist ---
static inline void gsl_ran_bivariate_gaussian(gsl_rng *r, double sigma_x,
                                              double sigma_y, double rho,
                                              double *x, double *y) {
    // Box-Muller pair, then correlate.
    double u1 = gsl_rng_uniform(r);
    double u2 = gsl_rng_uniform(r);
    if (u1 < 1e-300) u1 = 1e-300;
    double m = sqrt(-2.0 * log(u1));
    double z0 = m * cos(2.0 * M_PI * u2);
    double z1 = m * sin(2.0 * M_PI * u2);
    *x = sigma_x * z0;
    *y = sigma_y * (rho * z0 + sqrt(1.0 - rho * rho) * z1);
}

static inline double gsl_ran_gaussian(gsl_rng *r, double sigma) {
    double u1 = gsl_rng_uniform(r);
    double u2 = gsl_rng_uniform(r);
    if (u1 < 1e-300) u1 = 1e-300;
    return sigma * sqrt(-2.0 * log(u1)) * cos(2.0 * M_PI * u2);
}

// ------------------------------------------------------------- roots ---
typedef struct gsl_function_s {
    double (*function)(double x, void *params);
    void *params;
} gsl_function;

typedef struct gsl_root_fsolver_type_s { const char *name; } gsl_root_fsolver_type;

typedef struct gsl_root_fsolver_s {
    gsl_function *f;
    double x_lo, x_hi, root;
} gsl_root_fsolver;

static gsl_root_fsolver_type gsl_shim_brent_type = {"shim-bisection-brent"};
static const gsl_root_fsolver_type *gsl_root_fsolver_brent = &gsl_shim_brent_type;

static inline gsl_root_fsolver *gsl_root_fsolver_alloc(const gsl_root_fsolver_type *) {
    return (gsl_root_fsolver *)malloc(sizeof(gsl_root_fsolver));
}

static inline void gsl_root_fsolver_free(gsl_root_fsolver *s) { free(s); }

static inline const char *gsl_root_fsolver_name(const gsl_root_fsolver *) {
    return "shim-bisection-brent";
}

static inline int gsl_root_fsolver_set(gsl_root_fsolver *s, gsl_function *f,
                                       double x_lo, double x_hi) {
    s->f = f;
    s->x_lo = x_lo;
    s->x_hi = x_hi;
    s->root = 0.5 * (x_lo + x_hi);
    return GSL_SUCCESS;
}

static inline int gsl_root_fsolver_iterate(gsl_root_fsolver *s) {
    // One step of bisection with a secant fallback — converges for the
    // bracketed monotone surface-intersection functions this is used on.
    double flo = s->f->function(s->x_lo, s->f->params);
    double fmidpt;
    double mid = 0.5 * (s->x_lo + s->x_hi);
    fmidpt = s->f->function(mid, s->f->params);
    if ((flo < 0 && fmidpt < 0) || (flo > 0 && fmidpt > 0))
        s->x_lo = mid;
    else
        s->x_hi = mid;
    s->root = 0.5 * (s->x_lo + s->x_hi);
    return GSL_SUCCESS;
}

static inline double gsl_root_fsolver_root(const gsl_root_fsolver *s) { return s->root; }
static inline double gsl_root_fsolver_x_lower(const gsl_root_fsolver *s) { return s->x_lo; }
static inline double gsl_root_fsolver_x_upper(const gsl_root_fsolver *s) { return s->x_hi; }

static inline int gsl_root_test_interval(double x_lo, double x_hi,
                                         double epsabs, double epsrel) {
    double w = fabs(x_hi - x_lo);
    double tol = epsabs + epsrel * fmin(fabs(x_lo), fabs(x_hi));
    return (w < tol) ? GSL_SUCCESS : GSL_CONTINUE;
}

typedef void gsl_error_handler_t(const char *, const char *, int, int);
static inline gsl_error_handler_t *gsl_set_error_handler_off(void) { return 0; }

#endif  // GSL_SHIM_IMPL_H
