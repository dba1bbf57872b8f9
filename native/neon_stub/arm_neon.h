/* Minimal arm_neon.h STUB for x86 syntax-checking of the R8BT_NEON
 * guarded blocks in r8bt.cpp (this environment has no ARM toolchain —
 * see the NEON note at the top of r8bt.cpp).  Declares exactly the
 * types/intrinsics those blocks use, with C++-checkable signatures
 * matching the ACLE; values are meaningless, ONLY compilation is
 * exercised (native/Makefile target `neon_syntax`).  NOT installed, NOT
 * shipped, never used at runtime. */
#ifndef R8BT_ARM_NEON_STUB_H
#define R8BT_ARM_NEON_STUB_H

struct float64x2_t {
    double v[2];
};

static inline float64x2_t vld1q_f64(const double *p) {
    return float64x2_t{{p[0], p[1]}};
}
static inline void vst1q_f64(double *p, float64x2_t a) {
    p[0] = a.v[0];
    p[1] = a.v[1];
}
static inline float64x2_t vdupq_n_f64(double x) {
    return float64x2_t{{x, x}};
}
static inline float64x2_t vaddq_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[0] + b.v[0], a.v[1] + b.v[1]}};
}
static inline float64x2_t vsubq_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[0] - b.v[0], a.v[1] - b.v[1]}};
}
static inline float64x2_t vmulq_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[0] * b.v[0], a.v[1] * b.v[1]}};
}
/* acc + a*b */
static inline float64x2_t vfmaq_f64(float64x2_t acc, float64x2_t a,
                                    float64x2_t b) {
    return float64x2_t{{acc.v[0] + a.v[0] * b.v[0],
                        acc.v[1] + a.v[1] * b.v[1]}};
}
/* acc - a*b */
static inline float64x2_t vfmsq_f64(float64x2_t acc, float64x2_t a,
                                    float64x2_t b) {
    return float64x2_t{{acc.v[0] - a.v[0] * b.v[0],
                        acc.v[1] - a.v[1] * b.v[1]}};
}
static inline float64x2_t vnegq_f64(float64x2_t a) {
    return float64x2_t{{-a.v[0], -a.v[1]}};
}
static inline double vaddvq_f64(float64x2_t a) { return a.v[0] + a.v[1]; }
static inline float64x2_t vzip1q_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[0], b.v[0]}};
}
static inline float64x2_t vzip2q_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[1], b.v[1]}};
}
static inline float64x2_t vuzp1q_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[0], b.v[0]}};
}
static inline float64x2_t vuzp2q_f64(float64x2_t a, float64x2_t b) {
    return float64x2_t{{a.v[1], b.v[1]}};
}

#endif /* R8BT_ARM_NEON_STUB_H */
