/* Native VDkt variable-density k-t mask generator.
 *
 * C twin of dl_swin_gan_tpu/ops/masks.py::VDktMaskFunc (itself the TPU-native
 * counterpart of reference dl_cs/mri/subsample.py:65-254). Mask synthesis is
 * the one inherently sequential, per-example hot path in the host input
 * pipeline, so it gets a native implementation; everything is bit-exact with
 * the Python path, including the RNG: numpy's legacy RandomState (MT19937
 * seeded via init_by_array, doubles via the 53-bit recipe) is reimplemented
 * here so seeded masks match numpy sample for sample.
 *
 * Built as a plain shared library (no pybind11); loaded through ctypes by
 * dl_swin_gan_tpu/ops/native.py.
 */

#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* ------------------------------------------------------------------ MT19937
 * Standard Mersenne Twister, matching numpy's randomkit exactly. */

#define MT_N 624
#define MT_M 397
#define MATRIX_A 0x9908b0dfUL
#define UPPER_MASK 0x80000000UL
#define LOWER_MASK 0x7fffffffUL

typedef struct {
    uint32_t key[MT_N];
    int pos;
} mt_state;

static void mt_init_genrand(mt_state *st, uint32_t s) {
    st->key[0] = s;
    for (int i = 1; i < MT_N; i++) {
        st->key[i] = (uint32_t)(1812433253UL * (st->key[i - 1]
                     ^ (st->key[i - 1] >> 30)) + (uint32_t)i);
    }
    st->pos = MT_N;
}

static void mt_init_by_array(mt_state *st, const uint32_t *init_key,
                             int key_length) {
    int i = 1, j = 0;
    mt_init_genrand(st, 19650218UL);
    int k = (MT_N > key_length) ? MT_N : key_length;
    for (; k; k--) {
        st->key[i] = (uint32_t)((st->key[i] ^ ((st->key[i - 1]
                      ^ (st->key[i - 1] >> 30)) * 1664525UL))
                      + init_key[j] + (uint32_t)j);
        i++; j++;
        if (i >= MT_N) { st->key[0] = st->key[MT_N - 1]; i = 1; }
        if (j >= key_length) j = 0;
    }
    for (k = MT_N - 1; k; k--) {
        st->key[i] = (uint32_t)((st->key[i] ^ ((st->key[i - 1]
                      ^ (st->key[i - 1] >> 30)) * 1566083941UL)) - (uint32_t)i);
        i++;
        if (i >= MT_N) { st->key[0] = st->key[MT_N - 1]; i = 1; }
    }
    st->key[0] = 0x80000000UL;
    st->pos = MT_N;
}

static uint32_t mt_next(mt_state *st) {
    uint32_t y;
    if (st->pos >= MT_N) {
        int kk;
        for (kk = 0; kk < MT_N - MT_M; kk++) {
            y = (st->key[kk] & UPPER_MASK) | (st->key[kk + 1] & LOWER_MASK);
            st->key[kk] = st->key[kk + MT_M] ^ (y >> 1)
                          ^ (-(int32_t)(y & 1) & MATRIX_A);
        }
        for (; kk < MT_N - 1; kk++) {
            y = (st->key[kk] & UPPER_MASK) | (st->key[kk + 1] & LOWER_MASK);
            st->key[kk] = st->key[kk + (MT_M - MT_N)] ^ (y >> 1)
                          ^ (-(int32_t)(y & 1) & MATRIX_A);
        }
        y = (st->key[MT_N - 1] & UPPER_MASK) | (st->key[0] & LOWER_MASK);
        st->key[MT_N - 1] = st->key[MT_M - 1] ^ (y >> 1)
                            ^ (-(int32_t)(y & 1) & MATRIX_A);
        st->pos = 0;
    }
    y = st->key[st->pos++];
    y ^= y >> 11;
    y ^= (y << 7) & 0x9d2c5680UL;
    y ^= (y << 15) & 0xefc60000UL;
    y ^= y >> 18;
    return y;
}

/* numpy rk_double: 53-bit resolution double in [0, 1) */
static double mt_double(mt_state *st) {
    uint32_t a = mt_next(st) >> 5, b = mt_next(st) >> 6;
    return (a * 67108864.0 + b) / 9007199254740992.0;
}

/* numpy-compatible round-half-to-even */
static double np_round(double x) {
    double r = floor(x);
    double d = x - r;
    if (d > 0.5) return r + 1.0;
    if (d < 0.5) return r;
    /* exactly .5: to even */
    return (fmod(r, 2.0) == 0.0) ? r : r + 1.0;
}

static double clampd(double v, double lo, double hi) {
    return v < lo ? lo : (v > hi ? hi : v);
}

/* ------------------------------------------------------------------ vdkt */

/* Sort |ySamp| ascending carrying values; insertion w/ index tiebreak keeps
 * the original order on (measure-zero) ties like a stable argsort. */
static void sort_by_abs(double *v, int n) {
    for (int i = 1; i < n; i++) {
        double key = v[i];
        int j = i - 1;
        while (j >= 0 && fabs(v[j]) > fabs(key)) { v[j + 1] = v[j]; j--; }
        v[j + 1] = key;
    }
}


/* numpy indexing semantics for ktMask[yEdge, t]: a negative index wraps
 * once (ktMask[-1] is the last row); anything still out of [0, ny) is an
 * IndexError in the Python/reference path, surfaced here as -1 so the
 * wrapper can raise the same error instead of corrupting the heap. */
static long np_idx(long i, long n) {
    long w = i < 0 ? i + n : i;
    return (w < 0 || w >= n) ? -1 : w;
}

/* Generate one ky-t mask [ny, nt] (row-major float32). Matches
 * VDktMaskFunc._vdkt / reference subsample.py:122-221 exactly. */
static int vdkt_core(mt_state *rng, float *ktMask, long ny, long nt,
                      double accel, long nCal, double vdDegree,
                      double vdFactor_in, double perturbFactor,
                      double adhereFactor) {
    if (vdDegree < 0.0) vdDegree = 0.0;
    perturbFactor = clampd(perturbFactor, 0.0, 1.0);
    adhereFactor = clampd(adhereFactor, 0.0, 1.0);
    if (nCal < 0) nCal = 0;

    double vdFactor = (vdFactor_in <= 0.0 || vdFactor_in > accel)
                      ? accel : vdFactor_in;
    long yCent = (long)floor(ny / 2.0);
    double yRadius = (ny - 1) / 2.0;
    if (vdDegree > 0) vdFactor = pow(vdFactor, 1.0 / vdDegree);
    double aCoef = (vdFactor - 1.0) / vdFactor;
    double bCoef = 1.0 / vdFactor;

    memset(ktMask, 0, sizeof(float) * (size_t)(ny * nt));

    double *ySamp = (double *)malloc(sizeof(double) * (size_t)(ny + 4));

    for (long t = 0; t < nt; t++) {
        double shift = fmod(np_round(t * 0.618034 * accel), accel);
        /* np.arange semantics: count = ceil((stop-start)/step), value by
         * multiplication (not accumulation) to match numpy bit for bit */
        long nSamp = (long)ceil(((double)ny - shift) / accel);
        if (nSamp < 0) nSamp = 0;
        for (long n = 0; n < nSamp; n++)
            ySamp[n] = shift + (double)n * accel;

        if (perturbFactor > 0) {
            for (long n = 0; n < nSamp; n++) {
                if (ySamp[n] < perturbFactor * accel
                    || ySamp[n] >= ny - perturbFactor * accel) continue;
                double dy = perturbFactor * accel * (mt_double(rng) - 0.5);
                ySamp[n] += dy;
                if (n > 0) ySamp[n - 1] += adhereFactor * dy;
                if (n < nSamp - 1) ySamp[n + 1] += adhereFactor * dy;
            }
        }

        for (long n = 0; n < nSamp; n++) {
            double v = clampd(ySamp[n], 0.0, (double)(ny - 1));
            v = (v - yRadius) / yRadius;
            ySamp[n] = v * pow(aCoef * fabs(v) + bCoef, vdDegree);
        }

        sort_by_abs(ySamp, (int)nSamp);

        /* indices of non-negative (upper) and negative (lower) samples in
         * sorted-by-|.| order, preserving that order */
        /* upper half: fit to Cartesian grid from the center out */
        double yAdj = 1.0, yOff = 0.0;
        long yEdge = -1;
        int first = 1;
        for (long n = 0; n < nSamp; n++) {
            if (ySamp[n] < 0) continue;
            if (first) {
                yEdge = (long)floor(ySamp[n] * yRadius + yRadius + 0.0001);
                first = 0;
            }
            long yLoc = (long)floor((yOff + (ySamp[n] - yOff) * yAdj)
                                    * yRadius + yRadius + 0.0001);
            if (yLoc > ny - 1) yLoc = ny - 1;
            if (ktMask[yLoc * nt + t] == 0.0f) {
                ktMask[yLoc * nt + t] = 1.0f;
                yEdge = yLoc + 1;
            } else {
                long yw = np_idx(yEdge, ny);
                if (yw < 0) { free(ySamp); return -1; }
                ktMask[yw * nt + t] = 1.0f;
                yOff = ySamp[n];
                yAdj = (yRadius - (double)(yEdge - yRadius))
                       / (yRadius * (1 - fabs(yOff)));
                yEdge += 1;
            }
        }

        /* lower half */
        yAdj = 1.0; yOff = 0.0; first = 1; yEdge = -1;
        for (long n = 0; n < nSamp; n++) {
            if (ySamp[n] >= 0) continue;
            if (first) {
                yEdge = (long)floor(ySamp[n] * yRadius + yRadius + 0.0001);
                long yw0 = np_idx(yEdge, ny);
                if (yw0 < 0) { free(ySamp); return -1; }
                if (ktMask[yw0 * nt + t] == 1.0f) {
                    yEdge -= 1;
                    yOff = ySamp[n];
                    yAdj = (yRadius + (double)(yEdge - yRadius))
                           / (yRadius * (1.0 - fabs(yOff)));
                }
                first = 0;
            }
            long yLoc = (long)floor((yOff + (ySamp[n] - yOff) * yAdj)
                                    * yRadius + yRadius + 0.0001);
            if (yLoc < 0) yLoc = 0;
            if (ktMask[yLoc * nt + t] == 0.0f) {
                ktMask[yLoc * nt + t] = 1.0f;
                yEdge = yLoc + 1;
            } else {
                long yw = np_idx(yEdge, ny);
                if (yw < 0) { free(ySamp); return -1; }
                ktMask[yw * nt + t] = 1.0f;
                yOff = ySamp[n];
                yAdj = (yRadius - (double)(yEdge - yRadius))
                       / (yRadius * (1 - fabs(yOff)));
                yEdge -= 1;
            }
        }
    }

    /* calibration rows [yCent - ceil(nCal/2), yCent + nCal - 1 - ceil(nCal/2)) */
    long c0 = yCent - (long)ceil(nCal / 2.0);
    long c1 = yCent + nCal - 1 - (long)ceil(nCal / 2.0);
    for (long y = c0; y < c1; y++)
        if (y >= 0 && y < ny)
            for (long t = 0; t < nt; t++) ktMask[y * nt + t] = 1.0f;

    free(ySamp);
    return 0;
}

/* Full VDktMaskFunc.__call__ sequence: seed -> choose acceleration ->
 * vdkt (or partial-ky binary search) -> partial-kx broadcast.
 * out: [nphases, nky, nkx] float32 row-major.  Returns the acceleration. */
double vdkt_mask(float *out, long nkx, long nky, long nphases,
                 double accel_lo, double accel_hi,
                 double sim_partial_kx, double sim_partial_ky,
                 const uint32_t *seed_key, long key_len, int scalar_seed) {
    /* numpy legacy seeding: scalar int < 2^32 -> init_genrand; sequences
     * (e.g. tuple(map(ord, fname))) -> init_by_array */
    mt_state rng;
    if (scalar_seed)
        mt_init_genrand(&rng, seed_key[0]);
    else
        mt_init_by_array(&rng, seed_key, (int)key_len);

    double accel = accel_lo + (accel_hi - accel_lo) * mt_double(&rng);

    float *kt = (float *)malloc(sizeof(float) * (size_t)(nky * nphases));

    if (sim_partial_ky > 0.0) {
        /* binary search (reference subsample.py:223-254) */
        double lo = 1.0, hi = accel, act = 1.0;
        long nyMask = (long)(nky * sim_partial_ky);
        for (int it = 0; it < 10 && fabs(act - accel) > 0.1; it++) {
            double cur = 0.5 * (lo + hi);
            if (vdkt_core(&rng, kt, nky, nphases, cur, 1, 1.5, -1.0,
                          0.4, 0.33) != 0) { free(kt); return -1.0; }
            for (long y = nky - nyMask; y < nky; y++)
                for (long t = 0; t < nphases; t += 2) kt[y * nphases + t] = 0;
            for (long y = 0; y < nyMask; y++)
                for (long t = 1; t < nphases; t += 2) kt[y * nphases + t] = 0;
            double s = 0;
            for (long i = 0; i < nky * nphases; i++) s += kt[i];
            act = (double)(nky * nphases) / s;
            if (act < accel) lo = cur; else hi = cur;
        }
    } else {
        if (vdkt_core(&rng, kt, nky, nphases, accel, 1, 1.5, -1.0,
                      0.4, 0.33) != 0) { free(kt); return -1.0; }
    }

    /* broadcast over kx with partial-echo zeroing; kt is [ky, t];
     * out is [t, ky, kx] */
    long kx0 = (long)(sim_partial_kx * nkx);
    for (long t = 0; t < nphases; t++)
        for (long y = 0; y < nky; y++) {
            float val = kt[y * nphases + t];
            for (long x = 0; x < nkx; x++)
                out[(t * nky + y) * nkx + x] = (x < kx0) ? 0.0f : val;
        }

    free(kt);
    return accel;
}
