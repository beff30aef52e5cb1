/* Sequential R-process peeling decoder (host-side hot loop).
 *
 * The one-peel-at-a-time trajectory semantics of the reference
 * (peeling_decoder.py:47-82): repeatedly pick a uniformly random degree-1
 * check, resolve its unique unresolved variable, and record the number of
 * degree-1 checks before each peel.  The trajectory is the statistic of
 * interest (the R-process of finite-length scaling theory), so the loop is
 * inherently sequential per trial -- a poor fit for the TPU, hence native.
 *
 * Unlike the reference's O(n * m) re-strip per peel, this maintains check
 * degrees and the degree-1 set incrementally: O(E) per trial total.
 *
 * Randomness: xorshift64* seeded per trial from (seed, trial) -- fully
 * reproducible, unlike the reference's srand(time(NULL))
 * (random_code_generator.c:23).
 */

#include <stdint.h>
#include <stdlib.h>
#include <string.h>

static inline uint64_t xs64(uint64_t *s) {
    uint64_t x = *s;
    x ^= x >> 12;
    x ^= x << 25;
    x ^= x >> 27;
    *s = x;
    return x * 0x2545F4914F6CDD1DULL;
}

/* Unbiased uniform integer in [0, bound) by rejection. */
static inline uint32_t xs64_below(uint64_t *s, uint32_t bound) {
    uint64_t r, lim = UINT64_MAX - (UINT64_MAX % bound);
    do { r = xs64(s); } while (r >= lim);
    return (uint32_t)(r % bound);
}

/* Decode `trials` erasure patterns over one code.
 *
 * chk_to_var: [m*dc] variable index per check socket
 * var_to_chk: [n*dv] check index per variable socket
 * erased:     [trials*n] 1 = erased
 * unresolved_out: [trials*n] final unresolved mask
 * evolution_out:  [trials*max_evo] degree-1 counts before each peel,
 *                 final 0 appended on success, -1 padded
 * steps_out, num_erasures_out: [trials]
 * Returns 0 on success, -1 on bad arguments.
 */
int peel_decode_trials(const int32_t *chk_to_var, const int32_t *var_to_chk,
                       int32_t n, int32_t m, int32_t dv, int32_t dc,
                       const uint8_t *erased, int32_t trials, uint64_t seed,
                       uint8_t *unresolved_out, int32_t *evolution_out,
                       int32_t max_evo, int32_t *steps_out,
                       int32_t *num_erasures_out) {
    if (n <= 0 || m <= 0 || dv <= 0 || dc <= 0 || trials < 0 ||
        max_evo < 2)
        return -1;
    int32_t *deg = (int32_t *)malloc((size_t)m * sizeof(int32_t));
    int32_t *ones = (int32_t *)malloc((size_t)m * sizeof(int32_t));
    int32_t *pos = (int32_t *)malloc((size_t)m * sizeof(int32_t));
    if (!deg || !ones || !pos) {
        free(deg); free(ones); free(pos);
        return -1;
    }

    for (int32_t t = 0; t < trials; ++t) {
        const uint8_t *er = erased + (size_t)t * n;
        uint8_t *un = unresolved_out + (size_t)t * n;
        int32_t *evo = evolution_out + (size_t)t * max_evo;
        uint64_t rng = seed ^ (0x9E3779B97F4A7C15ULL * (uint64_t)(t + 1));
        if (!rng) rng = 0xD1B54A32D192ED03ULL; /* xorshift fixed point 0 */
        xs64(&rng); /* scramble the seed mix */

        memcpy(un, er, (size_t)n);
        int32_t erasures = 0;
        for (int32_t v = 0; v < n; ++v) erasures += er[v];
        num_erasures_out[t] = erasures;

        /* initial degrees + degree-1 set */
        int32_t ones_count = 0;
        for (int32_t c = 0; c < m; ++c) {
            int32_t d = 0;
            const int32_t *row = chk_to_var + (size_t)c * dc;
            for (int32_t j = 0; j < dc; ++j) d += un[row[j]];
            deg[c] = d;
            pos[c] = -1;
            if (d == 1) {
                pos[c] = ones_count;
                ones[ones_count++] = c;
            }
        }

        int32_t steps = 0;
        while (ones_count > 0 && steps < max_evo - 1) {
            evo[steps] = ones_count;
            int32_t c = ones[xs64_below(&rng, (uint32_t)ones_count)];
            /* unique unresolved participant of c */
            const int32_t *row = chk_to_var + (size_t)c * dc;
            int32_t v = -1;
            for (int32_t j = 0; j < dc; ++j)
                if (un[row[j]]) { v = row[j]; break; }
            un[v] = 0;
            /* update degrees of v's checks; maintain the degree-1 set */
            const int32_t *vcs = var_to_chk + (size_t)v * dv;
            for (int32_t p = 0; p < dv; ++p) {
                int32_t c2 = vcs[p];
                int32_t old = deg[c2]--;
                if (old == 2) {            /* becomes degree 1: insert */
                    pos[c2] = ones_count;
                    ones[ones_count++] = c2;
                } else if (old == 1) {     /* leaves the set: swap-remove */
                    int32_t i = pos[c2];
                    int32_t last = ones[--ones_count];
                    ones[i] = last;
                    pos[last] = i;
                    pos[c2] = -1;
                }
            }
            ++steps;
        }

        int32_t remaining = 0;
        for (int32_t v = 0; v < n; ++v) remaining += un[v];
        if (remaining == 0 && steps < max_evo) {
            evo[steps] = 0; /* reference's final append,
                               peeling_decoder.py:79-80 */
            ++steps;
        }
        steps_out[t] = steps;
        for (int32_t i = steps; i < max_evo; ++i) evo[i] = -1;
    }

    free(deg); free(ones); free(pos);
    return 0;
}
