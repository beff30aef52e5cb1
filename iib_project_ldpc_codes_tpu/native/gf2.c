/* Bit-packed GF(2) Gauss-Jordan elimination.
 *
 * Native replacement for the Python/`galois` row-reduce loop the reference
 * leans on (parallel_simulator.py:89-109) and the hot path of our ML
 * decoder (ops/ml.py): rows are uint64 words, 64 matrix columns per word.
 * Column j lives in bit (j % 64) of word (j / 64) -- the same layout as
 * ops/ml.py's _pack_rows.
 *
 * gf2_row_reduce: in-place Gauss-Jordan over the first num_cols columns of
 * the augmented matrix aug[rows][words]; writes pivot column indices into
 * pivots (caller-allocated, capacity >= min(rows, num_cols)) and returns
 * the rank.
 */

#include <stdint.h>
#include <string.h>

static inline int get_bit(const uint64_t *row, int col) {
    return (int)((row[col >> 6] >> (col & 63)) & 1u);
}

int gf2_row_reduce(uint64_t *aug, int rows, int words, int num_cols,
                   int *pivots) {
    int r = 0;
    for (int c = 0; c < num_cols && r < rows; c++) {
        /* find pivot row */
        int p = -1;
        for (int i = r; i < rows; i++) {
            if (get_bit(aug + (size_t)i * words, c)) { p = i; break; }
        }
        if (p < 0) continue;
        if (p != r) {
            for (int w = 0; w < words; w++) {
                uint64_t tmp = aug[(size_t)r * words + w];
                aug[(size_t)r * words + w] = aug[(size_t)p * words + w];
                aug[(size_t)p * words + w] = tmp;
            }
        }
        /* eliminate everywhere else (Gauss-Jordan) */
        const uint64_t *piv = aug + (size_t)r * words;
        for (int i = 0; i < rows; i++) {
            if (i == r) continue;
            uint64_t *row = aug + (size_t)i * words;
            if (get_bit(row, c)) {
                for (int w = 0; w < words; w++) row[w] ^= piv[w];
            }
        }
        pivots[r++] = c;
    }
    return r;
}

/* rank-only variant (no pivot bookkeeping, forward elimination only). */
int gf2_rank(uint64_t *mat, int rows, int words, int num_cols) {
    int r = 0;
    for (int c = 0; c < num_cols && r < rows; c++) {
        int p = -1;
        for (int i = r; i < rows; i++) {
            if (get_bit(mat + (size_t)i * words, c)) { p = i; break; }
        }
        if (p < 0) continue;
        if (p != r) {
            for (int w = 0; w < words; w++) {
                uint64_t tmp = mat[(size_t)r * words + w];
                mat[(size_t)r * words + w] = mat[(size_t)p * words + w];
                mat[(size_t)p * words + w] = tmp;
            }
        }
        const uint64_t *piv = mat + (size_t)r * words;
        for (int i = r + 1; i < rows; i++) {
            uint64_t *row = mat + (size_t)i * words;
            if (get_bit(row, c)) {
                for (int w = 0; w < words; w++) row[w] ^= piv[w];
            }
        }
        r++;
    }
    return r;
}

#include <stdlib.h>

/* Batched ML (optimal) BEC decode over sparse check->variable tables.
 *
 * The whole per-trial pipeline of ops/ml.py's ml_decode -- syndrome of the
 * known bits (ml_decoder.c:19-23 role), bit-packed Gauss-Jordan on the
 * erased columns, per-pivot free-column marginalisation -- in one native
 * call over a batch of trials, removing the per-trial Python/numpy
 * overhead of the host ML driver (reference parallel_simulator.py:60-129).
 * Works from the edge-list form directly (chk_to_var, the framework's
 * primary code structure), so per-trial setup is O(n + m*dc), not the
 * O(m*n) a dense H scan would cost.
 *
 * Semantics match the dense BOOLEAN parity-check matrix
 * (models/code.py dense_parity_check): a variable repeated within a check
 * row counts once, hence the in-row dedup below.  The samplers emit
 * simple rows, but their bounded-retry fallbacks may not.
 *
 * chk: [c_count][m][dc] check->variable table (int32); c_count == 1
 *      (fixed code) or == trials (fresh code per trial).  Entries
 *      outside [0, n) denote absent sockets (irregular phantom
 *      padding) and are skipped.
 * rx:  [trials][n] received words, 0/1/2 (2 = erasure).
 * out: [trials][n] decoded words, 0/1/2 (2 = ML-undetermined).
 * Returns 0 on success, -1 on bad arguments / allocation failure.
 */
int ml_decode_trials(const int32_t *chk, int32_t c_count, int32_t m,
                     int32_t dc, int32_t n, const uint8_t *rx,
                     int32_t trials, uint8_t *out) {
    if (m <= 0 || n <= 0 || dc <= 0 || trials < 0 ||
        (c_count != 1 && c_count != trials))
        return -1;
    int32_t max_words = (n + 1 + 63) / 64;
    uint64_t *aug = (uint64_t *)malloc((size_t)m * max_words * 8);
    uint64_t *free_mask = (uint64_t *)malloc((size_t)max_words * 8);
    int *pivots = (int *)malloc((size_t)(m < n ? m : n) * sizeof(int));
    int32_t *eidx = (int32_t *)malloc((size_t)n * sizeof(int32_t));
    int32_t *epos = (int32_t *)malloc((size_t)n * sizeof(int32_t));
    if (!aug || !free_mask || !pivots || !eidx || !epos) {
        free(aug); free(free_mask); free(pivots); free(eidx); free(epos);
        return -1;
    }

    for (int32_t t = 0; t < trials; ++t) {
        const int32_t *ct = chk + (c_count == 1 ? 0 : (size_t)t * m * dc);
        const uint8_t *r = rx + (size_t)t * n;
        uint8_t *o = out + (size_t)t * n;
        memcpy(o, r, (size_t)n);

        int32_t e = 0;
        for (int32_t v = 0; v < n; ++v) {
            eidx[v] = (r[v] == 2) ? e : -1;
            if (r[v] == 2) epos[e++] = v;
        }
        /* trivial cases: reference parallel_simulator.py:66-69 */
        if (e == 0 || e > m) continue;

        /* augmented [H_e | s], bit-packed 64 columns/word, built straight
         * from the edge list; syndrome accumulates in the same pass */
        int32_t words = (e + 1 + 63) / 64;
        memset(aug, 0, (size_t)m * words * 8);
        for (int32_t c = 0; c < m; ++c) {
            const int32_t *row = ct + (size_t)c * dc;
            uint64_t *arow = aug + (size_t)c * words;
            int s = 0;
            for (int32_t j = 0; j < dc; ++j) {
                int32_t v = row[j];
                /* entries outside [0, n) denote absent sockets (the
                 * irregular container's phantom padding,
                 * models/irregular.py): skip them */
                if (v < 0 || v >= n)
                    continue;
                int dup = 0;  /* dense-bool semantics: count (c,v) once */
                for (int32_t j2 = 0; j2 < j; ++j2)
                    if (row[j2] == v) { dup = 1; break; }
                if (dup) continue;
                if (eidx[v] >= 0)
                    arow[eidx[v] >> 6] |= 1ULL << (eidx[v] & 63);
                else
                    s ^= (r[v] == 1);
            }
            if (s)
                arow[e >> 6] |= 1ULL << (e & 63);
        }

        int rank = gf2_row_reduce(aug, m, words, e, pivots);

        /* free-column mask over the e unknown columns */
        memset(free_mask, 0, (size_t)words * 8);
        for (int32_t j = 0; j < e; ++j)
            free_mask[j >> 6] |= 1ULL << (j & 63);
        for (int32_t p = 0; p < rank; ++p)
            free_mask[pivots[p] >> 6] &= ~(1ULL << (pivots[p] & 63));

        /* a pivot bit is ML-determined iff its row has no free support */
        for (int32_t p = 0; p < rank; ++p) {
            const uint64_t *row = aug + (size_t)p * words;
            uint64_t dep = 0;
            for (int32_t w = 0; w < words; ++w)
                dep |= row[w] & free_mask[w];
            if (!dep)
                o[epos[pivots[p]]] =
                    (uint8_t)((row[e >> 6] >> (e & 63)) & 1u);
        }
    }

    free(aug); free(free_mask); free(pivots); free(eidx); free(epos);
    return 0;
}
