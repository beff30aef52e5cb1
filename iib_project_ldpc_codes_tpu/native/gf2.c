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
