"""Systematic encoding for LDPC codes.

The reference's ``encode`` is vestigial: its generator-matrix construction
is commented out (simulator.py:53, parallel_simulator.py:47) and every
simulation transmits the all-zero codeword.  Here the capability is real:
a systematic generator is derived from H by bit-packed GF(2) elimination
(reusing the ML decoder's kernel), supporting rank-deficient H (random
configuration-model matrices lose a few ranks with positive probability).

Layout: pivot columns of H carry parity bits, free columns carry the
``k_eff = n - rank(H)`` information bits.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from ..ops.ml import _WORD, _pack_rows, gf2_row_reduce
from .code import LDPCCode, dense_parity_check


@dataclasses.dataclass(frozen=True)
class Encoder:
    """Systematic encoder for one code."""

    n: int
    pivot_cols: np.ndarray        # int[rank]: parity positions
    free_cols: np.ndarray         # int[k_eff]: information positions
    # parity_map[r] = packed row over free columns: parity bit r is the
    # XOR of the info bits selected by this row
    parity_map: np.ndarray        # uint64[rank, words]

    @property
    def k_eff(self) -> int:
        return len(self.free_cols)

    @property
    def rank(self) -> int:
        return len(self.pivot_cols)

    def encode(self, info_bits: np.ndarray) -> np.ndarray:
        """info_bits [..., k_eff] -> codewords [..., n] over GF(2)."""
        info_bits = np.asarray(info_bits, np.uint8) & 1
        if info_bits.shape[-1] != self.k_eff:
            raise ValueError(
                f"need {self.k_eff} information bits, got "
                f"{info_bits.shape[-1]}")
        flat = info_bits.reshape(-1, self.k_eff)
        words = self.parity_map.shape[1]
        packed = np.zeros((flat.shape[0], words), np.uint64)
        for j in range(self.k_eff):
            packed[:, j // _WORD] |= (flat[:, j].astype(np.uint64)
                                      << np.uint64(j % _WORD))
        out = np.zeros((flat.shape[0], self.n), np.uint8)
        out[:, self.free_cols] = flat
        for r, col in enumerate(self.pivot_cols):
            acc = packed & self.parity_map[r]
            bits = np.zeros(flat.shape[0], np.uint64)
            for w in range(words):
                bits ^= acc[:, w]
            # parity of the word popcounts
            parity = np.zeros(flat.shape[0], np.uint8)
            v = bits
            while v.any():
                parity ^= (v & np.uint64(1)).astype(np.uint8)
                v = v >> np.uint64(1)
            out[:, col] = parity
        return out.reshape(info_bits.shape[:-1] + (self.n,))


def make_encoder(code: LDPCCode, h: Optional[np.ndarray] = None) -> Encoder:
    """Derive the systematic encoder from H (the reference's missing
    ``coding_matrix``)."""
    if h is None:
        h = dense_parity_check(code)
    h = np.asarray(h, bool)
    m, n = h.shape
    packed = _pack_rows(h)
    packed, pivots = gf2_row_reduce(packed, n)
    pivots = np.asarray(pivots, int)
    free = np.setdiff1d(np.arange(n), pivots)
    # After Gauss-Jordan, row r reads: x[pivot[r]] + sum_{f in free}
    # R[r, f] x[f] = 0  =>  parity = XOR of selected info bits.
    words = (len(free) + _WORD - 1) // _WORD
    parity_map = np.zeros((len(pivots), words), np.uint64)
    for r in range(len(pivots)):
        for jf, f in enumerate(free):
            bit = (packed[r, f // _WORD] >> np.uint64(f % _WORD)) & np.uint64(1)
            if bit:
                parity_map[r, jf // _WORD] |= np.uint64(1) << np.uint64(
                    jf % _WORD)
    return Encoder(n=n, pivot_cols=pivots, free_cols=free,
                   parity_map=parity_map)
