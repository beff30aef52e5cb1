"""Maximum-likelihood (optimal) BEC decoder via GF(2) elimination.

Reference pipeline: ml_decoder.c:7-36 splits H by the erasure pattern
(erased columns -> the unknowns' system matrix; known columns -> syndrome
accumulation ``target[j] ^= bit & H[j][i]``), then parallel_simulator.py:60-129
row-reduces over GF(2) with the ``galois`` package and iteratively prunes
unsolvable pivot columns.

Re-design: one bit-packed (64 columns/uint64) Gauss-Jordan elimination of
the augmented system [H_e | s]; an erased bit is ML-determined iff its pivot
row has no support on free columns -- the exact per-bit marginalisation the
reference's prune loop approximates.  Undetermined bits remain ERASURE
(= 2), matching the reference's output convention
(parallel_simulator.py:115-127).  Host-side numpy: ML decoding is the
small-n optimality oracle (O(n^3)), not the throughput path (SURVEY.md
native-component summary item 3).
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from ..models.code import LDPCCode, dense_parity_check
from .channels import ERASURE

_WORD = 64


def _pack_rows(mat: np.ndarray) -> np.ndarray:
    """bool[m, c] -> uint64[m, ceil(c/64)], bit j of word w = column 64w+j."""
    m, c = mat.shape
    nw = (c + _WORD - 1) // _WORD
    padded = np.zeros((m, nw * _WORD), dtype=bool)
    padded[:, :c] = mat
    weights = (1 << np.arange(_WORD, dtype=np.uint64))
    return (padded.reshape(m, nw, _WORD).astype(np.uint64) * weights).sum(
        axis=2, dtype=np.uint64)


def _get_col(packed: np.ndarray, j: int) -> np.ndarray:
    return (packed[:, j // _WORD] >> np.uint64(j % _WORD)) & np.uint64(1)


def gf2_row_reduce(aug: np.ndarray, num_cols: int
                   ) -> Tuple[np.ndarray, list]:
    """In-place bit-packed Gauss-Jordan; returns (reduced, pivot_cols).

    ``aug`` is uint64[m, words]; only the first ``num_cols`` columns are
    eligible pivots (the trailing column(s) are the augmented syndrome).
    Dispatches to the native C kernel (native/gf2.c) when available.
    """
    from ..native import gf2_row_reduce_native

    native = gf2_row_reduce_native(aug, num_cols)
    if native is not None:
        aug[:] = native[0]
        return aug, native[1]
    m = aug.shape[0]
    pivots = []
    r = 0
    for c in range(num_cols):
        if r >= m:
            break
        col = _get_col(aug, c)
        hot = np.nonzero(col[r:])[0]
        if hot.size == 0:
            continue
        p = r + hot[0]
        if p != r:
            aug[[r, p]] = aug[[p, r]]
        # eliminate everywhere else (Gauss-Jordan)
        col = _get_col(aug, c).astype(bool)
        col[r] = False
        aug[col] ^= aug[r]
        pivots.append(c)
        r += 1
    return aug, pivots


def _dense_of(code) -> np.ndarray:
    """Dense H for either code family (regular or irregular container)."""
    if hasattr(code, "dv_max"):
        from ..models.irregular import dense_parity_check_irregular

        return dense_parity_check_irregular(code)
    return dense_parity_check(code)


def _real_check_rows(code) -> np.ndarray:
    """chk_to_var rows for the native kernel: the phantom row is dropped
    for irregular codes; padded entries (== n) are skipped by the kernel
    itself (native/gf2.c ml_decode_trials rejects v outside [0, n))."""
    chk = np.asarray(code.chk_to_var)
    return chk[:-1] if hasattr(code, "dv_max") else chk


def ml_decode(code: LDPCCode, channel_output: np.ndarray,
              h: np.ndarray | None = None) -> np.ndarray:
    """Optimal per-bit BEC decode of one word in the {0,1,2} format.

    Trivial-case behaviour matches the reference: 0 erasures or more
    erasures than parity checks -> return the input unchanged
    (parallel_simulator.py:66-69).  Accepts regular and irregular codes.
    """
    if h is None:
        h = _dense_of(code)
    return _ml_decode_dense(np.asarray(h, bool), channel_output)


def _ml_decode_dense(h: np.ndarray, channel_output: np.ndarray
                     ) -> np.ndarray:
    """The elimination core of :func:`ml_decode` on a dense boolean H."""
    rx = np.asarray(channel_output, int)
    erased = rx == ERASURE
    e = int(erased.sum())
    if e == 0 or e > h.shape[0]:
        return rx.copy()

    # Syndrome of the known bits (ml_decoder.c:19-23).  NB: matmul must be
    # over integers -- numpy bool @ bool is OR-accumulation, not GF(2) sum.
    syndrome = (h[:, ~erased].astype(np.int64)
                @ rx[~erased].astype(np.int64)) % 2

    sub = h[:, erased]                       # [m, e]
    aug = np.concatenate([sub, syndrome[:, None].astype(bool)], axis=1)
    packed = _pack_rows(aug)
    packed, pivots = gf2_row_reduce(packed, e)

    # free-column mask at the same packed width as the augmented matrix
    # (e columns + 1 syndrome column; the syndrome bit stays masked out)
    nw = packed.shape[1]
    free = np.zeros(nw * _WORD, dtype=bool)
    free[:e] = True
    free[pivots] = False
    free_mask = _pack_rows(free[None, :])[0]

    values = np.full(e, ERASURE, dtype=int)
    for r, c in enumerate(pivots):
        row = packed[r]
        if np.any(row & free_mask):
            continue  # depends on a free variable: not determined
        values[c] = int(_get_col(packed[r:r + 1], e)[0])

    out = rx.copy()
    out[np.nonzero(erased)[0]] = values
    return out


def ml_decode_batch(code: LDPCCode, channel_outputs: np.ndarray
                    ) -> np.ndarray:
    """Batch of {0,1,2} words -> batched ML decode (one native call).

    Accepts regular and irregular codes (the native kernel skips the
    irregular container's phantom-padding entries)."""
    from ..native import ml_decode_trials_native

    rx = np.asarray(channel_outputs, np.uint8)
    native = ml_decode_trials_native(_real_check_rows(code), code.n, rx)
    if native is not None:
        return native.astype(int)
    h = _dense_of(code)
    return np.stack([ml_decode(code, r, h) for r in channel_outputs])


def ml_decode_batch_ensemble(chk_to_var: np.ndarray, n: int,
                             channel_outputs: np.ndarray) -> np.ndarray:
    """Per-trial codes: ``chk_to_var`` int32[trials, m, dc], one native call.

    Entries outside [0, n) (the irregular container's phantom padding)
    denote absent sockets.  Falls back to a per-trial Python path
    (building each dense H on the fly) when the native library is
    unavailable.
    """
    from ..native import ml_decode_trials_native

    chk = np.asarray(chk_to_var)
    rx = np.asarray(channel_outputs, np.uint8)
    native = ml_decode_trials_native(chk, n, rx)
    if native is not None:
        return native.astype(int)
    trials, m, dc = chk.shape
    rows = np.repeat(np.arange(m), dc)
    out = []
    for t in range(trials):
        h = np.zeros((m, n), bool)
        cols = chk[t].reshape(-1)
        real = (cols >= 0) & (cols < n)
        h[rows[real], cols[real]] = True
        out.append(_ml_decode_dense(h, rx[t]))
    return np.stack(out)


def ml_block_success(code: LDPCCode, erasure_mask: np.ndarray,
                     h: np.ndarray | None = None) -> bool:
    """Fast block-level ML verdict: full recovery iff rank(H_e) == e.

    (Bit-level stats need :func:`ml_decode`; the rank test is enough for
    block error rates and is ~2x faster.)
    """
    erased = np.asarray(erasure_mask, bool)
    e = int(erased.sum())
    if e == 0:
        return True
    if e > code.m:
        return False
    if h is None:
        h = _dense_of(code)
    packed = _pack_rows(h[:, erased])
    from ..native import gf2_rank_native

    rank = gf2_rank_native(packed, e)
    if rank is None:
        _, pivots = gf2_row_reduce(packed, e)
        rank = len(pivots)
    return rank == e
