"""Probe: reference optimal_decode (compiled ml_decoder.c + the galois
pruning loop, parallel_simulator.py:60-129) vs ops.ml.ml_decode.

Measures, per (eps, seed) grid cell at n=96 (and one n=1020 case):
  * trials where the two agree bit-for-bit;
  * trials where they differ: is ours' undetermined set a subset of the
    reference's (the provable direction) and do commonly-determined bits
    agree in value?
  * reference crashes (IndexError / non-convergence of the prune loop).

Run on CPU: python examples/probe_ml_reference.py
"""

import ctypes
import os
import subprocess
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

from iib_project_ldpc_codes_tpu.models import dense_parity_check, sample_code
from iib_project_ldpc_codes_tpu.ops import BEC
from iib_project_ldpc_codes_tpu.ops.ml import ml_decode

REFERENCE = "/root/reference"


def build_ref_lib(tmp):
    so = os.path.join(tmp, "ml_decoder.so")
    subprocess.run(["cc", "-O2", "-shared", "-fPIC",
                    os.path.join(REFERENCE, "ml_decoder.c"), "-o", so],
                   check=True, capture_output=True)
    return ctypes.CDLL(so)


def rref2(mat, ncols):
    """GF(2) reduced row echelon form over the first ncols columns
    (numpy stand-in for galois.GF(2).row_reduce(ncols))."""
    a = np.array(mat, dtype=np.uint8) % 2
    r = 0
    rows = a.shape[0]
    for c in range(min(ncols, a.shape[1])):
        if r >= rows:
            break
        hot = np.nonzero(a[r:, c])[0]
        if hot.size == 0:
            continue
        p = r + hot[0]
        if p != r:
            a[[r, p]] = a[[p, r]]
        elim = np.nonzero(a[:, c])[0]
        elim = elim[elim != r]
        a[elim] ^= a[r]
        r += 1
    return a


def reference_optimal_decode(lib, h, seq, n, k, dv, dc):
    """Faithful reimplementation of regular_LDPC_code.optimal_decode
    (parallel_simulator.py:60-129): C split (ml_decoder.c:7-36) + galois
    pruning loop.  Raises whatever the reference would raise."""
    seq = np.array(seq, dtype=np.int32)
    no_erasures = int(np.count_nonzero(seq == 2))
    if no_erasures == 0 or no_erasures > (n - k):
        return seq.copy()
    target = np.zeros(n - k, dtype=bool)
    remaining = np.zeros(no_erasures * (n - k), dtype=bool)
    hflat = np.ascontiguousarray(h, dtype=bool)
    lib.ml_decode(seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                  target.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  hflat.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  remaining.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  ctypes.c_int(n), ctypes.c_int(dv), ctypes.c_int(dc))
    target = np.array(target, dtype=int)
    remaining = np.array(remaining, dtype=int)
    remaining = np.reshape(remaining, (no_erasures, n - k)).T
    reduced = rref2(np.c_[remaining, target], no_erasures)
    unsolvable = []
    erasure_positions = np.nonzero(seq == 2)[0]
    i = 0
    while np.count_nonzero(
            np.diagonal(reduced[:no_erasures, :-1]) == 1) != (
                no_erasures - len(unsolvable)) and i < 1000:
        first_unknown_index = np.nonzero(
            np.diagonal(reduced[:, :-1]) != 1)[0][0]
        first_unknown_bit = erasure_positions[first_unknown_index]
        erasure_positions = np.delete(erasure_positions, first_unknown_index)
        unsolvable.append(first_unknown_bit)
        checks_to_remove = np.nonzero(remaining[:, first_unknown_index])[0]
        remaining = np.delete(remaining, checks_to_remove, axis=0)
        remaining = np.delete(remaining, first_unknown_index, axis=1)
        target = np.delete(target, checks_to_remove)
        reduced = rref2(np.c_[remaining, target],
                        no_erasures - len(unsolvable))
        i += 1
    solved = list(np.array(
        reduced[:no_erasures - len(unsolvable), -1], dtype=int))
    out = []
    for index, bit in enumerate(seq):
        if bit == 2:
            if index not in unsolvable:
                out.append(solved.pop(0))
            else:
                out.append(2)
        else:
            out.append(int(bit))
    return np.array(out)


def main():
    tmp = tempfile.mkdtemp()
    lib = build_ref_lib(tmp)
    n, dv, dc = 96, 3, 6
    k = n // 2
    trials_per_cell = 50
    stats = dict(total=0, equal=0, diverged=0, crashed=0, not_subset=0,
                 value_mismatch=0, block_mismatch=0)
    for eps in (0.2, 0.35, 0.42, 0.5, 0.65):
        cell_div = 0
        for seed in range(4):
            code = sample_code(jax.random.key(seed), n, dv, dc)
            h = dense_parity_check(code)
            ch = BEC(eps)
            for t in range(trials_per_cell):
                rx = np.asarray(ch.transmit(
                    jax.random.key(10_000 + 1000 * seed + t),
                    jnp.zeros(n, jnp.int32)))
                ours = ml_decode(code, rx, h)
                stats["total"] += 1
                try:
                    ref = reference_optimal_decode(lib, h, rx, n, k, dv, dc)
                except Exception as e:  # noqa: BLE001
                    stats["crashed"] += 1
                    continue
                if np.array_equal(ours, ref):
                    stats["equal"] += 1
                    continue
                stats["diverged"] += 1
                cell_div += 1
                our2 = set(np.nonzero(ours == 2)[0])
                ref2 = set(np.nonzero(ref == 2)[0])
                if not our2 <= ref2:
                    stats["not_subset"] += 1
                both = (ours != 2) & (ref != 2)
                if not np.array_equal(ours[both], ref[both]):
                    stats["value_mismatch"] += 1
                if (len(our2) > 0) != (len(ref2) > 0):
                    stats["block_mismatch"] += 1
        print(f"eps={eps}: diverged {cell_div}")
    print(stats)


if __name__ == "__main__":
    main()
