"""Parity of the ML decoder against the reference's compiled artifact.

Builds ml_decoder.c from the read-only reference checkout and drives the
reference's full optimal_decode pipeline -- the C split into
(target, remaining_parity_checks) (ml_decoder.c:7-36) followed by the
galois row-reduce + unsolvable-column pruning loop
(parallel_simulator.py:60-129), reimplemented here faithfully with a
numpy GF(2) RREF standing in for galois.GF(2).row_reduce -- on the same
codes and channel outputs as ``ops.ml``.

The two algorithms are NOT identical: ours is exact per-bit
marginalisation (a pivot bit is determined iff its RREF row has no free-
column support); the reference instead deletes each free column together
with EVERY check touching it and re-reduces, which can discard the only
checks that determine another bit.  The provable relationship, asserted
bit-for-bit below and measured on a 1000-trial grid
(examples/probe_ml_reference.py: 944 equal / 47 diverged / 9 reference
crashes, zero violations of any invariant):

  1. values agree on every bit both decoders determine;
  2. our undetermined set is a SUBSET of the reference's (the reference
     marks 2 on some ML-determined bits; never the other way);
  3. block-level verdicts (any undetermined bit) are IDENTICAL -- the
     prune loop only fires on trials that already have >= 1 free column,
     so ``optimal_block_error`` statistics match the reference exactly,
     while its bit-level count is inflated by the approximation;
  4. when the prune loop runs zero iterations (H_e full column rank --
     the overwhelmingly common case below threshold), outputs are
     bit-for-bit EQUAL including the {0,1,2} alphabet.

The reference loop can also crash outright (IndexError hunting a free
column when the pruned matrix has fewer rows than columns) -- observed
at eps >= 0.5; such trials are counted and skipped (there is no
reference behaviour to compare against).

Skipped automatically when the reference checkout is absent.
"""

import ctypes
import os
import subprocess

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import dense_parity_check, sample_code
from iib_project_ldpc_codes_tpu.ops import BEC
from iib_project_ldpc_codes_tpu.ops.ml import ml_decode, ml_decode_batch

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "ml_decoder.c")),
    reason="reference checkout not available")


@pytest.fixture(scope="module")
def c_ml(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refml")
    so = tmp / "ml_decoder.so"
    subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC",
         os.path.join(REFERENCE, "ml_decoder.c"), "-o", str(so)],
        check=True, capture_output=True)
    return ctypes.CDLL(str(so))


def _rref2(mat, ncols):
    """GF(2) reduced row echelon form over the first ``ncols`` columns --
    the numpy stand-in for ``galois.GF(2)(...).row_reduce(ncols)``."""
    a = np.array(mat, dtype=np.uint8) % 2
    r = 0
    for c in range(min(ncols, a.shape[1])):
        if r >= a.shape[0]:
            break
        hot = np.nonzero(a[r:, c])[0]
        if hot.size == 0:
            continue
        p = r + hot[0]
        if p != r:
            a[[r, p]] = a[[p, r]]
        elim = np.nonzero(a[:, c])[0]
        a[elim[elim != r]] ^= a[r]
        r += 1
    return a


def reference_optimal_decode(lib, h, seq, n, k, dv, dc):
    """Faithful reimplementation of regular_LDPC_code.optimal_decode
    (parallel_simulator.py:60-129) on top of the compiled ml_decoder.c.

    Returns ``(decoded, prune_iterations)``; raises whatever the
    reference's numpy code would raise (IndexError on the free-column
    hunt when rows < columns after pruning).
    """
    seq = np.array(seq, dtype=np.int32)
    no_erasures = int(np.count_nonzero(seq == 2))
    if no_erasures == 0 or no_erasures > (n - k):
        # parallel_simulator.py:66-69 trivial cases return the input
        return seq.copy(), 0
    target = np.zeros(n - k, dtype=bool)
    remaining = np.zeros(no_erasures * (n - k), dtype=bool)
    hflat = np.ascontiguousarray(h, dtype=bool)
    lib.ml_decode(seq.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
                  target.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  hflat.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  remaining.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
                  ctypes.c_int(n), ctypes.c_int(dv), ctypes.c_int(dc))
    target = np.array(target, dtype=int)
    remaining = np.reshape(np.array(remaining, dtype=int),
                           (no_erasures, n - k)).T
    reduced = _rref2(np.c_[remaining, target], no_erasures)
    unsolvable = []
    erasure_positions = np.nonzero(seq == 2)[0]
    i = 0
    # parallel_simulator.py:96-110 verbatim (numpy RREF for galois)
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
        reduced = _rref2(np.c_[remaining, target],
                         no_erasures - len(unsolvable))
        i += 1
    solved = list(np.array(
        reduced[:no_erasures - len(unsolvable), -1], dtype=int))
    out = []
    for index, bit in enumerate(seq):
        if bit == 2 and index not in unsolvable:
            out.append(solved.pop(0))
        elif bit == 2:
            out.append(2)
        else:
            out.append(int(bit))
    return np.array(out), i


def _assert_parity(ours, ref, prunes, where):
    """The four invariants of the module docstring, bit-for-bit."""
    our2 = ours == 2
    ref2 = ref == 2
    both = ~our2 & ~ref2
    assert np.array_equal(ours[both], ref[both]), \
        f"value mismatch on commonly-determined bits at {where}"
    assert not np.any(our2 & ~ref2), \
        f"reference determined a bit we left undetermined at {where}"
    assert our2.any() == ref2.any(), f"block verdict mismatch at {where}"
    if prunes == 0:
        assert np.array_equal(ours, ref), \
            f"prune-free trial not bit-for-bit equal at {where}"


@pytest.mark.parametrize("eps", [0.2, 0.35, 0.42, 0.5, 0.65])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_ml_matches_reference_pipeline(c_ml, eps, seed):
    n, dv, dc = 96, 3, 6
    k = n // 2
    trials = 24
    code = sample_code(jax.random.key(seed), n, dv, dc)
    h = dense_parity_check(code)
    ch = BEC(eps)
    rx = np.stack([np.asarray(ch.transmit(
        jax.random.key(10_000 + 1000 * seed + t), jnp.zeros(n, jnp.int32)))
        for t in range(trials)]).astype(np.uint8)
    ours_batch = ml_decode_batch(code, rx)      # native bit-packed kernel
    crashed = equal = 0
    for t in range(trials):
        ours = ours_batch[t]
        # the batched native kernel and the dense python path must agree
        # before either is compared to the artifact
        assert np.array_equal(ours, ml_decode(code, rx[t], h))
        try:
            ref, prunes = reference_optimal_decode(
                c_ml, h, rx[t], n, k, dv, dc)
        except IndexError:
            crashed += 1   # genuine reference crash mode (docstring)
            continue
        _assert_parity(np.asarray(ours), ref, prunes,
                       f"eps={eps} seed={seed} trial={t}")
        equal += int(np.array_equal(np.asarray(ours), ref))
    assert crashed <= trials // 4, "reference crashed unexpectedly often"
    if eps <= 0.35:
        # far below threshold H_e is almost surely full column rank:
        # demand bit-for-bit equality on the clear majority of trials
        assert equal >= trials - crashed - 2


def test_ml_reference_parity_larger_code(c_ml):
    n, dv, dc = 1020, 3, 6
    k = n // 2
    code = sample_code(jax.random.key(9), n, dv, dc)
    h = dense_parity_check(code)
    ch = BEC(0.42)
    for t in range(3):
        rx = np.asarray(ch.transmit(jax.random.key(99 + t),
                                    jnp.zeros(n, jnp.int32))).astype(np.uint8)
        ours = np.asarray(ml_decode_batch(code, rx[None, :])[0])
        assert np.array_equal(ours, ml_decode(code, rx, h))
        try:
            ref, prunes = reference_optimal_decode(c_ml, h, rx, n, k, dv, dc)
        except IndexError:
            continue
        _assert_parity(ours, ref, prunes, f"n=1020 trial={t}")
