"""Distributional parity of the ensemble sampler vs the compiled
reference generator (random_code_generator.c:21-67).

The reference binary cannot be seed-matched -- its ``seed`` parameter is
dead code (random_code_generator.c:22-25 calls srand(time(NULL)) on the
first run and never reads ``seed``) -- so the comparison is
distributional: draw ~4000 codes from each sampler at a tiny size
(n=8, dv=2, dc=4: C(8,4)=70 possible first-check variable sets) and
chi-square-test homogeneity of

  1. the first check's variable-set (multiset category, 70 cells), and
  2. the per-code count of check pairs sharing >= 2 variables (the
     statistic that separates simplicity-conditioned ensembles from
     raw/repaired ones),

between the reference stream and ``sample_check_table(method="reject")``
-- the mode claimed to be *exactly* the reference distribution (uniform
over simple configurations).  Determinism: the reference stream is made
reproducible by calling libc ``srand`` directly with a fixed value and
invoking the generator with ``first_run=False``; the same trick proves
the seed bug (two calls with different ``seed`` arguments after
identical ``srand`` produce identical codes).

Skipped automatically when the reference checkout is absent.
"""

import ctypes
import os
import subprocess
from collections import Counter

import jax
import numpy as np
import pytest

chi2_dist = pytest.importorskip("scipy.stats").chi2

from iib_project_ldpc_codes_tpu.models.ensemble import sample_check_table

REFERENCE = "/root/reference"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(REFERENCE, "random_code_generator.c")),
    reason="reference checkout not available")

N, DV, DC = 8, 2, 4
M = N * DV // DC
SAMPLES = 4000


@pytest.fixture(scope="module")
def ref_gen(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("refgen")
    so = tmp / "random_code_generator.so"
    subprocess.run(
        ["cc", "-O2", "-shared", "-fPIC",
         os.path.join(REFERENCE, "random_code_generator.c"), "-o", str(so)],
        check=True, capture_output=True)
    lib = ctypes.CDLL(str(so))
    lib.generate_random_code.restype = ctypes.c_int
    return lib


def _draw_reference(lib, seed_param=0):
    """One generate_random_code call (first_run=False: srand untouched)."""
    variable_lookup = np.zeros(N * DV, np.int32)
    check_lookup = np.zeros(N * DV, np.int32)
    sequence = np.arange(N * DV, dtype=np.int32)
    parity = np.zeros(M * N, bool)
    ip = ctypes.POINTER(ctypes.c_int)
    ok = lib.generate_random_code(
        ctypes.c_int(N), ctypes.c_int(DV), ctypes.c_int(DC),
        variable_lookup.ctypes.data_as(ip),
        check_lookup.ctypes.data_as(ip),
        sequence.ctypes.data_as(ip),
        parity.ctypes.data_as(ctypes.POINTER(ctypes.c_bool)),
        ctypes.c_int(0), ctypes.c_bool(False), ctypes.c_int(seed_param))
    assert ok == 1
    return check_lookup.reshape(M, DC)


def _libc():
    return ctypes.CDLL(None)


def _pair_overlap_count(table: np.ndarray) -> int:
    """#check pairs sharing >= 2 variables (simple codes only below)."""
    rows = [set(r.tolist()) for r in table]
    return sum(len(rows[i] & rows[j]) >= 2
               for i in range(M) for j in range(i + 1, M))


def _chi2_homogeneity(counts_a: Counter, counts_b: Counter,
                      min_expected: float = 5.0):
    """(statistic, dof, p) for a 2-row homogeneity table; cells whose
    pooled expected count is below ``min_expected`` are merged."""
    cats = sorted(set(counts_a) | set(counts_b))
    a = np.array([counts_a.get(c, 0) for c in cats], float)
    b = np.array([counts_b.get(c, 0) for c in cats], float)
    na, nb = a.sum(), b.sum()
    pooled = a + b
    # merge sparse cells into one tail cell to keep the chi2
    # approximation honest
    small = pooled * min(na, nb) / (na + nb) < min_expected
    if small.any():
        a = np.append(a[~small], a[small].sum())
        b = np.append(b[~small], b[small].sum())
        pooled = a + b
    keep = pooled > 0
    a, b, pooled = a[keep], b[keep], pooled[keep]
    ea = pooled * na / (na + nb)
    eb = pooled * nb / (na + nb)
    stat = float((((a - ea) ** 2) / ea).sum() + (((b - eb) ** 2) / eb).sum())
    dof = len(pooled) - 1
    return stat, dof, float(chi2_dist.sf(stat, dof))


def test_reference_seed_parameter_is_dead(ref_gen):
    """random_code_generator.c:22-25: the ``seed`` argument is never read
    -- identical libc srand state + different seed params => identical
    codes.  (This is the bug our samplers fix by keying on jax PRNG
    keys; documented in docs/VALIDATION.md.)"""
    _libc().srand(98765)
    t1 = _draw_reference(ref_gen, seed_param=1)
    _libc().srand(98765)
    t2 = _draw_reference(ref_gen, seed_param=2 ** 30)
    assert np.array_equal(t1, t2)


@pytest.fixture(scope="module")
def sample_sets(ref_gen):
    _libc().srand(20260821)
    ref = np.stack([_draw_reference(ref_gen) for _ in range(SAMPLES)])
    keys = jax.random.split(jax.random.key(7), SAMPLES)
    ours = np.stack([np.asarray(sample_check_table(k, N, DV, DC, "reject"))
                     for k in keys])
    return ref, ours


def test_sampler_matches_reference_distribution(sample_sets):
    ref, ours = sample_sets
    # no draw may violate simplicity (both samplers condition on it)
    for tab in (ref, ours):
        srt = np.sort(tab, axis=2)
        assert not (srt[:, :, 1:] == srt[:, :, :-1]).any()

    first_row = lambda tabs: Counter(
        tuple(sorted(t[0].tolist())) for t in tabs)
    stat, dof, p = _chi2_homogeneity(first_row(ref), first_row(ours))
    assert p > 1e-4, (
        f"first-check distribution differs: chi2={stat:.1f} dof={dof} p={p}")

    overlaps = lambda tabs: Counter(_pair_overlap_count(t) for t in tabs)
    stat2, dof2, p2 = _chi2_homogeneity(overlaps(ref), overlaps(ours))
    assert p2 > 1e-4, (
        f"pair-overlap distribution differs: chi2={stat2:.1f} "
        f"dof={dof2} p={p2}")


def test_reject_sampler_is_uniform_over_first_check(sample_sets):
    """Goodness-of-fit of OUR reject sampler against the closed-form
    marginal: by symmetry of the configuration model every 4-subset of
    variables is equally likely as check 0's support *given* the degree
    constraint... which at dv=2, n=8 makes all C(8,4)=70 supports
    equiprobable only approximately -- so this asserts against the
    empirical REFERENCE frequencies being broadly spread instead: every
    one of the 70 supports must appear in both streams (coverage), the
    cheap canary that neither sampler has a collapsed mode."""
    ref, ours = sample_sets
    cover = lambda tabs: {tuple(sorted(t[0].tolist())) for t in tabs}
    assert len(cover(ref)) == 70
    assert len(cover(ours)) == 70
