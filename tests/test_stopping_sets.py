"""Stopping-set finite-length analysis tests.

Cross-checks: sympy coefficient extraction (same expressions the reference
builds, test_finite_length_analysis.py:18-24), Monte Carlo expected
stopping-set counts on tiny ensembles, and structural identities.
"""

import math
from fractions import Fraction

import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
    StoppingSetAnalysis, _frac_to_float, expected_stopping_sets, f,
    total_stopping_sets)


def test_f_matches_sympy():
    sympy = pytest.importorskip("sympy")
    from sympy.abc import x
    for dc in (4, 6):
        for sigma in (0, 1, 2):
            for dt in (0, 1, 2):
                expr = sympy.expand(((1 + x) ** (dc - 1) - 1) ** sigma
                                    * ((1 + x) ** dc - 1 - dc * x) ** dt)
                d = expr.as_coefficients_dict()
                for coef in range(0, 10):
                    want = int(d.get(x ** coef, 0)) if coef else int(
                        d.get(sympy.Integer(1), 0))
                    assert f(dc, sigma, dt, coef) == want, (dc, sigma, dt,
                                                           coef)


def test_total_stopping_sets_small():
    sympy = pytest.importorskip("sympy")
    from sympy.abc import x
    for dv, dc, v, t in [(3, 6, 2, 3), (3, 6, 3, 3), (2, 4, 2, 2),
                         (3, 6, 2, 2)]:
        expr = sympy.expand(((1 + x) ** dc - 1 - dc * x) ** t)
        want = int(expr.coeff(x, v * dv)) * math.factorial(v * dv)
        assert total_stopping_sets(v, dv, dc, t) == want


def test_frac_to_float():
    assert _frac_to_float(Fraction(0)) == 0.0
    assert _frac_to_float(Fraction(3, 4)) == pytest.approx(0.75)
    assert _frac_to_float(-Fraction(1, 8)) == pytest.approx(-0.125)
    huge = Fraction(math.factorial(300), math.factorial(297))
    assert _frac_to_float(huge) == pytest.approx(300 * 299 * 298, rel=1e-9)


def test_T_is_configuration_count():
    a = StoppingSetAnalysis(12, 3, 6)
    # T(v) = (v dv)! C(k dc, v dv): labelled socket matchings
    assert a.T(0) == 1
    assert a.T(2) == math.factorial(6) * math.comb(6 * 6, 6)


def test_expected_stopping_sets_vs_monte_carlo():
    """E[# size-v stopping sets] over the raw configuration ensemble,
    checked by brute-force sampling on a tiny (3,6) ensemble."""
    n, dv, dc = 8, 3, 6
    m = n * dv // dc
    rng = np.random.default_rng(0)
    reps = 4000
    counts = np.zeros(4)
    for _ in range(reps):
        perm = rng.permutation(n * dv)
        chk = (perm // dv).reshape(m, dc)
        # adjacency with multiplicity
        adj = np.zeros((m, n), int)
        for c in range(m):
            for v in chk[c]:
                adj[c, v] += 1
        # count stopping sets of sizes 1..3
        import itertools
        for v_size in (1, 2, 3):
            for subset in itertools.combinations(range(n), v_size):
                sub = adj[:, list(subset)].sum(axis=1)
                touched = sub > 0
                if (sub[touched] >= 2).all() and touched.any():
                    counts[v_size] += 1
    mc = counts / reps
    exact = expected_stopping_sets(n, dv, dc, 3)
    for v_size in (1, 2, 3):
        # 4-sigma-ish agreement
        se = math.sqrt(max(mc[v_size], 1e-3) / reps) * 4 + 0.05 * exact[v_size]
        assert abs(mc[v_size] - exact[v_size]) < se + 0.02, (
            v_size, mc[v_size], exact[v_size])


def test_bit_error_monotone_and_bounded():
    a = StoppingSetAnalysis(12, 3, 6, X=1)
    totals = []
    for eps in (0.1, 0.2, 0.3):
        total, per_w = a.bit_error(eps)
        assert 0 <= total <= 1
        assert len(per_w) == 13
        assert all(w >= 0 for w in per_w)
        totals.append(total)
    assert totals[0] < totals[1] < totals[2]


def test_bit_error_full_erasure_limit():
    """At eps=1 every bit is erased and never recovered: the X=1 analysis
    must give (weighted) error 1 -- the whole graph is a stopping set."""
    a = StoppingSetAnalysis(8, 3, 6, X=1)
    total, per_w = a.bit_error(0.999999)
    assert total == pytest.approx(1.0, abs=1e-3)
    # only the full-weight term contributes materially
    assert per_w[8] == pytest.approx(total, rel=1e-2)


def test_B_reference_parity_anchors():
    """Exact values cross-checked against the reference implementation
    (test_finite_length_analysis.py B()) executed on (n=12, dv=3, dc=6,
    k=6 checks): matched to full precision for v=0..6, X in {0,1}."""
    a = StoppingSetAnalysis(12, 3, 6, num_checks=6, X=0)
    assert a.B(1) == 720
    assert a.B(2) == 102107520
    assert a.B(3) == 6618858624000


def test_A_s0_base_case():
    """A(v, t, 0) must equal the normalised stopping-set count."""
    a = StoppingSetAnalysis(12, 3, 6, X=0)
    v, t = 2, 3
    want = Fraction(total_stopping_sets(v, 3, 6, t)) / (
        math.factorial(v) * math.factorial(3) ** v)
    assert a._A(v, t, 0) == want


def test_bit_error_reference_value_anchors():
    """Full-precision parity with the reference's hardcoded finite-length
    analysis values (tools/plotting.py:50-56: n=100 (3,6) ensemble,
    'Finite length analysis n=100' hlines)."""
    a = StoppingSetAnalysis(100, 3, 6, X=1)
    for eps, want in [(0.3, 0.00927103257501793),
                      (0.35, 0.0469878894379349),
                      (0.4, 0.145904820551055)]:
        total, _ = a.bit_error(eps)
        assert total == pytest.approx(want, rel=1e-12), eps


def test_bit_error_bulk_matches_full():
    """The binomial-bulk window must reproduce the full 0..n sum within
    its certified truncation bound."""
    a = StoppingSetAnalysis(100, 3, 6, X=1)
    for eps in (0.3, 0.4):
        full, _ = a.bit_error(eps)
        windowed, bound = a.bit_error_bulk(eps)
        assert windowed <= full + 1e-15
        assert full - windowed <= bound


def test_bit_error_bulk_degenerate_channels():
    """eps in {0, 1} short-circuit exactly instead of raising a math
    domain error (log(0)) in the window selection."""
    a = StoppingSetAnalysis(60, 3, 6, X=1)
    assert a.bit_error_bulk(0.0) == (0.0, 0.0)
    one, bound = a.bit_error_bulk(1.0)
    assert bound == 0.0
    full, _ = a.bit_error(1.0)
    assert one == pytest.approx(full, rel=1e-12)


def test_B_prune_matches_unpruned_sweep():
    """The 2t + s <= v*dv loop prune drops only zero terms: compare with
    the reference's full k x k sweep on a small ensemble."""
    a = StoppingSetAnalysis(16, 3, 6, X=1)
    for v in (1, 2, 3, 4):
        k = a.k
        acc = Fraction(0)
        for t in range(k + 1):
            for s in range(k - t + 1):
                val = a._A(v, t, s)
                if val:
                    # every nonzero term must be inside the pruned window
                    assert 2 * t + s <= v * a.dv, (v, t, s)
                    acc += math.comb(k, t + s) * val
        acc *= math.factorial(v) * math.factorial(a.dv) ** v
        assert acc == a.B(v)


def test_exact_vs_monte_carlo_raw_ensemble():
    """SURVEY section 4 method 4, closed end-to-end: the exact
    ensemble-average BER (stopping-set enumeration) must agree with
    fresh-code Monte Carlo at a real (n, eps) -- the comparison the
    reference hardcodes at tools/plotting.py:50-56 against
    test_finite_length_analysis.py output.

    The analysis averages the RAW configuration ensemble (its T(v)
    normaliser counts all socket matchings, multi-edges included), so
    the Monte Carlo must sample with method='raw'; the simple-conditioned
    samplers are measurably biased low at this n (~-24%)."""
    import jax

    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci

    exact = 0.00927103257501793   # n=100 eps=0.3, checked above
    cfg = SimulationConfig(channel="BEC", channel_param=0.3, n=100,
                           dv=3, dc=6, decoder="bp", iterations=60,
                           num_tests=64000, batch=3200,
                           codes_per_chunk=100, sampler="raw",
                           max_block_errors=10 ** 9, seed=21,
                           code_mode="ensemble")
    res = run_simulation(cfg)
    lo, hi = ber_ci(res)
    assert lo <= exact <= hi, (res.bit_error_rate, lo, hi, exact)
    # and the interval is tight enough for the test to mean something
    assert (hi - lo) / exact < 0.25


# ---------------------------------------------------------------------------
# Irregular expected stopping sets + the lambda2 cycle floor (round 4)
# ---------------------------------------------------------------------------

IRR_LAM = [0, 1 / 3, 0, 2 / 3]
IRR_RHO = [0, 0, 0, 0, 0, 1.0]


def test_irregular_expected_sets_degenerate_matches_regular():
    from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
        irregular_expected_stopping_sets)

    n, dv, dc = 24, 3, 6
    reg = expected_stopping_sets(n, dv, dc, 4)
    irr = irregular_expected_stopping_sets(
        np.full(n, dv), np.full(n * dv // dc, dc), 4)
    for v in range(5):
        assert sum(c for c, _ in irr[v]) == pytest.approx(reg[v],
                                                          rel=1e-9)


def test_irregular_expected_sets_vs_monte_carlo():
    """E[# size-v stopping sets] of a tiny irregular ensemble, checked by
    brute-force raw configuration-model sampling."""
    import itertools

    from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
        irregular_expected_stopping_sets)

    var_deg = np.array([2, 2, 2, 2, 4, 4])          # lam-ish mix, E=16
    chk_deg = np.array([4, 4, 4, 4])
    exact = irregular_expected_stopping_sets(var_deg, chk_deg, 3)
    totals = [sum(c for c, _ in exact[v]) for v in range(4)]

    rng = np.random.default_rng(1)
    n, m = len(var_deg), len(chk_deg)
    socket_var = np.repeat(np.arange(n), var_deg)
    socket_chk = np.repeat(np.arange(m), chk_deg)
    reps = 6000
    counts = np.zeros(4)
    for _ in range(reps):
        perm = rng.permutation(len(socket_var))
        adj = np.zeros((m, n), int)
        for s, c in zip(perm, socket_chk):
            adj[c, socket_var[s]] += 1
        for v_size in (1, 2, 3):
            for subset in itertools.combinations(range(n), v_size):
                sub = adj[:, list(subset)].sum(axis=1)
                touched = sub > 0
                if touched.any() and (sub[touched] >= 2).all():
                    counts[v_size] += 1
    mc = counts / reps
    for v in (1, 2, 3):
        se = 4 * np.sqrt(max(mc[v], 1e-3) / reps) + 0.04 * totals[v]
        assert abs(mc[v] - totals[v]) < se + 0.02, (v, mc[v], totals[v])


def test_irregular_raw_terms_match_poisson_cycle_theory():
    """At large n the raw v=1 term is x/2 (double edges) and the v=2
    term is x^2/4 + (x/2)^2/2 (2-cycles + pairs of double edges), with
    x = eps lam'(0) rho'(1) at eps=1 -- the consistency that ties the
    exact enumeration to the asymptotic cycle floor."""
    from iib_project_ldpc_codes_tpu.models.irregular import (
        degree_sequences_from_lam_rho)
    from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
        irregular_expected_stopping_sets)

    n = 200_000
    vd, cd = degree_sequences_from_lam_rho(n, IRR_LAM, IRR_RHO)
    table = irregular_expected_stopping_sets(vd, cd, 2)
    x = (1 / 3) * 5.0
    n1 = sum(c for c, _ in table[1])
    n2 = sum(c for c, _ in table[2])
    assert n1 == pytest.approx(x / 2, rel=0.01)
    assert n2 == pytest.approx(x ** 2 / 4 + (x / 2) ** 2 / 2, rel=0.02)


def test_lambda2_cycle_floor_measured_by_monte_carlo():
    """The asymptotic cycle-floor formula must match measured FER deep
    below threshold, for BOTH ensembles: the simple-conditioned sampler
    (no double edges -> k>=2 cycles only) and the raw configuration
    model (k=1 double edges included).  eps=0.40 is far enough below
    eps*=0.4526 that the waterfall contribution at n=1024 is ~0.5%."""
    import jax

    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
        lambda2_cycle_floor)

    eps = 0.40
    want_simple = lambda2_cycle_floor(IRR_LAM, IRR_RHO, eps, simple=True)
    want_raw = lambda2_cycle_floor(IRR_LAM, IRR_RHO, eps, simple=False)
    assert want_simple == pytest.approx(
        1 - math.sqrt(1 - 2 / 3) * math.exp(1 / 3), rel=1e-12)
    assert want_raw > want_simple

    def fer(sampler, seed):
        cfg = SimulationConfig(channel="BEC", channel_param=eps, n=1024,
                               lam=IRR_LAM, rho=IRR_RHO, decoder="bp",
                               iterations=120, num_tests=4096, batch=2048,
                               codes_per_chunk=64, sampler=sampler,
                               max_block_errors=10 ** 9, seed=seed,
                               code_mode="ensemble")
        return run_simulation(cfg).block_error_rate

    got_simple = fer("repair", 3)
    got_raw = fer("raw", 4)
    # finite-n corrections are O(1/n)-ish with an O(0.01) waterfall tail;
    # 0.035 absolute tolerance ~= 5 binomial SEs + model slack
    assert abs(got_simple - want_simple) < 0.035, (got_simple, want_simple)
    assert abs(got_raw - want_raw) < 0.035, (got_raw, want_raw)
    assert got_raw > got_simple     # double edges are real failures


def test_lambda2_ber_floor_matches_monte_carlo():
    """The bit-error floor x^2/(2(1-x))/n (simple ensemble) must match
    measured BER deep below threshold; it also retrodicts the round-3
    raw design-ladder numbers (docs/VALIDATION.md)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.stopping_sets import (
        lambda2_cycle_floor_ber)

    # deep below threshold: at eps=0.40/n=1024 the ~0.5% waterfall tail
    # carries Theta(n)-bit failures that dominate the BIT error rate
    # (the FER floor test above is insensitive to this); eps=0.35 puts
    # the waterfall at ~2e-7 FER so the cycle floor is all there is
    eps, n = 0.35, 1024
    want = lambda2_cycle_floor_ber(IRR_LAM, IRR_RHO, eps, n, simple=True)
    x = eps * (1 / 3) * 5
    assert want == pytest.approx(x ** 2 / (2 * (1 - x)) / n, rel=1e-12)
    cfg = SimulationConfig(channel="BEC", channel_param=eps, n=n,
                           lam=IRR_LAM, rho=IRR_RHO, decoder="bp",
                           iterations=120, num_tests=8192, batch=2048,
                           codes_per_chunk=64, max_block_errors=10 ** 9,
                           seed=9, code_mode="ensemble")
    res = run_simulation(cfg)
    # floor BER ~ 6.5e-4; MC SE at 8192 trials ~ 5%; finite-n slack 20%
    assert res.bit_error_rate == pytest.approx(want, rel=0.25), \
        (res.bit_error_rate, want)
