"""Closed-form LDPC/BEC theory: density evolution, thresholds, scaling laws.

Pure host-side numpy/python -- these are the regression anchors and
acceptance oracles for the Monte Carlo engine (SURVEY.md section 6):

  * DE threshold eps*(3,6) ~= 0.4294375, eps*(4,8) ~= 0.3834453
    (test_de_threshold.py:7-28)
  * scaling parameter alpha(3,6) ~= 0.5595 with y* ~= 0.7799, x* ~= 0.2612
    (finite_length_scaling_calculation.py:9-21)
  * finite-size shift beta(3,6) = 0.616949 (tools/density_evolution.py:4)
  * waterfall P_block ~= Phi(-sqrt(n)(eps*-eps)/alpha)
    (finite_length_scaling_calculation.py:41-43)
"""

from __future__ import annotations

import math
from functools import lru_cache
from typing import List

import numpy as np

#: finite-size threshold shift for the (3,6) ensemble
#: (tools/density_evolution.py:4; variant 0.616045 at
#: finite_length_scaling_calculation.py:40)
BETA_3_6 = 0.616949


# ---------------------------------------------------------------------------
# Density evolution (tools/density_evolution.py:9-28)
# ---------------------------------------------------------------------------

def density_evolution(erasure_prob: float, iterations: int, dv: int, dc: int,
                      threshold: float = 0.0) -> List[float]:
    """Edge-erasure DE recursion x_{t+1} = eps(1-(1-x_t)^(dc-1))^(dv-1).

    Returns the trajectory [eps, x_1, x_2, ...], truncated when the value
    drops to ``threshold`` (tools/density_evolution.py:9-16).
    """
    results = [erasure_prob]
    x = erasure_prob
    for _ in range(iterations):
        x = erasure_prob * (1.0 - (1.0 - x) ** (dc - 1)) ** (dv - 1)
        if x <= threshold:
            break
        results.append(x)
    return results


def modified_density_evolution(erasure_prob: float, iterations: int, dv: int,
                               dc: int, threshold: float = 0.0
                               ) -> List[float]:
    """Bit-erasure DE: tracks eps(1-(1-x)^(dc-1))^dv alongside the edge
    recursion -- the curve overlaid on simulated BER-vs-iteration plots
    (tools/density_evolution.py:18-28, used at tools/plotting.py:86)."""
    results = [erasure_prob]
    x = erasure_prob
    for _ in range(iterations):
        inner = 1.0 - (1.0 - x) ** (dc - 1)
        bit_prob = erasure_prob * inner ** dv
        x = erasure_prob * inner ** (dv - 1)
        if bit_prob <= threshold:
            break
        results.append(bit_prob)
    return results


def finite_length_density_evolution(erasure_prob: float, iterations: int,
                                    n: int, dv: int = 3, dc: int = 6,
                                    threshold: float = 0.0,
                                    beta: float = BETA_3_6) -> List[float]:
    """DE at the finite-size-shifted erasure probability eps + beta n^(-2/3)
    (tools/density_evolution.py:3-6)."""
    return modified_density_evolution(erasure_prob + beta * n ** (-2.0 / 3.0),
                                      iterations, dv, dc, threshold)


# ---------------------------------------------------------------------------
# DE threshold (test_de_threshold.py:7-28)
# ---------------------------------------------------------------------------

def below_threshold(erasure_prob: float, dv: int, dc: int,
                    max_iterations: int = 100_000,
                    tolerance: float = 1e-6) -> bool:
    """Does DE drive the erasure probability below ``tolerance``?

    Same fixed point test as the reference (test_de_threshold.py:7-15) but
    with convergence early-exit instead of a fixed 100000-iteration burn.
    """
    x = erasure_prob
    for _ in range(max_iterations):
        new_x = erasure_prob * (1.0 - (1.0 - x) ** (dc - 1)) ** (dv - 1)
        if new_x < tolerance:
            return True
        # monotone decreasing recursion: stagnation => stuck above tolerance
        if x - new_x < 1e-15:
            return False
        x = new_x
    return x < tolerance


@lru_cache(maxsize=None)
def calc_threshold(dv: int, dc: int, precision: float = 1e-9) -> float:
    """BP threshold eps*(dv,dc) by bisection (test_de_threshold.py:17-28).

    Verified anchors: eps*(3,6) ~= 0.4294375, eps*(4,8) ~= 0.3834453.
    """
    lo, hi = 0.0, 1.0
    while hi - lo > precision:
        mid = 0.5 * (lo + hi)
        if below_threshold(mid, dv, dc):
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


# ---------------------------------------------------------------------------
# Finite-length scaling (finite_length_scaling_calculation.py:9-43,
# peeling_decoder.py:84-87)
# ---------------------------------------------------------------------------

@lru_cache(maxsize=None)
def threshold_y(threshold_erasure: float, dv: int, dc: int,
                tol: float = 1e-6) -> float:
    """Fixed point y* of y = 1-(1-eps* y^(dv-1))^(dc-1)
    (finite_length_scaling_calculation.py:10-16)."""
    prev, y = 0.0, 1.0
    while abs(y - prev) > tol:
        prev = y
        y = 1.0 - (1.0 - threshold_erasure * y ** (dv - 1)) ** (dc - 1)
    return y


def threshold_x(threshold_erasure: float, dv: int, dc: int) -> float:
    """x* = eps* (y*)^(dv-1) (finite_length_scaling_calculation.py:20)."""
    return threshold_erasure * threshold_y(threshold_erasure, dv, dc) ** (dv - 1)


def calculate_alpha(threshold: float, dv: int, dc: int) -> float:
    """Scaling parameter alpha = eps* sqrt(((dv-1)/dv)(1/x* - 1/y*))
    (finite_length_scaling_calculation.py:18-21).  alpha(3,6) ~= 0.5595."""
    y = threshold_y(threshold, dv, dc)
    x = threshold * y ** (dv - 1)
    return threshold * math.sqrt(((dv - 1) / dv) * (1.0 / x - 1.0 / y))


def _norm_cdf(z):
    return 0.5 * np.ones_like(z) * (1.0 + np.vectorize(math.erf)(
        np.asarray(z) / math.sqrt(2.0)))


def waterfall_block_error(n, erasure_probs, dv: int = 3, dc: int = 6,
                          finite_size_shift: bool = False,
                          beta: float = 0.616045) -> np.ndarray:
    """Scaling-law waterfall P_block(n, eps) = Phi(-sqrt(n)(eps*-eps)/alpha)
    (finite_length_scaling_calculation.py:41-43; optional beta n^(-2/3)
    shift from the commented variant at :40)."""
    erasure_probs = np.asarray(erasure_probs, float)
    thr = calc_threshold(dv, dc)
    alpha = calculate_alpha(thr, dv, dc)
    shift = beta * float(n) ** (-2.0 / 3.0) if finite_size_shift else 0.0
    z = math.sqrt(n) * (thr - erasure_probs - shift)
    return _norm_cdf(-z / alpha)


def critical_point_variance(n: int, erasure_prob: float, dv: int, dc: int
                            ) -> float:
    """Variance of the degree-1 check count at the critical point
    (peeling_decoder.py:225)."""
    thr = calc_threshold(dv, dc)
    alpha = calculate_alpha(thr, dv, dc)
    y = threshold_y(thr, dv, dc)
    return n * dv ** 2 * (alpha * thr * (dc - 1) * y ** (2 * dv - 2)
                          * (1.0 - thr * y ** (dv - 1)) ** (dc - 2)) ** 2


# ---------------------------------------------------------------------------
# Peeling drift / critical point (peeling_decoder.py:101-123,
# test_peeling_decoder_path.py:8-14, test_critical_point_calculator.py)
# ---------------------------------------------------------------------------

def peeling_drift_normalized(erasure_prob: float, dv: int, dc: int, y
                             ) -> np.ndarray:
    """Expected fraction-of-edges drift r(y) = eps y^(dv-1)
    (y - 1 + (1 - eps y^(dv-1))^(dc-1)) (test_peeling_decoder_path.py:12-14).
    ``y`` is the fraction of *unresolved* erased variables remaining."""
    y = np.asarray(y, float)
    x = erasure_prob * y ** (dv - 1)
    return x * (y - 1.0 + (1.0 - x) ** (dc - 1))


def peeling_drift(erasure_prob: float, dv: int, dc: int, n: int, steps
                  ) -> np.ndarray:
    """Expected degree-1 check count after ``steps`` peeling steps remain
    -- the reference's ``dv*n*f(...)`` in absolute time units
    (peeling_decoder.py:101-107): steps counts down from n*eps, and
    y = (1 - steps/(eps n))^(1/dv)."""
    steps = np.asarray(steps, float)
    y = (1.0 - steps / (erasure_prob * n)) ** (1.0 / dv)
    return dv * n * peeling_drift_normalized(erasure_prob, dv, dc, y)


def gallager_a_density_evolution(crossover_prob: float, iterations: int,
                                 dv: int, dc: int) -> List[float]:
    """Message-error-probability recursion for Gallager-A on the BSC.

    With x_t the message error rate, a check output is wrong w.p.
    u = (1-(1-2x)^(dc-1))/2 and the Gallager-A variable rule flips the
    channel bit only when all dv-1 other checks agree on the complement:
    x_{t+1} = p0 (1-(1-u)^(dv-1)) + (1-p0) u^(dv-1).

    Analysis-side counterpart of ops/gallager.py (the reference has no BSC
    analysis; this extends tools/density_evolution.py's role to BASELINE
    config 2).
    """
    p0 = crossover_prob
    x = p0
    out = [x]
    for _ in range(iterations):
        u = 0.5 * (1.0 - (1.0 - 2.0 * x) ** (dc - 1))
        x = p0 * (1.0 - (1.0 - u) ** (dv - 1)) + (1.0 - p0) * u ** (dv - 1)
        out.append(x)
    return out


@lru_cache(maxsize=None)
def gallager_a_threshold(dv: int, dc: int, precision: float = 1e-7) -> float:
    """BSC crossover threshold of Gallager-A decoding by bisection.

    Anchor: p*(3,6) ~= 0.0394 (Richardson/Urbanke value for Gallager
    algorithm A on the (3,6) ensemble).
    """
    def dies_out(p0: float) -> bool:
        x = p0
        for _ in range(20_000):
            u = 0.5 * (1.0 - (1.0 - 2.0 * x) ** (dc - 1))
            new_x = (p0 * (1.0 - (1.0 - u) ** (dv - 1))
                     + (1.0 - p0) * u ** (dv - 1))
            if new_x < 1e-12:
                return True
            if abs(new_x - x) < 1e-15:
                return False
            x = new_x
        return x < 1e-12

    lo, hi = 0.0, 0.5
    while hi - lo > precision:
        mid = 0.5 * (lo + hi)
        if dies_out(mid):
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def check_degree_fraction(erasure_prob: float, dv: int, dc: int, degree: int,
                          y) -> np.ndarray:
    """Expected fraction of residual checks with the given degree at
    peeling time y: C(dc,d) (eps y^(dv-1))^d (1 - eps y^(dv-1))^(dc-1)
    (test_peeling_decoder_path.py:18-20)."""
    y = np.asarray(y, float)
    x = erasure_prob * y ** (dv - 1)
    return math.comb(dc, degree) * x ** degree * (1.0 - x) ** (dc - 1)


def calculate_crit_point(erasure_prob: float, dv: int, dc: int,
                         tol: float = 1e-8) -> float:
    """Fixed point x where the peeling drift is tangent to zero
    (test_critical_point_calculator.py:4-11)."""
    prev, x = 0.0, 1.0
    while abs(x - prev) > tol:
        prev = x
        u = 1.0 - erasure_prob * x ** (dv - 1)
        x = (1.0 / dv) * ((dv - 1) - (dv - 1) * u ** (dc - 1)
                          + erasure_prob * (dv - 1) * (dc - 1)
                          * x ** (dv - 1) * u ** (dc - 2))
    return x


def calculate_crit_epsilon(dv: int, dc: int, low: float = 0.2,
                           high: float = 1.0, tol: float = 1e-8) -> float:
    """Bisection for the eps where the tangency point first appears
    (test_critical_point_calculator.py:13-23; note the reference hardwires
    (3,6) inside its loop -- fixed here to use the passed degrees)."""
    while high - low > tol:
        mid = 0.5 * (high + low)
        if abs(calculate_crit_point(mid, dv, dc)) < 1e-9:
            low = mid
        else:
            high = mid
    return high


# ---------------------------------------------------------------------------
# Residual-graph check-degree distribution (test_peeling_decoder_path.py:96-116)
# ---------------------------------------------------------------------------

def _degree_transition_generator(dc: int) -> np.ndarray:
    """Generator A with A[i,i] = -(i+1), A[i,i+1] = i+1 (rows = degree-1
    .. degree-dc), the dc=6 matrix hardcoded at
    test_peeling_decoder_path.py:99 generalised to any dc."""
    a = np.zeros((dc, dc))
    for i in range(dc):
        a[i, i] = -(i + 1)
        if i + 1 < dc:
            a[i, i + 1] = i + 1
    return a


def _expm(a: np.ndarray) -> np.ndarray:
    from scipy.linalg import expm

    return expm(a)


def initial_degree_distribution(erasure_prob: float, dc: int = 6
                                ) -> np.ndarray:
    """Check-degree distribution of the residual graph after stripping the
    received bits: expm(-A ln eps) X0 with X0 = e_dc
    (test_peeling_decoder_path.py:96-100)."""
    a = _degree_transition_generator(dc)
    x0 = np.zeros(dc)
    x0[-1] = 1.0
    return _expm(-a * math.log(erasure_prob)) @ x0


def degree_distribution_at_time(erasure_prob: float, time: float, dv: int = 3,
                                dc: int = 6) -> np.ndarray:
    """Degree-distribution evolution during peeling at normalized time t:
    expm(-C ln((1-t)/eps)) X_init with C = (1/dv) B + ((dv-1)/dv) A
    (test_peeling_decoder_path.py:102-106)."""
    a = _degree_transition_generator(dc)
    b = np.zeros((dc, dc))
    b[0, :] = -1.0
    c = (1.0 / dv) * b + ((dv - 1) / dv) * a
    init = initial_degree_distribution(erasure_prob, dc)
    return _expm(-c * math.log((1.0 - time) / erasure_prob)) @ init


# ---------------------------------------------------------------------------
# Irregular ensembles (capability extension -- the reference is regular-only;
# same DE machinery generalised to edge-perspective degree distributions
# lambda(x), rho(x), after Luby et al. / Richardson-Urbanke)
# ---------------------------------------------------------------------------

def _poly_check(coeffs, name: str) -> np.ndarray:
    c = np.asarray(coeffs, float)
    if c.ndim != 1 or c.size < 2 or c[0] != 0.0:
        raise ValueError(
            f"{name} must be 1-D polynomial coefficients [c0, c1, ...] with "
            "c0 == 0 (no degree-1 edge mass) and degree >= 1")
    if (c < 0).any() or not math.isclose(float(c.sum()), 1.0, abs_tol=1e-9):
        raise ValueError(f"{name} coefficients must be >= 0 and sum to 1")
    return c


def _poly_val(c: np.ndarray, x: float) -> float:
    return float(np.polyval(c[::-1], x))


def design_rate(lam, rho) -> float:
    """1 - (int rho)/(int lambda): the design rate of the (lambda, rho)
    ensemble.  Coefficient convention: ``lam[i]`` multiplies x**i, i.e.
    lam[i] is the fraction of edges attached to degree-(i+1) variables."""
    lam = _poly_check(lam, "lam")
    rho = _poly_check(rho, "rho")
    ints = lambda c: float(sum(ci / (i + 1) for i, ci in enumerate(c)))
    return 1.0 - ints(rho) / ints(lam)


def regular_lam_rho(dv: int, dc: int):
    """The degenerate (lambda, rho) of the (dv,dc)-regular ensemble."""
    lam = np.zeros(dv)
    lam[dv - 1] = 1.0
    rho = np.zeros(dc)
    rho[dc - 1] = 1.0
    return lam, rho


def irregular_density_evolution(erasure_prob: float, lam, rho,
                                iterations: int, threshold: float = 0.0
                                ) -> List[float]:
    """Edge-erasure DE x_{t+1} = eps * lambda(1 - rho(1 - x_t)).

    The irregular generalisation of :func:`density_evolution`; with the
    degenerate distributions of :func:`regular_lam_rho` the two recursions
    are identical.
    """
    lam = _poly_check(lam, "lam")
    rho = _poly_check(rho, "rho")
    results = [erasure_prob]
    x = erasure_prob
    for _ in range(iterations):
        x = erasure_prob * _poly_val(lam, 1.0 - _poly_val(rho, 1.0 - x))
        if x <= threshold:
            break
        results.append(x)
    return results


def irregular_below_threshold(erasure_prob: float, lam, rho,
                              max_iterations: int = 100_000,
                              tolerance: float = 1e-6) -> bool:
    """Does irregular DE drive the edge erasure rate below ``tolerance``?"""
    lam = _poly_check(lam, "lam")
    rho = _poly_check(rho, "rho")
    x = erasure_prob
    for _ in range(max_iterations):
        new_x = erasure_prob * _poly_val(lam, 1.0 - _poly_val(rho, 1.0 - x))
        if new_x < tolerance:
            return True
        # monotone decreasing recursion: stagnation => stuck above tolerance
        if x - new_x < 1e-15:
            return False
        x = new_x
    return x < tolerance


def irregular_threshold(lam, rho, precision: float = 1e-9) -> float:
    """BP threshold eps*(lambda, rho) by the same bisection as
    :func:`calc_threshold`.  Sanity properties (tested): equals the regular
    threshold on degenerate distributions, never exceeds the Shannon limit
    1 - design_rate, and never exceeds the stability limit
    1/(lambda'(0) rho'(1))."""
    lam = _poly_check(lam, "lam")
    rho = _poly_check(rho, "rho")
    lo, hi = 0.0, 1.0
    while hi - lo > precision:
        mid = 0.5 * (lo + hi)
        if irregular_below_threshold(mid, lam, rho):
            lo = mid
        else:
            hi = mid
    return 0.5 * (lo + hi)


def stability_limit(lam, rho) -> float:
    """The stability condition's threshold bound 1/(lambda'(0) rho'(1)):
    eps* <= this for every (lambda, rho) (equality when the degree-2
    variable mass is what limits convergence near the fixed point x=0)."""
    lam = _poly_check(lam, "lam")
    rho = _poly_check(rho, "rho")
    lam2 = float(lam[1])              # lambda'(0)
    rho_d1 = float(sum(i * ci for i, ci in enumerate(rho)))  # rho'(1)
    if lam2 == 0.0:
        return math.inf
    return 1.0 / (lam2 * rho_d1)
