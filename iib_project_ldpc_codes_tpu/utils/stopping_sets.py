"""Exact finite-length ensemble analysis via stopping-set enumeration.

Computes the exact ensemble-average bit erasure probability of iterative
decoding on the BEC by counting stopping constellations (Di/Proietti/
Telatar/Richardson/Urbanke-style generating-function recursion), matching
the reference's test_finite_length_analysis.py:18-109:

  * ``f(dc, sigma, dt, coef)``: coefficient of x^coef in
    ((1+x)^(dc-1) - 1)^sigma * ((1+x)^dc - 1 - dc x)^dt   (:18-24)
  * recursive constellation count ``A(v, t, s)``              (:26-58)
  * ``B(v) = sum_{t,s} C(k, t+s) A(v,t,s) * v! (dv!)^v``      (:60-66)
  * configuration normaliser ``T(v) = (v dv)! C(k dc, v dv)`` (:68-69)
  * ``bit_error = sum_e B(e) eps^e (1-eps)^(n-e) C(n,e)/T(e)`` (:92-109)

Design differences (not a port): polynomials are plain integer coefficient
lists with cached convolution powers -- no sympy, orders of magnitude
faster than ``sympy.expand`` on ((1+x)^dc-1-dc x)^t -- and all arithmetic
is exact ``fractions.Fraction`` (the reference mixes Python ints with
float factors like ``ds/s``, which overflows to inf for larger v).
Conversion to float happens once at the end via big-int log2, so n in the
thousands is representable.
"""

from __future__ import annotations

import math
from fractions import Fraction
from functools import lru_cache
from typing import List, Tuple

import numpy as np


# ---------------------------------------------------------------------------
# Integer polynomial helpers (coefficient lists, index = power)
# ---------------------------------------------------------------------------

def _poly_mul(a: Tuple[int, ...], b: Tuple[int, ...]) -> Tuple[int, ...]:
    out = [0] * (len(a) + len(b) - 1)
    for i, ai in enumerate(a):
        if ai:
            for j, bj in enumerate(b):
                if bj:
                    out[i + j] += ai * bj
    return tuple(out)


@lru_cache(maxsize=None)
def _binomial_poly(deg: int) -> Tuple[int, ...]:
    """(1+x)^deg as a coefficient tuple."""
    return tuple(math.comb(deg, i) for i in range(deg + 1))


@lru_cache(maxsize=None)
def _sigma_base(dc: int) -> Tuple[int, ...]:
    """(1+x)^(dc-1) - 1."""
    p = list(_binomial_poly(dc - 1))
    p[0] -= 1
    return tuple(p)


@lru_cache(maxsize=None)
def _dt_base(dc: int) -> Tuple[int, ...]:
    """(1+x)^dc - 1 - dc*x (degree->=2 check polynomial)."""
    p = list(_binomial_poly(dc))
    p[0] -= 1
    p[1] -= dc
    return tuple(p)


@lru_cache(maxsize=None)
def _poly_pow(base: Tuple[int, ...], e: int) -> Tuple[int, ...]:
    if e == 0:
        return (1,)
    if e == 1:
        return base
    return _poly_mul(_poly_pow(base, e - 1), base)


def f(dc: int, sigma: int, dt: int, coef: int) -> int:
    """[x^coef] ((1+x)^(dc-1)-1)^sigma ((1+x)^dc-1-dc x)^dt
    (test_finite_length_analysis.py:18-24)."""
    if coef < 0:
        return 0
    p = _poly_mul(_poly_pow(_sigma_base(dc), sigma),
                  _poly_pow(_dt_base(dc), dt))
    return p[coef] if coef < len(p) else 0


def total_stopping_sets(v: int, dv: int, dc: int, t: int) -> int:
    """(v dv)! [x^(v dv)] ((1+x)^dc - 1 - dc x)^t
    (test_finite_length_analysis.py:77-89): socket-labelled count of
    stopping sets of v variables whose edges land in exactly t checks,
    every check covered >= 2 times."""
    p = _poly_pow(_dt_base(dc), t)
    want = v * dv
    c = p[want] if want < len(p) else 0
    return c * math.factorial(want)


# ---------------------------------------------------------------------------
# Constellation recursion
# ---------------------------------------------------------------------------

class StoppingSetAnalysis:
    """Exact finite-length analysis for one (n, dv, dc) ensemble.

    ``k`` here is the number of *check* nodes (the reference passes
    ``int(0.5 n)``, test_finite_length_analysis.py:118).  ``X`` is the
    moment exponent: X=1 weights constellations by the fraction of bits
    they erase (bit-error), X=0 counts erasure events (block-error style).
    """

    def __init__(self, n: int, dv: int, dc: int, num_checks: int | None = None,
                 X: int = 1):
        self.n = n
        self.dv = dv
        self.dc = dc
        self.k = num_checks if num_checks is not None else (n * dv) // dc
        self.X = X
        self._A = lru_cache(maxsize=None)(self._A_impl)
        self._B = lru_cache(maxsize=None)(self._B_impl)

    def _A_impl(self, v: int, t: int, s: int) -> Fraction:
        """A(v,t,s) (test_finite_length_analysis.py:26-58), exact."""
        dv, dc, n, X = self.dv, self.dc, self.n, self.X
        if v == 0:
            return Fraction(0)
        if s == 0:
            count = total_stopping_sets(v, dv, dc, t)
            if count == 0:
                return Fraction(0)
            return (Fraction(count)
                    * Fraction(v, n) ** X
                    / (math.factorial(v) * math.factorial(dv) ** v))
        total = Fraction(0)
        for ds in range(1, dv + 1):
            for sigma in range(0, dv - ds + 1):
                if s + sigma - ds < 0:
                    continue
                omega = (v - 1) * dv - (s + sigma - ds)
                fourth = math.comb(s + sigma - ds, sigma)
                fifth = Fraction(dc ** ds * ds, s)
                for dt in range(0, (dv - ds - sigma) // 2 + 1):
                    if dc * (t - dt - sigma) - omega < 0:
                        continue
                    if t - dt - sigma < 0:
                        continue
                    sixth = self._A(v - 1, t - dt - sigma, s + sigma - ds)
                    if sixth == 0:
                        continue
                    first = math.comb(dt + ds, dt)
                    seventh = math.comb(t + s, dt + ds)
                    inner = 0
                    for tau in range(0, dv - ds - sigma - 2 * dt + 1):
                        second = f(dc, sigma, dt, dv - ds - tau)
                        if second == 0:
                            continue
                        third = math.comb(dc * (t - dt - sigma) - omega, tau)
                        inner += second * third
                    if inner:
                        total += (first * inner * fourth * seventh) \
                            * fifth * sixth
        return total

    def B(self, v: int) -> Fraction:
        """Weighted constellation count over all (t, s) splits
        (test_finite_length_analysis.py:60-66).  Cached per weight, so
        ``bit_error`` at many erasure probabilities reuses the heavy
        combinatorics.

        Loop pruning (vs the reference's full k x k sweep): a
        constellation on v variables has exactly v*dv edges, the t
        fully-covered checks absorb >= 2 each and the s singly-covered
        checks exactly 1, so A(v,t,s) == 0 unless 2t + s <= v*dv --
        verified against the unpruned sweep on the small-n parity anchors
        (tests/test_stopping_sets.py).  This turns B at reference scale
        (n ~ 10^3, k ~ 500) from O(k^2) into O((v dv)^2) recursion roots
        per weight.
        """
        return self._B(v)

    def _B_impl(self, v: int) -> Fraction:
        edges = v * self.dv
        acc = Fraction(0)
        for t in range(min(self.k, edges // 2) + 1):
            s_max = min(self.k - t, edges - 2 * t)
            for s in range(s_max + 1):
                a = self._A(v, t, s)
                if a:
                    acc += math.comb(self.k, t + s) * a
        return acc * (math.factorial(v) * math.factorial(self.dv) ** v)

    def T(self, v: int) -> int:
        """Total labelled configurations with v active variables
        (test_finite_length_analysis.py:68-69)."""
        return (math.factorial(v * self.dv)
                * math.comb(self.k * self.dc, v * self.dv))

    def bit_error(self, erasure_prob, max_weight: int | None = None
                  ) -> Tuple[float, List[float]]:
        """Exact ensemble-average erasure-weighted error probability.

        Returns ``(total, per_weight)`` where ``per_weight[e]`` is the
        contribution of erasure weight e (test_finite_length_analysis.py:
        92-109).  ``max_weight`` truncates the sum (the tail is
        combinatorially negligible below threshold).
        """
        n = self.n
        eps = Fraction(erasure_prob).limit_denominator(10 ** 9)
        max_weight = n if max_weight is None else min(max_weight, n)
        per_weight = []
        total = Fraction(0)
        for e in range(max_weight + 1):
            b = self.B(e)
            if b == 0:
                per_weight.append(0.0)
                continue
            value = (b * eps ** e * (1 - eps) ** (n - e)
                     * math.comb(n, e)) / self.T(e)
            total += value
            per_weight.append(_frac_to_float(value))
        return _frac_to_float(total), per_weight


    def bit_error_bulk(self, erasure_prob, tail_mass: float = 1e-12
                       ) -> Tuple[float, float]:
        """Exact ensemble-average error restricted to the binomial bulk of
        erasure weights, with a certified truncation bound.

        The full sum (``bit_error``) weights B(e)/T(e) by the
        Binomial(n, eps) pmf; at reference scale (n ~ 512-1024,
        test_finite_length_analysis.py:92-109 runs e = 0..n) the mass
        sits at e ~ n*eps, so the sum only needs the pmf bulk.  Since
        0 <= B(e)/T(e) <= 1 (a weighted count of constellations over the
        total configuration count, weight (v/n)^X <= 1), discarding
        weights whose total pmf is ``tail_mass`` changes the result by at
        most ``tail_mass``.  Cost is set by the bulk's upper edge, not n:
        the A recursion only runs up to v = e_hi.

        Returns ``(value, bound)`` with value <= true <= value + bound.
        (The bound also absorbs the representation of ``erasure_prob`` as
        a rational with denominator <= 10^9; that rounding perturbs the
        polynomial value by O(n * 2^-30) ~ 1e-6 relative at reference
        scale, orders below any ``tail_mass`` in practical use.)
        """
        n = self.n
        eps = float(erasure_prob)
        if eps <= 0.0 or eps >= 1.0:
            # Degenerate channels: eps=0 erases nothing (error 0); eps=1
            # erases everything -- only the e=n term survives, exactly.
            if eps <= 0.0:
                return 0.0, 0.0
            return _frac_to_float(Fraction(self.B(n)) / self.T(n)), 0.0
        # exact-enough binomial pmf in log space for window selection
        logpmf = [math.lgamma(n + 1) - math.lgamma(e + 1)
                  - math.lgamma(n - e + 1)
                  + e * math.log(eps) + (n - e) * math.log1p(-eps)
                  for e in range(n + 1)]
        pmf = [math.exp(v) for v in logpmf]
        # grow the window outward from the mode until the discarded mass
        # is safely below tail_mass (x0.1 margin for float pmf error)
        order = sorted(range(n + 1), key=lambda e: -pmf[e])
        keep: set = set()
        discarded = 1.0
        for e in order:
            keep.add(e)
            discarded -= pmf[e]
            if discarded < tail_mass * 0.1:
                break
        e_lo, e_hi = min(keep), max(keep)
        eps_f = Fraction(erasure_prob).limit_denominator(10 ** 9)
        total = Fraction(0)
        for e in range(e_lo, e_hi + 1):
            b = self.B(e)
            if b == 0:
                continue
            total += (b * eps_f ** e * (1 - eps_f) ** (n - e)
                      * math.comb(n, e)) / self.T(e)
        return _frac_to_float(total), tail_mass


def _frac_to_float(fr: Fraction) -> float:
    """Fraction -> float via big-int log2 (robust to huge numerators)."""
    if fr == 0:
        return 0.0
    sign = -1.0 if fr < 0 else 1.0
    num, den = abs(fr.numerator), fr.denominator
    log2 = math.log2(num) - math.log2(den)
    if log2 < -1022:
        return sign * 0.0
    if log2 > 1023:
        return sign * math.inf
    return sign * 2.0 ** log2


def _poly_mul_trunc(a, b, deg: int):
    out = [0] * min(len(a) + len(b) - 1, deg + 1)
    for i, ai in enumerate(a):
        if ai and i <= deg:
            for j, bj in enumerate(b):
                if bj and i + j <= deg:
                    out[i + j] += ai * bj
    return tuple(out)


def _poly_pow_trunc(base, e: int, deg: int):
    result = (1,)
    b = tuple(base[: deg + 1])
    while e:
        if e & 1:
            result = _poly_mul_trunc(result, b, deg)
        e >>= 1
        if e:
            b = _poly_mul_trunc(b, b, deg)
    return result


def irregular_expected_stopping_sets(var_degrees, chk_degrees, vmax: int
                                     ) -> List[List[float]]:
    """E[# stopping sets with v_d variables of each degree d] over the
    irregular configuration ensemble -- the (lambda, rho) generalisation
    of :func:`expected_stopping_sets` and the quantitative basis of the
    lambda2 > 0 error floor (the reference has no irregular analysis at
    all; SURVEY C15/C20 context).

    For a composition (v_d)_d with e = sum d v_d socket endpoints, the
    check side admits
    ``e! [x^e] prod_d ((1+x)^d - d x)^{m_d}`` socket-labelled placements
    whose touched checks are all covered >= 2 (each check contributes
    (1+x)^d - d x = untouched + all >=2-subsets), out of E!/(E-e)!
    ordered placements.  Polynomials are truncated at degree
    e_max = vmax * dv_max, so the cost is O(log m) truncated multiplies
    -- n = 10^6 is instant.

    Returns ``totals`` where ``totals[v]`` is a list of
    (expected count, composition dict) for each composition of total
    size v (v = 0..vmax); sum the counts for E[N_v].
    """
    import collections
    import itertools

    var_degrees = np.asarray(var_degrees, np.int64)
    chk_degrees = np.asarray(chk_degrees, np.int64)
    E = int(var_degrees.sum())
    var_counts = collections.Counter(var_degrees.tolist())
    chk_counts = collections.Counter(chk_degrees.tolist())
    degs = sorted(var_counts)
    e_max = vmax * max(degs)

    check_poly = (1,)
    for d, m_d in sorted(chk_counts.items()):
        base = list(_binomial_poly(d))
        base[1] -= d                       # (1+x)^d - d x
        check_poly = _poly_mul_trunc(
            check_poly, _poly_pow_trunc(tuple(base), m_d, e_max), e_max)

    out: List[List] = [[] for _ in range(vmax + 1)]
    out[0].append((1.0, {}))
    for v in range(1, vmax + 1):
        for combo in itertools.combinations_with_replacement(degs, v):
            comp = collections.Counter(combo)
            if any(comp[d] > var_counts[d] for d in comp):
                continue
            e = sum(d * c for d, c in comp.items())
            if e > e_max or e > E:
                continue
            coef = check_poly[e] if e < len(check_poly) else 0
            if coef == 0:
                out[v].append((0.0, dict(comp)))
                continue
            ways = 1
            for d, c in comp.items():
                ways *= math.comb(var_counts[d], c)
            # e! * coef placements / (E falling e) ordered socket choices
            # (falling factorial, NOT E!/(E-e)! via math.factorial --
            # factorial(3e6) has ~2e7 digits)
            falling = 1
            for i in range(e):
                falling *= E - i
            value = Fraction(ways * math.factorial(e) * coef, falling)
            out[v].append((_frac_to_float(value), dict(comp)))
    return out


def lambda2_cycle_floor(lam, rho, erasure_prob, simple: bool = True
                        ) -> float:
    """Asymptotic block-error floor of a lambda2 > 0 ensemble.

    Below threshold the only n->infinity failures are fully-erased
    cycles of degree-2 variables (every other small stopping structure
    has E[count] = O(1/n): a composition with a degree-d>=3 variable
    scales as n^(v - e/2) < 1).  Cycle counts of length k are
    asymptotically independent Poisson with mean x^k / (2k) where
    x = eps * lambda'(0) * rho'(1) (the stability-condition parameter --
    the floor diverges exactly at the stability limit), each fully
    erased w.p. already folded into x via eps.  Hence

      FER_floor = 1 - exp(-sum_k x^k / 2k) = 1 - sqrt(1 - x)  (raw)

    and the SIMPLE (no multi-edge) ensemble drops the k=1 "cycle" (a
    double edge):  FER_floor = 1 - sqrt(1-x) * e^(x/2).

    Exact-finite-n counterparts of the Poisson means are available from
    :func:`irregular_expected_stopping_sets` (its v=1 raw term equals
    x/2 and its v=2 term equals x^2/4 + (x/2)^2/2! at large n --
    verified in tests); the asymptotic formula is the one the measured
    n=10^6 floor validates (docs/VALIDATION.md).
    """
    lam = np.asarray(lam, float)
    rho = np.asarray(rho, float)
    lam2 = float(lam[1])
    rho_d1 = float(sum(i * c for i, c in enumerate(rho)))
    x = float(erasure_prob) * lam2 * rho_d1
    if x >= 1.0:
        return 1.0   # beyond the stability limit: floor saturates
    rate = -0.5 * math.log1p(-x)
    if simple:
        rate -= 0.5 * x
    return 1.0 - math.exp(-rate)


def lambda2_cycle_floor_ber(lam, rho, erasure_prob, n: int,
                            simple: bool = True) -> float:
    """Asymptotic BIT-error floor of a lambda2 > 0 ensemble.

    Each fully-erased degree-2 cycle of length k leaves exactly its k
    bits unresolved, so E[floor erased bits] = sum_k (x^k/2k) * k =
    x/(2(1-x)) (minus the k=1 term x/2 for the simple ensemble:
    x^2/(2(1-x)) total) and BER_floor is that over n.  Companion of
    :func:`lambda2_cycle_floor`; predicts e.g. the measured raw
    below-threshold BER of the LP design ladder (docs/VALIDATION.md).
    """
    lam = np.asarray(lam, float)
    rho = np.asarray(rho, float)
    x = (float(erasure_prob) * float(lam[1])
         * float(sum(i * c for i, c in enumerate(rho))))
    if x >= 1.0:
        return 1.0
    bits = x / (2.0 * (1.0 - x))
    if simple:
        bits -= x / 2.0
    return bits / n


def expected_stopping_sets(n: int, dv: int, dc: int, vmax: int
                           ) -> List[float]:
    """E[# stopping sets of size v] over the configuration ensemble:
    sum_t C(m, t) * total_stopping_sets(v,t) * C(n,v) ... normalised by
    the matching count -- the small-v diagnostic used to justify
    expurgation (SURVEY.md C20 context)."""
    m = (n * dv) // dc
    out = []
    for v in range(vmax + 1):
        acc = Fraction(0)
        for t in range(min(m, v * dv // 2) + 1):
            c = total_stopping_sets(v, dv, dc, t)
            if c:
                acc += math.comb(m, t) * c
        total = (math.comb(n, v) * acc
                 * Fraction(math.factorial(n * dv - v * dv),
                            math.factorial(n * dv))
                 )
        out.append(_frac_to_float(total))
    return out
