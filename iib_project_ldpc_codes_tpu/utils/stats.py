"""Statistical acceptance machinery: confidence intervals and comparators.

SURVEY.md section 7 "hard parts": matching BER/FER "within 95% CI"
requires the harness to compute CIs properly (Clopper-Pearson on block
errors; the reference's 200-error stop rule gives ~+-14% relative FER
precision) -- build the CI math into the comparator, not the eyeball.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Tuple

from .results import SimulationResult


def clopper_pearson(successes: int, trials: int, alpha: float = 0.05
                    ) -> Tuple[float, float]:
    """Exact binomial (1-alpha) CI for a proportion."""
    if trials == 0:
        return 0.0, 1.0
    from scipy.stats import beta

    lo = 0.0 if successes == 0 else float(
        beta.ppf(alpha / 2, successes, trials - successes + 1))
    hi = 1.0 if successes == trials else float(
        beta.ppf(1 - alpha / 2, successes + 1, trials - successes))
    return lo, hi


def wilson(successes: int, trials: int, alpha: float = 0.05
           ) -> Tuple[float, float]:
    """Wilson score interval (cheap, no scipy dependency)."""
    if trials == 0:
        return 0.0, 1.0
    z = _norm_ppf(1 - alpha / 2)
    p = successes / trials
    denom = 1 + z * z / trials
    centre = (p + z * z / (2 * trials)) / denom
    half = z * math.sqrt(p * (1 - p) / trials
                         + z * z / (4 * trials * trials)) / denom
    return max(0.0, centre - half), min(1.0, centre + half)


def _norm_ppf(q: float) -> float:
    """Inverse standard-normal CDF (Acklam rational approximation)."""
    # coefficients
    a = [-3.969683028665376e+01, 2.209460984245205e+02,
         -2.759285104469687e+02, 1.383577518672690e+02,
         -3.066479806614716e+01, 2.506628277459239e+00]
    b = [-5.447609879822406e+01, 1.615858368580409e+02,
         -1.556989798598866e+02, 6.680131188771972e+01,
         -1.328068155288572e+01]
    c = [-7.784894002430293e-03, -3.223964580411365e-01,
         -2.400758277161838e+00, -2.549732539343734e+00,
         4.374664141464968e+00, 2.938163982698783e+00]
    d = [7.784695709041462e-03, 3.224671290700398e-01,
         2.445134137142996e+00, 3.754408661907416e+00]
    plow = 0.02425
    if q < plow:
        u = math.sqrt(-2 * math.log(q))
        return (((((c[0] * u + c[1]) * u + c[2]) * u + c[3]) * u + c[4])
                * u + c[5]) / ((((d[0] * u + d[1]) * u + d[2]) * u + d[3])
                               * u + 1)
    if q > 1 - plow:
        return -_norm_ppf(1 - q)
    u = q - 0.5
    t = u * u
    return (((((a[0] * t + a[1]) * t + a[2]) * t + a[3]) * t + a[4]) * t
            + a[5]) * u / (((((b[0] * t + b[1]) * t + b[2]) * t + b[3]) * t
                            + b[4]) * t + 1)


@dataclasses.dataclass
class ComparisonVerdict:
    quantity: str
    observed: float
    ci: Tuple[float, float]
    expected: float
    consistent: bool

    def __str__(self):
        mark = "OK " if self.consistent else "FAIL"
        return (f"[{mark}] {self.quantity}: observed {self.observed:.4g} "
                f"(95% CI {self.ci[0]:.4g}..{self.ci[1]:.4g}) vs expected "
                f"{self.expected:.4g}")


def fer_ci(result: SimulationResult, alpha: float = 0.05,
           optimal: bool = False) -> Tuple[float, float]:
    k = (result.optimal_block_errors if optimal else result.block_errors)
    return clopper_pearson(int(k or 0), result.num_trials, alpha)


def compare_fer(result: SimulationResult, expected: float,
                alpha: float = 0.05, slack: float = 0.0
                ) -> ComparisonVerdict:
    """Is the simulated FER consistent with an expected value?

    ``slack`` widens the interval multiplicatively to absorb model error
    (e.g. the scaling law's O(n^-1/3) finite-size terms).
    """
    lo, hi = fer_ci(result, alpha)
    lo, hi = lo * (1 - slack), hi * (1 + slack)
    rate = result.block_error_rate
    return ComparisonVerdict("FER", rate, (lo, hi), expected,
                             lo <= expected <= hi)


def compare_ber(result: SimulationResult, expected: float,
                alpha: float = 0.05, slack: float = 0.0
                ) -> ComparisonVerdict:
    """BER comparison treating bit errors as n*trials Bernoulli draws.

    Bit errors within a block are correlated, so the naive interval is
    too narrow; the effective-sample-size correction uses blocks (the
    conservative choice): CI computed on block-averaged error fractions.
    """
    trials = result.num_trials
    # conservative: treat each *block* as one observation of its bit-error
    # fraction; normal interval on the mean with variance bound p(1-p)
    p = result.bit_error_rate
    z = _norm_ppf(1 - alpha / 2)
    # worst-case per-block variance: a failed block has O(eps n) errors;
    # bound the per-block fraction variance by p * max_frac
    max_frac = max(result.error_rate_per_iteration[0]
                   if result.error_rate_per_iteration else 1.0, p)
    half = z * math.sqrt(max(p * max_frac, 1e-300) / trials)
    lo, hi = max(0.0, p - half), p + half
    lo, hi = lo * (1 - slack), hi * (1 + slack)
    return ComparisonVerdict("BER", p, (lo, hi), expected,
                             lo <= expected <= hi)


def required_trials_for_fer(fer: float, rel_precision: float = 0.14,
                            alpha: float = 0.05) -> int:
    """Trials needed so the CI half-width is rel_precision * fer
    (the reference's 200-block-error rule corresponds to ~14%)."""
    z = _norm_ppf(1 - alpha / 2)
    return int(math.ceil(z * z * (1 - fer) / (fer * rel_precision ** 2)))
