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


def ber_ci(result: SimulationResult, alpha: float = 0.05
           ) -> Tuple[float, float]:
    """Block-level BER confidence interval.

    Bit errors are correlated *within* a block but blocks are iid, so the
    right unit of observation is the per-block error count e_i: BER_hat =
    (sum e_i)/(n T) and Var(BER_hat) = Var(e)/(T n^2).  With the recorded
    second moment (``result.bit_errors_sq`` = sum e_i^2) the empirical
    block variance gives the exact-asymptotic normal interval -- no
    worst-case bound.  Degenerate/missing-moment cases fall back to the
    conservative p*max_frac variance bound.
    """
    trials = result.num_trials
    n = result.config.n
    p = result.bit_error_rate
    z = _norm_ppf(1 - alpha / 2)
    if result.bit_errors_sq is not None and trials > 1:
        s1 = float(result.bit_errors)
        if s1 == 0.0:
            # Zero observed bit errors says nothing with certainty: use
            # the two-sided Clopper-Pearson bound with 0 successes,
            # P <= ln(2/alpha)/T = ln(40)/T ~= 3.69/T at alpha=0.05
            # (deliberately wider than the one-sided rule of three,
            # ln(20)/T ~= 3/T, to pair with the two-sided intervals
            # everywhere else), scaled by the worst per-block error
            # fraction -- the channel fraction when recorded, else a
            # whole block.
            max_frac = max(result.error_rate_per_iteration[0]
                           if result.error_rate_per_iteration else 1.0, 1 / n)
            return 0.0, math.log(2.0 / alpha) / trials * max_frac
        var_e = (float(result.bit_errors_sq) - s1 * s1 / trials) \
            / (trials - 1)
        var_e = max(var_e, 0.0)
        half = z * math.sqrt(var_e / trials) / n
        # Ensemble mode: trials sharing a sampled code are positively
        # correlated, so the iid interval above is anti-conservative.
        # Recompute at cluster (per-code) granularity from the recorded
        # cluster second moment and take the wider of the two (cluster
        # variance >= iid variance in expectation under positive
        # correlation; max() guards small-sample noise).
        b = result.trials_per_code
        if result.code_bit_errors_sq is not None and b and trials > b:
            c = trials // b  # clusters (codes)
            var_s = (float(result.code_bit_errors_sq) - s1 * s1 / c) \
                / (c - 1)
            half = max(half, z * math.sqrt(max(var_s, 0.0) / c) / (b * n))
        # never report an interval narrower than the count being +-1:
        # the normal approximation is meaningless below one error event
        half = max(half, z / (n * trials))
    else:
        # conservative fallback: per-block fraction variance <= p*max_frac
        max_frac = max(result.error_rate_per_iteration[0]
                       if result.error_rate_per_iteration else 1.0, p)
        half = z * math.sqrt(max(p * max_frac, 1e-300) / trials)
    return max(0.0, p - half), p + half


def compare_ber(result: SimulationResult, expected: float,
                alpha: float = 0.05, slack: float = 0.0
                ) -> ComparisonVerdict:
    """Is the simulated BER consistent with an expected value?

    Uses the block-level empirical-variance interval of :func:`ber_ci`
    (SURVEY.md section 7: "build the CI math into the comparator").
    """
    lo, hi = ber_ci(result, alpha)
    lo, hi = lo * (1 - slack), hi * (1 + slack)
    p = result.bit_error_rate
    return ComparisonVerdict("BER", p, (lo, hi), expected,
                             lo <= expected <= hi)


def block_bootstrap_ci(per_block_errors, n: int, alpha: float = 0.05,
                       num_resamples: int = 2000, seed: int = 0
                       ) -> Tuple[float, float]:
    """Percentile bootstrap CI for the BER from raw per-block error counts.

    Resamples whole blocks (the iid unit), so within-block correlation is
    handled exactly; use when per-trial counts are available (e.g. from
    ops.erasure_bp.bp_decode_packed_traj) and the error distribution is
    too skewed for the normal interval of :func:`ber_ci`.
    """
    import numpy as np

    e = np.asarray(per_block_errors, float)
    t = len(e)
    if t == 0:
        return 0.0, 1.0
    rng = np.random.default_rng(seed)
    idx = rng.integers(0, t, size=(num_resamples, t))
    means = e[idx].mean(axis=1) / n
    lo = float(np.quantile(means, alpha / 2))
    hi = float(np.quantile(means, 1 - alpha / 2))
    return lo, hi


def required_trials_for_fer(fer: float, rel_precision: float = 0.14,
                            alpha: float = 0.05) -> int:
    """Trials needed so the CI half-width is rel_precision * fer
    (the reference's 200-block-error rule corresponds to ~14%)."""
    z = _norm_ppf(1 - alpha / 2)
    return int(math.ceil(z * z * (1 - fer) / (fer * rel_precision ** 2)))
