"""Statistical acceptance tests + sweep drivers.

These are the BER/FER parity tests SURVEY.md section 4 prescribes: Monte
Carlo results must be statistically consistent with density evolution,
the waterfall scaling law, and per-code concentration.
"""

import math

import jax
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
from iib_project_ldpc_codes_tpu.utils import theory
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
from iib_project_ldpc_codes_tpu.utils.stats import (clopper_pearson,
                                                    compare_fer, fer_ci,
                                                    required_trials_for_fer,
                                                    wilson, _norm_ppf)
from iib_project_ldpc_codes_tpu.utils.sweeps import (concentration_study,
                                                     sweep_block_length,
                                                     sweep_channel_param)


def test_clopper_pearson_properties():
    lo, hi = clopper_pearson(0, 100)
    assert lo == 0.0 and 0.02 < hi < 0.05
    lo, hi = clopper_pearson(100, 100)
    assert hi == 1.0 and lo > 0.95
    lo, hi = clopper_pearson(200, 1000)
    assert lo < 0.2 < hi
    # ~14% relative precision at 200 errors (SURVEY.md hard-parts note)
    assert (hi - lo) / 2 / 0.2 < 0.16


def test_wilson_close_to_cp():
    for k, n in [(5, 100), (50, 500), (200, 1000)]:
        cp = clopper_pearson(k, n)
        wi = wilson(k, n)
        assert abs(cp[0] - wi[0]) < 0.02
        assert abs(cp[1] - wi[1]) < 0.02


def test_norm_ppf():
    assert _norm_ppf(0.975) == pytest.approx(1.959964, abs=1e-4)
    assert _norm_ppf(0.5) == pytest.approx(0.0, abs=1e-9)
    assert _norm_ppf(0.025) == pytest.approx(-1.959964, abs=1e-4)


def test_required_trials():
    # 200 block errors at FER ~ p needs ~ 200/p trials; the CI formula
    # should give the same order
    t = required_trials_for_fer(0.01, rel_precision=0.14)
    assert 15_000 < t < 25_000


def test_fer_consistent_with_deep_subthreshold():
    """Far below threshold at moderate n, FER is tiny: CI must include
    the waterfall prediction ~ 0."""
    cfg = SimulationConfig(channel_param=0.30, n=1024, decoder="bp",
                           iterations=80, num_tests=2048, batch=1024,
                           max_block_errors=10**9, code_mode="fixed")
    code = sample_code(jax.random.key(0), cfg.n, 3, 6)
    res = run_simulation(cfg, code=code)
    lo, hi = fer_ci(res)
    expected = float(theory.waterfall_block_error(1024, [0.30])[0])
    assert lo <= max(expected, 1e-12) <= max(hi, 1e-12)
    assert res.block_error_rate < 0.01


def test_fer_against_waterfall_near_threshold():
    """Near threshold the scaling law (with finite-size shift) must sit
    within the widened Monte Carlo CI (model error O(n^-1/3) absorbed via
    slack)."""
    eps = 0.415
    n = 2048
    cfg = SimulationConfig(channel_param=eps, n=n, decoder="bp",
                           iterations=100, num_tests=4096, batch=2048,
                           max_block_errors=10**9, code_mode="ensemble",
                           codes_per_chunk=64)
    res = run_simulation(cfg)
    predicted = float(theory.waterfall_block_error(
        n, [eps], finite_size_shift=True)[0])
    verdict = compare_fer(res, predicted, slack=0.35)
    assert verdict.consistent, str(verdict)


def test_iteration_curve_tracks_density_evolution():
    """Early-iteration average bit erasure rates converge to DE as n grows
    (SURVEY.md section 4 item 1)."""
    eps = 0.40
    cfg = SimulationConfig(channel_param=eps, n=8192, decoder="bp",
                           iterations=10, num_tests=4096, batch=2048,
                           max_block_errors=10**9, code_mode="ensemble",
                           codes_per_chunk=64)
    res = run_simulation(cfg)
    de = theory.modified_density_evolution(eps, 10, 3, 6)
    sim = res.error_rate_per_iteration
    for t in range(1, 6):
        # relative agreement a few percent at n=8192 for early iterations
        assert abs(sim[t] - de[t]) / de[t] < 0.05, (t, sim[t], de[t])


def test_sweep_channel_param():
    code = sample_code(jax.random.key(1), 512, 3, 6)
    base = SimulationConfig(n=512, decoder="bp", iterations=50,
                            num_tests=512, batch=512,
                            max_block_errors=10**9, code_mode="fixed")
    rs = sweep_channel_param(base, [0.35, 0.40, 0.45], code=code)
    fers = [r.block_error_rate for r in rs]
    assert fers[0] <= fers[1] <= fers[2]
    assert rs[0].config.channel_param == 0.35


def test_sweep_block_length():
    base = SimulationConfig(channel_param=0.40, decoder="bp",
                            iterations=60, num_tests=512, batch=512,
                            max_block_errors=10**9, code_mode="fixed")
    rs = sweep_block_length(base, [256, 1024])
    # below threshold: larger n decodes better
    assert rs[1].block_error_rate <= rs[0].block_error_rate + 0.05
    assert [r.config.n for r in rs] == [256, 1024]


def test_concentration_study():
    base = SimulationConfig(channel_param=0.42, n=512, decoder="bp",
                            iterations=50, num_tests=1024, batch=1024,
                            max_block_errors=10**9)
    rs = concentration_study(base, range(1, 5))
    rates = np.array([r.bit_error_rate for r in rs])
    # different codes, same ensemble: rates concentrate (within ~3x)
    assert rates.max() <= max(3 * rates.min(), rates.min() + 0.02)
    # codes are genuinely different objects
    assert len({r.config.code_number for r in rs}) == 4


def _fake_result(per_block_errors, n):
    """SimulationResult carrying the counters of given per-block counts."""
    from iib_project_ldpc_codes_tpu.utils.results import SimulationResult

    e = np.asarray(per_block_errors, np.int64)
    cfg = SimulationConfig(channel="BEC", channel_param=0.4, n=n, dv=3,
                           dc=6, decoder="bp", num_tests=len(e),
                           batch=32, max_block_errors=10**9)
    return SimulationResult(
        config=cfg, num_trials=len(e),
        error_rate_per_iteration=[0.4],
        block_error_rate=float((e > 0).mean()),
        bit_error_rate=float(e.sum()) / (n * len(e)),
        block_errors=int((e > 0).sum()), bit_errors=int(e.sum()),
        bit_errors_sq=float((e.astype(float) ** 2).sum()))


def test_ber_ci_coverage_property():
    """~95% of empirical-variance intervals cover the true BER (synthetic
    failed-block mixture: fail w.p. q, then Binomial(n, mu) errors)."""
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci

    n, q, mu = 1024, 0.12, 0.18
    true_ber = q * mu
    rng = np.random.default_rng(7)
    reps, trials = 300, 400
    hits = 0
    for _ in range(reps):
        fails = rng.random(trials) < q
        e = np.where(fails, rng.binomial(n, mu, size=trials), 0)
        lo, hi = ber_ci(_fake_result(e, n))
        hits += lo <= true_ber <= hi
    assert 0.88 <= hits / reps <= 0.99


def test_ber_ci_tighter_than_worst_case_bound():
    """The empirical-variance interval beats the old p*max_frac bound."""
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci, _norm_ppf

    n = 1024
    rng = np.random.default_rng(3)
    e = np.where(rng.random(2000) < 0.1, rng.binomial(n, 0.15, 2000), 0)
    res = _fake_result(e, n)
    lo, hi = ber_ci(res)
    p = res.bit_error_rate
    z = _norm_ppf(0.975)
    worst_half = z * math.sqrt(p * 0.4 / res.num_trials)
    assert (hi - lo) / 2 < worst_half
    assert lo < p < hi


def test_ber_ci_fallback_without_moment():
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci

    res = _fake_result([0, 10, 0, 5] * 50, 96)
    res.bit_errors_sq = None
    lo, hi = ber_ci(res)
    assert 0 <= lo < res.bit_error_rate < hi


def test_block_bootstrap_matches_normal_interval():
    """Bootstrap and empirical-variance intervals agree on large samples."""
    from iib_project_ldpc_codes_tpu.utils.stats import (block_bootstrap_ci,
                                                        ber_ci)

    n = 512
    rng = np.random.default_rng(11)
    e = np.where(rng.random(4000) < 0.2, rng.binomial(n, 0.2, 4000), 0)
    blo, bhi = block_bootstrap_ci(e, n, seed=1)
    nlo, nhi = ber_ci(_fake_result(e, n))
    assert abs(blo - nlo) < 0.15 * (nhi - nlo)
    assert abs(bhi - nhi) < 0.15 * (nhi - nlo)


def test_bit_errors_sq_recorded_by_engine():
    """The engine's recorded second moment equals the sum of squared
    per-trial final counts (cross-checked via the trajectory kernel)."""
    from iib_project_ldpc_codes_tpu.ops.bitops import bernoulli_packed
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_traj)
    import jax.numpy as jnp

    cfg = SimulationConfig(channel="BEC", channel_param=0.45, n=96, dv=3,
                           dc=6, decoder="bp", iterations=20, num_tests=256,
                           batch=256, max_block_errors=10**9, seed=3,
                           code_mode="fixed")
    code = sample_code(jax.random.key(2), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    key = jax.random.key(cfg.seed)
    want = 0.0
    for c in range(256 // cfg.batch or 1):
        erased = bernoulli_packed(jax.random.fold_in(key, c), 0.45,
                                  (cfg.n, cfg.batch // 32))
        _, traj = bp_decode_packed_traj(code, erased,
                                        jnp.zeros_like(erased), 20)
        want += float((np.asarray(traj)[-1].astype(float) ** 2).sum())
    assert res.bit_errors_sq == pytest.approx(want, rel=1e-6)


def test_compare_ber_verdict_on_simulation():
    """compare_ber accepts a simulation against its own rerun's BER."""
    from iib_project_ldpc_codes_tpu.utils.stats import compare_ber

    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=96, dv=3,
                           dc=6, decoder="bp", iterations=30,
                           num_tests=4096, batch=512,
                           max_block_errors=10**9, seed=5,
                           code_mode="fixed")
    code = sample_code(jax.random.key(4), cfg.n, cfg.dv, cfg.dc)
    r1 = run_simulation(cfg, code=code)
    # reference value from a 4x larger independent run (its own noise is
    # then small against r1's CI width)
    cfg2 = SimulationConfig(**{**cfg.__dict__, "seed": 99,
                               "num_tests": 16384})
    r2 = run_simulation(cfg2, code=code)
    v = compare_ber(r1, r2.bit_error_rate)
    assert v.consistent, str(v)
    # and a clearly-wrong expectation is rejected
    assert not compare_ber(r1, 2.0 * r1.bit_error_rate + 0.01).consistent


def test_ber_ci_zero_errors_rule_of_three():
    """Zero observed errors must not yield a zero-width certainty interval."""
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci, compare_ber

    res = _fake_result([0] * 200, 1024)
    lo, hi = ber_ci(res)
    assert lo == 0.0
    assert hi > 0.0
    # rule-of-three flavour: upper bound shrinks ~1/T
    res2 = _fake_result([0] * 2000, 1024)
    assert ber_ci(res2)[1] < hi
    assert ber_ci(res2)[1] == pytest.approx(hi / 10, rel=0.01)
    # compare_ber no longer rejects a small nonzero expectation outright
    assert compare_ber(res, hi / 2).consistent


def test_ber_ci_zero_errors_respects_alpha():
    """The zero-error upper bound must scale with alpha (generalised rule
    of three, ln(2/alpha)/T), not hardcode the 95% value."""
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci

    res = _fake_result([0] * 500, 1024)
    hi95 = ber_ci(res, alpha=0.05)[1]
    hi99 = ber_ci(res, alpha=0.01)[1]
    assert hi99 > hi95  # stricter confidence -> wider upper bound
    assert hi99 / hi95 == pytest.approx(
        math.log(2 / 0.01) / math.log(2 / 0.05), rel=1e-9)
    # alpha=0.05 reproduces ln(40)/T ~= 3.7/T (the classic rule of three
    # up to the exact CP constant), scaled by the recorded channel
    # fraction max_frac = 0.4
    assert hi95 == pytest.approx(math.log(40.0) / 500 * 0.4, rel=1e-9)


def test_cluster_ci_widens_under_per_code_correlation():
    """Ensemble-mode CI uses the per-code cluster variance: with strongly
    correlated trials within a code the clustered interval must be wider
    than the iid per-trial interval would claim."""
    from iib_project_ldpc_codes_tpu.utils.stats import ber_ci

    n, b, codes = 1024, 32, 60
    rng = np.random.default_rng(5)
    # bimodal ensemble: a "bad code" fails all 32 of its trials alike
    bad = rng.random(codes) < 0.2
    per_code = np.where(bad, 40, 0)             # per-trial errors, by code
    e = np.repeat(per_code, b)                  # [codes * b] trial counts
    res = _fake_result(e, n)
    iid = ber_ci(res)
    res.trials_per_code = b
    s_c = per_code.astype(float) * b            # per-code cluster sums
    res.code_bit_errors_sq = float((s_c ** 2).sum())
    clustered = ber_ci(res)
    assert clustered[1] - clustered[0] > 2.0 * (iid[1] - iid[0])


def test_cluster_moment_recorded_by_engine():
    """Ensemble runs record sum-of-squared per-code error totals; with one
    code per 32-trial lane group the cluster moment is >= the per-trial one
    and the result carries the cluster size."""
    cfg = SimulationConfig(channel="BEC", channel_param=0.44, n=96, dv=3,
                           dc=6, decoder="bp", iterations=20, num_tests=512,
                           batch=512, max_block_errors=10**9, seed=9,
                           code_mode="ensemble", codes_per_chunk=16)
    res = run_simulation(cfg)
    assert res.trials_per_code == 32
    assert res.code_bit_errors_sq is not None
    assert res.code_bit_errors_sq >= res.bit_errors_sq - 1e-6
    # Cauchy-Schwarz sanity: sum s_c^2 >= (sum s_c)^2 / C
    c = res.num_trials // res.trials_per_code
    assert res.code_bit_errors_sq >= (res.bit_errors ** 2) / c - 1e-6
