"""C14 closure: residual-graph degree distributions vs expm theory.

The reference computes the analytic check-degree-distribution evolution of
the residual graph during peeling via matrix exponentials
(test_peeling_decoder_path.py:96-116) but never compares it against a
simulation.  Here the native peeler's incrementally-maintained degree
histogram is snapshotted at fixed unresolved-variable counts and the
edge-fraction distribution X_d(t) is tested against
utils.theory.degree_distribution_at_time.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.utils import theory
from iib_project_ldpc_codes_tpu.utils.experiments import (
    _peel_hist_python, residual_degree_experiment)


def test_initial_distribution_is_edge_weighted_binomial():
    """X_init d = (d/dc) Binom(dc, eps)(d): the expm initial value equals
    the stripping statistics (checks lose participants independently)."""
    import math

    eps, dc = 0.37, 6
    init = theory.initial_degree_distribution(eps, dc)
    want = np.array([(d / dc) * math.comb(dc, d) * eps ** d
                     * (1 - eps) ** (dc - d) for d in range(1, dc + 1)])
    np.testing.assert_allclose(init, want, rtol=1e-10)
    assert init.sum() == pytest.approx(eps)


def test_distribution_at_start_of_peeling_matches_initial():
    eps = 0.41
    x = theory.degree_distribution_at_time(eps, 1 - eps, 3, 6)
    np.testing.assert_allclose(x, theory.initial_degree_distribution(eps, 6),
                               rtol=1e-9, atol=1e-12)


def test_simulated_degrees_match_expm_theory():
    """Monte Carlo residual degree distributions track the expm curves."""
    res = residual_degree_experiment(1024, 3, 6, 0.40, times=(0.65, 0.8),
                                     repeats=48, seed=0)
    assert (res.survivors >= 40).all()  # eps below threshold: most survive
    # calibrated: max |emp - theory| measured 0.0011-0.0026 over seeds 0-2
    assert res.max_abs_error < 0.006
    # exact identity: edge fractions sum to 1 - t by construction
    np.testing.assert_allclose(res.empirical.sum(axis=1), 1 - res.times,
                               atol=1e-12)
    # theory curves carry the same normalisation
    np.testing.assert_allclose(res.analytic.sum(axis=1), 1 - res.times,
                               atol=1e-9)


def test_native_and_python_hist_agree_on_invariants():
    """Both hist backends: sum_d d*hist_d == dv * unresolved at every
    snapshot, and the native peel order matches peel_decode_trials."""
    from iib_project_ldpc_codes_tpu.native import (
        load, peel_decode_trials_hist_native, peel_decode_trials_native)
    from iib_project_ldpc_codes_tpu.ops.channels import BEC, ERASURE

    if load() is None:
        pytest.skip("native library unavailable")
    n, dv, dc = 240, 3, 6
    code = sample_code(jax.random.key(2), n, dv, dc)
    rx = BEC(0.42).transmit(jax.random.key(3), jnp.zeros((n, 8), jnp.int32))
    erased = (np.asarray(rx) == ERASURE).T            # [8, n]
    sample_u = np.array([80, 60, 40, 20], np.int32)
    c2v = np.asarray(code.chk_to_var)
    v2c = np.asarray(code.var_to_chk)

    hist, unresolved, erasures = peel_decode_trials_hist_native(
        c2v, v2c, erased, seed=9, sample_u=sample_u)
    for t in range(8):
        for s, u in enumerate(sample_u):
            if hist[t, s, 0] >= 0:
                assert (hist[t, s] * np.arange(dc + 1)).sum() == dv * u
                assert hist[t, s].sum() == code.m
        # python fallback: identical invariants (different RNG stream)
        py = _peel_hist_python(c2v, v2c, erased[t], sample_u,
                               np.random.default_rng(t))
        for s, u in enumerate(sample_u):
            if py[s, 0] >= 0:
                assert (py[s] * np.arange(dc + 1)).sum() == dv * u

    # same (seed, trial) -> same peel order as the trajectory kernel
    un2, _, _, er2 = peel_decode_trials_native(c2v, v2c, erased, seed=9)
    np.testing.assert_array_equal(unresolved, un2)
    np.testing.assert_array_equal(erasures, er2)


def test_unreached_snapshots_marked():
    """Snapshots above the erasure count or below the stall point are -1."""
    from iib_project_ldpc_codes_tpu.native import (
        load, peel_decode_trials_hist_native)

    if load() is None:
        pytest.skip("native library unavailable")
    n, dv, dc = 120, 3, 6
    code = sample_code(jax.random.key(4), n, dv, dc)
    # all-erased pattern: e = n, BP/peeling stalls immediately (no
    # degree-1 checks in a (3,6) graph with every variable erased)
    erased = np.ones((1, n), np.uint8)
    sample_u = np.array([n, n - 5], np.int32)
    hist, unresolved, erasures = peel_decode_trials_hist_native(
        np.asarray(code.chk_to_var), np.asarray(code.var_to_chk), erased,
        seed=1, sample_u=sample_u)
    assert erasures[0] == n
    assert (hist[0, 0] >= 0).all()          # u = n observed at start
    assert hist[0, 0, dc] == code.m         # every check still degree dc
    assert (hist[0, 1] == -1).all()         # stalled before u = n-5
    assert unresolved[0].all()


def test_plot_degree_distributions_smoke(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from iib_project_ldpc_codes_tpu.utils import plotting

    res = residual_degree_experiment(512, 3, 6, 0.38, times=(0.7, 0.85),
                                     repeats=8, seed=1)
    fig = plotting.plot_degree_distributions(res)
    fig.savefig(tmp_path / "deg.png", dpi=50)
    assert (tmp_path / "deg.png").exists()
