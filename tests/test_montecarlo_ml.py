"""Monte Carlo ML/both/peeling driver tests (reference modes 1/2/4/5)."""

import jax
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig


def cfg_for(decoder, **kw):
    base = dict(channel="BEC", channel_param=0.42, n=48, dv=3, dc=6,
                decoder=decoder, iterations=20, num_tests=128, batch=64,
                max_block_errors=10**9, seed=11, code_mode="fixed")
    base.update(kw)
    return SimulationConfig(**base)


def test_ml_only_fixed():
    cfg = cfg_for("ml")
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    assert res.num_trials == 128
    assert res.optimal_block_error_rate is not None
    assert 0 <= res.optimal_block_error_rate <= 1
    assert res.optimal_bit_error_rate <= res.optimal_block_error_rate


def test_both_ml_dominates_bp():
    """On the same channel outputs, ML block errors <= BP block errors."""
    cfg = cfg_for("both", num_tests=256, batch=128)
    code = sample_code(jax.random.key(2), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    assert res.optimal_block_errors <= res.block_errors
    assert res.optimal_bit_errors <= res.bit_errors
    # BP per-iteration curve exists in both mode
    assert len(res.error_rate_per_iteration) == cfg.iterations + 1
    assert res.error_rate_per_iteration[0] > 0.3


def test_ml_ensemble_mode():
    cfg = cfg_for("ml", code_mode="ensemble", num_tests=64, batch=64)
    res = run_simulation(cfg)
    assert res.num_trials == 64
    assert res.optimal_block_error_rate is not None


def test_peeling_driver_matches_bp_rates():
    """Peeling and BP have identical final error patterns on the BEC, so
    their Monte Carlo block/bit rates must agree exactly at matched noise
    (different RNG streams here, so compare within loose CI)."""
    code = sample_code(jax.random.key(3), 96, 3, 6)
    cfg_p = cfg_for("peeling", n=96, num_tests=512, batch=256,
                    channel_param=0.45)
    cfg_b = cfg_for("bp", n=96, num_tests=512, batch=256,
                    channel_param=0.45, iterations=100)
    rp = run_simulation(cfg_p, code=code)
    rb = run_simulation(cfg_b, code=code)
    assert abs(rp.block_error_rate - rb.block_error_rate) < 0.12
    assert rp.num_trials == rb.num_trials == 512


def test_peeling_ensemble_mode():
    cfg = cfg_for("peeling", n=96, num_tests=256, batch=128,
                  code_mode="ensemble", channel_param=0.45)
    res = run_simulation(cfg)
    assert res.num_trials == 256
    assert 0 <= res.block_error_rate <= 1


def test_ml_array_job_combine_recipe():
    """The blessed multi-process recipe for the host-path drivers
    (montecarlo._run_ml_or_both is single-process by design): run
    independent seeds as separate jobs and reduce with combine_results.
    Counts must merge integer-exactly and rates re-derive from the
    merged counts."""
    from iib_project_ldpc_codes_tpu.utils.combine import combine_results

    code = sample_code(jax.random.key(1), 48, 3, 6)
    shards = [run_simulation(cfg_for("both", seed=s), code=code)
              for s in (21, 22, 23)]
    merged = combine_results(shards)
    assert merged.num_trials == sum(r.num_trials for r in shards)
    assert merged.optimal_block_errors == sum(
        r.optimal_block_errors for r in shards)
    assert merged.optimal_bit_errors == sum(
        r.optimal_bit_errors for r in shards)
    assert merged.block_errors == sum(r.block_errors for r in shards)
    want = np.sum([r.error_counts_per_iteration for r in shards], axis=0)
    np.testing.assert_array_equal(merged.error_counts_per_iteration, want)
    assert merged.bit_error_rate == pytest.approx(
        merged.bit_errors / (48 * merged.num_trials))
    # shards genuinely differ (different seeds -> different noise)
    assert len({r.bit_errors for r in shards}) > 1
