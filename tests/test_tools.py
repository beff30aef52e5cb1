"""Tools-layer tests: combine, plotting, checker, profiling, experiments."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import (code_from_dense,
                                               dense_parity_check,
                                               sample_code)
from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
from iib_project_ldpc_codes_tpu.utils.checker import (
    check_code_consistency, duplicate_variable_columns,
    find_low_weight_codewords, minimum_distance_probe)
from iib_project_ldpc_codes_tpu.utils.combine import (combine_directory,
                                                      combine_results)
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
from iib_project_ldpc_codes_tpu.utils.experiments import (
    peeling_scaling_experiment, waterfall_curves)
from iib_project_ldpc_codes_tpu.utils.profiling import (ThroughputCounter,
                                                        time_fn)
from iib_project_ldpc_codes_tpu.utils.results import save_result


def _cfg(seed=1, **kw):
    base = dict(channel="BEC", channel_param=0.42, n=96, dv=3, dc=6,
                decoder="bp", iterations=20, num_tests=256, batch=128,
                max_block_errors=10**9, seed=seed, code_mode="fixed")
    base.update(kw)
    return SimulationConfig(**base)


def test_combine_results_exact():
    code = sample_code(jax.random.key(1), 96, 3, 6)
    r1 = run_simulation(_cfg(seed=1), code=code)
    r2 = run_simulation(_cfg(seed=2), code=code)
    both = combine_results([r1, r2])
    assert both.num_trials == 512
    assert both.block_errors == r1.block_errors + r2.block_errors
    assert both.bit_errors == r1.bit_errors + r2.bit_errors
    want = (np.asarray(r1.error_counts_per_iteration)
            + np.asarray(r2.error_counts_per_iteration))
    assert (np.asarray(both.error_counts_per_iteration) == want).all()
    assert both.bit_error_rate == pytest.approx(
        (r1.bit_errors + r2.bit_errors) / (96 * 512))


def test_combine_rejects_mismatched():
    code = sample_code(jax.random.key(1), 96, 3, 6)
    r1 = run_simulation(_cfg(), code=code)
    r2 = run_simulation(_cfg(channel_param=0.3), code=code)
    with pytest.raises(ValueError):
        combine_results([r1, r2])


def test_combine_directory(tmp_path):
    code = sample_code(jax.random.key(1), 96, 3, 6)
    for seed in (1, 2, 3):
        save_result(run_simulation(_cfg(seed=seed), code=code),
                    str(tmp_path / "shards"))
    out = combine_directory(str(tmp_path / "shards"),
                            str(tmp_path / "combined"))
    assert len(out) == 1
    assert out[0].num_trials == 3 * 256
    assert len(list((tmp_path / "combined").iterdir())) == 1


def test_checker_consistency_and_duplicates():
    code = sample_code(jax.random.key(2), 60, 3, 6)
    assert check_code_consistency(code) == []
    dups = duplicate_variable_columns(code)
    # duplicates imply weight-2 codewords; cross-check the two detectors
    w2 = [t for t in find_low_weight_codewords(code, 2) if len(t) == 2]
    assert sorted(dups) == sorted(w2)


def test_min_distance_probe_consistent_with_duplicates():
    """Weight-2 codewords exist iff two variables share all their checks."""
    code = sample_code(jax.random.key(3), 36, 3, 6)
    dups = duplicate_variable_columns(code)
    got = minimum_distance_probe(code, max_weight=2)
    if dups:
        assert got == 2
    else:
        assert got != 2


def test_weight3_search_finds_xor_triples():
    # Construct a small dense H with a known weight-3 codeword:
    # c2 = c0 xor c1 (columns), rest random but regular enough for export
    rng = np.random.default_rng(5)
    code = sample_code(jax.random.key(6), 48, 3, 6)
    h = dense_parity_check(code)
    triples = [t for t in find_low_weight_codewords(code, 3) if len(t) == 3]
    for (i, j, k) in triples:
        assert not np.logical_xor.reduce(h[:, [i, j, k]], axis=1).any()


def test_peeling_scaling_experiment_runs():
    exp = peeling_scaling_experiment(n=200, dv=3, dc=6, erasure_prob=0.34,
                                     repeats=20, seed=0)
    assert len(exp.trajectories) == 20
    assert exp.drift.shape[0] == int(200 * 0.34)
    assert exp.variance_at_critical > 0
    assert 0 <= exp.failure_rate <= 1
    # below threshold, most trials decode fully
    assert exp.failure_rate < 0.5
    # trajectory endpoints: successful runs end at 0 degree-1 checks
    ok = [t for t, s in zip(exp.trajectories, exp.sizes_at_failure) if s == 0]
    for t in ok[:5]:
        assert t[0] == 0.0


def test_export_peeling_paths(tmp_path):
    """Per-epsilon decoding-path export: reference-format CSV + JSON
    (test_peeling_decoder_path.py:56-62 role)."""
    import csv
    import json

    from iib_project_ldpc_codes_tpu.utils.experiments import (
        export_peeling_paths)

    exp = peeling_scaling_experiment(n=120, dv=3, dc=6, erasure_prob=0.34,
                                     repeats=10, seed=1)
    jpath = export_peeling_paths(exp, str(tmp_path))
    doc = json.loads(open(jpath).read())
    assert doc["erasure_prob"] == 0.34
    assert len(doc["trajectories"]) == 10
    assert len(doc["x"]) == len(doc["analytic_fraction_of_edges"])
    cpath = tmp_path / "peeling_decoder_paths_0.34.csv"
    rows = list(csv.reader(open(cpath)))
    assert rows[0] == ["x", "fraction of edges"]
    assert len(rows) == 1 + len(doc["x"])


def test_waterfall_curves():
    w = waterfall_curves([1000, 5000])
    assert len(w.curves) == 2
    assert abs(w.threshold - 0.42944) < 1e-3
    assert abs(w.alpha - 0.5595) < 1e-3


def test_plotting_smoke(tmp_path):
    mpl = pytest.importorskip("matplotlib")
    mpl.use("Agg")
    from iib_project_ldpc_codes_tpu.utils import plotting

    code = sample_code(jax.random.key(1), 96, 3, 6)
    results = [run_simulation(_cfg(channel_param=e), code=code)
               for e in (0.38, 0.42)]
    exact = {(96, 0.38): 1e-4, (96, 0.42): 1e-3}  # overlay wiring
    figs = [
        plotting.plot_error_vs_iteration(results, exact_values=exact),
        plotting.plot_error_vs_erasure_prob(results, metric="bit",
                                            exact_values=exact),
        plotting.plot_error_vs_n(results),
        plotting.plot_concentration(results),
    ]
    exp = peeling_scaling_experiment(n=120, dv=3, dc=6, erasure_prob=0.34,
                                     repeats=10)
    figs.append(plotting.plot_peeling_trajectories(exp))
    figs.append(plotting.plot_critical_histogram(exp))
    for i, fig in enumerate(figs):
        fig.savefig(tmp_path / f"fig{i}.png", dpi=50)
    assert len(list(tmp_path.iterdir())) == 6


def test_profiling_helpers():
    import jax.numpy as jnp

    f = jax.jit(lambda x: x * 2 + 1)
    t = time_fn(f, jnp.ones(128), reps=3)
    assert t.seconds > 0 and t.per_call > 0
    with ThroughputCounter(info_bits_per_trial=512) as tc:
        tc.add_trials(1000)
    assert tc.bits_per_second > 0
