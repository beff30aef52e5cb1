"""Interop with CSVs produced by the reference's OWN writer code.

The three writer functions below are vendored verbatim from
parallel_simulator.py:20-42 (only the hardcoded ``base_directory`` is a
parameter) and the filenames follow parallel_simulator.py:250-260 /
:384-397 exactly, so these fixtures produce byte-level what a reference
HPC shard would have written.  The tests assert that

  * ``read_legacy_csv`` parses curve + labelled summary rows,
  * ``result_from_legacy_csv`` reconstructs the reference's integer
    counts exactly (the ``round(rate*num*n)`` rule the reference's own
    reducer uses, tools/combine_data.py:49), and
  * ``combine_results`` over two ingested reference shards reproduces
    the summed counts -- the reference's ensemble_combine
    (tools/combine_data.py:65-95) outcome, exactly.

No reference checkout needed: the writers are vendored (they are the
interop contract itself).
"""

import csv

import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.utils.combine import combine_results
from iib_project_ldpc_codes_tpu.utils.results import (read_legacy_csv,
                                                      result_from_legacy_csv)


# --- vendored reference writers (parallel_simulator.py:20-42) ---------------

def write_optimal_file(base_directory, filename, optimal_block_error,
                       optimal_bit_error):
    with open(base_directory + filename, 'w', newline='') as csvfile:
        writer = csv.writer(csvfile)
        writer.writerow(['Optimal decoding block-wise error',
                         optimal_block_error])
        writer.writerow(['Optimal decoding bit-wise error',
                         optimal_bit_error])


def write_message_passing_file(base_directory, filename, errors,
                               message_passing_block_error,
                               message_passing_bit_error):
    with open(base_directory + filename, 'w', newline='') as csvfile:
        writer = csv.writer(csvfile)
        for error_at_iteration in errors:
            writer.writerow([error_at_iteration])
        writer.writerow(['Message passing block-wise error',
                         message_passing_block_error])
        writer.writerow(['Message passing bit-wise error',
                         message_passing_bit_error])


def write_combined_file(base_directory, filename, errors,
                        message_passing_block_error,
                        message_passing_bit_error, optimal_block_error,
                        optimal_bit_error):
    with open(base_directory + filename, 'w', newline='') as csvfile:
        writer = csv.writer(csvfile)
        for error_at_iteration in errors:
            writer.writerow([error_at_iteration])
        writer.writerow(['Message passing block-wise error',
                         message_passing_block_error])
        writer.writerow(['Message passing bit-wise error',
                         message_passing_bit_error])
        writer.writerow(['Optimal decoding block-wise error',
                         optimal_block_error])
        writer.writerow(['Optimal decoding bit-wise error',
                         optimal_bit_error])


# ---------------------------------------------------------------------------

N, K, DV, DC, ITERS = 512, 256, 3, 6, 50


def _reference_filename(num, stamp, code_number=None):
    """parallel_simulator.py:250-260 (ensemble) / :384-397 (fixed)."""
    filename = 'regular_code'
    if code_number is not None:
        filename += '_code_number=' + str(code_number)
    filename += '_BEC=' + str(0.42)
    filename += '_n=' + str(N)
    filename += '_k=' + str(K)
    filename += '_dv=' + str(DV)
    filename += '_dc=' + str(DC)
    filename += '_it=' + str(ITERS)
    filename += '_num=' + str(num)
    filename += '_time=' + stamp
    filename += '.csv'
    return filename


def _shard(rng, num):
    """Synthetic integer shard counts + the rates the reference writes."""
    counts = np.sort(rng.integers(0, num * N // 5, ITERS + 1))[::-1]
    block = int(rng.integers(1, num // 3))
    bits = int(counts[-1])
    return dict(counts=counts, block=block, bits=bits,
                avg=counts / (num * N), block_rate=block / num,
                bit_rate=bits / (num * N))


def test_message_passing_file_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    num = 12_345
    s = _shard(rng, num)
    name = _reference_filename(num, '01-01-2022-10-00-00')
    write_message_passing_file(str(tmp_path) + '/', name, s["avg"],
                               s["block_rate"], s["bit_rate"])
    parsed = read_legacy_csv(str(tmp_path / name))
    assert len(parsed["error_rate_per_iteration"]) == ITERS + 1
    assert parsed["Message passing block-wise error"] == \
        pytest.approx(s["block_rate"])
    r = result_from_legacy_csv(str(tmp_path / name))
    assert r.num_trials == num
    assert r.config.decoder == "bp"
    assert r.config.code_mode == "ensemble"
    assert r.config.iterations == ITERS
    assert r.block_errors == s["block"]
    assert r.bit_errors == s["bits"]
    assert r.error_counts_per_iteration == s["counts"].tolist()


def test_combined_file_roundtrip_fixed_code(tmp_path):
    rng = np.random.default_rng(1)
    num = 4_000
    s = _shard(rng, num)
    opt_block, opt_bits = 37, 911
    name = _reference_filename(num, '01-01-2022-11-00-00', code_number=3)
    write_combined_file(str(tmp_path) + '/', name, s["avg"],
                        s["block_rate"], s["bit_rate"],
                        opt_block / num, opt_bits / (num * N))
    r = result_from_legacy_csv(str(tmp_path / name))
    assert r.config.decoder == "both"
    assert r.config.code_mode == "fixed" and r.config.code_number == 3
    assert r.optimal_block_errors == opt_block
    assert r.optimal_bit_errors == opt_bits
    assert r.block_errors == s["block"]


def test_optimal_file_roundtrip(tmp_path):
    num = 2_000
    name = _reference_filename(num, '01-01-2022-12-00-00')
    write_optimal_file(str(tmp_path) + '/', name, 11 / num,
                       254 / (num * N))
    r = result_from_legacy_csv(str(tmp_path / name))
    assert r.config.decoder == "ml"
    assert r.optimal_block_errors == 11
    assert r.optimal_bit_errors == 254
    assert r.error_counts_per_iteration is None


def test_combine_reference_shards_exact(tmp_path):
    """Two reference-writer shards -> combine_results == summed counts
    (the ensemble_combine outcome, tools/combine_data.py:65-95, exactly,
    integer for integer)."""
    rng = np.random.default_rng(2)
    shards = []
    for i, num in enumerate((10_000, 15_000)):
        s = _shard(rng, num)
        name = _reference_filename(num, f'01-01-2022-13-00-0{i}')
        write_message_passing_file(str(tmp_path) + '/', name, s["avg"],
                                   s["block_rate"], s["bit_rate"])
        s["num"], s["name"] = num, name
        shards.append(s)
    combined = combine_results(
        [result_from_legacy_csv(str(tmp_path / s["name"])) for s in shards])
    total_num = sum(s["num"] for s in shards)
    assert combined.num_trials == total_num
    assert combined.block_errors == sum(s["block"] for s in shards)
    assert combined.bit_errors == sum(s["bits"] for s in shards)
    want_counts = (shards[0]["counts"] + shards[1]["counts"]).tolist()
    assert combined.error_counts_per_iteration == want_counts
    # the recombined per-iteration curve is the count-weighted average,
    # not the shard-rate average
    assert combined.error_rate_per_iteration == pytest.approx(
        [c / (total_num * N) for c in want_counts])


def test_expurgated_reference_filename_ingest(tmp_path):
    """The reference's expurgated writer prefixes
    'regular_code_expurgated=<s>' (parallel_simulator_expurgated.py
    :262-265); the ingester must carry it into cfg.expurgation --
    'expurgation' is a merge key, so dropping it would let expurgated
    and raw shards silently combine."""
    rng = np.random.default_rng(3)
    num = 5_000
    s = _shard(rng, num)
    name = ('regular_code_expurgated=2' +
            _reference_filename(num, '01-01-2022-14-00-00')[len(
                'regular_code'):])
    write_message_passing_file(str(tmp_path) + '/', name, s["avg"],
                               s["block_rate"], s["bit_rate"])
    r = result_from_legacy_csv(str(tmp_path / name))
    assert r.config.expurgation == 2
    raw_name = _reference_filename(num, '01-01-2022-14-00-01')
    write_message_passing_file(str(tmp_path) + '/', raw_name, s["avg"],
                               s["block_rate"], s["bit_rate"])
    raw = result_from_legacy_csv(str(tmp_path / raw_name))
    with pytest.raises(ValueError, match="mismatched"):
        combine_results([r, raw])


def test_optimal_only_csv_merges_with_native_ml_shard(tmp_path):
    """Reference optimal-only filenames carry no 'it=' segment
    (parallel_simulator.py:256 adds it only for message passing);
    iterations is meaningless for the ML decoder and must not block the
    merge with a native decoder='ml' shard."""
    import jax

    from iib_project_ldpc_codes_tpu.models import sample_code
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=48, dv=3,
                           dc=6, decoder="ml", iterations=50,
                           num_tests=64, batch=64,
                           max_block_errors=10 ** 9, seed=3,
                           code_mode="ensemble")
    native = run_simulation(cfg)

    num = 2_000
    name = ('regular_code_BEC=0.42_n=48_k=24_dv=3_dc=6'
            f'_num={num}_time=01-01-2022-15-00-00.csv')
    write_optimal_file(str(tmp_path) + '/', name, 11 / num,
                       254 / (num * 48))
    ingested = result_from_legacy_csv(str(tmp_path / name))
    assert ingested.config.iterations == 0   # no 'it=' and no curve
    merged = combine_results([native, ingested])
    assert merged.num_trials == native.num_trials + num
    assert merged.optimal_block_errors == \
        native.optimal_block_errors + 11
    assert merged.optimal_bit_errors == native.optimal_bit_errors + 254
