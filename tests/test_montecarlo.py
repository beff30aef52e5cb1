"""Monte Carlo engine tests: counters, stopping rules, sharding, expurgation."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
from iib_project_ldpc_codes_tpu.parallel.montecarlo import (make_chunk_fn,
                                                            run_simulation)
from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
from iib_project_ldpc_codes_tpu.utils.results import (decode_filename,
                                                      encode_filename,
                                                      load_result,
                                                      read_legacy_csv,
                                                      save_result)


def small_cfg(**kw):
    base = dict(channel="BEC", channel_param=0.42, n=96, dv=3, dc=6,
                decoder="bp", iterations=30, num_tests=2048, batch=512,
                max_block_errors=10**9, seed=7, code_mode="fixed")
    base.update(kw)
    return SimulationConfig(**base)


def test_fixed_code_counters_consistent():
    cfg = small_cfg()
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    assert res.num_trials == 2048
    # error_rate[0] should be close to the channel erasure rate
    assert abs(res.error_rate_per_iteration[0] - 0.42) < 0.02
    # block errors <=> nonzero final erasures; bit error rate consistency
    assert res.bit_error_rate == res.bit_errors / (cfg.n * res.num_trials)
    assert res.error_rate_per_iteration[-1] == pytest.approx(
        res.bit_errors / (cfg.n * res.num_trials))
    assert 0 <= res.block_error_rate <= 1
    # monotone average trajectory
    assert (np.diff(res.error_rate_per_iteration) <= 1e-12).all()


def test_reproducibility_same_seed():
    cfg = small_cfg()
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    r1 = run_simulation(cfg, code=code)
    r2 = run_simulation(cfg, code=code)
    assert r1.error_counts_per_iteration == r2.error_counts_per_iteration
    assert r1.block_errors == r2.block_errors


def test_block_error_early_stop():
    cfg = small_cfg(channel_param=0.48, max_block_errors=20,
                    num_tests=10**6, batch=256)
    code = sample_code(jax.random.key(2), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    assert res.stopped_by == "block_errors"
    assert res.block_errors >= 20
    assert res.num_trials < 10**6


def test_ensemble_mode_runs():
    cfg = small_cfg(code_mode="ensemble", codes_per_chunk=4, batch=256,
                    num_tests=256)
    res = run_simulation(cfg)
    assert res.num_trials == 256
    assert abs(res.error_rate_per_iteration[0] - 0.42) < 0.05


def test_expurgation_excludes_trials():
    cfg = small_cfg(channel_param=0.45, expurgation=0, num_tests=512,
                    batch=512)
    code = sample_code(jax.random.key(3), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    cfg_plain = small_cfg(channel_param=0.45, num_tests=512, batch=512)
    res_plain = run_simulation(cfg_plain, code=code)
    # expurgation=0 excludes exactly the successful trials
    assert res.excluded_trials == 512 - res_plain.block_errors
    # block/bit errors are unchanged (only successful trials are dropped)
    assert res.block_errors == res_plain.block_errors
    assert res.bit_errors == res_plain.bit_errors
    # the iteration-0 average now counts only failing trials' erasures
    assert res.error_counts_per_iteration[0] <= \
        res_plain.error_counts_per_iteration[0]


def test_sharded_matches_single_device():
    """psum'd multi-device chunk == single-device chunk with matched keys.

    Exact equality is not expected (different per-device key folds), but
    statistics must agree; and determinism across repeated sharded runs must
    be exact.
    """
    cfg = small_cfg(batch=512, num_tests=512)
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    mesh = make_mesh()
    assert mesh.size == 8, "conftest should provide 8 virtual cpu devices"
    r1 = run_simulation(cfg, code=code, mesh=mesh)
    r2 = run_simulation(cfg, code=code, mesh=mesh)
    assert r1.error_counts_per_iteration == r2.error_counts_per_iteration
    r_single = run_simulation(cfg, code=code)
    assert abs(r1.error_rate_per_iteration[0]
               - r_single.error_rate_per_iteration[0]) < 0.02
    assert r1.num_trials == r_single.num_trials


def test_sharded_counters_exact_sum():
    """The mesh chunk's psum'd ChunkStats equal -- exactly, as integers --
    the sum of single-device chunks run with the same fold_in(key, idx)
    keys (SURVEY.md section 2 reduction semantics: 'exactly psum on a few
    small int vectors')."""
    cfg = small_cfg(batch=512, num_tests=512)
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    mesh = make_mesh()
    n_dev = mesh.size
    assert n_dev == 8

    key = jax.random.key(42)
    sharded = jax.device_get(make_chunk_fn(cfg, code, mesh)(key))

    cfg_one = small_cfg(batch=cfg.batch // n_dev, num_tests=512)
    single_fn = make_chunk_fn(cfg_one, code, mesh=None)
    parts = [jax.device_get(single_fn(jax.random.fold_in(key, d)))
             for d in range(n_dev)]

    assert int(sharded.block_errors) == sum(
        int(p.block_errors) for p in parts)
    assert int(sharded.bit_errors) == sum(int(p.bit_errors) for p in parts)
    assert int(sharded.excluded) == sum(int(p.excluded) for p in parts)
    np.testing.assert_array_equal(
        np.asarray(sharded.error_totals, np.int64),
        np.sum([np.asarray(p.error_totals, np.int64) for p in parts],
               axis=0))


def test_sharded_counters_exact_sum_ensemble():
    """Same exact-integer identity on the ensemble (fresh codes) path."""
    cfg = small_cfg(code_mode="ensemble", codes_per_chunk=16, batch=512,
                    num_tests=512)
    mesh = make_mesh()
    n_dev = mesh.size
    key = jax.random.key(5)
    sharded = jax.device_get(make_chunk_fn(cfg, None, mesh)(key))
    cfg_one = small_cfg(code_mode="ensemble",
                        codes_per_chunk=cfg.codes_per_chunk // n_dev,
                        batch=cfg.batch // n_dev, num_tests=512)
    single_fn = make_chunk_fn(cfg_one, None, mesh=None)
    parts = [jax.device_get(single_fn(jax.random.fold_in(key, d)))
             for d in range(n_dev)]
    assert int(sharded.block_errors) == sum(
        int(p.block_errors) for p in parts)
    np.testing.assert_array_equal(
        np.asarray(sharded.error_totals, np.int64),
        np.sum([np.asarray(p.error_totals, np.int64) for p in parts],
               axis=0))


def test_result_roundtrip(tmp_path):
    cfg = small_cfg(num_tests=256, batch=256, output_dir=str(tmp_path),
                    write_legacy_csv=True)
    code = sample_code(jax.random.key(1), cfg.n, cfg.dv, cfg.dc)
    res = run_simulation(cfg, code=code)
    path = save_result(res)
    loaded = load_result(path)
    assert loaded.block_errors == res.block_errors
    assert loaded.config.n == cfg.n
    params = decode_filename(path)
    assert params["n"] == "96" and params["BEC"] == "0.42"
    csvs = [p for p in tmp_path.iterdir() if p.suffix == ".csv"]
    assert len(csvs) == 1
    legacy = read_legacy_csv(str(csvs[0]))
    assert legacy["Message passing block-wise error"] == \
        pytest.approx(res.block_error_rate)
    assert len(legacy["error_rate_per_iteration"]) == cfg.iterations + 1


def test_reference_argv_parsing():
    cfg = SimulationConfig.from_reference_argv(
        ["0.42", "10000", "200", "1024", "3", "6", "0", "99"])
    assert cfg.channel_param == 0.42 and cfg.decoder == "bp"
    assert cfg.code_mode == "ensemble" and cfg.seed == 99
    cfg5 = SimulationConfig.from_reference_argv(
        ["0.4", "1000", "50", "512", "3", "6", "5", "3"])
    assert cfg5.decoder == "both" and cfg5.code_mode == "fixed"
    assert cfg5.code_number == 3


def test_checkpoint_resume_bit_identical(tmp_path):
    """An interrupted+resumed run equals an uninterrupted one exactly."""
    ckpt = str(tmp_path / "state.json")
    cfg_full = small_cfg(num_tests=2048, batch=256)
    code = sample_code(jax.random.key(1), cfg_full.n, cfg_full.dv,
                       cfg_full.dc)
    full = run_simulation(cfg_full, code=code)

    cfg_half = small_cfg(num_tests=1024, batch=256, checkpoint_path=ckpt,
                         checkpoint_every_chunks=2)
    run_simulation(cfg_half, code=code)
    cfg_resume = small_cfg(num_tests=2048, batch=256, checkpoint_path=ckpt)
    resumed = run_simulation(cfg_resume, code=code)

    assert resumed.num_trials == full.num_trials
    assert resumed.block_errors == full.block_errors
    assert resumed.bit_errors == full.bit_errors
    assert resumed.error_counts_per_iteration == \
        full.error_counts_per_iteration


def test_checkpoint_ignored_on_seed_change(tmp_path):
    ckpt = str(tmp_path / "state.json")
    code = sample_code(jax.random.key(1), 96, 3, 6)
    run_simulation(small_cfg(num_tests=512, batch=256,
                             checkpoint_path=ckpt), code=code)
    fresh = run_simulation(small_cfg(num_tests=512, batch=256, seed=99,
                                     checkpoint_path=ckpt), code=code)
    assert fresh.num_trials == 512  # restarted, not resumed


def test_check_vma_passes():
    """The ensemble chunk shard_map runs with the vma checker ON.

    Pins down two jax 0.9.0 behaviours the samplers must work around
    (models/ensemble._with_key_vma):

      1. sort-derived index outputs (argsort, and therefore
         jax.random.permutation) drop the operand's varying-manual-axes
         type under shard_map;
      2. a scan/fori_loop nested inside a while_loop body hard-errors on
         the resulting carry vma mismatch instead of letting the while
         fixpoint promote the carry.
    """
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(jax.devices()[:2])

    # (1) the underlying jax bug, as a canary: if this starts preserving
    # vma, the _with_key_vma re-tag (and this test) can be removed.
    def probe(key):
        k = jax.random.fold_in(key, jax.lax.axis_index(mesh.axis_names[0]))
        bits = jax.random.bits(k, (16,), jnp.uint32)
        assert jax.typeof(bits).vma, "bits should be varying"
        assert not jax.typeof(jnp.argsort(bits)).vma, \
            "jax fixed argsort vma propagation -- drop _with_key_vma"
        return jax.lax.psum(jnp.sum(bits), mesh.axis_names[0])

    jax.jit(jax.shard_map(probe, mesh=mesh, in_specs=P(), out_specs=P()))(
        jax.random.key(0))

    # (2) the production chunk kernels type-check with check_vma on
    # (make_chunk_fn no longer passes check_vma=False) for both samplers.
    for sampler in ("repair", "reject"):
        cfg = small_cfg(code_mode="ensemble", num_tests=512, batch=512,
                        sampler=sampler)
        fn = make_chunk_fn(cfg, None, mesh)
        stats = fn(jax.random.key(3))
        assert int(stats.block_errors) >= 0


def test_chunk_fn_compile_cache_reused_across_sweep_points():
    """An eps sweep must reuse one compiled chunk executable (the channel
    parameter is traced, not baked): same static config at two eps ->
    the same cached jit; changing a static (iterations) -> a different
    one.  Counters must match a fresh engine run exactly (the cache key
    covers every static the trace reads)."""
    from iib_project_ldpc_codes_tpu.parallel import montecarlo as mc

    def cfg(eps, iterations=20):
        return SimulationConfig(channel="BEC", channel_param=eps, n=128,
                                dv=3, dc=6, decoder="bp",
                                iterations=iterations, num_tests=256,
                                batch=256, max_block_errors=10 ** 9,
                                seed=5, code_mode="ensemble")

    mc._CHUNK_CACHE.clear()
    f1 = mc.make_chunk_fn(cfg(0.40), None)
    assert len(mc._CHUNK_CACHE) == 1
    f2 = mc.make_chunk_fn(cfg(0.45), None)
    assert len(mc._CHUNK_CACHE) == 1      # sweep point: cache hit
    mc.make_chunk_fn(cfg(0.40, iterations=21), None)
    assert len(mc._CHUNK_CACHE) == 2      # static change: new entry

    # chunk results are pure functions of (key, eps): the two sweep
    # points share the executable but differ in output
    import jax

    s1 = jax.device_get(f1(jax.random.key(0)))
    s2 = jax.device_get(f2(jax.random.key(0)))
    assert int(s1.bit_errors) != int(s2.bit_errors)
    # and a run through the engine equals a fresh-cache run bit-for-bit
    r1 = run_simulation(cfg(0.42))
    mc._CHUNK_CACHE.clear()
    r2 = run_simulation(cfg(0.42))
    assert r1.bit_errors == r2.bit_errors
    assert r1.block_errors == r2.block_errors
    assert r1.error_counts_per_iteration == r2.error_counts_per_iteration
