"""Edge-sharded BP tests: bit-identical to the single-device fast path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code
from iib_project_ldpc_codes_tpu.ops import BEC
from iib_project_ldpc_codes_tpu.ops.bitops import pack_bits
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode_packed_allzero
from iib_project_ldpc_codes_tpu.parallel.edge_sharded import (
    edge_sharded_bp_decode)
from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh


@pytest.mark.parametrize("eps", [0.35, 0.45])
def test_edge_sharded_matches_single_device(eps):
    n, W = 192, 2
    code = sample_code(jax.random.key(1), n, 3, 6)
    mask = BEC(eps).erasure_mask(jax.random.key(2), (n, 32 * W))
    erased = pack_bits(mask)
    mesh = make_mesh()
    assert mesh.size == 8
    single = bp_decode_packed_allzero(code, erased, 60)
    sharded = edge_sharded_bp_decode(code, erased, 60, mesh)
    assert (np.asarray(single.known) == np.asarray(sharded.known)).all()
    assert (np.asarray(single.error_totals)
            == np.asarray(sharded.error_totals)).all()
    assert int(single.iterations) == int(sharded.iterations)


def test_edge_sharded_rejects_indivisible():
    code = sample_code(jax.random.key(3), 100, 3, 6)  # m=50, not /8
    mesh = make_mesh()
    erased = jnp.zeros((100, 1), jnp.uint32)
    with pytest.raises(ValueError):
        edge_sharded_bp_decode(code, erased, 10, mesh)


def test_edge_sharded_large_n_smoke():
    """A 'huge-n' smoke run (n scaled down for CI): decodes below
    threshold."""
    n, W = 4096, 1
    code = sample_code(jax.random.key(4), n, 3, 6)
    mask = BEC(0.40).erasure_mask(jax.random.key(5), (n, 32))
    erased = pack_bits(mask)
    mesh = make_mesh()
    res = edge_sharded_bp_decode(code, erased, 100, mesh)
    # at eps=0.40 < eps* and n=4096, almost all trials decode
    assert float(np.asarray(res.failed).mean()) < 0.3
    assert int(res.error_totals[-1]) <= int(res.error_totals[0])


def test_edge_sharded_mc_bit_identical_to_plain():
    """run_simulation(edge_sharded=True) over an 8-device mesh produces
    counters bit-identical to the plain single-device fixed-code engine:
    same chunk keys -> same erasures, and the edge-sharded decoder reaches
    the same fixed point.  Mesh size is a pure wall-clock knob."""
    from iib_project_ldpc_codes_tpu.models.ensemble import sample_code
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    kw = dict(channel="BEC", channel_param=0.42, n=2048, dv=3, dc=6,
              decoder="bp", iterations=60, num_tests=256, batch=128,
              max_block_errors=10**9, seed=31, code_mode="fixed")
    code = sample_code(jax.random.key(8), 2048, 3, 6)
    plain = run_simulation(SimulationConfig(**kw), code=code)
    sharded = run_simulation(SimulationConfig(edge_sharded=True, **kw),
                             code=code, mesh=make_mesh(jax.devices()[:8]))
    assert sharded.num_trials == plain.num_trials
    assert sharded.block_errors == plain.block_errors
    assert sharded.bit_errors == plain.bit_errors
    assert sharded.bit_errors_sq == plain.bit_errors_sq
    assert sharded.error_counts_per_iteration == \
        plain.error_counts_per_iteration


def test_edge_sharded_mc_stopping_and_checkpoint(tmp_path):
    """Stopping rules + checkpoint/resume work through the edge-sharded
    path (the engine machinery is shared)."""
    from iib_project_ldpc_codes_tpu.models.ensemble import sample_code
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    code = sample_code(jax.random.key(9), 1024, 3, 6)
    mesh = make_mesh(jax.devices()[:4])
    kw = dict(channel="BEC", channel_param=0.45, n=1024, dv=3, dc=6,
              decoder="bp", iterations=50, num_tests=512, batch=64,
              seed=5, code_mode="fixed", edge_sharded=True)
    res = run_simulation(SimulationConfig(max_block_errors=5, **kw),
                         code=code, mesh=mesh)
    assert res.stopped_by == "block_errors"
    assert res.block_errors >= 5

    ck = str(tmp_path / "es.ck")
    full = run_simulation(
        SimulationConfig(max_block_errors=10**9, **kw), code=code,
        mesh=mesh)
    partial_cfg = SimulationConfig(max_block_errors=10**9,
                                   checkpoint_path=ck,
                                   checkpoint_every_chunks=1, **kw)
    partial_cfg.num_tests = 256
    run_simulation(partial_cfg, code=code, mesh=mesh)
    resumed_cfg = SimulationConfig(max_block_errors=10**9,
                                   checkpoint_path=ck,
                                   checkpoint_every_chunks=1, **kw)
    resumed = run_simulation(resumed_cfg, code=code, mesh=mesh)
    assert resumed.bit_errors == full.bit_errors
    assert resumed.block_errors == full.block_errors


def test_edge_sharded_config_validation():
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    with pytest.raises(ValueError):
        SimulationConfig(edge_sharded=True, code_mode="ensemble")
    with pytest.raises(ValueError):
        SimulationConfig(edge_sharded=True, code_mode="fixed",
                         channel="BSC", decoder="gallager")
    with pytest.raises(ValueError):
        SimulationConfig(edge_sharded=True, code_mode="fixed",
                         expurgation=2)


def test_edge_sharded_irregular_bit_identical():
    """Irregular edge-sharded decode == single-device irregular decode,
    bit for bit, on an 8-device mesh (phantom-row padding makes any mesh
    size work: m+1 rows are padded with extra all-phantom rows)."""
    from iib_project_ldpc_codes_tpu.models.irregular import (
        IrregularEnsembleSpec)
    from iib_project_ldpc_codes_tpu.ops.bitops import bernoulli_packed
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_allzero_irregular)
    from iib_project_ldpc_codes_tpu.parallel.edge_sharded import (
        edge_sharded_bp_decode_irregular)
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh

    spec = IrregularEnsembleSpec.from_lam_rho(
        1024, [0, 1 / 3, 0, 2 / 3], [0, 0, 0, 0, 0, 1.0])
    code = spec.sample(jax.random.key(4))
    assert (code.m + 1) % 8 != 0  # exercises the extra-phantom-row pad
    mesh = make_mesh(jax.devices()[:8])
    for eps in (0.35, 0.46):
        erased = bernoulli_packed(jax.random.key(int(eps * 100)), eps,
                                  (1024, 2))
        ref = bp_decode_packed_allzero_irregular(code, erased, 80)
        got = edge_sharded_bp_decode_irregular(code, erased, 80, mesh)
        assert (np.asarray(got.known) == np.asarray(ref.known)).all()
        assert (np.asarray(got.error_totals)
                == np.asarray(ref.error_totals)).all()
        assert int(got.iterations) == int(ref.iterations)


def test_edge_sharded_irregular_mc_engine():
    """edge_sharded=True + (lam, rho) through run_simulation matches the
    unsharded irregular fixed-code engine exactly."""
    from iib_project_ldpc_codes_tpu.models.ensemble import code_for_config
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    kw = dict(channel="BEC", channel_param=0.42, n=512,
              lam=[0, 1 / 3, 0, 2 / 3], rho=[0, 0, 0, 0, 0, 1.0],
              decoder="bp", iterations=60, num_tests=128, batch=64,
              max_block_errors=10**9, seed=6, code_mode="fixed")
    code = code_for_config(SimulationConfig(**kw))
    plain = run_simulation(SimulationConfig(**kw), code=code)
    sharded = run_simulation(SimulationConfig(edge_sharded=True, **kw),
                             code=code, mesh=make_mesh(jax.devices()[:4]))
    assert sharded.block_errors == plain.block_errors
    assert sharded.bit_errors == plain.bit_errors
    assert sharded.error_counts_per_iteration == \
        plain.error_counts_per_iteration
