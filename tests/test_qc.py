"""Quasi-cyclic (protograph-lifted) codes: structure + roll-decoder
bit-exactness against the generic gather decoder on the expanded code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models.qc import QCLDPCCode, sample_qc_code
from iib_project_ldpc_codes_tpu.ops.bitops import bernoulli_packed
from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
    bp_decode, bp_decode_packed, bp_decode_packed_allzero)
from iib_project_ldpc_codes_tpu.ops.qc_bp import (qc_bp_decode_packed,
                                                  qc_bp_decode_packed_allzero)


@pytest.fixture(scope="module")
def qc():
    return sample_qc_code(jax.random.key(3), nb=12, dv=3, dc=6, Z=16)


def test_qc_expand_structure(qc):
    code = qc.expand()
    assert code.n == 12 * 16 and qc.m == 6 * 16 and code.m == qc.m
    chk = np.asarray(code.chk_to_var)
    # simple: a simple base graph lifts to a simple code for any shifts
    srt = np.sort(chk, axis=1)
    assert not (srt[:, 1:] == srt[:, :-1]).any()
    # regular degrees
    counts = np.bincount(chk.reshape(-1), minlength=code.n)
    assert (counts == 3).all()
    # circulant structure: check (c, z+1)'s sockets are check (c, z)'s
    # participants' next lift positions (same block, z+1 mod Z)
    Z = qc.Z
    blocks = chk // Z
    offs = chk % Z
    for c in (0, 3):
        assert (blocks[c * Z] == blocks[c * Z + 1]).all()
        assert ((offs[c * Z] + 1) % Z == offs[c * Z + 1]).all()


@pytest.mark.parametrize("eps", [0.3, 0.42, 0.5])
def test_qc_allzero_bit_exact(qc, eps):
    """Roll decoder == generic gather decoder on the expanded code,
    bit for bit: known planes, error trajectory, iteration count."""
    code = qc.expand()
    erased = bernoulli_packed(jax.random.key(hash(eps) % 1000), eps,
                              (code.n, 3))
    a = qc_bp_decode_packed_allzero(qc, erased, 30)
    b = bp_decode_packed_allzero(code, erased, 30)
    np.testing.assert_array_equal(np.asarray(a.known), np.asarray(b.known))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_array_equal(np.asarray(a.failed), np.asarray(b.failed))


def test_qc_full_decode_bit_exact(qc):
    """Nonzero-transmit variant: val planes must match too."""
    from iib_project_ldpc_codes_tpu.models.encode import (encode_packed,
                                                          encoder_planes,
                                                          make_encoder)

    code = qc.expand()
    enc = make_encoder(code)
    planes = encoder_planes(enc)
    info = bernoulli_packed(jax.random.key(8), 0.5, (enc.k_eff, 2))
    tx = encode_packed(planes, info)
    erased = bernoulli_packed(jax.random.key(9), 0.42, (code.n, 2))
    a = qc_bp_decode_packed(qc, erased, tx, 30)
    b = bp_decode_packed(code, erased, tx, 30)
    np.testing.assert_array_equal(np.asarray(a.known), np.asarray(b.known))
    np.testing.assert_array_equal(np.asarray(a.val & a.known),
                                  np.asarray(b.val & b.known))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))


def test_qc_matches_naive_oracle(qc):
    """Transitively covered by the packed==naive suite, but pin one
    direct single-word comparison against the {0,1,2} oracle."""
    from iib_project_ldpc_codes_tpu.ops import BEC
    from iib_project_ldpc_codes_tpu.ops.bitops import pack_bits

    code = qc.expand()
    rx = BEC(0.42).transmit(jax.random.key(11),
                            jnp.zeros(code.n, jnp.int32))
    dec, errs, _ = bp_decode(code, rx, 30)
    erased = pack_bits(jnp.asarray(
        np.tile(np.asarray(rx == 2)[:, None], (1, 32))))
    res = qc_bp_decode_packed_allzero(qc, erased, 30)
    want_unresolved = np.asarray(dec) == 2
    got_unresolved = np.asarray(
        (~res.known[:, 0] >> jnp.uint32(0)) & 1).astype(bool)
    np.testing.assert_array_equal(got_unresolved, want_unresolved)
    assert int(res.error_totals[-1]) == 32 * int(errs[-1])


def test_qc_through_monte_carlo_engine(qc):
    """expand() makes QC codes first-class in the existing engine."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    code = qc.expand()
    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=code.n,
                           dv=3, dc=6, decoder="bp", iterations=30,
                           num_tests=256, batch=128,
                           max_block_errors=10 ** 9, seed=1,
                           code_mode="fixed")
    r = run_simulation(cfg, code=code)
    assert r.num_trials == 256
    assert 0 < r.block_error_rate < 1


def test_qc_engine_fast_path_bit_identical_to_expand(qc):
    """run_simulation on the QC object (roll fast path) must produce
    BIT-IDENTICAL counters to running on code.expand() (generic
    kernels): same seed -> same chunk keys -> same erasure planes ->
    the decoders are bit-identical -> every statistic equal."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=qc.n,
                           dv=3, dc=6, decoder="bp", iterations=30,
                           num_tests=512, batch=256,
                           max_block_errors=10 ** 9, seed=9,
                           code_mode="fixed")
    fast = run_simulation(cfg, code=qc)
    generic = run_simulation(cfg, code=qc.expand())
    assert fast.num_trials == generic.num_trials
    assert fast.block_errors == generic.block_errors
    assert fast.bit_errors == generic.bit_errors
    assert fast.bit_errors_sq == generic.bit_errors_sq
    assert fast.error_counts_per_iteration == \
        generic.error_counts_per_iteration


def test_qc_engine_other_modes_expand_transparently(qc):
    """Non-fast-path modes (here: ML decoder and expurgated BEC) accept
    the QC object and run via expand()."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    r = run_simulation(SimulationConfig(
        channel="BEC", channel_param=0.42, n=qc.n, dv=3, dc=6,
        decoder="ml", iterations=10, num_tests=64, batch=64,
        max_block_errors=10 ** 9, seed=2, code_mode="fixed"), code=qc)
    assert r.num_trials == 64
    assert r.optimal_block_error_rate is not None
    r2 = run_simulation(SimulationConfig(
        channel="BEC", channel_param=0.45, n=qc.n, dv=3, dc=6,
        decoder="bp", iterations=20, num_tests=128, batch=128,
        expurgation=1, max_block_errors=10 ** 9, seed=3,
        code_mode="fixed"), code=qc)
    assert r2.num_trials == 128


def test_qc_engine_sharded_matches_unsharded(qc):
    """The QC fast path under an 8-device batch mesh: psum'd counters
    (different per-device keys, so equality with the unsharded run is
    statistical-by-construction -- what IS exact is the trial count and
    the plausibility bands; the decoder itself is the bit-exact roll
    kernel)."""
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=qc.n,
                           dv=3, dc=6, decoder="bp", iterations=30,
                           num_tests=2048, batch=512,
                           max_block_errors=10 ** 9, seed=4,
                           code_mode="fixed")
    mesh = make_mesh()
    sharded = run_simulation(cfg, code=qc, mesh=mesh)
    single = run_simulation(cfg, code=qc)
    assert sharded.num_trials == single.num_trials == 2048
    assert sharded.bit_errors > 0
    # same regime within loose Monte Carlo bands
    assert abs(sharded.block_error_rate - single.block_error_rate) < 0.1


def test_qc_soft_int8_bit_exact(qc):
    """Roll-based int8 min-sum == generic int8 min-sum on the expanded
    code, bit for bit (integer arithmetic is order-independent)."""
    from iib_project_ldpc_codes_tpu.ops import AWGN
    from iib_project_ldpc_codes_tpu.ops.qc_soft_bp import qc_soft_bp_decode
    from iib_project_ldpc_codes_tpu.ops.soft_bp import soft_bp_decode

    code = qc.expand()
    ch = AWGN(0.9)
    llr = ch.llr(ch.transmit(jax.random.key(30),
                             jnp.zeros((code.n, 64), jnp.int32)))
    a = qc_soft_bp_decode(qc, llr, 25, method="minsum",
                          msg_dtype=jnp.int8)
    b = soft_bp_decode(code, llr, 25, method="minsum",
                       msg_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_array_equal(np.asarray(a.posterior),
                                  np.asarray(b.posterior))
    np.testing.assert_array_equal(np.asarray(a.satisfied),
                                  np.asarray(b.satisfied))


@pytest.mark.parametrize("method", ["minsum", "sumproduct"])
def test_qc_soft_float_matches_generic(qc, method):
    """Float paths agree to roundoff (posterior addition order differs);
    hard decisions and counters must still coincide at these SNRs."""
    from iib_project_ldpc_codes_tpu.ops import AWGN
    from iib_project_ldpc_codes_tpu.ops.qc_soft_bp import qc_soft_bp_decode
    from iib_project_ldpc_codes_tpu.ops.soft_bp import soft_bp_decode

    code = qc.expand()
    ch = AWGN(0.85)
    llr = ch.llr(ch.transmit(jax.random.key(31),
                             jnp.zeros((code.n, 32), jnp.int32)))
    a = qc_soft_bp_decode(qc, llr, 20, method=method)
    b = soft_bp_decode(code, llr, 20, method=method)
    np.testing.assert_allclose(np.asarray(a.posterior),
                               np.asarray(b.posterior),
                               rtol=1e-4, atol=1e-3)
    assert np.mean(np.asarray(a.hard) == np.asarray(b.hard)) > 0.999


def test_qc_engine_soft_int8_bit_identical_to_expand(qc):
    """The engine's QC soft fast path draws the same LLRs from the same
    chunk keys as the generic _soft_chunk, and the int8 decoder is
    bit-exact -- so whole-run counters must be identical."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="AWGN", channel_param=0.9, n=qc.n,
                           dv=3, dc=6, decoder="minsum",
                           soft_msg_dtype="int8", iterations=20,
                           num_tests=256, batch=128,
                           max_block_errors=10 ** 9, seed=17,
                           code_mode="fixed")
    fast = run_simulation(cfg, code=qc)
    generic = run_simulation(cfg, code=qc.expand())
    assert fast.num_trials == generic.num_trials == 256
    assert fast.block_errors == generic.block_errors
    assert fast.bit_errors == generic.bit_errors
    assert fast.error_counts_per_iteration == \
        generic.error_counts_per_iteration


def test_qc_soft_int8_rejects_alpha_beta(qc):
    """Same loud contract as the generic decoder: int8 + alpha/beta
    must raise, not silently break the bit-identity guarantee."""
    from iib_project_ldpc_codes_tpu.ops.qc_soft_bp import qc_soft_bp_decode

    llr = jnp.ones((qc.n, 32), jnp.float32)
    with pytest.raises(ValueError, match="saturation"):
        qc_soft_bp_decode(qc, llr, 5, method="minsum",
                          msg_dtype=jnp.int8, alpha=0.8)


def test_qc_engine_soft_int8_sharded(qc):
    """The QC int8 soft fast path under the 8-device batch mesh (the
    vma re-tag regression the round-5 review caught: un-tagged
    while_loop carries hard-error at trace time under shard_map)."""
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="AWGN", channel_param=0.9, n=qc.n,
                           dv=3, dc=6, decoder="minsum",
                           soft_msg_dtype="int8", iterations=15,
                           num_tests=512, batch=256,
                           max_block_errors=10 ** 9, seed=19,
                           code_mode="fixed")
    r = run_simulation(cfg, code=qc, mesh=make_mesh())
    assert r.num_trials == 512
    assert r.bit_errors > 0


def test_qc_engine_float_soft_expands(qc):
    """Float soft dtypes go through expand() (no bit-identity claim for
    roundoff-different paths): the run must succeed and match the
    explicit expanded run exactly, because it IS the expanded path."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="AWGN", channel_param=0.9, n=qc.n,
                           dv=3, dc=6, decoder="sumproduct",
                           iterations=10, num_tests=128, batch=128,
                           max_block_errors=10 ** 9, seed=23,
                           code_mode="fixed")
    a = run_simulation(cfg, code=qc)
    b = run_simulation(cfg, code=qc.expand())
    assert a.error_counts_per_iteration == b.error_counts_per_iteration


def test_qc_gallager_bit_exact(qc):
    """Roll-based Gallager-A == generic on the expanded code, bit for
    bit (pure bitwise algebra), incl. per-trial trajectories."""
    from iib_project_ldpc_codes_tpu.ops.gallager import (
        gallager_decode_packed)
    from iib_project_ldpc_codes_tpu.ops.qc_gallager import (
        qc_gallager_decode_packed)

    code = qc.expand()
    received = bernoulli_packed(jax.random.key(40), 0.05, (code.n, 4))
    for thresh in (None, 1):
        a = qc_gallager_decode_packed(qc, received, 15, threshold=thresh,
                                      record="per_trial")
        b = gallager_decode_packed(code, received, 15, threshold=thresh,
                                   record="per_trial")
        np.testing.assert_array_equal(np.asarray(a.decided),
                                      np.asarray(b.decided))
        np.testing.assert_array_equal(np.asarray(a.traj),
                                      np.asarray(b.traj))
        np.testing.assert_array_equal(np.asarray(a.error_totals),
                                      np.asarray(b.error_totals))
        assert int(a.iterations) == int(b.iterations)


def test_qc_engine_gallager_bit_identical_to_expand(qc):
    """The Gallager QC fast path: whole-run counters identical to the
    generic engine on expand() (same keys, bit-exact decoder)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BSC", channel_param=0.05, n=qc.n,
                           dv=3, dc=6, decoder="gallager",
                           iterations=15, num_tests=256, batch=128,
                           max_block_errors=10 ** 9, seed=31,
                           code_mode="fixed")
    fast = run_simulation(cfg, code=qc)
    generic = run_simulation(cfg, code=qc.expand())
    assert fast.block_errors == generic.block_errors
    assert fast.bit_errors == generic.bit_errors
    assert fast.error_counts_per_iteration == \
        generic.error_counts_per_iteration


def test_qc_degenerate_lift_is_base_code():
    """Z=1 lift == the base code itself (shifts all 0 mod 1)."""
    from iib_project_ldpc_codes_tpu.models.ensemble import sample_check_table

    qc = sample_qc_code(jax.random.key(6), nb=24, dv=3, dc=6, Z=1)
    code = qc.expand()
    assert code.n == 24
    np.testing.assert_array_equal(np.asarray(code.chk_to_var),
                                  np.asarray(qc.base_chk))
    # and the base table is exactly what the regular sampler draws from
    # the split subkey (sample_qc_code splits (base, shifts))
    k_base, _ = jax.random.split(jax.random.key(6))
    np.testing.assert_array_equal(
        np.asarray(qc.base_chk),
        np.asarray(sample_check_table(k_base, 24, 3, 6, "repair")))


def test_qc_sampler_reproducible_and_shift_range():
    a = sample_qc_code(jax.random.key(7), nb=12, dv=3, dc=6, Z=37)
    b = sample_qc_code(jax.random.key(7), nb=12, dv=3, dc=6, Z=37)
    np.testing.assert_array_equal(np.asarray(a.base_chk),
                                  np.asarray(b.base_chk))
    np.testing.assert_array_equal(np.asarray(a.shifts),
                                  np.asarray(b.shifts))
    sh = np.asarray(a.shifts)
    assert sh.min() >= 0 and sh.max() < 37
    c = sample_qc_code(jax.random.key(8), nb=12, dv=3, dc=6, Z=37)
    assert not np.array_equal(np.asarray(a.shifts), np.asarray(c.shifts))


# ---------------------------------------------------------------------------
# Irregular protograph bases (IrregularQCLDPCCode)
# ---------------------------------------------------------------------------

LAM = [0, 1 / 3, 0, 2 / 3]
RHO = [0, 0, 0, 0, 0, 1.0]


@pytest.fixture(scope="module")
def iqc():
    from iib_project_ldpc_codes_tpu.models.qc import sample_qc_code_irregular

    return sample_qc_code_irregular(jax.random.key(50), nb=24, lam=LAM,
                                    rho=RHO, Z=16)


def test_irregular_qc_expand_structure(iqc):
    from iib_project_ldpc_codes_tpu.models.irregular import (
        validate_irregular_code)

    code = iqc.expand()
    assert code.n == 24 * 16 and code.m == iqc.mb * 16
    validate_irregular_code(code)
    # lifted degrees replicate the base degrees Z-fold
    base_vdeg = np.bincount(
        np.asarray(iqc.base_chk)[np.asarray(iqc.base_chk) < iqc.nb],
        minlength=iqc.nb)
    np.testing.assert_array_equal(
        np.asarray(code.var_degrees), np.repeat(base_vdeg, iqc.Z))


@pytest.mark.parametrize("eps", [0.35, 0.45])
def test_irregular_qc_bec_bit_exact(iqc, eps):
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_allzero_irregular)

    code = iqc.expand()
    erased = bernoulli_packed(jax.random.key(int(eps * 100)), eps,
                              (iqc.n, 3))
    a = qc_bp_decode_packed_allzero(iqc, erased, 30)
    b = bp_decode_packed_allzero_irregular(code, erased, 30)
    np.testing.assert_array_equal(np.asarray(a.known), np.asarray(b.known))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))
    assert int(a.iterations) == int(b.iterations)


def test_irregular_qc_soft_int8_bit_exact(iqc):
    from iib_project_ldpc_codes_tpu.ops import AWGN
    from iib_project_ldpc_codes_tpu.ops.qc_soft_bp import qc_soft_bp_decode
    from iib_project_ldpc_codes_tpu.ops.soft_bp import (
        soft_bp_decode_irregular)

    code = iqc.expand()
    ch = AWGN(0.9)
    llr = ch.llr(ch.transmit(jax.random.key(51),
                             jnp.zeros((iqc.n, 64), jnp.int32)))
    a = qc_soft_bp_decode(iqc, llr, 20, method="minsum",
                          msg_dtype=jnp.int8)
    b = soft_bp_decode_irregular(code, llr, 20, method="minsum",
                                 msg_dtype=jnp.int8)
    np.testing.assert_array_equal(np.asarray(a.hard), np.asarray(b.hard))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))
    assert int(a.iterations) == int(b.iterations)
    np.testing.assert_array_equal(np.asarray(a.posterior),
                                  np.asarray(b.posterior))


@pytest.mark.parametrize("thresh", [None, 1])
def test_irregular_qc_gallager_bit_exact(iqc, thresh):
    from iib_project_ldpc_codes_tpu.ops.gallager import (
        gallager_decode_packed_irregular)
    from iib_project_ldpc_codes_tpu.ops.qc_gallager import (
        qc_gallager_decode_packed)

    code = iqc.expand()
    received = bernoulli_packed(jax.random.key(52), 0.04, (iqc.n, 3))
    a = qc_gallager_decode_packed(iqc, received, 15, threshold=thresh)
    b = gallager_decode_packed_irregular(code, received, 15,
                                         threshold=thresh)
    np.testing.assert_array_equal(np.asarray(a.decided),
                                  np.asarray(b.decided))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))
    assert int(a.iterations) == int(b.iterations)


def test_irregular_qc_engine_bit_identical(iqc):
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.45, n=iqc.n,
                           lam=LAM, rho=RHO, decoder="bp",
                           iterations=30, num_tests=256, batch=128,
                           max_block_errors=10 ** 9, seed=53,
                           code_mode="fixed")
    fast = run_simulation(cfg, code=iqc)
    generic = run_simulation(cfg, code=iqc.expand())
    assert fast.error_counts_per_iteration == \
        generic.error_counts_per_iteration
    assert fast.block_errors == generic.block_errors


def test_irregular_qc_gallager_degree_one_and_uniform_base():
    """Round-5 review regressions: (a) degree-1 variable blocks (5G
    parity-extension columns) must decode, matching the generic
    irregular kernel; (b) a degree-UNIFORM irregular base with an
    explicit threshold > d-1 must use the irregular clamp rule, not the
    regular raw rule."""
    from iib_project_ldpc_codes_tpu.models.qc import IrregularQCLDPCCode
    from iib_project_ldpc_codes_tpu.ops.gallager import (
        gallager_decode_packed_irregular)
    from iib_project_ldpc_codes_tpu.ops.qc_gallager import (
        qc_gallager_decode_packed)

    # (a) hand-built base with a degree-1 block (block 3)
    base = jnp.asarray([[0, 1, 2], [0, 1, 3]], jnp.int32)
    sh = jnp.asarray([[0, 1, 2], [3, 0, 1]], jnp.int32)
    iqc = IrregularQCLDPCCode(base_chk=base, shifts=sh, Z=8, nb=4, mb=2)
    received = bernoulli_packed(jax.random.key(60), 0.1, (iqc.n, 2))
    a = qc_gallager_decode_packed(iqc, received, 10)
    b = gallager_decode_packed_irregular(iqc.expand(), received, 10)
    np.testing.assert_array_equal(np.asarray(a.decided),
                                  np.asarray(b.decided))
    np.testing.assert_array_equal(np.asarray(a.error_totals),
                                  np.asarray(b.error_totals))

    # (b) degree-uniform irregular base (every block degree 2),
    # threshold > d-1: the clamp must engage like the generic kernel's
    base2 = jnp.asarray([[0, 1, 2, 3], [0, 2, 4, 5],
                         [1, 3, 4, 5]], jnp.int32)
    sh2 = jnp.asarray([[0, 1, 2, 3], [1, 2, 3, 0],
                       [2, 3, 0, 1]], jnp.int32)
    iqc2 = IrregularQCLDPCCode(base_chk=base2, shifts=sh2, Z=8, nb=6,
                               mb=3)
    received2 = bernoulli_packed(jax.random.key(61), 0.1, (iqc2.n, 2))
    a2 = qc_gallager_decode_packed(iqc2, received2, 10, threshold=3)
    b2 = gallager_decode_packed_irregular(iqc2.expand(), received2, 10,
                                          threshold=3)
    np.testing.assert_array_equal(np.asarray(a2.decided),
                                  np.asarray(b2.decided))
    np.testing.assert_array_equal(np.asarray(a2.error_totals),
                                  np.asarray(b2.error_totals))


def test_qc_engine_bsc_int8_bit_identical(qc):
    """The remaining fast-path gate cell: BSC channel + int8 min-sum."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BSC", channel_param=0.06, n=qc.n,
                           dv=3, dc=6, decoder="minsum",
                           soft_msg_dtype="int8", iterations=15,
                           num_tests=128, batch=128,
                           max_block_errors=10 ** 9, seed=37,
                           code_mode="fixed")
    fast = run_simulation(cfg, code=qc)
    generic = run_simulation(cfg, code=qc.expand())
    assert fast.error_counts_per_iteration == \
        generic.error_counts_per_iteration
    assert fast.bit_errors == generic.bit_errors


def test_irregular_qc_engine_gallager_bit_identical(iqc):
    """The irregular-QC Gallager engine contract the round-5 review
    probed: fast path == expand() path, whole-run, with and without an
    explicit (clamped) threshold."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    for thresh in (None, 3):
        cfg = SimulationConfig(channel="BSC", channel_param=0.04,
                               n=iqc.n, lam=LAM, rho=RHO,
                               decoder="gallager",
                               gallager_threshold=thresh, iterations=15,
                               num_tests=128, batch=128,
                               max_block_errors=10 ** 9, seed=41,
                               code_mode="fixed")
        fast = run_simulation(cfg, code=iqc)
        generic = run_simulation(cfg, code=iqc.expand())
        assert fast.error_counts_per_iteration == \
            generic.error_counts_per_iteration, thresh
        assert fast.bit_errors == generic.bit_errors, thresh


def test_qc_store_roundtrip(tmp_path, qc, iqc):
    """QC persistence: base+shifts form (KBs at any n), both classes."""
    from iib_project_ldpc_codes_tpu.models.store import (load_qc_code,
                                                         save_qc_code)

    for code in (qc, iqc):
        p = str(tmp_path / f"{type(code).__name__}.npz")
        save_qc_code(code, p)
        loaded = load_qc_code(p)
        assert type(loaded) is type(code)
        assert loaded.Z == code.Z and loaded.n == code.n
        np.testing.assert_array_equal(np.asarray(loaded.base_chk),
                                      np.asarray(code.base_chk))
        np.testing.assert_array_equal(np.asarray(loaded.shifts),
                                      np.asarray(code.shifts))


def test_protograph_de_threshold_anchors(qc):
    """P-EXIT density evolution on base graphs (theory.protograph_*):
    a regular base reproduces eps*(3,6); the round-5 irregular bases'
    thresholds quantify the measured base-size law (nb=24 -> 0.449,
    explaining the measured FER=0.997 at eps=0.45; nb=240 -> 0.451;
    ensemble limit 0.4526)."""
    from iib_project_ldpc_codes_tpu.models.qc import (
        sample_qc_code_irregular)
    from iib_project_ldpc_codes_tpu.utils import theory

    t_reg = theory.protograph_threshold(qc.base_chk, qc.nb)
    assert abs(t_reg - theory.calc_threshold(3, 6)) < 2e-4

    iqc24 = sample_qc_code_irregular(jax.random.key(0), nb=24, lam=LAM,
                                     rho=RHO, Z=8)
    t24 = theory.protograph_threshold(iqc24.base_chk, 24)
    iqc240 = sample_qc_code_irregular(jax.random.key(0), nb=240,
                                      lam=LAM, rho=RHO, Z=8)
    t240 = theory.protograph_threshold(iqc240.base_chk, 240)
    t_inf = theory.irregular_threshold(LAM, RHO, 1e-6)
    assert 0.44 < t24 < t240 < t_inf
    assert abs(t24 - 0.4491) < 2e-3   # pins the measured-law anchor
    # the measured n=1e6 lifted waterfalls bracket their base
    # thresholds: nb=24 fails at 0.45 (> t24), decodes at 0.43 (< t24)
    assert t24 < 0.45 and t24 > 0.43


def test_design_protograph_beats_default_base():
    """Rejection design over P-EXIT thresholds: the designed nb=24 base
    must beat the single-sample default and stay below the ensemble
    limit."""
    from iib_project_ldpc_codes_tpu.models.qc import (
        design_protograph, sample_qc_code_irregular)
    from iib_project_ldpc_codes_tpu.utils import theory

    default = sample_qc_code_irregular(jax.random.key(0), nb=24,
                                       lam=LAM, rho=RHO, Z=8)
    t_default = theory.protograph_threshold(default.base_chk, 24)
    designed, t_designed = design_protograph(jax.random.key(1), nb=24,
                                             lam=LAM, rho=RHO, Z=8,
                                             tries=12)
    t_inf = theory.irregular_threshold(LAM, RHO, 1e-6)
    assert t_designed >= t_default
    assert t_designed <= t_inf + 1e-3
    # the designed object decodes (sanity through the roll kernel)
    erased = bernoulli_packed(jax.random.key(2), 0.3,
                              (designed.n, 2))
    res = qc_bp_decode_packed_allzero(designed, erased, 30)
    assert int(res.error_totals[-1]) < int(res.error_totals[0])
