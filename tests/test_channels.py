"""Channel model tests: conventions and statistics (channels.py:19-26)."""

import jax
import jax.numpy as jnp
import numpy as np

from iib_project_ldpc_codes_tpu.ops import AWGN, BEC, BSC, ERASURE
from iib_project_ldpc_codes_tpu.ops.bitops import (bernoulli_packed,
                                                   pack_bits, per_trial_counts,
                                                   popcount, total_popcount,
                                                   unpack_bits)


def test_bec_erasure_fraction():
    ch = BEC(0.4)
    bits = jnp.zeros(20000, jnp.int32)
    out = ch.transmit(jax.random.key(0), bits)
    frac = float(jnp.mean(out == ERASURE))
    assert abs(frac - 0.4) < 0.02
    assert set(np.unique(np.asarray(out))) <= {0, ERASURE}


def test_bec_preserves_unerased_bits():
    ch = BEC(0.3)
    bits = jnp.array([0, 1] * 500, jnp.int32)
    out = np.asarray(ch.transmit(jax.random.key(1), bits))
    unerased = out != ERASURE
    assert (out[unerased] == np.asarray(bits)[unerased]).all()


def test_bec_pm_convention():
    """Legacy wire format: 0 -> -1, 1 -> 1, erasure -> 0 (channels.py:5)."""
    ch = BEC(0.25)
    bits = jnp.array([0, 1] * 500, jnp.int32)
    out = np.asarray(ch.transmit_pm(jax.random.key(2), bits))
    assert set(np.unique(out)) <= {-1, 0, 1}
    kept = out != 0
    expected = np.where(np.asarray(bits) == 0, -1, 1)
    assert (out[kept] == expected[kept]).all()


def test_bsc_flip_rate():
    ch = BSC(0.11)
    bits = jnp.zeros(20000, jnp.int32)
    out = ch.transmit(jax.random.key(3), bits)
    assert abs(float(jnp.mean(out)) - 0.11) < 0.02
    llr = np.asarray(ch.llr(out))
    assert (np.sign(llr) == np.where(np.asarray(out) == 0, 1, -1)).all()


def test_awgn_stats_and_llr():
    ch = AWGN(0.8)
    bits = jnp.concatenate([jnp.zeros(10000, jnp.int32),
                            jnp.ones(10000, jnp.int32)])
    y = np.asarray(ch.transmit(jax.random.key(4), bits))
    assert abs(y[:10000].mean() - 1.0) < 0.05
    assert abs(y[10000:].mean() + 1.0) < 0.05
    assert abs(y[:10000].std() - 0.8) < 0.05
    llr = np.asarray(ch.llr(jnp.asarray(y)))
    np.testing.assert_allclose(llr, 2 * y / 0.64, rtol=1e-5)
    rate = 0.5
    sigma = float(AWGN.sigma_from_ebn0_db(2.0, rate))
    assert abs(2 * rate * 10 ** 0.2 - 1 / sigma**2) < 1e-5


def test_pack_unpack_roundtrip(rng):
    bits = rng.random((7, 96)) < 0.37
    packed = pack_bits(jnp.asarray(bits))
    assert packed.shape == (7, 3)
    assert packed.dtype == jnp.uint32
    back = np.asarray(unpack_bits(packed))
    assert (back == bits).all()


def test_popcounts(rng):
    bits = rng.random((11, 64)) < 0.5
    packed = pack_bits(jnp.asarray(bits))
    assert int(total_popcount(packed)) == int(bits.sum())
    per_trial = np.asarray(per_trial_counts(packed, axis=0))
    assert (per_trial == bits.sum(axis=0)).all()
    assert (np.asarray(popcount(packed)) ==
            bits.reshape(11, 2, 32).sum(axis=-1)).all()


def test_bernoulli_packed_rate():
    words = bernoulli_packed(jax.random.key(9), 0.4294, (500, 4))
    frac = int(total_popcount(words)) / (500 * 4 * 32)
    assert abs(frac - 0.4294) < 0.01
