"""Peeling decoder tests: sequential R-process + parallel variant.

Oracles: an independent numpy peeling implementation, and the BP/peeling
fixed-point equivalence on the BEC (both leave exactly the maximal stopping
set unresolved -- SURVEY.md section 4 item 5).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import dense_parity_check, sample_code
from iib_project_ldpc_codes_tpu.ops import BEC, ERASURE
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode
from iib_project_ldpc_codes_tpu.ops.peeling import (peel_decode,
                                                    peel_decode_batch,
                                                    peel_decode_parallel)


def numpy_peel(h, received, rng):
    """Independent sequential peeling oracle (random degree-1 choice)."""
    h = np.asarray(h, bool).copy()
    n = h.shape[1]
    unresolved = np.asarray(received) == ERASURE
    # strip known variables
    h[:, ~unresolved] = False
    evolution = []
    while True:
        deg = h.sum(axis=1)
        ones = np.nonzero(deg == 1)[0]
        if len(ones) == 0:
            break
        evolution.append(len(ones))
        c = rng.choice(ones)
        v = np.nonzero(h[c])[0][0]
        unresolved[v] = False
        h[:, v] = False
    if not h.any():
        evolution.append(0)
    return unresolved, evolution


@pytest.mark.parametrize("eps", [0.3, 0.42, 0.5])
def test_final_set_matches_numpy_oracle(eps, rng):
    """The final unresolved set is choice-independent (maximal stopping
    set), so ours must equal the oracle's despite different random picks."""
    n = 60
    code = sample_code(jax.random.key(1), n, 3, 6)
    h = dense_parity_check(code)
    rx = np.asarray(BEC(eps).transmit(jax.random.key(2),
                                      jnp.zeros(n, jnp.int32)))
    want_unresolved, want_evo = numpy_peel(h, rx, rng)
    res = peel_decode(code, jnp.asarray(rx), jax.random.key(3))
    assert (np.asarray(res.unresolved) == want_unresolved).all()
    # trajectory lengths agree (same number of peels: one per resolved var)
    got_evo = np.asarray(res.one_degree_evolution)
    got_evo = got_evo[got_evo >= 0]
    assert len(got_evo) == len(want_evo)
    # first entry (pre-peel degree-1 count) is choice-independent
    if want_evo:
        assert got_evo[0] == want_evo[0]


@pytest.mark.parametrize("eps", [0.35, 0.45])
def test_peeling_equals_bp_fixed_point(eps):
    n = 96
    code = sample_code(jax.random.key(4), n, 3, 6)
    rx = BEC(eps).transmit(jax.random.key(5), jnp.zeros(n, jnp.int32))
    res = peel_decode(code, rx, jax.random.key(6))
    dec, _, _ = bp_decode(code, rx, 200)
    bp_unresolved = np.asarray(dec) == ERASURE
    assert (np.asarray(res.unresolved) == bp_unresolved).all()
    unresolved_par, _ = peel_decode_parallel(code, rx)
    assert (np.asarray(unresolved_par) == bp_unresolved).all()


def test_evolution_bookkeeping():
    n = 48
    code = sample_code(jax.random.key(7), n, 3, 6)
    # no erasures: evolution = [0], steps=1 (reference appends final 0)
    rx = jnp.zeros(n, jnp.int32)
    res = peel_decode(code, rx, jax.random.key(8))
    assert int(res.steps) == 1
    assert int(res.one_degree_evolution[0]) == 0
    assert bool(res.success)
    assert int(res.size_at_failure) == 0
    # low eps success: steps == num_erasures + 1, size_at_failure == 0
    rx = BEC(0.2).transmit(jax.random.key(9), jnp.zeros(n, jnp.int32))
    res = peel_decode(code, rx, jax.random.key(10))
    if bool(res.success):
        assert int(res.steps) == int(res.num_erasures) + 1
        assert int(res.size_at_failure) == 0
    # high eps failure: remaining+1 == size_at_failure
    rx = BEC(0.75).transmit(jax.random.key(11), jnp.zeros(n, jnp.int32))
    res = peel_decode(code, rx, jax.random.key(12))
    assert not bool(res.success)
    assert int(res.size_at_failure) == int(res.remaining) + 1


def test_seeded_reproducibility():
    n = 48
    code = sample_code(jax.random.key(13), n, 3, 6)
    rx = BEC(0.4).transmit(jax.random.key(14), jnp.zeros(n, jnp.int32))
    r1 = peel_decode(code, rx, jax.random.key(15))
    r2 = peel_decode(code, rx, jax.random.key(15))
    assert (np.asarray(r1.one_degree_evolution)
            == np.asarray(r2.one_degree_evolution)).all()


def test_batch_decode():
    n = 48
    code = sample_code(jax.random.key(16), n, 3, 6)
    rxs = jnp.stack([
        BEC(0.4).transmit(jax.random.key(20 + i), jnp.zeros(n, jnp.int32))
        for i in range(8)])
    res = peel_decode_batch(code, rxs, jax.random.key(30))
    assert res.unresolved.shape == (8, n)
    assert res.one_degree_evolution.shape == (8, n + 1)
    # each trial individually consistent
    for i in range(8):
        single = peel_decode(code, rxs[i], jax.random.key(99 + i))
        assert bool(single.success) == (~np.asarray(res.unresolved[i]).any())
