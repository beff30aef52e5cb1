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


# ---------------------------------------------------------------------------
# Native C sequential peel (native/peeling.c)
# ---------------------------------------------------------------------------

def _native_available():
    from iib_project_ldpc_codes_tpu.native import load
    return load() is not None


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
@pytest.mark.parametrize("eps", [0.2, 0.4, 0.55])
def test_native_peel_matches_bp_fixed_point(eps):
    """Final unresolved set is choice-order independent: must equal the BP
    fixed point exactly, trial by trial."""
    from iib_project_ldpc_codes_tpu.native import peel_decode_trials_native

    n, trials = 96, 32
    code = sample_code(jax.random.key(30), n, 3, 6)
    rxs = BEC(eps).transmit(jax.random.key(31),
                            jnp.zeros((trials, n), jnp.int32))
    erased = np.asarray(rxs) == ERASURE
    un, evo, steps, erasures = peel_decode_trials_native(
        np.asarray(code.chk_to_var), np.asarray(code.var_to_chk),
        erased, seed=7)
    assert (erasures == erased.sum(axis=1)).all()
    for t in range(trials):
        dec, _, _ = bp_decode(code, jnp.asarray(rxs[t]), 200)
        assert (un[t] == (np.asarray(dec) == ERASURE)).all()


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_native_peel_bookkeeping_and_determinism():
    from iib_project_ldpc_codes_tpu.native import peel_decode_trials_native

    n, trials = 96, 64
    code = sample_code(jax.random.key(32), n, 3, 6)
    cv, vc = np.asarray(code.chk_to_var), np.asarray(code.var_to_chk)
    erased = np.asarray(BEC(0.4).transmit(
        jax.random.key(33), jnp.zeros((trials, n), jnp.int32))) == ERASURE
    un, evo, steps, erasures = peel_decode_trials_native(cv, vc, erased, 7)
    un2, evo2, steps2, _ = peel_decode_trials_native(cv, vc, erased, 7)
    assert (evo == evo2).all() and (steps == steps2).all()
    un3, evo3, _, _ = peel_decode_trials_native(cv, vc, erased, 8)
    assert (un3 == un).all()          # final set independent of choices
    for t in range(trials):
        e = evo[t][evo[t] >= 0]
        remaining = int(un[t].sum())
        if remaining == 0:            # success: peels + final 0 append
            assert steps[t] == erasures[t] + 1
            assert e[-1] == 0
            if len(e) > 1:
                assert (e[:-1] > 0).all()
        else:                         # failure: stalled with R=0
            assert int(erasures[t]) + 1 - int(steps[t]) == remaining + 1
            assert (e > 0).all()
    # first recorded count (pre-peel degree-1 checks) is choice-independent
    deg = (erased[:, cv].sum(axis=2) == 1)  # [trials, m]
    has = erasures > 0
    assert (evo[has, 0] == deg.sum(axis=1)[has]).all()


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_native_experiment_backend():
    """peeling_scaling_experiment produces equivalent statistics on both
    backends (same drift axis, comparable failure rates)."""
    from iib_project_ldpc_codes_tpu.utils.experiments import (
        peeling_scaling_experiment)

    nat = peeling_scaling_experiment(120, 3, 6, 0.35, repeats=40, seed=3,
                                     backend="native")
    jx = peeling_scaling_experiment(120, 3, 6, 0.35, repeats=40, seed=3,
                                    backend="jax")
    assert nat.critical_point == jx.critical_point
    assert np.allclose(nat.drift, jx.drift)
    assert abs(nat.failure_rate - jx.failure_rate) < 0.35
    # same codes + channels on both backends -> identical first counts
    for a, b in zip(nat.trajectories, jx.trajectories):
        assert len(a) == len(b)       # num_erasures identical
        assert a[-1] == b[-1] or (np.isnan(a[-1]) and np.isnan(b[-1]))


# ---------------------------------------------------------------------------
# Irregular (lambda, rho) sequential peeling (round-4 extension)
# ---------------------------------------------------------------------------

IRR_LAM = [0, 1 / 3, 0, 2 / 3]
IRR_RHO = [0, 0, 0, 0, 0, 1.0]


def _irregular_code(key, n=96):
    from iib_project_ldpc_codes_tpu.models.irregular import (
        IrregularEnsembleSpec)

    return IrregularEnsembleSpec.from_lam_rho(n, IRR_LAM, IRR_RHO) \
        .sample(key)


@pytest.mark.parametrize("eps", [0.3, 0.42])
def test_irregular_peel_matches_bp_fixed_point(eps):
    """On the BEC, sequential peeling and BP stop at the identical maximal
    stopping set -- for irregular codes too (the phantom-padded peeler
    must not invent or miss degree-1 opportunities)."""
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode_irregular
    from iib_project_ldpc_codes_tpu.ops.peeling import peel_decode_irregular

    code = _irregular_code(jax.random.key(5))
    for s in range(4):
        rx = np.asarray(BEC(eps).transmit(
            jax.random.fold_in(jax.random.key(6), s),
            jnp.zeros(code.n, jnp.int32)))
        res = peel_decode_irregular(code, jnp.asarray(rx),
                                    jax.random.key(7 + s))
        decoded, _, _ = bp_decode_irregular(code, jnp.asarray(rx),
                                            code.n)
        bp_unresolved = np.asarray(decoded) == ERASURE
        assert (np.asarray(res.unresolved) == bp_unresolved).all()
        # trajectory bookkeeping: one peel per resolved erasure (+1 final
        # zero on success)
        evo = np.asarray(res.one_degree_evolution)
        evo = evo[evo >= 0]
        resolved = int(res.num_erasures) - bp_unresolved.sum()
        assert int(res.steps) == len(evo)
        assert len(evo) == resolved + (1 if not bp_unresolved.any()
                                       else 0)


def _native_available():
    from iib_project_ldpc_codes_tpu.native import load

    return load() is not None


@pytest.mark.skipif(not _native_available(), reason="native lib unavailable")
def test_irregular_native_peel_matches_jax_final_set():
    """The padded-table native peeler reaches the same maximal stopping
    set as the jax irregular peeler (choice-independent), with matching
    trajectory lengths."""
    from iib_project_ldpc_codes_tpu.native import peel_decode_trials_native
    from iib_project_ldpc_codes_tpu.ops.peeling import peel_decode_irregular

    code = _irregular_code(jax.random.key(8), n=120)
    rxs = np.asarray(BEC(0.42).transmit(
        jax.random.key(9), jnp.zeros((8, code.n), jnp.int32)))
    chk = np.asarray(code.chk_to_var)[:-1]
    var = np.asarray(code.var_to_chk)[:-1]
    erased = rxs == ERASURE
    un, evo, steps, erasures = peel_decode_trials_native(
        chk, var, erased, seed=77)
    for t in range(8):
        res = peel_decode_irregular(code, jnp.asarray(rxs[t]),
                                    jax.random.key(100 + t))
        assert (np.asarray(res.unresolved) == un[t]).all()
        jx_evo = np.asarray(res.one_degree_evolution)
        jx_evo = jx_evo[jx_evo >= 0]
        nat_evo = evo[t][evo[t] >= 0]
        assert len(nat_evo) == len(jx_evo)
        # pre-peel degree-1 count is choice-independent
        if len(nat_evo):
            assert nat_evo[0] == jx_evo[0]


def test_irregular_drift_tracks_trajectories():
    """The measured mean R-process tracks the irregular analytic drift at
    an early checkpoint (before survivor bias matters)."""
    from iib_project_ldpc_codes_tpu.utils.experiments import (
        peeling_scaling_experiment)

    n, eps = 2048, 0.40
    res = peeling_scaling_experiment(n, 0, 0, eps, repeats=32, seed=11,
                                     lam=IRR_LAM, rho=IRR_RHO)
    # checkpoint at 90% of erasures still unresolved (early in the peel)
    u0 = int(0.9 * n * eps)
    vals = [t[u0] for t in res.trajectories
            if len(t) > u0 and not np.isnan(t[u0])]
    assert len(vals) >= 24
    mean, se = np.mean(vals), np.std(vals, ddof=1) / np.sqrt(len(vals))
    want = res.drift[u0]
    assert abs(mean - want) < 4 * se + 0.02 * want, (mean, want, se)


def test_irregular_drift_reduces_to_regular():
    from iib_project_ldpc_codes_tpu.utils import theory

    lam, rho = theory.regular_lam_rho(3, 6)
    steps = np.arange(0, 400)
    a = theory.peeling_drift(0.42, 3, 6, 1000, steps)
    b = theory.irregular_peeling_drift(0.42, lam, rho, 1000, steps)
    assert np.allclose(a, b, atol=1e-9)
    # x=1 anchor: r1(1) = eps * rho(1 - eps)
    r1 = theory.irregular_peeling_drift_normalized(0.42, IRR_LAM, IRR_RHO,
                                                   1.0)
    import math
    assert r1 == pytest.approx(0.42 * (1 - 0.42) ** 5, rel=1e-12)
    # critical point: regular inputs land on y* (the DE tangency)
    xc = theory.irregular_critical_x(lam, rho)
    ystar = theory.threshold_y(theory.calc_threshold(3, 6), 3, 6)
    assert abs(xc - ystar) < 2e-3
