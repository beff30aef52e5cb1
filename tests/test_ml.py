"""ML decoder tests: brute-force marginal oracle + BP dominance.

The brute-force oracle enumerates ALL solutions of the erased subsystem; a
bit is ML-determined iff it takes the same value in every solution -- the
exact definition our elimination must reproduce.
"""

import itertools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import dense_parity_check, sample_code
from iib_project_ldpc_codes_tpu.ops import BEC, ERASURE
from iib_project_ldpc_codes_tpu.ops.erasure_bp import bp_decode
from iib_project_ldpc_codes_tpu.ops.ml import (gf2_row_reduce, ml_block_success,
                                               ml_decode, ml_decode_batch)


def brute_force_marginals(h, rx):
    """Enumerate solutions of H_e z = s; determined bits = constant bits."""
    h = np.asarray(h, int)
    rx = np.asarray(rx, int)
    erased = rx == ERASURE
    e = int(erased.sum())
    s = (h[:, ~erased] @ rx[~erased]) % 2
    sub = h[:, erased]
    sols = []
    for bits in itertools.product([0, 1], repeat=e):
        z = np.array(bits)
        if ((sub @ z) % 2 == s).all():
            sols.append(z)
    sols = np.array(sols)
    assert len(sols) > 0, "true codeword must be a solution"
    out = rx.copy()
    vals = np.where((sols == sols[0]).all(axis=0), sols[0], ERASURE)
    out[erased] = vals
    return out


@pytest.mark.parametrize("seed", range(6))
def test_ml_matches_brute_force(seed):
    n = 24
    code = sample_code(jax.random.key(seed), n, 3, 6)
    h = dense_parity_check(code)
    rx = np.asarray(BEC(0.45).transmit(jax.random.key(100 + seed),
                                       jnp.zeros(n, jnp.int32)))
    if (rx == ERASURE).sum() > 14:  # keep brute force cheap
        rx[np.nonzero(rx == ERASURE)[0][14:]] = 0
    want = brute_force_marginals(h, rx)
    got = ml_decode(code, rx)
    assert (got == want).all()


@pytest.mark.parametrize("seed", range(4))
def test_ml_matches_brute_force_nonzero_codeword(seed):
    """Oracle check with a NONZERO transmitted word (nonzero syndrome).

    Regression guard: numpy bool@bool is OR-accumulation, which silently
    corrupted the known-bit syndrome whenever two known 1-bits hit the
    same check -- invisible under all-zero-codeword tests.
    """
    from iib_project_ldpc_codes_tpu.models.encode import make_encoder

    n = 24
    code = sample_code(jax.random.key(seed), n, 3, 6)
    h = dense_parity_check(code)
    enc = make_encoder(code)
    rng = np.random.default_rng(50 + seed)
    w = enc.encode((rng.random(enc.k_eff) < 0.5).astype(int))
    rx = np.where(rng.random(n) < 0.45, ERASURE, w)
    if (rx == ERASURE).sum() > code.m:  # stay below the e > m bail-out
        rerase = np.nonzero(rx == ERASURE)[0][code.m:]
        rx[rerase] = w[rerase]
    want = brute_force_marginals(h, rx)
    got = ml_decode(code, rx)
    assert (got == want).all()


def test_trivial_cases():
    n = 24
    code = sample_code(jax.random.key(1), n, 3, 6)
    rx = np.zeros(n, int)
    assert (ml_decode(code, rx) == rx).all()       # no erasures
    rx2 = np.full(n, ERASURE)
    assert (ml_decode(code, rx2) == rx2).all()     # e > m: bail unchanged


@pytest.mark.parametrize("eps", [0.3, 0.42])
def test_ml_dominates_bp(eps):
    """Every bit BP resolves, ML must also resolve, with the same value."""
    n = 48
    code = sample_code(jax.random.key(2), n, 3, 6)
    for i in range(5):
        rx = np.asarray(BEC(eps).transmit(jax.random.key(10 + i),
                                          jnp.zeros(n, jnp.int32)))
        bp_dec = np.asarray(bp_decode(code, jnp.asarray(rx), 100)[0])
        ml_dec = ml_decode(code, rx)
        bp_resolved = bp_dec != ERASURE
        if (rx == ERASURE).sum() > code.m:
            continue
        assert (ml_dec[bp_resolved] == bp_dec[bp_resolved]).all()
        # ML resolves a superset of BP's bits
        assert not np.any((ml_dec == ERASURE) & bp_resolved)


def test_all_zero_transmit_resolves_to_zero():
    n = 48
    code = sample_code(jax.random.key(3), n, 3, 6)
    rx = np.asarray(BEC(0.35).transmit(jax.random.key(4),
                                       jnp.zeros(n, jnp.int32)))
    dec = ml_decode(code, rx)
    assert set(np.unique(dec)) <= {0, ERASURE}


def test_block_success_consistent_with_decode():
    n = 36
    code = sample_code(jax.random.key(5), n, 3, 6)
    for i in range(10):
        rx = np.asarray(BEC(0.4).transmit(jax.random.key(20 + i),
                                          jnp.zeros(n, jnp.int32)))
        erased = rx == ERASURE
        dec = ml_decode(code, rx)
        full = not np.any(dec == ERASURE)
        assert ml_block_success(code, erased) == full


def test_batch_decode():
    n = 36
    code = sample_code(jax.random.key(6), n, 3, 6)
    rxs = np.stack([
        np.asarray(BEC(0.4).transmit(jax.random.key(30 + i),
                                     jnp.zeros(n, jnp.int32)))
        for i in range(4)])
    decs = ml_decode_batch(code, rxs)
    assert decs.shape == (4, n)
    for i in range(4):
        assert (decs[i] == ml_decode(code, rxs[i])).all()


def test_gf2_row_reduce_identity():
    rng = np.random.default_rng(0)
    a = rng.random((8, 8)) < 0.5
    from iib_project_ldpc_codes_tpu.ops.ml import _pack_rows
    aug = _pack_rows(a)
    red, pivots = gf2_row_reduce(aug.copy(), 8)
    # pivot columns have exactly one 1 (Gauss-Jordan)
    for r, c in enumerate(pivots):
        col = ((red[:, c // 64] >> np.uint64(c % 64)) & np.uint64(1))
        assert col.sum() == 1 and col[r] == 1


def test_native_gf2_matches_numpy(rng):
    """C kernel (when buildable) == pure-numpy elimination, both outputs."""
    from iib_project_ldpc_codes_tpu.native import (gf2_row_reduce_native,
                                                   load)
    from iib_project_ldpc_codes_tpu.ops.ml import _pack_rows

    if load() is None:
        pytest.skip("no C compiler available")
    for trial in range(5):
        m, c = 40, 70
        a = rng.random((m, c)) < 0.4
        packed = _pack_rows(a)
        # numpy path (force by copying before native dispatch)
        import iib_project_ldpc_codes_tpu.ops.ml as mlmod
        import iib_project_ldpc_codes_tpu.native as native_mod
        saved = native_mod.gf2_row_reduce_native
        try:
            native_mod._tried = True
            native_mod_lib, native_mod._lib = native_mod._lib, None
            np_red, np_piv = mlmod.gf2_row_reduce(packed.copy(), c)
        finally:
            native_mod._lib = native_mod_lib
        nat_red, nat_piv = gf2_row_reduce_native(packed.copy(), c)
        assert np_piv == nat_piv
        assert (np_red == nat_red).all()


def test_native_rank(rng):
    from iib_project_ldpc_codes_tpu.native import gf2_rank_native, load
    from iib_project_ldpc_codes_tpu.ops.ml import _pack_rows

    if load() is None:
        pytest.skip("no C compiler available")
    a = rng.random((30, 50)) < 0.5
    want = np.linalg.matrix_rank(a.astype(float))  # over R, not GF2 -- use
    # GF(2) rank via numpy elimination instead
    import iib_project_ldpc_codes_tpu.ops.ml as mlmod
    import iib_project_ldpc_codes_tpu.native as native_mod
    saved_lib = native_mod._lib
    try:
        native_mod._lib = None
        native_mod._tried = True
        _, piv = mlmod.gf2_row_reduce(_pack_rows(a).copy(), 50)
    finally:
        native_mod._lib = saved_lib
    assert gf2_rank_native(_pack_rows(a).copy(), 50) == len(piv)


def test_ml_decode_batch_native_bit_exact():
    """Batched native ML == per-trial ml_decode, bit for bit (fixed code)."""
    import jax
    import numpy as np

    from iib_project_ldpc_codes_tpu.models import (dense_parity_check,
                                                   sample_code)
    from iib_project_ldpc_codes_tpu.ops.ml import ml_decode, ml_decode_batch

    n = 96
    code = sample_code(jax.random.key(8), n, 3, 6)
    h = dense_parity_check(code)
    rng = np.random.default_rng(0)
    # include edge cases: no erasures, all erased (> m), near-threshold
    rx = np.where(rng.random((64, n)) < 0.44, 2, 0)
    rx[0, :] = 0
    rx[1, :] = 2
    got = ml_decode_batch(code, rx)
    want = np.stack([ml_decode(code, r, h) for r in rx])
    np.testing.assert_array_equal(got, want)


def test_ml_decode_batch_ensemble_bit_exact():
    """Per-trial-codes batched ML == per-trial ml_decode (native AND
    pure-python fallback)."""
    import jax
    import numpy as np

    from iib_project_ldpc_codes_tpu.models import dense_parity_check
    from iib_project_ldpc_codes_tpu.models.code import LDPCCode
    from iib_project_ldpc_codes_tpu.models.ensemble import sample_codes
    from iib_project_ldpc_codes_tpu import native as native_mod
    from iib_project_ldpc_codes_tpu.ops.ml import (ml_decode,
                                                   ml_decode_batch_ensemble)

    n, B = 60, 16
    codes = sample_codes(jax.random.key(9), B, n, 3, 6)
    per = [LDPCCode(chk_to_var=codes.chk_to_var[i],
                    var_to_edge=codes.var_to_edge[i], n=n, dv=3, dc=6)
           for i in range(B)]
    hs = np.stack([dense_parity_check(c) for c in per])
    rng = np.random.default_rng(1)
    rx = np.where(rng.random((B, n)) < 0.42, 2, 0)
    chk = np.asarray(codes.chk_to_var)
    want = np.stack([ml_decode(c, r, h) for c, r, h in zip(per, rx, hs)])
    got = ml_decode_batch_ensemble(chk, n, rx)
    np.testing.assert_array_equal(got, want)
    # force the pure-python fallback path
    saved_lib, saved_tried = native_mod._lib, native_mod._tried
    native_mod._lib, native_mod._tried = None, True
    try:
        fallback = ml_decode_batch_ensemble(chk, n, rx)
    finally:
        native_mod._lib, native_mod._tried = saved_lib, saved_tried
    np.testing.assert_array_equal(fallback, want)


def test_ml_decode_batch_nonzero_codeword_native():
    """Native syndrome path on nonzero known bits (rx contains 1s)."""
    import jax
    import numpy as np

    from iib_project_ldpc_codes_tpu.models import (dense_parity_check,
                                                   sample_code)
    from iib_project_ldpc_codes_tpu.models.encode import make_encoder
    from iib_project_ldpc_codes_tpu.ops.ml import ml_decode, ml_decode_batch

    n = 96
    code = sample_code(jax.random.key(10), n, 3, 6)
    h = dense_parity_check(code)
    enc = make_encoder(code)
    rng = np.random.default_rng(2)
    rxs = []
    for _ in range(16):
        w = enc.encode((rng.random(enc.k_eff) < 0.5).astype(int))
        rxs.append(np.where(rng.random(n) < 0.35, 2, w))
    rx = np.stack(rxs)
    got = ml_decode_batch(code, rx)
    want = np.stack([ml_decode(code, r, h) for r in rx])
    np.testing.assert_array_equal(got, want)
