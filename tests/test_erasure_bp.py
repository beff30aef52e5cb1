"""Erasure-BP decoder tests.

Oracle strategy follows SURVEY.md section 4: redundant implementations must
agree (naive {0,1,2} path vs bit-packed path), BP fixed points are maximal
stopping sets (peeling equivalence on the BEC), and error-trajectory
bookkeeping matches the reference semantics (initial count prepended,
stall-value tail, zero tail after convergence -- message_passing.c:16-19,
:69-78, parallel_simulator.py:147-166).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models import sample_code, dense_parity_check
from iib_project_ldpc_codes_tpu.ops import BEC, ERASURE
from iib_project_ldpc_codes_tpu.ops.bitops import pack_bits, unpack_bits
from iib_project_ldpc_codes_tpu.ops.erasure_bp import (bp_decode,
                                                       bp_decode_packed)


def reference_erasure_bp(h, received, max_iters):
    """Independent numpy oracle: textbook parallel erasure BP.

    A variable is resolved when some check has all its other participants
    resolved; its value is the XOR of theirs.  Returns (decoded, errors)
    with the reference's error-array semantics.
    """
    h = np.asarray(h, bool)
    m, n = h.shape
    known = received != ERASURE
    val = np.where(known, received, 0).astype(int)
    errors = [int((~known).sum())]
    for _ in range(max_iters):
        if errors[-1] == 0 or (len(errors) >= 2 and errors[-1] == errors[-2]):
            break
        new_known = known.copy()
        new_val = val.copy()
        for v in range(n):
            if known[v]:
                continue
            for c in np.nonzero(h[:, v])[0]:
                others = np.nonzero(h[c])[0]
                others = others[others != v]
                if known[others].all():
                    new_val[v] = val[others].sum() % 2
                    new_known[v] = True
                    break
        known, val = new_known, new_val
        errors.append(int((~known).sum()))
    # pad with tail semantics
    last = errors[-1]
    while len(errors) < max_iters + 1:
        errors.append(last if last else 0)
    return np.where(known, val, ERASURE), np.array(errors)


@pytest.mark.parametrize("eps", [0.2, 0.42, 0.6])
@pytest.mark.parametrize("seed", [0, 1])
def test_bp_matches_numpy_oracle(eps, seed):
    n, dv, dc, iters = 48, 3, 6, 30
    code = sample_code(jax.random.key(seed), n, dv, dc)
    h = dense_parity_check(code)
    ch = BEC(eps)
    rx = np.asarray(ch.transmit(jax.random.key(seed + 100),
                                jnp.zeros(n, jnp.int32)))
    want_dec, want_err = reference_erasure_bp(h, rx, iters)
    got_dec, got_err, _ = bp_decode(code, jnp.asarray(rx), iters)
    assert (np.asarray(got_dec) == want_dec).all()
    assert (np.asarray(got_err) == want_err).all()


def test_bp_nonzero_codeword():
    """General codewords: erased bits recover the true transmitted bits."""
    n, dv, dc = 60, 3, 6
    code = sample_code(jax.random.key(3), n, dv, dc)
    h = dense_parity_check(code).astype(int)
    # Build a valid codeword: solve H x = 0 by brute force over random
    # vectors projected... simpler: use all-zero flipped on a codeword from
    # the dual -- instead find a valid codeword via nullspace over GF(2).
    import itertools
    # gaussian elimination over GF(2) to find one nonzero codeword
    hh = h.copy() % 2
    nrows, ncols = hh.shape
    piv_cols = []
    r = 0
    for c in range(ncols):
        rows = [i for i in range(r, nrows) if hh[i, c]]
        if not rows:
            continue
        hh[[r, rows[0]]] = hh[[rows[0], r]]
        for i in range(nrows):
            if i != r and hh[i, c]:
                hh[i] ^= hh[r]
        piv_cols.append(c)
        r += 1
    free = [c for c in range(ncols) if c not in piv_cols]
    assert free, "code has no free variables?"
    x = np.zeros(ncols, int)
    x[free[0]] = 1
    for i, c in enumerate(piv_cols):
        x[c] = (hh[i] @ x - hh[i, c] * x[c]) % 2
    assert (h @ x % 2 == 0).all()

    rx = np.asarray(BEC(0.3).transmit(jax.random.key(9), jnp.asarray(x)))
    dec, _, _ = bp_decode(code, jnp.asarray(rx), 40)
    dec = np.asarray(dec)
    resolved = dec != ERASURE
    assert (dec[resolved] == x[resolved]).all()


@pytest.mark.parametrize("eps", [0.3, 0.42, 0.55])
def test_packed_matches_naive(eps):
    n, dv, dc, iters, W = 96, 3, 6, 50, 2
    B = 32 * W
    code = sample_code(jax.random.key(5), n, dv, dc)
    ch = BEC(eps)
    mask_bits = np.asarray(ch.erasure_mask(jax.random.key(6), (n, B)))
    erased = pack_bits(jnp.asarray(mask_bits))
    tx = jnp.zeros((n, W), jnp.uint32)
    res = bp_decode_packed(code, erased, tx, iters)

    total_err = np.zeros(iters + 1, np.int64)
    failed = np.zeros(B, bool)
    bit_errors = np.zeros(B, np.int64)
    for b in range(B):
        rx = np.where(mask_bits[:, b], ERASURE, 0)
        _, err, _ = bp_decode(code, jnp.asarray(rx), iters)
        err = np.asarray(err)
        total_err += err
        failed[b] = err[-1] != 0
        bit_errors[b] = err[-1]
    assert (np.asarray(res.error_totals) == total_err).all()
    assert (np.asarray(res.failed) == failed).all()
    assert (np.asarray(res.bit_errors) == bit_errors).all()


def test_packed_decodes_true_bits():
    """Packed decoder on random transmitted words: resolved planes match."""
    n, dv, dc, W = 48, 3, 6, 1
    code = sample_code(jax.random.key(11), n, dv, dc)
    # transmit the all-one word's syndrome-free cousin: use all-zero and
    # all-... instead pack 32 random *valid* codewords? Use zero codeword
    # in half the lanes and check val bits stay zero there.
    mask = BEC(0.35).erasure_mask(jax.random.key(12), (n, 32))
    erased = pack_bits(mask)
    tx = jnp.zeros((n, W), jnp.uint32)
    res = bp_decode_packed(code, erased, tx, 50)
    # all-zero transmit: every resolved value bit must be zero
    assert int(jnp.sum(res.val & res.known)) == 0


def test_error_array_tail_semantics():
    """Converged -> zero tail; stalled -> constant tail; errors[0] initial."""
    n, dv, dc = 48, 3, 6
    code = sample_code(jax.random.key(13), n, dv, dc)
    # low eps: should converge
    rx = BEC(0.1).transmit(jax.random.key(14), jnp.zeros(n, jnp.int32))
    _, err, it = bp_decode(code, rx, 30)
    err = np.asarray(err)
    assert err[0] == int(np.sum(np.asarray(rx) == ERASURE))
    assert err[-1] == 0
    # high eps: should stall at a positive value
    rx = BEC(0.8).transmit(jax.random.key(15), jnp.zeros(n, jnp.int32))
    _, err, it = bp_decode(code, rx, 30)
    err = np.asarray(err)
    assert err[-1] > 0
    assert err[-1] == err[-2]  # constant tail


def test_monotonicity_and_fixed_point():
    """Erasure count non-increasing; running further never changes result."""
    n, dv, dc = 72, 3, 6
    code = sample_code(jax.random.key(17), n, dv, dc)
    rx = BEC(0.45).transmit(jax.random.key(18), jnp.zeros(n, jnp.int32))
    dec1, err1, _ = bp_decode(code, rx, 25)
    dec2, err2, _ = bp_decode(code, rx, 100)
    err1, err2 = np.asarray(err1), np.asarray(err2)
    assert (np.diff(err1) <= 0).all()
    assert (np.asarray(dec1) == np.asarray(dec2)).all()


def test_allzero_fast_path_bit_identical():
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import \
        bp_decode_packed_allzero

    n, W = 96, 2
    code = sample_code(jax.random.key(21), n, 3, 6)
    mask = BEC(0.42).erasure_mask(jax.random.key(22), (n, 32 * W))
    erased = pack_bits(mask)
    tx = jnp.zeros((n, W), jnp.uint32)
    full = bp_decode_packed(code, erased, tx, 50)
    fast = bp_decode_packed_allzero(code, erased, 50)
    assert (np.asarray(full.known) == np.asarray(fast.known)).all()
    assert (np.asarray(full.error_totals)
            == np.asarray(fast.error_totals)).all()
    assert int(full.iterations) == int(fast.iterations)
    assert (np.asarray(full.failed) == np.asarray(fast.failed)).all()


def test_packed_traj_bit_exact_per_trial():
    """bp_decode_packed_traj trajectories == per-trial bp_decode errors,
    exactly, and its aggregate result matches bp_decode_packed."""
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_traj)

    n, dv, dc, iters, W = 96, 3, 6, 40, 2
    B = 32 * W
    code = sample_code(jax.random.key(31), n, dv, dc)
    mask = np.asarray(BEC(0.44).erasure_mask(jax.random.key(32), (n, B)))
    erased = pack_bits(jnp.asarray(mask))
    tx = jnp.zeros((n, W), jnp.uint32)
    res, traj = bp_decode_packed_traj(code, erased, tx, iters)
    traj = np.asarray(traj)
    assert traj.shape == (iters + 1, B)
    for b in range(B):
        rx = np.where(mask[:, b], ERASURE, 0)
        _, err, _ = bp_decode(code, jnp.asarray(rx), iters)
        assert (traj[:, b] == np.asarray(err)).all(), f"trial {b}"
    agg = bp_decode_packed(code, erased, tx, iters)
    assert (np.asarray(res.error_totals)
            == np.asarray(agg.error_totals)).all()
    assert (np.asarray(res.failed) == np.asarray(agg.failed)).all()


def test_traj_reproduces_expurgated_totals():
    """Recomputing expurgated sums from per-trial trajectories equals the
    Monte Carlo engine's two-pass expurgation exactly
    (parallel_simulator_expurgated.py:238-243 semantics)."""
    from iib_project_ldpc_codes_tpu.ops.bitops import bernoulli_packed
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        bp_decode_packed_traj)
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import _bp_chunk

    n, dv, dc, iters, W = 96, 3, 6, 30, 4
    s = 2  # expurgation parameter
    code = sample_code(jax.random.key(41), n, dv, dc)
    key = jax.random.key(42)
    stats = _bp_chunk(code, key, n=n, words=W, iterations=iters,
                      erasure_prob=0.46, expurgation=s)

    erased = bernoulli_packed(key, 0.46, (n, W))
    _, traj = bp_decode_packed_traj(code, erased, jnp.zeros_like(erased),
                                    iters)
    traj = np.asarray(traj)                  # [iters+1, B]
    include = traj[-1] > s
    assert int(stats.excluded) == int((~include).sum())
    assert int(stats.block_errors) == int((include & (traj[-1] > 0)).sum())
    assert int(stats.bit_errors) == int(traj[-1][include].sum())
    np.testing.assert_array_equal(np.asarray(stats.error_totals),
                                  traj[:, include].sum(axis=1))


def test_bp_decoding_paths_experiment(tmp_path):
    """The decoding-path experiment drives the traj kernel and exports."""
    from iib_project_ldpc_codes_tpu.utils.experiments import (
        bp_decoding_paths, export_bp_decoding_paths)

    paths = bp_decoding_paths(96, 3, 6, 0.42, iterations=30, trials=64,
                              seed=3)
    assert paths.trajectories.shape == (64, 31)
    # mean path starts near eps and is non-increasing
    assert abs(paths.mean_path[0] - 0.42) < 0.1
    assert (np.diff(paths.mean_path) <= 1e-12).all()
    # failed trials end with erasures; successes end at zero
    if paths.failed.any():
        assert paths.mean_path_failed[-1] > 0
    if (~paths.failed).any():
        assert paths.mean_path_success[-1] == 0
    out = export_bp_decoding_paths(paths, str(tmp_path))
    import json
    doc = json.loads(open(out).read())
    assert doc["erasure_prob"] == 0.42
    assert len(doc["trajectories"]) == 64


def test_bp_decoding_paths_export_strict_json_all_success(tmp_path):
    """All trials succeeding -> mean_path_failed is NaN -> the export must
    still be strict RFC-8259 JSON (NaN -> null), parseable with
    parse_constant forbidden."""
    import json

    from iib_project_ldpc_codes_tpu.utils.experiments import (
        bp_decoding_paths, export_bp_decoding_paths)

    paths = bp_decoding_paths(96, 3, 6, 0.10, iterations=30, trials=64,
                              seed=3)
    assert not paths.failed.any()          # far below threshold
    out = export_bp_decoding_paths(paths, str(tmp_path))

    def reject(_):
        raise AssertionError("non-RFC8259 constant in exported JSON")

    doc = json.loads(open(out).read(), parse_constant=reject)
    assert all(v is None for v in doc["mean_path_failed"])


def test_packed_nonzero_codewords_match_naive():
    """Value-plane adoption on real (nonzero) codewords: every lane of the
    packed decode equals the naive {0,1,2} decode bit-for-bit."""
    from iib_project_ldpc_codes_tpu.models.encode import make_encoder

    n, W, B = 96, 1, 32
    code = sample_code(jax.random.key(23), n, 3, 6)
    enc = make_encoder(code)
    rng = np.random.default_rng(24)
    words = np.stack([enc.encode((rng.random(enc.k_eff) < 0.5).astype(int))
                      for _ in range(B)], axis=1)        # [n, B]
    mask = np.asarray(BEC(0.4).erasure_mask(jax.random.key(25), (n, B)))
    erased = pack_bits(jnp.asarray(mask))
    tx = pack_bits(jnp.asarray(words.astype(bool)))
    res = bp_decode_packed(code, erased, tx, 50)
    val = np.asarray(res.val)
    known = np.asarray(res.known)
    for b in range(B):
        rx = np.where(mask[:, b], ERASURE, words[:, b])
        dec, _, _ = bp_decode(code, jnp.asarray(rx), 50)
        dec = np.asarray(dec)
        lane_known = (known[:, 0] >> np.uint32(b)) & 1
        lane_val = (val[:, 0] >> np.uint32(b)) & 1
        assert (lane_known.astype(bool) == (dec != ERASURE)).all()
        resolved = dec != ERASURE
        assert (lane_val[resolved] == dec[resolved]).all()


def test_packed_batch_int32_guard():
    """Batches at/after 2^31 total bits must refuse loudly at trace
    time (the int32 counter contract), not silently wrap -- the
    observed pre-guard failure mode was a while_loop that saw a
    negative total and exited at iteration 0."""
    from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
        _check_packed_batch_bits)

    _check_packed_batch_bits(100_000, 512)   # 1.64e9 bits: in contract
    with pytest.raises(ValueError, match="2\\^31"):
        _check_packed_batch_bits(100_000, 768)
    with pytest.raises(ValueError, match="split"):
        _check_packed_batch_bits(1_000_000, 192)
