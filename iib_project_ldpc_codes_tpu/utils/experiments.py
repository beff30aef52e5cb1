"""Experiment drivers: finite-length scaling of the peeling decoder.

Replicates the analysis pipeline of the reference's peeling experiment
(peeling_decoder.py:89-232) and waterfall calculation
(finite_length_scaling_calculation.py:31-45) as library functions returning
structured results (the reference runs at module scope and plots directly).
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models.code import LDPCCode
from ..models.ensemble import sample_code
from ..ops.channels import BEC
from ..ops.peeling import peel_decode
from . import theory


@dataclasses.dataclass
class PeelingScalingResult:
    """Output of the peeling R-process experiment at one (n, eps)."""

    n: int
    dv: int
    dc: int
    erasure_prob: float
    repeats: int
    # trajectories[i] = degree-1 check counts, reversed (steps-remaining
    # axis), NaN-padded to num_erasures+1 (peeling_decoder.py:143-149)
    trajectories: List[np.ndarray]
    sizes_at_failure: np.ndarray     # int[repeats]
    drift: np.ndarray                # analytic E[R] on the same axis
    critical_point: int              # step index of the critical point
    critical_distribution: np.ndarray  # R values at the critical point
    num_failures_at_critical: int
    expected_at_critical: float      # first-order drift prediction
    variance_at_critical: float      # scaling-law variance

    @property
    def failure_rate(self) -> float:
        return float((self.sizes_at_failure > 0).mean())


def peeling_scaling_experiment(n: int, dv: int, dc: int, erasure_prob: float,
                               repeats: int = 100, seed: int = 0,
                               code: Optional[LDPCCode] = None,
                               backend: str = "native",
                               lam=None, rho=None) -> PeelingScalingResult:
    """Monte Carlo R-process trajectories vs the analytic drift.

    Mirrors peeling_decoder.py:136-168: fresh (or fixed) code per repeat,
    all-zero transmit through the BEC, sequential random peeling, and the
    critical-point bookkeeping of :105-123.

    ``backend="native"`` runs the sequential peel in the C kernel
    (native/peeling.c, O(E) incremental degree tracking -- the loop is
    inherently sequential so it lives on the host); falls back to the
    jax scan (``ops.peeling.peel_decode``) when the library is
    unavailable.  Both are seeded and reproducible; they use different
    PRNG streams for the uniform degree-1 choice, so individual
    trajectories differ while all distributional statistics agree.

    ``lam``/``rho`` switch to the irregular (lambda, rho) ensemble
    (``dv``/``dc`` ignored): fresh codes from IrregularEnsembleSpec, the
    drift from :func:`..utils.theory.irregular_peeling_drift`, and the
    critical point from the interior minimum of the irregular drift.
    ``expected_at_critical`` is then the drift value there (the exact
    quantity the reference's regular branch first-order-expands,
    peeling_decoder.py:117-118) and ``variance_at_critical`` is NaN (the
    regular covariance-evolution formula does not generalise; use the
    empirical spread).
    """
    irregular = lam is not None
    if irregular:
        from ..models.irregular import IrregularEnsembleSpec

        spec = IrregularEnsembleSpec.from_lam_rho(n, lam, rho)
        thr = theory.irregular_threshold(lam, rho, 1e-7)
        x_crit = theory.irregular_critical_x(lam, rho)
        # unresolved count at the critical time = n eps* L(x*) -- the
        # irregular generalisation of peeling_decoder.py:111's
        # int(n eps* y*^dv)
        critical_point = int(n * thr * theory._node_poly_val(lam, x_crit))
        steps = np.arange(int(n * erasure_prob))
        drift = theory.irregular_peeling_drift(
            erasure_prob, lam, rho, n, steps)[::-1]
        expected_at_critical = (float(drift[critical_point])
                                if critical_point < len(drift)
                                else float("nan"))
        variance = float("nan")
        dv, dc = spec.dv_max, spec.dc_max
    else:
        thr = theory.calc_threshold(dv, dc)
        y_crit = theory.threshold_y(thr, dv, dc)
        # critical step index (peeling_decoder.py:111: int(n eps* y*^dv))
        critical_point = int(n * thr * y_crit ** dv)

        # analytic drift on the steps-remaining axis
        # (peeling_decoder.py:106-107)
        steps = np.arange(int(n * erasure_prob))
        drift = theory.peeling_drift(erasure_prob, dv, dc, n, steps)[::-1]

        # first-order expected R at the critical point
        # (peeling_decoder.py:117-118)
        first_derivative = (
            -n * dv * (dc - 1) * thr * y_crit ** (2 * dv - 2)
            * (1 - erasure_prob * y_crit ** (dv - 1)) ** (dc - 2))
        expected_at_critical = first_derivative * (erasure_prob - thr)
        variance = theory.critical_point_variance(n, erasure_prob, dv, dc)

    key = jax.random.key(seed)
    ch = BEC(erasure_prob)
    trajectories = []
    sizes_at_failure = []
    critical_distribution = []
    num_failures_at_critical = 0

    use_native = False
    if backend == "native":
        from ..native import load as _native_load
        use_native = _native_load() is not None

    for i in range(repeats):
        k_code, k_noise, k_peel = jax.random.split(
            jax.random.fold_in(key, i), 3)
        if code is not None:
            c = code
        elif irregular:
            c = spec.sample(k_code)
        else:
            c = sample_code(k_code, n, dv, dc)
        rx = ch.transmit(k_noise, jnp.zeros(n, jnp.int32))
        if use_native:
            from ..native import peel_decode_trials_native
            from ..ops.channels import ERASURE
            erased = (np.asarray(rx) == ERASURE)[None, :]
            # irregular: strip the phantom rows; the C kernel understands
            # the padding sentinels (entries n / m)
            chk = np.asarray(c.chk_to_var)
            var = np.asarray(c.var_to_chk)
            if irregular:
                chk, var = chk[:-1], var[:-1]
            out = peel_decode_trials_native(
                chk, var, erased, seed=seed * 1_000_003 + i)
            _, evolution, _, erasure_counts = out
            evo = evolution[0]
            evo = evo[evo >= 0].astype(float)
            num_erasures = int(erasure_counts[0])
        else:
            from ..ops.peeling import peel_decode_irregular

            peel = peel_decode_irregular if irregular else peel_decode
            res = peel(c, rx, k_peel)
            evo = np.asarray(res.one_degree_evolution)
            evo = evo[evo >= 0].astype(float)
            num_erasures = int(res.num_erasures)
        sizes_at_failure.append(num_erasures + 1 - len(evo))
        padded = np.concatenate(
            [evo, np.full(num_erasures + 1 - len(evo), np.nan)])
        traj = padded[::-1]
        trajectories.append(traj)
        # critical-point statistics (peeling_decoder.py:162-168)
        if critical_point < len(traj):
            r = traj[critical_point] - (
                drift[critical_point] if critical_point < len(drift) else 0.0)
            if math.isnan(r) or r < 0:
                num_failures_at_critical += 1
            else:
                critical_distribution.append(traj[critical_point])
        else:
            num_failures_at_critical += 1

    return PeelingScalingResult(
        n=n, dv=dv, dc=dc, erasure_prob=erasure_prob, repeats=repeats,
        trajectories=trajectories,
        sizes_at_failure=np.array(sizes_at_failure),
        drift=drift, critical_point=critical_point,
        critical_distribution=np.array(critical_distribution),
        num_failures_at_critical=num_failures_at_critical,
        expected_at_critical=float(expected_at_critical),
        variance_at_critical=float(variance))


@dataclasses.dataclass
class ResidualDegreeResult:
    """Simulated vs analytic residual-graph check-degree distributions.

    The validation the reference sketches at
    test_peeling_decoder_path.py:96-116: during peeling, the residual
    graph's check-degree distribution should follow the matrix-exponential
    evolution expm(-C ln((1-t)/eps)) X_init.  ``empirical``/``analytic``
    are in the expm curves' units: X_d(t) = (edges into degree-d residual
    checks) / (n dv), so sum_d X_d(t) = 1 - t.
    """

    n: int
    dv: int
    dc: int
    erasure_prob: float
    repeats: int
    sample_u: np.ndarray    # int[S] unresolved-variable counts sampled
    times: np.ndarray       # f64[S] normalized times t = 1 - u/n
    empirical: np.ndarray   # f64[S, dc] mean X_d over surviving trials
    stderr: np.ndarray      # f64[S, dc] standard error of that mean
    analytic: np.ndarray    # f64[S, dc] expm prediction
    survivors: np.ndarray   # int[S] trials that reached each snapshot

    @property
    def max_abs_error(self) -> float:
        return float(np.max(np.abs(self.empirical - self.analytic)))


def _peel_hist_python(chk_to_var, var_to_chk, erased_row, sample_u, rng):
    """Pure-numpy fallback of native peel_decode_trials_hist (one trial)."""
    n, dv = var_to_chk.shape
    m, dc = chk_to_var.shape
    un = erased_row.astype(bool).copy()
    deg = un[chk_to_var].sum(axis=1)
    hist = np.bincount(deg, minlength=dc + 1)
    out = np.full((len(sample_u), dc + 1), -1, np.int64)
    u = int(un.sum())
    si = 0
    while si < len(sample_u) and sample_u[si] > u:
        si += 1
    if si < len(sample_u) and sample_u[si] == u:
        out[si] = hist
        si += 1
    ones = list(np.nonzero(deg == 1)[0])
    while ones:
        # `ones` is re-filtered to deg==1 at the end of every step, so
        # every entry here is live
        c = ones[rng.integers(len(ones))]
        row = chk_to_var[c]
        v = row[un[row]][0]
        un[v] = False
        u -= 1
        for c2 in var_to_chk[v]:
            old = deg[c2]
            deg[c2] -= 1
            hist[old] -= 1
            hist[old - 1] += 1
            if old == 2:
                ones.append(c2)
        ones = [c for c in ones if deg[c] == 1]
        if si < len(sample_u) and sample_u[si] == u:
            out[si] = hist
            si += 1
    return out


def residual_degree_experiment(n: int, dv: int, dc: int, erasure_prob: float,
                               times=(0.65, 0.75, 0.85), repeats: int = 64,
                               seed: int = 0,
                               code: Optional[LDPCCode] = None
                               ) -> ResidualDegreeResult:
    """Measure residual check-degree distributions during actual peeling
    and compare with the expm theory curves
    (utils.theory.degree_distribution_at_time; reference
    test_peeling_decoder_path.py:96-116).

    Snapshots are taken when the unresolved-variable count first equals
    u = round(n(1-t)) -- fixed u rather than fixed peel-step, so every
    surviving trial is observed at exactly the theory's time coordinate.
    Fresh code per repeat (the reference experiment's convention,
    peeling_decoder.py:136-140) unless ``code`` is given.  Uses the native
    O(E) peeler when available, a numpy fallback otherwise.
    """
    from ..native import peel_decode_trials_hist_native
    from ..ops.channels import ERASURE

    sample_u = np.array(sorted({int(round(n * (1.0 - t))) for t in times},
                               reverse=True), np.int32)
    ts = 1.0 - sample_u.astype(float) / n
    analytic = np.stack([
        theory.degree_distribution_at_time(erasure_prob, t, dv, dc)
        for t in ts])

    key = jax.random.key(seed)
    ch = BEC(erasure_prob)
    degs = np.arange(1, dc + 1, dtype=float)
    samples = [[] for _ in sample_u]
    rng_fallback = np.random.default_rng(seed)
    for i in range(repeats):
        k_code, k_noise = jax.random.split(jax.random.fold_in(key, i))
        c = code if code is not None else sample_code(k_code, n, dv, dc)
        rx = ch.transmit(k_noise, jnp.zeros(n, jnp.int32))
        erased = (np.asarray(rx) == ERASURE)
        out = peel_decode_trials_hist_native(
            np.asarray(c.chk_to_var), np.asarray(c.var_to_chk),
            erased[None, :], seed=seed * 1_000_003 + i, sample_u=sample_u)
        if out is not None:
            hist = out[0][0]                       # [S, dc+1]
        else:
            hist = _peel_hist_python(np.asarray(c.chk_to_var),
                                     np.asarray(c.var_to_chk), erased,
                                     sample_u, rng_fallback)
        for s in range(len(sample_u)):
            if hist[s, 0] >= 0:
                samples[s].append(hist[s, 1:] * degs / (n * dv))

    S = len(sample_u)
    empirical = np.full((S, dc), np.nan)
    stderr = np.full((S, dc), np.nan)
    survivors = np.zeros(S, int)
    for s in range(S):
        if samples[s]:
            arr = np.stack(samples[s])
            survivors[s] = len(arr)
            empirical[s] = arr.mean(axis=0)
            stderr[s] = arr.std(axis=0, ddof=1) / math.sqrt(len(arr)) \
                if len(arr) > 1 else np.inf
    return ResidualDegreeResult(
        n=n, dv=dv, dc=dc, erasure_prob=erasure_prob, repeats=repeats,
        sample_u=sample_u, times=ts, empirical=empirical, stderr=stderr,
        analytic=analytic, survivors=survivors)


@dataclasses.dataclass
class BPDecodingPaths:
    """Per-trial BP erasure-count trajectories at one (n, eps).

    The BP analogue of the reference's per-epsilon decoding-path export
    (test_peeling_decoder_path.py:56-62): simulated per-iteration decoding
    paths, here per *trial* (reference ``errors`` array semantics,
    parallel_simulator.py:147-166) with outcome-conditional means and the
    bit-erasure DE curve on the same axis.
    """

    n: int
    dv: int
    dc: int
    erasure_prob: float
    iterations: int
    num_trials: int
    trajectories: np.ndarray       # int32[trials, iterations+1]
    failed: np.ndarray             # bool[trials]
    mean_path: np.ndarray          # f64[iterations+1], fraction of n
    mean_path_failed: np.ndarray   # conditional on decode failure (or NaN)
    mean_path_success: np.ndarray  # conditional on success (or NaN)
    de_path: np.ndarray            # modified DE bit-erasure curve

    @property
    def failure_rate(self) -> float:
        return float(self.failed.mean())


def bp_decoding_paths(n: int, dv: int, dc: int, erasure_prob: float,
                      iterations: int, trials: int = 1024, seed: int = 0,
                      code: Optional[LDPCCode] = None) -> BPDecodingPaths:
    """Per-trial BP decoding paths via the packed trajectory kernel.

    Drives :func:`..ops.erasure_bp.bp_decode_packed_traj` -- the only way
    to observe per-trial erasure trajectories at Monte Carlo scale (32
    trials/uint32; ~32x the counting work of the totals-only kernel, still
    thousands of times faster than per-trial decodes).  All-zero transmit.
    """
    from ..ops.bitops import bernoulli_packed
    from ..ops.erasure_bp import bp_decode_packed_traj

    if trials % 32:
        raise ValueError("trials must be a multiple of 32")
    key = jax.random.key(seed)
    k_code, k_noise = jax.random.split(key)
    c = code if code is not None else sample_code(k_code, n, dv, dc)
    erased = bernoulli_packed(k_noise, erasure_prob, (n, trials // 32))
    res, traj = bp_decode_packed_traj(
        c, erased, jnp.zeros_like(erased), iterations)
    traj = np.asarray(traj).T                       # [trials, iters+1]
    failed = np.asarray(res.failed)

    def cond_mean(mask):
        if not mask.any():
            return np.full(iterations + 1, np.nan)
        return traj[mask].mean(axis=0) / n

    de = np.asarray(theory.modified_density_evolution(
        erasure_prob, iterations, dv, dc))
    de = np.concatenate([de, np.full(iterations + 1 - len(de), 0.0)])
    return BPDecodingPaths(
        n=n, dv=dv, dc=dc, erasure_prob=erasure_prob, iterations=iterations,
        num_trials=trials, trajectories=traj, failed=failed,
        mean_path=traj.mean(axis=0) / n,
        mean_path_failed=cond_mean(failed),
        mean_path_success=cond_mean(~failed),
        de_path=de)


def export_bp_decoding_paths(paths: BPDecodingPaths, directory: str) -> str:
    """Write one structured JSON per epsilon (decoding-path export).

    Structured replacement for the reference's per-epsilon CSV dump
    (test_peeling_decoder_path.py:56-62): explicit metadata, the mean and
    outcome-conditional simulated paths, the DE overlay, and the raw
    per-trial trajectories.
    """
    import json
    import os

    os.makedirs(directory, exist_ok=True)
    path = os.path.join(
        directory,
        f"bp_decoding_paths_eps={paths.erasure_prob}_n={paths.n}"
        f"_dv={paths.dv}_dc={paths.dc}.json")
    def clean(x):
        # NaN (e.g. mean_path_failed with zero failures) -> null: keep
        # the file strict RFC-8259 JSON
        if isinstance(x, list):
            return [clean(e) for e in x]
        if isinstance(x, float) and not math.isfinite(x):
            return None
        return x

    doc = dataclasses.asdict(paths)
    for k, v in doc.items():
        if isinstance(v, np.ndarray):
            doc[k] = clean(v.tolist())
    with open(path, "w") as f:
        json.dump(doc, f, allow_nan=False)
    return path


def export_peeling_paths(result: PeelingScalingResult, directory: str,
                         legacy_csv: bool = True) -> str:
    """Export a peeling R-process experiment's decoding paths.

    Writes the reference-format analytic CSV
    ``peeling_decoder_paths_<eps>.csv`` with header ['x', 'fraction of
    edges'] (test_peeling_decoder_path.py:56-62: x = steps/(n eps),
    fraction = drift/(n dv)) plus a structured JSON with the simulated
    trajectories alongside the analytic curve.
    """
    import csv
    import json
    import os

    os.makedirs(directory, exist_ok=True)
    eps, n, dv = result.erasure_prob, result.n, result.dv
    steps = len(result.drift)
    xs = np.arange(steps) / max(steps - 1, 1)
    frac = result.drift / (n * dv)

    if legacy_csv:
        cpath = os.path.join(directory, f"peeling_decoder_paths_{eps}.csv")
        with open(cpath, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["x", "fraction of edges"])
            for x, v in zip(xs, frac):
                w.writerow([x, v])

    jpath = os.path.join(
        directory, f"peeling_decoder_paths_eps={eps}_n={n}.json")
    with open(jpath, "w") as f:
        json.dump({
            "n": n, "dv": dv, "dc": result.dc, "erasure_prob": eps,
            "repeats": result.repeats,
            "x": xs.tolist(),
            "analytic_fraction_of_edges": frac.tolist(),
            "drift": result.drift.tolist(),
            "critical_point": result.critical_point,
            "trajectories": [
                np.where(np.isnan(t), -1, t).astype(int).tolist()
                for t in result.trajectories],
            "sizes_at_failure": result.sizes_at_failure.tolist(),
        }, f)
    return jpath


@dataclasses.dataclass
class WaterfallResult:
    ns: List[int]
    erasure_probs: np.ndarray
    curves: List[np.ndarray]          # P_block per n (scaling law)
    threshold: float
    alpha: float


def waterfall_curves(ns, erasure_probs=None, dv: int = 3, dc: int = 6,
                     finite_size_shift: bool = False) -> WaterfallResult:
    """Scaling-law waterfall curves for a list of block lengths
    (finite_length_scaling_calculation.py:31-45)."""
    if erasure_probs is None:
        erasure_probs = np.linspace(0.32, 0.5, 100)
    erasure_probs = np.asarray(erasure_probs)
    thr = theory.calc_threshold(dv, dc)
    alpha = theory.calculate_alpha(thr, dv, dc)
    curves = [theory.waterfall_block_error(
        n, erasure_probs, dv, dc, finite_size_shift) for n in ns]
    return WaterfallResult(ns=list(ns), erasure_probs=erasure_probs,
                           curves=curves, threshold=thr, alpha=alpha)
