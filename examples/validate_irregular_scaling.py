"""Irregular finite-length scaling: measure the (lambda, rho) waterfall
at several block lengths, fit the scaling law, and test the sqrt(n)
collapse.

The reference's finite-length scaling machinery is regular-only
(finite_length_scaling_calculation.py:18-43: alpha from the (dv,dc)
closed form).  For the flagship irregular rate-1/2 pair
lambda = (1/3)x + (2/3)x^3, rho = x^5 no closed form is wired, so alpha
comes from measurement: expurgated FER at 4 block lengths near the
computed threshold eps* = 0.45265, probit-fit to
P_block = Phi(-sqrt(n)(eps* - eps - beta n^(-2/3)) / alpha)
(utils.theory.fit_waterfall_alpha -- linear after the probit), with a
per-n refit to test that alpha is n-stable.

Expurgation (s = max(32, n/100) final erasures) removes the lambda2 > 0
small-stopping-set floor (O(1)-size events) without touching genuine
waterfall failures (Theta(n)-size stalls) -- the
parallel_simulator_expurgated.py:238-243 rule applied where the
reference never could.

A second, independent alpha estimate comes from the irregular R-process
(ops/peeling + native/peeling.c): the scaling law equates
P_block ~ Phi(-E[R*]/sd(R*)), so alpha = sqrt(n) sd(R*) / |d drift* /
d eps|; agreement of the two routes closes items 2+3 of the round-3
review together.

Run on the TPU.  Writes docs/data/irregular_scaling.json and
docs/figures/irregular_waterfall_scaling.png.
"""

import json
import os
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
LAM = [0.0, 1 / 3, 0.0, 2 / 3]
RHO = [0.0, 0.0, 0.0, 0.0, 0.0, 1.0]

# eps grids straddling the computed threshold 0.45265, widths ~ the
# expected waterfall width alpha/sqrt(n) (alpha unknown a priori;
# saturated points are dropped by the fit)
GRID = {
    4096: [0.424, 0.430, 0.436, 0.442, 0.448],
    8192: [0.430, 0.435, 0.440, 0.445, 0.450],
    16384: [0.436, 0.440, 0.444, 0.448, 0.451],
    65536: [0.442, 0.445, 0.448, 0.450, 0.452],
}
TRIALS = {4096: 65536, 8192: 65536, 16384: 32768, 65536: 16384}
# per-execution batch: the remote worker reproducibly dies on long
# single executions (n=16384 chunks at batch 8192 ran ~2 min each and
# crashed the worker three times at the same point); smaller chunks
# keep each XLA execution well under the tunnel's patience
BATCH = {4096: 8192, 8192: 8192, 16384: 2048, 65536: 1024}


def run_point(n, eps, trials, seed=17):
    from iib_project_ldpc_codes_tpu.parallel.montecarlo import run_simulation
    from iib_project_ldpc_codes_tpu.utils.config import SimulationConfig
    from iib_project_ldpc_codes_tpu.utils.stats import fer_ci

    batch = BATCH[n]
    cfg = SimulationConfig(
        channel="BEC", channel_param=eps, n=n, lam=LAM, rho=RHO,
        decoder="bp", iterations=150, num_tests=trials, batch=batch,
        codes_per_chunk=batch // 32, expurgation=max(32, n // 100),
        max_block_errors=10 ** 9, seed=seed, code_mode="ensemble")
    t0 = time.time()
    res = run_simulation(cfg)
    lo, hi = fer_ci(res)
    return dict(n=n, eps=eps, trials=res.num_trials,
                fer=res.block_error_rate, fer_lo=lo, fer_hi=hi,
                block_errors=res.block_errors,
                excluded=res.excluded_trials,
                expurgation=cfg.expurgation,
                seconds=round(time.time() - t0, 1))


def peeling_alpha(n=16384, repeats=300, seed=5):
    """Independent alpha from the R-process critical-point statistics."""
    from iib_project_ldpc_codes_tpu.utils import theory
    from iib_project_ldpc_codes_tpu.utils.experiments import (
        peeling_scaling_experiment)

    thr = theory.irregular_threshold(LAM, RHO, 1e-7)
    eps = thr  # at threshold the drift minimum touches zero
    t0 = time.time()
    exp = peeling_scaling_experiment(n, 0, 0, eps, repeats=repeats,
                                     seed=seed, lam=LAM, rho=RHO)
    # R at the critical index over surviving trials, de-conditioned: at
    # eps = eps* roughly half the trials die before the critical point,
    # so the surviving R* sample is the upper half of the Gaussian --
    # estimate sd from the upper-half moments (mean m, sd s of a
    # half-normal above its mean: m = mu + s0*phi/Phi ...).  Simpler and
    # robust: run slightly below threshold so most trials survive.
    eps2 = thr - 0.006
    exp2 = peeling_scaling_experiment(n, 0, 0, eps2, repeats=repeats,
                                      seed=seed + 1, lam=LAM, rho=RHO)
    cp = exp2.critical_point
    vals = np.asarray([t[cp] for t in exp2.trajectories
                       if len(t) > cp and not np.isnan(t[cp])])
    sd = vals.std(ddof=1)
    # d drift(crit) / d eps by central difference of the analytic drift
    h = 1e-4
    up = theory.irregular_peeling_drift(eps2 + h, LAM, RHO, n,
                                        np.arange(int(n * (eps2 + h))))[::-1]
    dn = theory.irregular_peeling_drift(eps2 - h, LAM, RHO, n,
                                        np.arange(int(n * (eps2 - h))))[::-1]
    dslope = (up[cp] - dn[cp]) / (2 * h)
    alpha_peel = float(np.sqrt(n) * sd / abs(dslope))
    return dict(n=n, eps=eps2, repeats=repeats, survivors=len(vals),
                sd_at_critical=float(sd), ddrift_deps=float(dslope),
                alpha=alpha_peel,
                seconds=round(time.time() - t0, 1)), exp


def main():
    import jax
    import jax.numpy as jnp

    np.asarray(jnp.zeros(1))  # tunnel warmup
    print("devices:", jax.devices(), flush=True)
    from iib_project_ldpc_codes_tpu.utils import theory

    thr = theory.irregular_threshold(LAM, RHO, 1e-7)
    print(f"computed threshold eps* = {thr:.6f}", flush=True)

    # incremental resume: the TPU worker can crash mid-run (known
    # failure mode); completed points are persisted after each run and
    # skipped on restart (per-point seeds are fixed, so a skipped point
    # equals its rerun bit-for-bit)
    part_path = os.path.join(ROOT, "docs", "data",
                             "irregular_scaling_points.json")
    rows = []
    if os.path.exists(part_path):
        with open(part_path) as f:
            rows = json.load(f)
    done = {(r["n"], r["eps"]) for r in rows}
    for n, grid in GRID.items():
        for eps in grid:
            if (n, eps) in done:
                continue
            r = run_point(n, eps, TRIALS[n])
            rows.append(r)
            with open(part_path, "w") as f:
                json.dump(rows, f, indent=1)
            print(f"n={n} eps={eps}: FER={r['fer']:.4f} "
                  f"({r['block_errors']} events, {r['excluded']} expurgated"
                  f", {r['seconds']}s)", flush=True)

    pts = [(r["n"], r["eps"], r["fer"]) for r in rows]
    alpha, beta = theory.fit_waterfall_alpha(pts, thr)
    print(f"joint fit: alpha={alpha:.4f} beta={beta:.4f}", flush=True)

    # per-n alpha with the joint beta: the n-stability test
    per_n = {}
    for n in GRID:
        sub = [(r["n"], r["eps"], r["fer"]) for r in rows if r["n"] == n]
        z = [theory._norm_ppf_np(f) for _, _, f in sub if 0 < f < 1]
        b = [-np.sqrt(n) * (thr - e - beta * n ** (-2 / 3))
             for _, e, f in sub if 0 < f < 1]
        per_n[n] = float(np.dot(b, z) / np.dot(z, z))
        print(f"alpha_hat(n={n}) = {per_n[n]:.4f}", flush=True)

    peel, exp = peeling_alpha()
    print(f"R-process alpha (n={peel['n']}, independent route): "
          f"{peel['alpha']:.4f}", flush=True)

    os.makedirs(os.path.join(ROOT, "docs", "data"), exist_ok=True)
    with open(os.path.join(ROOT, "docs", "data",
                           "irregular_scaling.json"), "w") as f:
        json.dump(dict(threshold=thr, alpha=alpha, beta=beta,
                       alpha_per_n=per_n, points=rows,
                       peeling_route=peel), f, indent=1)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, axes = plt.subplots(1, 2, figsize=(12, 4.6))
    ax = axes[0]
    for n in GRID:
        rs = [r for r in rows if r["n"] == n]
        eps = [r["eps"] for r in rs]
        ax.errorbar(eps, [r["fer"] for r in rs],
                    yerr=[[r["fer"] - r["fer_lo"] for r in rs],
                          [r["fer_hi"] - r["fer"] for r in rs]],
                    fmt="o", capsize=3, label=f"n={n}")
        grid = np.linspace(min(eps) - 0.003, thr, 200)
        ax.plot(grid, theory.waterfall_block_error_fitted(
            n, grid, thr, alpha, beta), "--", lw=1)
    ax.axvline(thr, color="k", ls=":", label=f"eps*={thr:.4f}")
    ax.set_yscale("log")
    ax.set_ylim(1e-3, 1.2)
    ax.set_xlabel("erasure probability")
    ax.set_ylabel("expurgated FER")
    ax.set_title("Irregular waterfalls vs fitted scaling law")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)

    ax = axes[1]   # sqrt(n) collapse: FER vs scaled coordinate
    for n in GRID:
        rs = [r for r in rows if 0 < r["fer"] < 1 and r["n"] == n]
        x = [np.sqrt(r["n"]) * (thr - r["eps"]
                                - beta * r["n"] ** (-2 / 3)) / alpha
             for r in rs]
        ax.plot(x, [r["fer"] for r in rs], "o", label=f"n={n}")
    xs = np.linspace(0, 4, 100)
    from math import erf, sqrt
    ax.plot(xs, [0.5 * (1 - erf(v / sqrt(2))) for v in xs], "k-",
            lw=1, label="Phi(-x)")
    ax.set_yscale("log")
    ax.set_ylim(1e-3, 1.2)
    ax.set_xlabel(r"$\sqrt{n}(\epsilon^*-\epsilon-\beta n^{-2/3})/\alpha$")
    ax.set_ylabel("expurgated FER")
    ax.set_title("sqrt(n) waterfall collapse")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig(os.path.join(ROOT, "docs", "figures",
                             "irregular_waterfall_scaling.png"),
                dpi=120, bbox_inches="tight")

    # R-process trajectory figure for the irregular pair
    from iib_project_ldpc_codes_tpu.utils.plotting import (
        plot_peeling_trajectories)

    fig2 = plot_peeling_trajectories(exp)
    fig2.savefig(os.path.join(ROOT, "docs", "figures",
                              "irregular_peeling_trajectories.png"),
                 dpi=120, bbox_inches="tight")
    print("wrote docs/data/irregular_scaling.json + 2 figures")


if __name__ == "__main__":
    main()
