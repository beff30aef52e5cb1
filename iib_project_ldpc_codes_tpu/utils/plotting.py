"""Report figures (matplotlib), replacing tools/plotting.py.

Figure set mirrors the reference's (tools/plotting.py:26-336): BER vs
iteration with the density-evolution overlay, BER/FER vs erasure
probability with the scaling-law waterfall, BER vs block length with ML
comparison points, and per-code concentration plots.  Inputs are
structured :class:`SimulationResult` objects rather than filename-encoded
CSVs; every figure function returns the matplotlib Figure so callers can
save or show.
"""

from __future__ import annotations

from typing import Mapping, Sequence

import numpy as np

from . import theory
from .results import SimulationResult


def _plt():
    import matplotlib
    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    return plt


def plot_error_vs_iteration(results: Sequence[SimulationResult],
                            overlay_de: bool = True,
                            finite_length_de: bool = False,
                            logy: bool = True,
                            exact_values: Mapping | None = None):
    """Average bit erasure rate vs BP iteration, with DE overlay
    (tools/plotting.py:26-113; DE curve at :86).

    ``exact_values`` maps (n, erasure_prob) -> exact ensemble-average BER
    from the stopping-set analysis (utils.stopping_sets); matching
    results get a dashed hline -- the overlay the reference hardcodes at
    tools/plotting.py:50-71, here computed in-repo
    (StoppingSetAnalysis(n, dv, dc, X=1).bit_error_bulk(eps)).
    """
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    for r in results:
        cfg = r.config
        curve = np.asarray(r.error_rate_per_iteration)
        ax.plot(curve, marker=".", lw=1,
                label=f"sim n={cfg.n} eps={cfg.channel_param} "
                      f"num={r.num_trials}")
        if overlay_de:
            if finite_length_de:
                de = theory.finite_length_density_evolution(
                    cfg.channel_param, cfg.iterations, cfg.n, cfg.dv, cfg.dc)
            else:
                de = theory.modified_density_evolution(
                    cfg.channel_param, cfg.iterations, cfg.dv, cfg.dc)
            ax.plot(de, "--", lw=1,
                    label=f"DE eps={cfg.channel_param}")
        if exact_values:
            v = exact_values.get((cfg.n, cfg.channel_param))
            if v is not None:
                ax.axhline(v, ls="-.", lw=1, alpha=0.8,
                           label=f"exact analysis n={cfg.n} "
                                 f"eps={cfg.channel_param}")
    if logy:
        ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("average bit erasure rate")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    return fig


def plot_error_vs_erasure_prob(results: Sequence[SimulationResult],
                               metric: str = "block",
                               overlay_waterfall: bool = True,
                               finite_size_shift: bool = False,
                               exact_values: Mapping | None = None):
    """BER/FER vs channel erasure probability with the scaling-law
    waterfall overlay (tools/plotting.py:206-336 +
    finite_length_scaling_calculation.py:41-45).

    ``exact_values`` maps (n, erasure_prob) -> exact ensemble-average
    bit error (stopping-set analysis); plotted as star markers on the
    ``metric="bit"`` curves (the reference's hardcoded comparison values,
    tools/plotting.py:50-71)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    by_n = {}
    for r in results:
        by_n.setdefault(r.config.n, []).append(r)
    for n, rs in sorted(by_n.items()):
        rs = sorted(rs, key=lambda r: r.config.channel_param)
        eps = [r.config.channel_param for r in rs]
        if metric == "block":
            ys = [r.block_error_rate for r in rs]
        else:
            ys = [r.bit_error_rate for r in rs]
        ax.plot(eps, ys, "o-", label=f"sim n={n}")
        if overlay_waterfall and metric == "block" and rs:
            dv, dc = rs[0].config.dv, rs[0].config.dc
            grid = np.linspace(min(eps), max(eps), 200)
            ax.plot(grid, theory.waterfall_block_error(
                n, grid, dv, dc, finite_size_shift), "--",
                label=f"scaling law n={n}")
        opt = [r.optimal_block_error_rate if metric == "block"
               else r.optimal_bit_error_rate for r in rs]
        if any(o is not None for o in opt):
            ax.plot(eps, opt, "s:", label=f"ML n={n}")
        if exact_values and metric == "bit":
            pts = [(e, exact_values[(n, e)]) for e in eps
                   if (n, e) in exact_values]
            if pts:
                ax.plot(*zip(*pts), "k*", ms=10,
                        label=f"exact analysis n={n}")
    ax.set_yscale("log")
    ax.set_xlabel("erasure probability")
    ax.set_ylabel(f"{metric}-error rate")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    return fig


def plot_error_vs_n(results: Sequence[SimulationResult],
                    metric: str = "bit"):
    """BER vs block length with ML comparison (tools/plotting.py:115-167)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    rs = sorted(results, key=lambda r: r.config.n)
    ns = [r.config.n for r in rs]
    key = "bit_error_rate" if metric == "bit" else "block_error_rate"
    ax.plot(ns, [getattr(r, key) for r in rs], "o-", label="message passing")
    opt_key = f"optimal_{key}"
    opt = [getattr(r, opt_key) for r in rs]
    if any(o is not None for o in opt):
        ax.plot(ns, opt, "s--", label="optimal (ML)")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("block length n")
    ax.set_ylabel(f"{metric}-error rate")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    return fig


def plot_concentration(results: Sequence[SimulationResult],
                       metric: str = "bit"):
    """Per-code concentration plot: one curve per fixed code number at the
    same parameters (tools/plotting.py:169-204)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    for r in sorted(results, key=lambda r: r.config.code_number):
        curve = np.asarray(r.error_rate_per_iteration)
        ax.plot(curve, lw=1, label=f"code {r.config.code_number}")
    ax.set_yscale("log")
    ax.set_xlabel("iteration")
    ax.set_ylabel("average bit erasure rate")
    ax.legend(fontsize=7, ncol=2)
    ax.grid(alpha=0.3)
    return fig


def plot_peeling_trajectories(exp, max_curves: int = 30):
    """R-process trajectories vs drift (peeling_decoder.py:151, :174-176)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    for traj in exp.trajectories[:max_curves]:
        ax.plot(traj, "--", lw=0.6, alpha=0.5)
    ax.plot(exp.drift, "k-", lw=2, label="analytic drift")
    ax.axvline(exp.critical_point, color="r", ls=":",
               label="critical point")
    ax.set_xlabel("peeling steps remaining (reversed)")
    ax.set_ylabel("degree-1 checks")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    return fig


def plot_critical_histogram(exp, bins: int = 40):
    """Histogram of R at the critical point vs the scaling-law Gaussian
    (peeling_decoder.py:220-228)."""
    import math

    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))
    data = exp.critical_distribution
    if len(data):
        ax.hist(data, bins=bins, density=False, alpha=0.6, label="simulated")
        x = np.linspace(data.min(), data.max(), 500)
        total = len(data) + exp.num_failures_at_critical
        sd = math.sqrt(exp.variance_at_critical)
        pdf = np.exp(-0.5 * ((x - exp.expected_at_critical) / sd) ** 2) \
            / (sd * math.sqrt(2 * math.pi))
        binw = (data.max() - data.min()) / bins if len(data) > 1 else 1.0
        ax.plot(x, total * pdf * binw, "r-", label="scaling-law Gaussian")
    ax.set_xlabel("degree-1 checks at critical point")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    return fig


def plot_degree_distributions(res, bar_width: float = 0.35):
    """Simulated vs analytic residual check-degree distributions
    (one panel per sampled time; reference test_peeling_decoder_path.py
    :96-116 comparison, here with error bars)."""
    plt = _plt()
    S = len(res.times)
    fig, axes = plt.subplots(1, S, figsize=(4 * S, 3.2), squeeze=False)
    degs = np.arange(1, res.dc + 1)
    for s, ax in enumerate(axes[0]):
        ax.bar(degs - bar_width / 2, res.empirical[s], bar_width,
               yerr=res.stderr[s], label="simulated", capsize=3)
        ax.bar(degs + bar_width / 2, res.analytic[s], bar_width,
               label="expm theory")
        ax.set_title(f"t = {res.times[s]:.2f} "
                     f"({res.survivors[s]}/{res.repeats} trials)")
        ax.set_xlabel("residual check degree")
        ax.set_ylabel("edge fraction $X_d$")
        ax.legend()
    fig.suptitle(f"({res.dv},{res.dc}) n={res.n} eps={res.erasure_prob}")
    fig.tight_layout()
    return fig


def plot_irregular_vs_regular(irregular_results: Sequence[SimulationResult],
                              regular_results: Sequence[SimulationResult],
                              metric: str = "bit",
                              mark_thresholds: bool = True):
    """Irregular-vs-regular BER/FER comparison at a common rate, with the
    computed BP thresholds marked (capability extension of the
    tools/plotting.py figure set; the quantity that shows the irregular
    gain is the *bit* error rate -- lambda2 > 0 ensembles carry a
    finite-n block-error floor from O(1) stopping sets)."""
    plt = _plt()
    fig, ax = plt.subplots(figsize=(7, 5))

    def curve(rs, label):
        rs = sorted(rs, key=lambda r: r.config.channel_param)
        eps = [r.config.channel_param for r in rs]
        ys = [r.bit_error_rate if metric == "bit" else r.block_error_rate
              for r in rs]
        ax.plot(eps, ys, "o-", label=label)
        return rs

    irr = curve(irregular_results, "irregular")
    reg = curve(regular_results, "regular")
    if mark_thresholds:
        if irr and irr[0].config.lam is not None:
            thr = theory.irregular_threshold(irr[0].config.lam,
                                             irr[0].config.rho, 1e-6)
            ax.axvline(thr, ls="--", color="C0", alpha=0.6,
                       label=f"irregular eps*={thr:.4f}")
        if reg:
            thr = theory.calc_threshold(reg[0].config.dv,
                                        reg[0].config.dc)
            ax.axvline(thr, ls="--", color="C1", alpha=0.6,
                       label=f"regular eps*={thr:.4f}")
    ax.set_yscale("log")
    ax.set_xlabel("erasure probability")
    ax.set_ylabel(f"{metric}-error rate")
    ax.legend(fontsize=7)
    ax.grid(alpha=0.3)
    return fig
