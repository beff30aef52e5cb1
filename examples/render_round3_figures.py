"""Render the round-3 validation figures from the measured data.

Reproduces docs/figures/{irregular_vs_regular_n8192.png,
waterfall_scaling_n1e5_1e6.png} from the tables recorded in
docs/VALIDATION.md (measured on one v5e chip by
examples/validate_round3.py).  Matplotlib-only, repo figure style:
one axis, fixed series colors, dashed theory overlays, log-scale BER.
"""

import sys

sys.path.insert(0, ".")

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from iib_project_ldpc_codes_tpu.utils import theory

LAM = [0, 1 / 3, 0, 2 / 3]
RHO = [0, 0, 0, 0, 0, 1.0]


def irregular_vs_regular():
    eps = [0.40, 0.42, 0.43, 0.44, 0.45, 0.46, 0.47]
    ber_irr = [7.9e-05, 9.6e-05, 2.3e-04, 1.2e-02, 1.3e-01, 2.9e-01,
               3.4e-01]
    ber_reg = [1e-07, 2.3e-02, 1.6e-01, 2.7e-01, 3.1e-01, 3.4e-01,
               3.7e-01]  # 0.40 point measured 0 / 4096 trials: floor marker
    fig, ax = plt.subplots(figsize=(7, 5))
    ax.plot(eps, ber_irr, "o-", color="C0",
            label="irregular λ=(1/3)x+(2/3)x³, ρ=x⁵")
    ax.plot(eps[1:], ber_reg[1:], "s-", color="C1", label="(3,6) regular")
    thr_i = theory.irregular_threshold(LAM, RHO, 1e-6)
    thr_r = theory.calc_threshold(3, 6)
    ax.axvline(thr_i, ls="--", color="C0", alpha=0.6,
               label=f"irregular ε* = {thr_i:.4f}")
    ax.axvline(thr_r, ls="--", color="C1", alpha=0.6,
               label=f"regular ε* = {thr_r:.4f}")
    ax.set_yscale("log")
    ax.set_xlabel("erasure probability ε")
    ax.set_ylabel("bit error rate")
    ax.set_title("Irregular vs regular at rate 1/2, n = 8192\n"
                 "(4096 trials/point, one v5e chip)")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig("docs/figures/irregular_vs_regular_n8192.png", dpi=130)


def waterfall_scaling():
    data = {
        100_000: ([0.4250, 0.4275, 0.4290, 0.4310],
                  [0.0093, 0.1655, 0.4685, 0.8364]),
        1_000_000: ([0.4280, 0.4288, 0.4292, 0.4298],
                    [0.0068, 0.1299, 0.3818, 0.7852]),
    }
    fig, ax = plt.subplots(figsize=(7, 5))
    for color, (n, (eps, fer)) in zip(("C0", "C1"), data.items()):
        ax.plot(eps, fer, "o", color=color, label=f"measured n = {n:.0e}")
        grid = np.linspace(min(eps) - 5e-4, max(eps) + 5e-4, 300)
        ax.plot(grid, theory.waterfall_block_error(
            n, grid, 3, 6, finite_size_shift=True), "--", color=color,
            alpha=0.7, label=f"scaling law n = {n:.0e}")
    ax.set_xlabel("erasure probability ε")
    ax.set_ylabel("block (frame) error rate")
    ax.set_title("FER vs the finite-length scaling law "
                 "Φ(−√n(ε*−βn^(-2/3)−ε)/α)\n"
                 "edge-sharded Monte Carlo, one v5e chip")
    ax.legend(fontsize=8)
    ax.grid(alpha=0.3)
    fig.tight_layout()
    fig.savefig("docs/figures/waterfall_scaling_n1e5_1e6.png", dpi=130)


if __name__ == "__main__":
    irregular_vs_regular()
    waterfall_scaling()
    print("wrote docs/figures/irregular_vs_regular_n8192.png and "
          "docs/figures/waterfall_scaling_n1e5_1e6.png")
