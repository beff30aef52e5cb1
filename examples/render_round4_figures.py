"""Render the round-4 summary figure from recorded measurement data.

One panel: for every ensemble/channel family, the threshold measured by
finite-length waterfall extrapolation (utils.theory.fit_waterfall_full
over the hardware FER points in docs/data/) against its density-
evolution value -- the {DE, Monte Carlo, scaling-law} triangle closed
on measured data.  CPU-only; reads the JSONs the validate_* drivers
wrote.
"""

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DATA = os.path.join(ROOT, "docs", "data")


def main():
    from iib_project_ldpc_codes_tpu.utils import theory

    rows = []
    # regular BEC: refit from the round-3 measured n=1e5/1e6 FERs
    thr = theory.calc_threshold(3, 6)
    real = ([(100_000, e, f) for e, f in zip(
        [0.4250, 0.4275, 0.4290, 0.4310],
        [0.0093, 0.1655, 0.4685, 0.8364])] +
        [(1_000_000, e, f) for e, f in zip(
            [0.4280, 0.4288, 0.4292, 0.4298],
            [0.0068, 0.1299, 0.3818, 0.7852])])
    _, _, t = theory.fit_waterfall_full(real)
    rows.append(("BEC (3,6)\nregular", thr, t))

    with open(os.path.join(DATA, "irregular_scaling.json")) as f:
        doc = json.load(f)
    pts = [(r["n"], r["eps"], r["fer"]) for r in doc["points"]]
    _, _, t = theory.fit_waterfall_full(pts)
    rows.append(("BEC irregular\npair", doc["threshold"], t))

    for fname, label in [("awgn_scaling.json", "AWGN (3,6)\nsum-product"),
                         ("awgn_scaling_int8.json",
                          "AWGN (3,6)\nint8 min-sum"),
                         ("awgn_scaling_irregular.json",
                          "AWGN irregular\n(GA anchor)")]:
        with open(os.path.join(DATA, fname)) as f:
            doc = json.load(f)
        rows.append((label, doc["sigma_star_de"], doc["sigma_star_fit"]))

    with open(os.path.join(DATA, "bsc_scaling.json")) as f:
        doc = json.load(f)
    rows.append(("BSC (3,6)\nGallager-A", doc["p_star_de"],
                 doc["p_star_fit"]))

    fig, ax = plt.subplots(figsize=(9, 4.6))
    xs = range(len(rows))
    devs = [1e2 * (fit / de - 1.0) for _, de, fit in rows]
    colors = ["C0", "C0", "C1", "C1", "C1", "C2"]
    ax.bar(xs, devs, color=colors, alpha=0.8)
    for x, (label, de, fit) in zip(xs, rows):
        ax.text(x, devs[x] + (0.02 if devs[x] >= 0 else -0.06),
                f"DE {de:.4f}\nfit {fit:.4f}", ha="center", fontsize=8)
    ax.axhline(0, color="k", lw=1)
    ax.set_xticks(list(xs))
    ax.set_xticklabels([r[0] for r in rows], fontsize=8)
    ax.set_ylabel("fitted threshold vs DE  (%)")
    ax.set_ylim(-0.8, 0.8)
    ax.set_title("Thresholds measured two ways: density evolution vs\n"
                 "finite-length waterfall extrapolation (hardware MC; "
                 "the AWGN-irregular bar = measured GA bias)",
                 fontsize=11)
    ax.grid(alpha=0.3, axis="y")
    fig.tight_layout()
    out = os.path.join(ROOT, "docs", "figures",
                       "threshold_cross_measurements.png")
    fig.savefig(out, dpi=130)
    print("wrote", out)
    for label, de, fit in rows:
        print(f"{label.replace(chr(10), ' '):28s} DE={de:.5f} "
              f"fit={fit:.5f} ({1e2 * (fit / de - 1):+0.2f}%)")


if __name__ == "__main__":
    main()
