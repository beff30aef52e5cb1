"""Render the round-5 summary figure from recorded measurements.

One panel: decode throughput of the generic gather decoders vs the QC
roll decoders on the same codes, per family and block length -- the
structural huge-n win, with the honest n=1e5 regime where the generic
kernel stays ahead.  CPU-only; numbers are the on-chip measurements
recorded in docs/VALIDATION.md (round-5 sections).
"""

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIG = os.path.join(ROOT, "docs", "figures", "qc_roll_vs_gather.png")

# (label, generic Ginfobit/s, qc Ginfobit/s) -- docs/VALIDATION.md r5
ROWS = [
    ("BEC packed BP\nn=1e4, w=768", 4.51, 4.84),
    ("BEC packed BP\nn=1e5, w=512", 2.83, 1.90),
    ("BEC packed BP\nn=1e6, w=48", 0.11, 2.70),
    ("BEC irregular pair\nn=1e6, w=48", 0.07, 2.91),
    ("Gallager-A\nn=1e6, w=48", 0.06, 1.54),
    ("int8 min-sum\nn=1e6, B=128", 0.048, 0.092),
]


def main():
    fig, ax = plt.subplots(figsize=(9, 4.4))
    x = np.arange(len(ROWS))
    w = 0.38
    gen = [r[1] for r in ROWS]
    qc = [r[2] for r in ROWS]
    ax.bar(x - w / 2, gen, w, label="generic (gather)", color="#1f77b4")
    ax.bar(x + w / 2, qc, w, label="QC (roll)", color="#d62728")
    for xi, (g, q) in zip(x, zip(gen, qc)):
        ratio = q / g
        ax.annotate(f"{ratio:.1f}x" if ratio >= 1 else f"{ratio:.2f}x",
                    xy=(xi + w / 2, q), xytext=(0, 3),
                    textcoords="offset points", ha="center", fontsize=8)
    ax.set_yscale("log")
    ax.set_ylabel("decoded info bits/s (Ginfobit/s, log)")
    ax.set_xticks(x)
    ax.set_xticklabels([r[0] for r in ROWS], fontsize=8)
    ax.grid(True, axis="y", which="both", alpha=0.25)
    ax.legend()
    ax.set_title("Quasi-cyclic roll decoders vs generic gather decoders "
                 "(one v5e chip, decode-only, bit-identical outputs)",
                 fontsize=10)
    fig.tight_layout()
    os.makedirs(os.path.dirname(FIG), exist_ok=True)
    fig.savefig(FIG, dpi=150)
    print("wrote", FIG)


if __name__ == "__main__":
    main()
