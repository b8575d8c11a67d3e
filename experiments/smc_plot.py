"""Frontier plot for the SMC lambda sweep (docs/results/smc_budget*.json).

Three stacked panels over log-lambda (scores / population FID-proxy /
ESS stay on separate axes — different units never share a scale); the
lambda=0 arm (= independent best-of-16) is the dashed reference line in
each panel rather than a point (log axis). If the spread-mode file
exists, its arms overlay as dashed lines with open markers — same hue
per measure (color follows the measure; linestyle carries the mode).

Usage: python experiments/smc_plot.py
Writes: docs/results/smc_budget.png
"""

from __future__ import annotations

import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "docs", "results")

BLUE, ORANGE, AQUA, YELLOW = "#2a78d6", "#eb6834", "#1baf7a", "#eda100"
INK, MUTED = "#0b0b0b", "#52514e"


def load(name):
    p = os.path.join(RESULTS, name)
    if not os.path.isfile(p):
        return None
    with open(p) as f:
        d = json.load(f)
    arms = {float(k): v for k, v in d["arms"].items()}
    lams = sorted(l for l in arms if l > 0)
    return {
        "baseline": arms.get(0.0),
        "lams": lams,
        "best": [arms[l]["E_best"] for l in lams],
        "mean": [arms[l]["E_population_mean"] for l in lams],
        "fid": [arms[l]["population_fid_proxy"] for l in lams],
        "ess": [arms[l]["mean_ess"] for l in lams],
    }


def main():
    absolute = load("smc_budget.json")
    spread = load("smc_budget_spread.json")
    assert absolute, "docs/results/smc_budget.json missing"

    fig, (ax_s, ax_f, ax_e) = plt.subplots(
        3, 1, figsize=(6.4, 7.6), sharex=True,
        gridspec_kw={"hspace": 0.12})
    fig.patch.set_facecolor("#fcfcfb")

    def style(ax):
        ax.set_facecolor("#fcfcfb")
        ax.grid(True, which="major", color="#e6e5e1", lw=0.6, zorder=0)
        for s in ("top", "right"):
            ax.spines[s].set_visible(False)
        for s in ("left", "bottom"):
            ax.spines[s].set_color("#c9c8c2")
        ax.tick_params(colors=MUTED, labelsize=8)

    def series(ax, data, key, color, label, dashed=False):
        ax.plot(data["lams"], data[key],
                color=color, lw=2, zorder=3, label=label,
                linestyle="--" if dashed else "-",
                marker="o" if not dashed else "s", ms=5,
                markerfacecolor="none" if dashed else color,
                markeredgecolor=color, markeredgewidth=1.5)

    # -- panel 1: verifier scores (same unit -> one axis, two series)
    series(ax_s, absolute, "best", BLUE, "E[best] (absolute λ)")
    series(ax_s, absolute, "mean", ORANGE, "E[population mean] (absolute λ)")
    if spread:
        series(ax_s, spread, "best", BLUE, "E[best] (spread λ)", dashed=True)
        series(ax_s, spread, "mean", ORANGE, "E[population mean] (spread λ)",
               dashed=True)
    b = absolute["baseline"]
    ax_s.axhline(b["E_best"], color=BLUE, lw=1, ls=":", zorder=2)
    ax_s.axhline(b["E_population_mean"], color=ORANGE, lw=1, ls=":", zorder=2)
    ax_s.text(0.02, 0.50, "dotted: independent\nbest-of-16 (λ=0)",
              transform=ax_s.transAxes, ha="left", fontsize=7.5,
              color=MUTED)
    ax_s.set_ylabel("verifier score", fontsize=9, color=INK)
    ax_s.legend(fontsize=7.5, frameon=False, loc="lower right", ncol=1)

    # -- panel 2: population FID-proxy (its own scale)
    series(ax_f, absolute, "fid", AQUA, "absolute λ")
    if spread:
        series(ax_f, spread, "fid", AQUA, "spread λ", dashed=True)
        ax_f.legend(fontsize=7.5, frameon=False, loc="lower right")
    ax_f.axhline(b["population_fid_proxy"], color=AQUA, lw=1, ls=":")
    ax_f.set_ylabel("population FID-proxy\n(lower = more diverse)",
                    fontsize=9, color=INK)

    # -- panel 3: mean ESS (its own scale)
    series(ax_e, absolute, "ess", YELLOW, "absolute λ")
    if spread:
        series(ax_e, spread, "ess", YELLOW, "spread λ", dashed=True)
        ax_e.legend(fontsize=7.5, frameon=False, loc="upper right")
    ax_e.axhline(16, color=YELLOW, lw=1, ls=":")
    ax_e.set_ylabel("mean ESS (of 16)", fontsize=9, color=INK)
    ax_e.set_xlabel("λ (steering temperature, log scale)", fontsize=9,
                    color=INK)
    ax_e.set_xscale("log")

    for ax in (ax_s, ax_f, ax_e):
        style(ax)
    ax_s.set_title(
        "SMC steering at equal NFE: 16 particles, T=1000, 20 seeds\n"
        "score gain vs diversity cost across the steering temperature",
        fontsize=10, color=INK, pad=10)

    out = os.path.join(RESULTS, "smc_budget.png")
    fig.savefig(out, dpi=150, bbox_inches="tight")
    print(f"-> {out}")


if __name__ == "__main__":
    main()
