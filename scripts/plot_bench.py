"""Render achieved-bandwidth-vs-size curves from CLI benchmark output —
the analog of the reference's published plots (`benchmark_plot/*.png`,
generated from its sample sweeps; README.md:68-71).

Usage:
    python -m vkfft_tpu.cli -vkfft 0 -o /tmp/pallas.txt
    python -m vkfft_tpu.cli -vkfft 0 -compare -o /tmp/xla.txt   # second impl
    python scripts/plot_bench.py out.png pallas=/tmp/pallas.txt xla=/tmp/xla.txt \
        --roofline 819

Also accepts bench.py JSON lines (files whose first char is '{').

Chart rules (dataviz method): line form for change-over-size; categorical
hues in fixed validated order; one axis; thin 2px lines with >=8px markers;
recessive grid; legend for >=2 series plus direct end labels; roofline as a
muted reference line, never a series color.
"""
from __future__ import annotations

import argparse
import json
import math
import re
import sys

# Validated categorical palette (light mode), fixed slot order.
SERIES_COLORS = ["#2a78d6", "#eb6834", "#1baf7a", "#eda100",
                 "#e87ba4", "#008300", "#4a3aa7", "#e34948"]
TEXT_PRIMARY = "#1a1a19"
TEXT_SECONDARY = "#5f5e56"
GRID = "#e8e7e0"
SURFACE = "#ffffff"

_LINE = re.compile(
    r"^\s*([0-9]+(?:x[0-9]+)*)\s+batch\s+\d+:\s+[0-9.]+\s*ms\s+est\s+"
    r"([0-9.]+)\s*GB/s")


def parse_cli_file(path: str) -> list[tuple[int, float]]:
    """(total_size, GB/s) points from `cli -o` output."""
    pts = []
    for line in open(path):
        m = _LINE.match(line)
        if m:
            size = math.prod(int(v) for v in m.group(1).split("x"))
            pts.append((size, float(m.group(2))))
    return sorted(pts)


def parse_bench_json(path: str) -> list[tuple[int, float]]:
    pts = []
    for line in open(path):
        line = line.strip()
        if not line.startswith("{"):
            continue
        d = json.loads(line)
        for k, v in d.get("detail", {}).items():
            if not isinstance(v, dict) or "GBs" not in v:
                continue
            if k.startswith("3d_"):
                size = math.prod(int(s) for s in k[3:].split("x"))
            else:
                try:
                    size = int(k)
                except ValueError:
                    continue
            pts.append((size, float(v["GBs"])))
    return sorted(pts)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("output", help="output PNG path")
    ap.add_argument("series", nargs="+",
                    help="label=path pairs (CLI -o output or bench.py JSON)")
    ap.add_argument("--roofline", type=float, default=0.0,
                    help="HBM roofline GB/s reference line (e.g. 819 for v5e)")
    ap.add_argument("--title", default="Achieved bandwidth, batched FFT fwd+inv")
    a = ap.parse_args(argv)

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 4.5), dpi=144)
    fig.patch.set_facecolor(SURFACE)
    ax.set_facecolor(SURFACE)

    any_pts = False
    for i, spec in enumerate(a.series):
        label, _, path = spec.partition("=")
        if not path:
            label, path = path or spec, spec
        head = open(path).read(1)
        pts = (parse_bench_json(path) if head == "{"
               else parse_cli_file(path))
        if not pts:
            print(f"warning: no points parsed from {path}", file=sys.stderr)
            continue
        any_pts = True
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        c = SERIES_COLORS[i % len(SERIES_COLORS)]
        ax.plot(xs, ys, color=c, linewidth=2, marker="o", markersize=5,
                label=label, zorder=3)
        # direct end label (selective labeling; identity not color-alone)
        ax.annotate(label, (xs[-1], ys[-1]), textcoords="offset points",
                    xytext=(6, 0), color=TEXT_PRIMARY, fontsize=9,
                    va="center")
    if not any_pts:
        print("error: nothing to plot", file=sys.stderr)
        return 1

    if a.roofline:
        ax.axhline(a.roofline, color=TEXT_SECONDARY, linewidth=1,
                   linestyle=(0, (4, 3)), zorder=2)
        ax.annotate(f"HBM roofline {a.roofline:.0f} GB/s",
                    (1.0, a.roofline), xycoords=("axes fraction", "data"),
                    textcoords="offset points", xytext=(-4, 4),
                    ha="right", color=TEXT_SECONDARY, fontsize=8)

    ax.set_xscale("log", base=2)
    ax.set_xlabel("system size (points)", color=TEXT_SECONDARY, fontsize=9)
    ax.set_ylabel("effective GB/s", color=TEXT_SECONDARY, fontsize=9)
    ax.set_title(a.title, color=TEXT_PRIMARY, fontsize=11, loc="left")
    ax.grid(True, color=GRID, linewidth=0.8, zorder=0)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.tick_params(colors=TEXT_SECONDARY, labelsize=8)
    ax.set_ylim(bottom=0)
    if len(a.series) >= 2:
        ax.legend(frameon=False, fontsize=9, labelcolor=TEXT_PRIMARY)
    fig.tight_layout()
    fig.savefig(a.output, facecolor=SURFACE)
    print(f"wrote {a.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
