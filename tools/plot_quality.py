"""Render the docs/quality metric curves to PNGs for quick inspection.

Reads every ``docs/quality/*.metrics.jsonl`` and writes one chart per run to
``docs/quality/plots/``:

- SPAIR runs (rows with ``test0/count_acc``): seen- vs unseen-background
  count accuracy vs step, with the zero-collapse floor (all-zero predictor
  accuracy on the synthetic test split) as a labeled reference line.
- GMVAE runs (rows with ``test/classifier_cluster_acc``): cluster accuracy
  vs step, with the 0.10 chance floor and, for the `digits` generator, the
  measured 0.62 pixel-space k-means ceiling (BASELINE.md "clustering
  groundwork") as reference lines.
- Runs carrying disentanglement-probe columns additionally get a
  ``<name>.probes.png`` companion: frozen-classifier accuracy on the
  reconstruction vs the z_l-resampled / z_g-resampled (/ swapped-cluster)
  decodes — the SPLIT signature is z_l tracking the recon line while z_g
  falls to the chance floor (vae/trainer.py:213-226 semantics, range-fixed
  probe companions per train/probes.py).

Colors are the first slots of the validated categorical palette from the
dataviz reference instance (all-pairs safe at <=3 series); marks follow its
specs (2px lines, recessive grid, text in ink tokens, legend for >=2 series).

Usage: python tools/plot_quality.py [--out docs/quality/plots]
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e4e3df"
SERIES = ["#2a78d6", "#eb6834", "#1baf7a", "#b0529e"]  # blue, orange, aqua, magenta

# Reference lines per run family: (label, value, only_for_substring)
CHANCE_FLOOR = 0.10
DIGITS_PIXEL_CEILING = 0.62  # BASELINE.md: 30-means on raw pixels, digits style
# All-zero-counts predictor accuracy, measured per SPAIR dataset's synthetic
# test split — drawn only when the run name identifies the dataset (a floor
# from one dataset would mislabel another's plot).
COLLAPSE_FLOORS = {"ckb_rot6": 0.148, "ckb_rot_6": 0.148}


def _load(path: str):
    with open(path) as f:
        return [json.loads(line) for line in f]


def _series(rows, key):
    return ([r["step"] for r in rows if key in r],
            [r[key] for r in rows if key in r])


def _style_axes(ax, title, ylabel):
    ax.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(GRID)
    ax.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    ax.tick_params(colors=INK2, labelsize=9)
    ax.set_xlabel("training step", color=INK2, fontsize=10)
    ax.set_ylabel(ylabel, color=INK2, fontsize=10)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=10)


def _refline(ax, y, label):
    ax.axhline(y, color=INK2, linewidth=1, linestyle=(0, (4, 3)), alpha=0.7)
    ax.annotate(f"{label} ({y:.2f})", xy=(1.0, y), xycoords=("axes fraction", "data"),
                xytext=(-4, 4), textcoords="offset points", ha="right",
                color=INK2, fontsize=8)


# Disentanglement-probe columns (train/probes.py): plotted on the companion
# chart when present. The reconstruction probe is the fidelity ceiling; the
# rangefix variants feed classifier-distribution inputs (see module docstring
# there for why the verbatim reference columns are range-corrupted).
PROBE_KEYS = [
    ("test/classifier_recon_acc", "reconstruction"),
    ("test/probe_random_z_l_acc_rangefix", "z_l resampled"),
    ("test/probe_random_z_g_acc_rangefix", "z_g resampled"),
    ("test/probe_swapped_y_z_g_acc_rangefix", "z_g swapped cluster"),
]


def plot_probes(path: str, out_dir: str) -> str | None:
    rows = _load(path)
    name = os.path.basename(path).replace(".metrics.jsonl", "")
    present = [(k, lbl) for k, lbl in PROBE_KEYS if any(k in r for r in rows)]
    if len(present) < 2:  # recon alone is not a probe story
        return None
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=120)
    fig.patch.set_facecolor(SURFACE)
    for i, (key, label) in enumerate(present):
        xs, ys = _series(rows, key)
        ax.plot(xs, ys, color=SERIES[i % len(SERIES)], linewidth=2, label=label)
    _style_axes(ax, f"{name} — disentanglement probes",
                "frozen-classifier accuracy")
    _refline(ax, CHANCE_FLOOR, "chance")
    ax.set_ylim(-0.02, 1.0)
    ax.legend(frameon=False, fontsize=9, labelcolor=INK2, loc="upper left")
    out = os.path.join(out_dir, f"{name}.probes.png")
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    plt.close(fig)
    return out


def plot_run(path: str, out_dir: str) -> str | None:
    rows = _load(path)
    name = os.path.basename(path).replace(".metrics.jsonl", "")
    fig, ax = plt.subplots(figsize=(7.2, 4.2), dpi=120)
    fig.patch.set_facecolor(SURFACE)

    if any("test0/count_acc" in r for r in rows):
        for i, (key, label) in enumerate(
                [("test0/count_acc", "seen backgrounds"),
                 ("test1/count_acc", "unseen backgrounds")]):
            xs, ys = _series(rows, key)
            if xs:
                ax.plot(xs, ys, color=SERIES[i], linewidth=2, label=label)
        _style_axes(ax, name, "count accuracy")
        floor = next((v for k, v in COLLAPSE_FLOORS.items() if k in name), None)
        if floor is not None:
            _refline(ax, floor, "zero-collapse floor")
        ax.set_ylim(-0.02, 1.0)
        ax.legend(frameon=False, fontsize=9, labelcolor=INK2, loc="upper left")
    elif any("test/classifier_cluster_acc" in r for r in rows):
        xs, ys = _series(rows, "test/classifier_cluster_acc")
        ax.plot(xs, ys, color=SERIES[0], linewidth=2)
        _style_axes(ax, name, "cluster accuracy (30-way assignment)")
        _refline(ax, CHANCE_FLOOR, "chance")
        if "digits" in name:
            _refline(ax, DIGITS_PIXEL_CEILING, "pixel-space k-means")
        ax.set_ylim(-0.02, 1.0)
    else:
        plt.close(fig)
        return None

    out = os.path.join(out_dir, f"{name}.png")
    fig.tight_layout()
    fig.savefig(out, facecolor=SURFACE)
    plt.close(fig)
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quality_dir", default="docs/quality")
    ap.add_argument("--out", default="docs/quality/plots")
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    made = []
    for path in sorted(glob.glob(os.path.join(args.quality_dir, "*.metrics.jsonl"))):
        for out in (plot_run(path, args.out), plot_probes(path, args.out)):
            if out:
                made.append(out)
                print("wrote", out)
    print(f"{len(made)} plots")


if __name__ == "__main__":
    main()
