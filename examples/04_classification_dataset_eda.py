"""Classification dataset EDA: label distributions + correlations
(reference notebooks/analysis_classification_dataset.ipynb).

Given a classification ``annotations.csv`` (the schema produced by
``spine-vision-tpu dataset classification``), plots per-label count
distributions, the Modic/endplate correlation block, and the general
disc-pathology Spearman correlation matrix — the notebook's seaborn panels
via this framework's ``viz.dataset`` plot inventory + matplotlib heatmaps
(no pandas/seaborn required).

Usage:
    python examples/04_classification_dataset_eda.py [annotations.csv] [--out-dir DIR]
"""

from __future__ import annotations

import argparse
import csv
import tempfile
from pathlib import Path

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np

from _synth import synth_classification_annotations

LABEL_COLUMNS = [
    "pfirrmann_grade",
    "disc_herniation",
    "disc_narrowing",
    "disc_bulging",
    "spondylolisthesis",
    "modic",
    "up_endplate",
    "low_endplate",
]
BINARY_COLUMNS = [
    "disc_herniation",
    "disc_narrowing",
    "disc_bulging",
    "spondylolisthesis",
]
MODIC_GROUP = ["modic", "up_endplate", "low_endplate"]
GENERAL_GROUP = ["pfirrmann_grade"] + BINARY_COLUMNS


def spearman_matrix(columns: dict[str, np.ndarray]) -> np.ndarray:
    """Spearman correlation = Pearson on midranks (ties averaged)."""

    def midrank(v: np.ndarray) -> np.ndarray:
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v), float)
        sv = v[order]
        i = 0
        while i < len(v):
            j = i
            while j + 1 < len(v) and sv[j + 1] == sv[i]:
                j += 1
            ranks[order[i : j + 1]] = (i + j) / 2.0 + 1.0
            i = j + 1
        return ranks

    names = list(columns)
    ranked = np.stack([midrank(columns[n]) for n in names])
    return np.corrcoef(ranked)


def heatmap(matrix: np.ndarray, names: list[str], title: str) -> plt.Figure:
    n = len(names)
    fig, ax = plt.subplots(figsize=(1.1 * n + 2, 1.0 * n + 1.5))
    im = ax.imshow(matrix, cmap="coolwarm", vmin=-1, vmax=1)
    ax.set_xticks(range(n))
    ax.set_yticks(range(n))
    ax.set_xticklabels(names, rotation=45, ha="right", fontsize=8)
    ax.set_yticklabels(names, fontsize=8)
    for i in range(n):
        for j in range(n):
            ax.text(j, i, f"{matrix[i, j]:.2f}", ha="center", va="center", fontsize=7)
    fig.colorbar(im, ax=ax, shrink=0.8)
    ax.set_title(title)
    fig.tight_layout()
    return fig


def main() -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("annotations", nargs="?", type=Path)
    parser.add_argument("--out-dir", type=Path, default=Path("output/eda"))
    args = parser.parse_args()

    from spine_vision_tpu.viz.dataset import (
        plot_binary_label_distributions,
        plot_label_cooccurrence,
        plot_pfirrmann_by_level,
    )

    tmp = None
    path = args.annotations
    if path is None:
        tmp = tempfile.TemporaryDirectory()
        path = synth_classification_annotations(Path(tmp.name) / "annotations.csv")
        print(f"no annotations given — synthesized {path}")

    with open(path, newline="") as f:
        rows = list(csv.DictReader(f))
    print(f"{len(rows)} rows, columns: {list(rows[0].keys())}")

    cols = {
        c: np.asarray([float(r[c]) for r in rows])
        for c in LABEL_COLUMNS
        if c in rows[0]
    }
    args.out_dir.mkdir(parents=True, exist_ok=True)

    # Per-label count distributions (notebook cell 5).
    present = [c for c in LABEL_COLUMNS if c in cols]
    n_cols = 3
    n_rows = (len(present) + n_cols - 1) // n_cols
    fig, axes = plt.subplots(n_rows, n_cols, figsize=(15, 4 * n_rows))
    axes = np.atleast_1d(axes).reshape(-1)
    for ax in axes[len(present) :]:
        ax.axis("off")
    for ax, c in zip(axes, present):
        values, counts = np.unique(cols[c].astype(int), return_counts=True)
        bars = ax.bar([str(v) for v in values], counts,
                      color=plt.get_cmap("viridis")(np.linspace(0.2, 0.9, len(values))))
        ax.bar_label(bars, fontsize=8)
        ax.set_title(f"Distribution of {c}")
        ax.set_ylabel("Count")
    fig.tight_layout()
    fig.savefig(args.out_dir / "label_distributions.png", dpi=110)
    plt.close(fig)

    # Correlation blocks (notebook cells 8-10). Constant columns have no
    # rank variance (correlation undefined) — drop them rather than render
    # NaN cells.
    for group, title, out in (
        (MODIC_GROUP, "Modic correlation", "modic_correlation.png"),
        (GENERAL_GROUP, "Disc pathology & Pfirrmann (Spearman)",
         "general_correlation.png"),
    ):
        names = [c for c in group if c in cols]
        constant = [c for c in names if np.ptp(cols[c]) == 0]
        if constant:
            print(f"skipping constant column(s) in '{title}': {constant}")
            names = [c for c in names if c not in constant]
        if len(names) < 2:
            continue
        fig = heatmap(spearman_matrix({c: cols[c] for c in names}), names, title)
        fig.savefig(args.out_dir / out, dpi=110)
        plt.close(fig)

    # Framework-native panels on the same records.
    distribution = {
        c: {int(v): int(n) for v, n in zip(*np.unique(cols[c].astype(int),
                                                       return_counts=True))}
        for c in BINARY_COLUMNS
        if c in cols
    }
    records = [
        {
            "level_idx": int(r["ivd_level"]) - 1,
            "pfirrmann": int(float(r["pfirrmann_grade"])),
            **{c: int(float(r[c])) for c in BINARY_COLUMNS if c in r},
        }
        for r in rows
    ]
    for fig, out in (
        (plot_binary_label_distributions(distribution), "binary_labels.png"),
        (plot_label_cooccurrence(records, [c for c in BINARY_COLUMNS if c in cols]),
         "cooccurrence.png"),
        (plot_pfirrmann_by_level(records), "pfirrmann_by_level.png"),
    ):
        fig.savefig(args.out_dir / out, dpi=110)
        plt.close(fig)

    print(f"saved 5 figures to {args.out_dir}")
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
