"""Paper figure generation.

Replaces `plot_diagram_2.py` (#14) with the core figure families over the
collector's tidy rows (matplotlib, Agg backend, png+pdf pairs like the
reference's ``diagrams_paper/`` output):

- delta(nDCG@10) histogram over groups (`plot_delta_hist`);
- per-pair mix-ratio curves, word vs embed mode (`plot_ratio_curves`);
- lambda* distribution (`plot_lambda_star`);
- EN-in-index vs EN-absent delta split (`plot_en_split`);
- embedding-space projection panel from analyzer outputs
  (`plot_projection_panel`).
"""

from __future__ import annotations

import math
import pathlib
from collections import defaultdict
from typing import Dict, List

import numpy as np


def _mpl():
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    return plt


def _save(fig, outdir: pathlib.Path, name: str) -> List[pathlib.Path]:
    outdir.mkdir(parents=True, exist_ok=True)
    paths = []
    for ext in ("png", "pdf"):
        p = outdir / f"{name}.{ext}"
        fig.savefig(p, bbox_inches="tight", dpi=150)
        paths.append(p)
    return paths


def plot_delta_hist(summary_rows: List[Dict], outdir) -> List[pathlib.Path]:
    plt = _mpl()
    deltas = [r["delta_ndcg"] for r in summary_rows if not math.isnan(r.get("delta_ndcg", math.nan))]
    fig, ax = plt.subplots(figsize=(5, 3.2))
    ax.hist(deltas, bins=21, color="#4878a8", edgecolor="white")
    ax.axvline(0, color="black", lw=0.8)
    ax.set_xlabel("Δ nDCG@10 (best interior − best endpoint)")
    ax.set_ylabel("groups")
    paths = _save(fig, pathlib.Path(outdir), "delta_hist")
    plt.close(fig)
    return paths


def plot_ratio_curves(rows: List[Dict], outdir, metric: str = "ndcg10") -> List[pathlib.Path]:
    plt = _mpl()
    by_key = defaultdict(list)
    for r in rows:
        if r.get(metric) is None:
            continue
        by_key[(r.get("pair"), r.get("doc_side"), r.get("mix_mode"))].append(
            (r["mix_ratio"], r[metric])
        )
    fig, ax = plt.subplots(figsize=(5.5, 3.5))
    for (pair, doc_side, mode), pts in sorted(by_key.items(), key=lambda kv: str(kv[0])):
        pts.sort()
        xs = [p[0] for p in pts]
        ys = [p[1] for p in pts]
        style = "-o" if mode == "embed" else "--s"
        ax.plot(xs, ys, style, ms=3, lw=1, label=f"{pair} {doc_side} ({mode})")
    ax.set_xlabel("mix ratio (% second language)")
    ax.set_ylabel(metric)
    if by_key:
        ax.legend(fontsize=6)
    paths = _save(fig, pathlib.Path(outdir), f"ratio_curves_{metric}")
    plt.close(fig)
    return paths


def plot_lambda_star(summary_rows: List[Dict], outdir) -> List[pathlib.Path]:
    plt = _mpl()
    lams = [
        r["lambda_star_mid"]
        for r in summary_rows
        if r.get("lambda_star_mid") is not None and not math.isnan(r["lambda_star_mid"])
    ]
    fig, ax = plt.subplots(figsize=(4.5, 3))
    vals, counts = np.unique(lams, return_counts=True) if lams else ([], [])
    ax.bar([str(int(v)) for v in vals], counts, color="#6aa86a")
    ax.set_xlabel("λ* (%)")
    ax.set_ylabel("groups")
    paths = _save(fig, pathlib.Path(outdir), "lambda_star")
    plt.close(fig)
    return paths


def plot_en_split(split: Dict[str, Dict[str, float]], outdir) -> List[pathlib.Path]:
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(4, 3))
    names = list(split.keys())
    means = [split[n]["mean"] for n in names]
    ax.bar(names, means, color=["#a85a5a", "#5a7aa8"][: len(names)])
    ax.axhline(0, color="black", lw=0.8)
    ax.set_ylabel("mean Δ nDCG@10")
    paths = _save(fig, pathlib.Path(outdir), "en_split")
    plt.close(fig)
    return paths


def plot_projection_panel(
    pi_en: np.ndarray, pi_zh: np.ndarray, pi_cm: np.ndarray, outdir
) -> List[pathlib.Path]:
    """Language-probe projection densities (reference's probe panels)."""
    plt = _mpl()
    fig, ax = plt.subplots(figsize=(5, 3))
    for vals, label, color in (
        (pi_en, "EN", "#4878a8"),
        (pi_zh, "ZH", "#a85a5a"),
        (pi_cm, "CM", "#6aa86a"),
    ):
        ax.hist(vals, bins=30, alpha=0.5, label=label, color=color, density=True)
    ax.set_xlabel("probe projection π")
    ax.legend()
    paths = _save(fig, pathlib.Path(outdir), "probe_projections")
    plt.close(fig)
    return paths


def generate_all(rows: List[Dict], summary_rows: List[Dict], outdir) -> List[pathlib.Path]:
    from codemix_dense_retrieval_tpu.analysis.paper_values import en_absent_split

    out: List[pathlib.Path] = []
    out += plot_delta_hist(summary_rows, outdir)
    out += plot_ratio_curves(rows, outdir)
    out += plot_lambda_star(summary_rows, outdir)
    split = en_absent_split(summary_rows)
    if split:
        out += plot_en_split(split, outdir)
    return out
