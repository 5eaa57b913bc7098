"""Paper-statistics calculator.

Replaces `calculate_paper_values.py` (#13): pure-python (stdlib + numpy
-free math) statistics over the collector's summary rows — delta
distributions, group splits, permutation tests (mean-diff, Spearman,
one-way ANOVA-F), and cluster bootstrap CIs (`:102-136,184-257`).

The statistical routines are exact behavioral matches of the reference's
(same resampling scheme, same p-value convention (more+1)/(n+1)); the
report section builder covers the headline values of
`paper_values.txt:9-24` (delta distribution, EN-absent split, peak-
lambda counts).
"""

from __future__ import annotations

import math
import random
from collections import defaultdict
from statistics import mean, median
from typing import Callable, Dict, List, Optional, Sequence, Tuple

PERMUTATIONS = 5000
BOOTSTRAPS = 10000


def quantile(sorted_vals: Sequence[float], q: float) -> float:
    """Linear-interpolation quantile over a pre-sorted list (reference
    convention)."""
    n = len(sorted_vals)
    if n == 0:
        return float("nan")
    if n == 1:
        return float(sorted_vals[0])
    pos = q * (n - 1)
    lo = int(math.floor(pos))
    hi = min(lo + 1, n - 1)
    frac = pos - lo
    return float(sorted_vals[lo] * (1 - frac) + sorted_vals[hi] * frac)


def cluster_bootstrap_stats(
    clusters: Dict[str, List],
    stat_fn: Callable[[List], float],
    n_boot: int = BOOTSTRAPS,
    seed: int = 0,
) -> Tuple[float, float, float, int]:
    """Cluster bootstrap CI (resample clusters with replacement)."""
    all_records = [r for rs in clusters.values() for r in rs]
    obs = stat_fn(all_records)
    keys = list(clusters.keys())
    if not keys:
        return float("nan"), float("nan"), float("nan"), 0
    rng = random.Random(seed)
    samples = []
    for _ in range(n_boot):
        sampled_keys = [keys[rng.randrange(len(keys))] for _ in range(len(keys))]
        val = stat_fn([r for k in sampled_keys for r in clusters[k]])
        if not math.isnan(val):
            samples.append(val)
    samples.sort()
    return obs, quantile(samples, 0.025), quantile(samples, 0.975), len(samples)


def _rank(vals: Sequence[float]) -> List[float]:
    order = sorted(range(len(vals)), key=lambda i: vals[i])
    ranks = [0.0] * len(vals)
    i = 0
    while i < len(order):
        j = i
        while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
            j += 1
        avg = (i + j) / 2 + 1
        for t in range(i, j + 1):
            ranks[order[t]] = avg
        i = j + 1
    return ranks


def spearman_rho(x: Sequence[float], y: Sequence[float]) -> float:
    if len(x) != len(y) or len(x) < 2:
        return float("nan")
    rx, ry = _rank(x), _rank(y)
    mx, my = mean(rx), mean(ry)
    num = sum((a - mx) * (b - my) for a, b in zip(rx, ry))
    dx = math.sqrt(sum((a - mx) ** 2 for a in rx))
    dy = math.sqrt(sum((b - my) ** 2 for b in ry))
    if dx == 0 or dy == 0:
        return float("nan")
    return num / (dx * dy)


def perm_spearman(
    x: Sequence[float], y: Sequence[float], n_perm: int = PERMUTATIONS, seed: int = 0
) -> Tuple[float, float]:
    obs = spearman_rho(x, y)
    rng = random.Random(seed)
    y_copy = list(y)
    more = 0
    for _ in range(n_perm):
        rng.shuffle(y_copy)
        if abs(spearman_rho(x, y_copy)) >= abs(obs):
            more += 1
    return obs, (more + 1) / (n_perm + 1)


def perm_mean_diff(
    groups: Dict[str, List[float]],
    a_label: Optional[str] = None,
    b_label: Optional[str] = None,
    n_perm: int = PERMUTATIONS,
    seed: int = 0,
) -> Tuple[float, float]:
    """Two-group permutation test for mean difference."""
    unique = list(groups.keys())
    if len(unique) != 2:
        return float("nan"), float("nan")
    if a_label is None or b_label is None:
        a_label, b_label = sorted(unique)
    labels = [g for g, vals in groups.items() for _ in vals]
    values = [v for vals in groups.values() for v in vals]

    def stat(lbls):
        a = [v for v, l in zip(values, lbls) if l == a_label]
        b = [v for v, l in zip(values, lbls) if l == b_label]
        if not a or not b:
            return float("nan")
        return mean(a) - mean(b)

    obs = stat(labels)
    rng = random.Random(seed)
    labels_copy = labels[:]
    more = 0
    for _ in range(n_perm):
        rng.shuffle(labels_copy)
        s = stat(labels_copy)
        if not math.isnan(s) and abs(s) >= abs(obs):
            more += 1
    return obs, (more + 1) / (n_perm + 1)


def anova_f(groups: Dict[str, List[float]]) -> float:
    all_vals = [v for vals in groups.values() for v in vals]
    if len(groups) < 2 or not all_vals:
        return float("nan")
    overall = mean(all_vals)
    ss_between = ss_within = 0.0
    for vals in groups.values():
        if not vals:
            continue
        m = mean(vals)
        ss_between += len(vals) * (m - overall) ** 2
        ss_within += sum((v - m) ** 2 for v in vals)
    df_between = len(groups) - 1
    df_within = len(all_vals) - len(groups)
    if df_within <= 0 or ss_within == 0:
        return float("nan")
    return (ss_between / df_between) / (ss_within / df_within)


def perm_anova(
    groups: Dict[str, List[float]], n_perm: int = PERMUTATIONS, seed: int = 0
) -> Tuple[float, float]:
    labels = [g for g, vals in groups.items() for _ in vals]
    values = [v for vals in groups.values() for v in vals]
    obs = anova_f(groups)
    rng = random.Random(seed)
    labels_copy = labels[:]
    more = 0
    for _ in range(n_perm):
        rng.shuffle(labels_copy)
        shuffled = defaultdict(list)
        for v, l in zip(values, labels_copy):
            shuffled[l].append(v)
        if anova_f(shuffled) >= obs:
            more += 1
    return obs, (more + 1) / (n_perm + 1)


def eta_squared(groups: Dict[str, List[float]]) -> float:
    all_vals = [v for vals in groups.values() for v in vals]
    if len(groups) < 2 or len(all_vals) < 2:
        return float("nan")
    overall = mean(all_vals)
    ss_total = sum((v - overall) ** 2 for v in all_vals)
    ss_between = sum(
        len(vals) * (mean(vals) - overall) ** 2 for vals in groups.values() if vals
    )
    if ss_total == 0:
        return float("nan")
    return ss_between / ss_total


# ---------------------------------------------------------------------------
# headline report over collector summary rows
# ---------------------------------------------------------------------------

def delta_distribution(summary_rows: List[Dict]) -> Dict[str, float]:
    """paper_values.txt:9-17 — delta(nDCG@10) distribution over groups."""
    deltas = [r["delta_ndcg"] for r in summary_rows if not math.isnan(r["delta_ndcg"])]
    if not deltas:
        return {}
    pos = sum(1 for d in deltas if d > 0)
    return {
        "n_groups": len(deltas),
        "delta_mean": mean(deltas),
        "delta_median": median(deltas),
        "delta_max": max(deltas),
        "delta_min": min(deltas),
        "frac_positive": pos / len(deltas),
        "n_positive": pos,
    }


def en_absent_split(summary_rows: List[Dict]) -> Dict[str, Dict[str, float]]:
    """paper_values.txt:22-24 — delta stats split by whether EN documents
    are in the searched index."""
    def has_en(row) -> bool:
        side = str(row.get("doc_side") or "")
        return side == "english" or (side.startswith("bilingual-") and "en" in side.split("-")[1:])

    groups: Dict[str, List[float]] = {"en_in_index": [], "en_absent": []}
    for r in summary_rows:
        if math.isnan(r["delta_ndcg"]):
            continue
        groups["en_in_index" if has_en(r) else "en_absent"].append(r["delta_ndcg"])
    out = {}
    for name, vals in groups.items():
        if vals:
            out[name] = {
                "n": len(vals),
                "mean": mean(vals),
                "frac_positive": sum(1 for v in vals if v > 0) / len(vals),
            }
    return out


def peak_lambda_counts(summary_rows: List[Dict]) -> Dict[float, int]:
    counts: Dict[float, int] = defaultdict(int)
    for r in summary_rows:
        lam = r.get("lambda_star_mid")
        if lam is not None and not math.isnan(lam):
            counts[float(lam)] += 1
    return dict(sorted(counts.items()))


def paper_values_report(summary_rows: List[Dict]) -> str:
    lines = ["# paper values", ""]
    dd = delta_distribution(summary_rows)
    if dd:
        lines += [
            f"groups: {dd['n_groups']}",
            f"delta(nDCG@10) mean: {dd['delta_mean']:+.2f}",
            f"delta(nDCG@10) median: {dd['delta_median']:+.2f}",
            f"delta > 0 in {dd['n_positive']}/{dd['n_groups']} groups",
            f"max gain: {dd['delta_max']:+.2f}",
            "",
        ]
    split = en_absent_split(summary_rows)
    for name, stats in split.items():
        lines.append(
            f"{name}: n={stats['n']} mean={stats['mean']:+.2f} "
            f"frac>0={stats['frac_positive']:.2f}"
        )
    lines.append("")
    lines.append("peak lambda* counts: " + ", ".join(
        f"{lam:g}%:{cnt}" for lam, cnt in peak_lambda_counts(summary_rows).items()
    ))
    return "\n".join(lines) + "\n"
