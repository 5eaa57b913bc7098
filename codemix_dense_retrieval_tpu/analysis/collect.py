"""Results collector — aggregates eval-artifact trees into tidy CSVs.

Replaces `collect_results.py` / `collect_ablation_results.py` (#11/#12):
walks ``<results_root>/**``, parses experiment directory names
(`collect_results.py:234-274` semantics via ``io.naming``), keeps only
the LATEST timestamped agg per run stem (`:568-579`), extracts metric
means, and emits:

- a long-form CSV (one row per (experiment, mix_mode, band/alpha)), and
- a summary CSV with best-endpoint vs best-interior delta(nDCG@10) and
  lambda* per (pair, doc side) (`compute_full_summary`, `:362-403`).
"""

from __future__ import annotations

import json
import math
import pathlib
import re
from collections import defaultdict
from typing import Dict, List, Optional, Tuple

from codemix_dense_retrieval_tpu.io.naming import parse_eval_stem, parse_experiment_dirname
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("collect")

_ALPHA_RE = re.compile(r"^cm-alpha-(?P<alpha>[0-9.]+)(?:_base|_raw)?$")
_BAND_RE = re.compile(r"^cm(?P<lo>\d+)(?:-(?P<hi>\d+))?(?:_base|_raw)?$")


def mix_ratio_from_runstem(stem: str) -> Optional[Tuple[str, float]]:
    """(mix_mode, ratio 0..100) from a run stem.

    ``cm-alpha-0.5`` -> ("embed", 50.0); ``cm40-60`` -> ("word", 50.0)
    (band midpoint); ``cm0``/``cm100`` -> ("word", 0/100).
    """
    m = _ALPHA_RE.match(stem)
    if m:
        return "embed", float(m.group("alpha")) * 100.0
    m = _BAND_RE.match(stem)
    if m:
        lo = int(m.group("lo"))
        hi = int(m.group("hi")) if m.group("hi") else lo
        return "word", (lo + hi) / 2.0
    return None


def collect_results(results_root) -> List[Dict]:
    """Walk the tree; one row per latest agg.json."""
    root = pathlib.Path(results_root)
    # latest-timestamp dedup per (dir, runstem, split)
    latest: Dict[Tuple[str, str, str], Tuple[str, pathlib.Path]] = {}
    for agg in root.rglob("*-agg.json"):
        stem = agg.name[: -len("-agg.json")]
        parsed = parse_eval_stem(stem)
        if not parsed:
            continue
        runstem, split, ts = parsed
        key = (str(agg.parent), runstem, split)
        if key not in latest or ts > latest[key][0]:
            latest[key] = (ts, agg)

    rows: List[Dict] = []
    for (parent, runstem, split), (ts, agg) in sorted(latest.items()):
        # find the experiment dir walking up (vector_mix subdirs etc.)
        exp = None
        for p in [pathlib.Path(parent)] + list(pathlib.Path(parent).parents):
            exp = parse_experiment_dirname(p.name)
            if exp:
                break
        mix = mix_ratio_from_runstem(runstem)
        if mix is None:
            continue
        mix_mode, ratio = mix
        try:
            metrics = json.loads(agg.read_text())
        except (OSError, json.JSONDecodeError) as e:
            log.warning("skipping unreadable %s: %s", agg, e)
            continue
        # vector_mix subdir forces embed mode (reference dir layout)
        if pathlib.Path(parent).name == "vector_mix":
            mix_mode = "embed"
        row = {
            "experiment": exp.dirname() if exp else pathlib.Path(parent).name,
            "dataset": exp.dataset if exp else None,
            "docs_size": exp.size if exp else None,
            "doc_side": exp.doc_side if exp else None,
            "pair": f"{exp.qa.upper()}-{exp.qb.upper()}" if exp else None,
            "model": exp.encoder_tag if exp else None,
            "split": split,
            "run": runstem,
            "mix_mode": mix_mode,
            "mix_ratio": ratio,
            "timestamp": ts,
            "ndcg10": metrics.get("nDCG@10"),
            "mrr10": metrics.get("RR@10"),
            "recall10": metrics.get("R@10"),
            "recall100": metrics.get("R@100"),
            "map": metrics.get("AP"),
        }
        perquery = load_perquery_ndcg10(agg)
        if perquery:
            row["perquery"] = perquery
        rows.append(row)
    return rows


def load_perquery_ndcg10(agg_json_path: pathlib.Path) -> Optional[Dict[str, float]]:
    """Per-query nDCG@10 series from the sibling -perquery.csv (written by
    the evaluator with --perquery); None when absent."""
    stem = agg_json_path.name[: -len("-agg.json")]
    pq = agg_json_path.parent / f"{stem}-perquery.csv"
    if not pq.exists():
        return None
    import csv

    out: Dict[str, float] = {}
    with open(pq, newline="", encoding="utf-8") as f:
        reader = csv.DictReader(f)
        if "nDCG@10" not in (reader.fieldnames or []):
            return None
        for row in reader:
            try:
                out[row["qid"]] = float(row["nDCG@10"])
            except (ValueError, KeyError):
                continue
    return out or None


def bootstrap_delta_ci(
    endpoint_series: Dict[str, float],
    interior_series: Dict[str, float],
    n_boot: int = 2000,
    seed: int = 0,
) -> Optional[Dict[str, float]]:
    """Cluster (per-query) bootstrap CI for delta(nDCG@10) between the best
    interior and best endpoint runs (reference `collect_results.py:490-566`
    semantics: resample qids, recompute the mean difference)."""
    import random

    qids = sorted(set(endpoint_series) & set(interior_series))
    if len(qids) < 2:
        return None
    diffs = [interior_series[q] - endpoint_series[q] for q in qids]
    rng = random.Random(seed)
    n = len(diffs)
    samples = sorted(
        sum(diffs[rng.randrange(n)] for _ in range(n)) / n for _ in range(n_boot)
    )

    def q(p: float) -> float:
        pos = p * (len(samples) - 1)
        lo = int(pos)
        hi = min(lo + 1, len(samples) - 1)
        return samples[lo] * (1 - pos + lo) + samples[hi] * (pos - lo)

    return {
        "delta_ndcg_ci90_low": q(0.05),
        "delta_ndcg_ci90_high": q(0.95),
        "delta_ndcg_ci95_low": q(0.025),
        "delta_ndcg_ci95_high": q(0.975),
    }


def compute_summary(rows: List[Dict]) -> List[Dict]:
    """Best-endpoint vs best-interior delta and lambda* per
    (pair, doc_side, mix_mode, model). When rows carry ``perquery``
    series (dict qid -> nDCG@10), a cluster-bootstrap CI over the
    best-interior-minus-best-endpoint per-query differences is added."""
    groups: Dict[Tuple, List[Dict]] = defaultdict(list)
    for r in rows:
        if r["ndcg10"] is None:
            continue
        groups[(r["pair"], r["doc_side"], r["mix_mode"], r["model"])].append(r)
    out: List[Dict] = []
    for (pair, doc_side, mix_mode, model), grp in sorted(
        groups.items(), key=lambda kv: tuple(str(x) for x in kv[0])
    ):
        endpoints = [g for g in grp if g["mix_ratio"] in (0.0, 100.0)]
        interior = [g for g in grp if 0.0 < g["mix_ratio"] < 100.0]
        best_endpoint = max((g["ndcg10"] for g in endpoints), default=math.nan)
        best_endpoint_row = (
            max(endpoints, key=lambda g: g["ndcg10"]) if endpoints else None
        )
        if interior:
            best = max(interior, key=lambda g: g["ndcg10"])
            best_mixed = best["ndcg10"]
            lambda_star = best["mix_ratio"]
            delta = best_mixed - (best_endpoint if not math.isnan(best_endpoint) else 0.0)
        else:
            best, best_mixed, lambda_star, delta = None, math.nan, math.nan, 0.0
        row_out = {
            "pair": pair,
            "doc_side": doc_side,
            "mix_mode": mix_mode,
            "model": model,
            "best_endpoint_ndcg": best_endpoint,
            "best_mixed_ndcg": best_mixed,
            "delta_ndcg": delta,
            "lambda_star_mid": lambda_star,
            "n_points": len(grp),
        }
        if (
            best is not None
            and best_endpoint_row is not None
            and isinstance(best.get("perquery"), dict)
            and isinstance(best_endpoint_row.get("perquery"), dict)
        ):
            ci = bootstrap_delta_ci(best_endpoint_row["perquery"], best["perquery"])
            if ci:
                row_out.update(ci)
        if pair:
            from codemix_dense_retrieval_tpu.analysis.lang_factors import pair_factors

            row_out.update(pair_factors(str(pair)))
        out.append(row_out)
    return out


def write_csv(path, rows: List[Dict]) -> None:
    import csv

    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if not rows:
        path.write_text("")
        return
    cols = list(rows[0].keys())
    for r in rows[1:]:  # union of keys, first-seen order (factor columns vary)
        for k in r:
            if k not in cols:
                cols.append(k)
    with open(path, "w", newline="", encoding="utf-8") as f:
        w = csv.DictWriter(f, fieldnames=cols, restval="")
        w.writeheader()
        w.writerows(rows)


def collect_cli(args) -> None:
    rows = collect_results(args.results_root)
    out = pathlib.Path(args.out)
    # the long-form CSV drops the bulky per-query dicts
    write_csv(out, [{k: v for k, v in r.items() if k != "perquery"} for r in rows])
    summary = compute_summary(rows)
    summary_path = out.with_name(out.stem + "_processed" + out.suffix)
    write_csv(summary_path, summary)
    print(f"collected {len(rows)} rows -> {out}; {len(summary)} summary rows -> {summary_path}")
