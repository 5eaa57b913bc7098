"""Ablation-results collector.

Replaces `collect_ablation_results.py` (#12): parses the ablation result
-tree naming (`:470-535`) —

    <dataset>-<size>-bilingual-<a>-<b>[-<block>]-<N>bands-<model>
    <dataset>-<size>-mono-<doc>-<a>-<b>[-<block>]-<N>bands-<model>

with optional ``vector_mix`` subdirs and collision-suffixed ``-rN`` run
dirs (`run_ablation.sh resolve_outdir:351-377`) — keeping the ``block``
and ``model`` columns, then reuses the main collector's latest-timestamp
dedup and summary machinery.
"""

from __future__ import annotations

import json
import pathlib
import re
from typing import Dict, List, Optional

from codemix_dense_retrieval_tpu.analysis.collect import (
    compute_summary,
    mix_ratio_from_runstem,
    write_csv,
)
from codemix_dense_retrieval_tpu.io.naming import LANG_NAMES
from codemix_dense_retrieval_tpu.io.naming import parse_eval_stem
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("ablation")

_BANDS_RE = re.compile(r"^(\d+)bands?$")
_RN_RE = re.compile(r"-r\d+$")
_LANG_TOKENS = set(LANG_NAMES) | set(LANG_NAMES.values())


def normalize_lang(tok: str) -> Optional[str]:
    tok = tok.lower()
    if tok in LANG_NAMES:  # already a code
        return tok
    for code, name in LANG_NAMES.items():
        if tok == name:
            return code
    return tok if len(tok) == 2 else None


def parse_ablation_dirname(name: str) -> Optional[Dict]:
    """Returns dict with dataset/docs_size/exp_type/block/doc_lang/q1/q2/
    model, or None. ``-rN`` collision suffixes are stripped."""
    name = _RN_RE.sub("", name)
    parts = name.split("-")
    if len(parts) < 4:
        return None
    band_idx = None
    for i, tok in enumerate(parts):
        if _BANDS_RE.match(tok):
            band_idx = i
            break
    if band_idx is None or band_idx <= 2:
        return None
    info: Dict = {
        "dataset": parts[0],
        "docs_size": parts[1],
        "num_bands": int(_BANDS_RE.match(parts[band_idx]).group(1)),
        "model": "-".join(parts[band_idx + 1:]) or None,
        "block": None,
        "doc_lang": None,
        "q1": None,
        "q2": None,
    }
    exp = parts[2:band_idx]
    if not exp:
        return None
    exp_type = exp[0].lower()
    info["exp_type"] = exp_type
    if exp_type == "bilingual":
        if len(exp) >= 3:
            info["q1"], info["q2"] = normalize_lang(exp[1]), normalize_lang(exp[2])
            if info["q1"] and info["q2"]:
                info["doc_lang"] = f"{info['q1']}-{info['q2']}"
        if len(exp) >= 4:
            info["block"] = exp[3]
    elif exp_type == "mono":
        if len(exp) >= 4:
            info["doc_lang"] = normalize_lang(exp[1])
            info["q1"], info["q2"] = normalize_lang(exp[2]), normalize_lang(exp[3])
        if len(exp) >= 5:
            info["block"] = exp[4]
    else:
        langs = [p for p in exp if p.lower() in _LANG_TOKENS]
        if len(langs) >= 2:
            info["q1"], info["q2"] = normalize_lang(langs[0]), normalize_lang(langs[1])
        if langs:
            info["doc_lang"] = normalize_lang(langs[0])
        info["block"] = exp[-1]
    return info


def collect_ablation_results(results_root) -> List[Dict]:
    root = pathlib.Path(results_root)
    latest: Dict = {}
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
        info = None
        for p in [pathlib.Path(parent)] + list(pathlib.Path(parent).parents):
            info = parse_ablation_dirname(p.name)
            if info:
                break
        if not info:
            continue
        mix = mix_ratio_from_runstem(runstem)
        if mix is None:
            continue
        mix_mode, ratio = mix
        if pathlib.Path(parent).name.startswith("vector"):
            mix_mode = "embed"
        try:
            metrics = json.loads(agg.read_text())
        except (OSError, json.JSONDecodeError) as e:
            log.warning("skipping unreadable %s: %s", agg, e)
            continue
        rows.append(
            {
                "experiment": pathlib.Path(parent).name,
                "dataset": info["dataset"],
                "docs_size": info["docs_size"],
                "exp_type": info["exp_type"],
                "block": info["block"],
                "doc_side": info["doc_lang"],
                "pair": (
                    f"{info['q1'].upper()}-{info['q2'].upper()}"
                    if info["q1"] and info["q2"] else None
                ),
                "model": info["model"],
                "split": split,
                "run": runstem,
                "mix_mode": mix_mode,
                "mix_ratio": ratio,
                "timestamp": ts,
                "ndcg10": metrics.get("nDCG@10"),
                "mrr10": metrics.get("RR@10"),
                "recall10": metrics.get("R@10"),
                "map": metrics.get("AP"),
            }
        )
    return rows


def compute_ablation_summary(rows: List[Dict]) -> List[Dict]:
    """Per (pair, doc, mix_mode, model, block) best-interior delta."""
    # reuse the main summary but keep block in the key by folding it into
    # the model column temporarily
    tagged = []
    for r in rows:
        r2 = dict(r)
        r2["model"] = f"{r.get('model')}|{r.get('block')}"
        tagged.append(r2)
    out = compute_summary(tagged)
    for row in out:
        model_block = str(row["model"]).split("|")
        row["model"] = model_block[0]
        row["block"] = model_block[1] if len(model_block) > 1 else None
    return out


def collect_ablation_cli(results_root, out) -> None:
    rows = collect_ablation_results(results_root)
    out = pathlib.Path(out)
    write_csv(out, rows)
    summary = compute_ablation_summary(rows)
    write_csv(out.with_name(out.stem + "_processed" + out.suffix), summary)
