"""TREC run-file IO and bilingual max-score collapse.

Run-line contract (reference `onepass_dense_run.py:429-430`):
``qid Q0 docid rank score tag`` — readers split on any whitespace, so both
the reference's tab-separated mono runs and space-separated bilingual runs
parse identically.

Bilingual collapse (reference `onepass_bilingual_hub.py:123-138`): derived
docids are ``base#lang``; a collapsed run keeps, per (qid, base), the max
score over languages, re-ranked by score descending.

A C++ fast path (``native/fastio.cpp``) accelerates bulk writing and
collapse for multi-million-line runs; this module transparently falls back
to pure Python when the shared library is absent.
"""

from __future__ import annotations

import os
import pathlib
from dataclasses import dataclass
from typing import Dict, Iterable, List, Sequence

import numpy as np

PathLike = os.PathLike | str


@dataclass(frozen=True)
class RunEntry:
    qid: str
    docid: str
    rank: int
    score: float
    tag: str = "run"


def read_run(path: PathLike) -> List[RunEntry]:
    out: List[RunEntry] = []
    with open(path, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            qid, _, docid, rank, score, tag = line.split()
            out.append(RunEntry(qid, docid, int(rank), float(score), tag))
    return out


def iter_run_lines(
    qids: Sequence[str],
    docids: Sequence[Sequence[str]],
    scores: np.ndarray,
    tag: str,
    precision: int = 4,
) -> Iterable[str]:
    """Yield TREC lines for batched search output.

    ``docids[i][j]`` is the docid string of hit j for query i; ``scores``
    is a (num_queries, k) float array.
    """
    for i, qid in enumerate(qids):
        row_docs = docids[i]
        row_scores = scores[i]
        for rank, (doc, sc) in enumerate(zip(row_docs, row_scores), 1):
            yield f"{qid}\tQ0\t{doc}\t{rank}\t{sc:.{precision}f}\t{tag}"


def write_run(
    path: PathLike,
    qids: Sequence[str],
    docids: Sequence[Sequence[str]],
    scores: np.ndarray,
    tag: str = "onepass",
    precision: int = 4,
) -> int:
    """Write a TREC run; returns the number of lines written.

    Uses the native C++ writer when available (significant for k=500 runs
    over thousands of queries), else pure Python.
    """
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    native = _native()
    if native is not None:
        n = native.write_run(str(path), qids, docids, np.asarray(scores, np.float32), tag, precision)
        if n >= 0:
            return n
    lines = list(iter_run_lines(qids, docids, scores, tag, precision))
    path.write_text("\n".join(lines) + ("\n" if lines else ""), encoding="utf-8")
    return len(lines)


def write_run_entries(path: PathLike, entries: Iterable[RunEntry]) -> int:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    n = 0
    with open(path, "w", encoding="utf-8") as f:
        for e in entries:
            f.write(f"{e.qid}\tQ0\t{e.docid}\t{e.rank}\t{e.score:.6f}\t{e.tag}\n")
            n += 1
    return n


def collapse_run_max(in_run: PathLike, out_run: PathLike, tag: str = "bilingual-onepass") -> None:
    """Collapse ``docid#lang`` duplicates by max score, re-rank, rewrite.

    Exact behavioral parity with reference `onepass_bilingual_hub.py:123-138`
    including first-seen qid order, 6-decimal scores and the stable sort by
    score descending within a qid.
    """
    native = _native()
    if native is not None and native.collapse_run_max(str(in_run), str(out_run), tag):
        return
    by_q: Dict[str, Dict[str, float]] = {}
    with open(in_run, "r", encoding="utf-8") as f:
        for raw in f:
            line = raw.strip()
            if not line:
                continue
            qid, _, did, _rk, sc, _tag = line.split()
            base = did.split("#", 1)[0]
            score = float(sc)
            groups = by_q.setdefault(qid, {})
            if base not in groups or score > groups[base]:
                groups[base] = score
    out_path = pathlib.Path(out_run)
    out_path.parent.mkdir(parents=True, exist_ok=True)
    with open(out_path, "w", encoding="utf-8") as out:
        for qid, groups in by_q.items():
            items = sorted(groups.items(), key=lambda x: x[1], reverse=True)
            for rank, (base, val) in enumerate(items, 1):
                out.write(f"{qid} Q0 {base} {rank} {val:.6f} {tag}\n")


_NATIVE = None
_NATIVE_TRIED = False


def _native():
    """Load the optional C++ fast-IO extension (None if unavailable)."""
    global _NATIVE, _NATIVE_TRIED
    if not _NATIVE_TRIED:
        _NATIVE_TRIED = True
        try:
            from codemix_dense_retrieval_tpu.io import _fastio

            _NATIVE = _fastio if _fastio.available() else None
        except Exception:
            _NATIVE = None
    return _NATIVE
