"""Generate tests/fixtures/trec_golden.json — the evaluator's golden
metric fixture (VERDICT round-1 item 10).

The fixture pins exact metric values for a small adversarial qrels/run
pair (graded relevance, score ties, unjudged docs, a query missing from
the run, a query with zero positive judgments). When ``ir_measures`` is
importable (NOT in this image), the expected values come from
pytrec_eval itself and ``source`` records that; otherwise they come from
the standalone implementation below, which is written independently of
``evals/metrics.py`` (different structure and sort mechanics) and spot
-verified by hand in the test file.

Regenerate (ideally in an ir_measures-capable environment):
    python scripts/gen_trec_golden.py
"""

import json
import math
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

OUT = pathlib.Path(__file__).resolve().parents[1] / "tests" / "fixtures" / "trec_golden.json"

# --- fixture data (deterministic, hand-authored) ---------------------------
# graded rels incl. 0 (judged non-relevant) and a rel-0-only query
QRELS = {
    "q1": {"d1": 3, "d2": 1, "d3": 0, "d9": 2},
    "q2": {"d4": 1, "d5": 1},
    "q3": {"d6": 2},          # missing from the run -> all metrics 0
    "q4": {"d7": 0},          # judged but nothing positive
}
# score ties (d2/d3 at 0.5; d8/d9 at 0.25) exercise trec_eval's
# docid-DESCENDING tie order; d8/dX are unjudged
RUN = {
    "q1": [["d3", 0.5], ["d1", 0.9], ["d2", 0.5], ["d8", 0.25], ["d9", 0.25]],
    "q2": [["d5", 0.7], ["dX", 0.6], ["d4", 0.2]],
    "q4": [["d7", 0.9], ["dY", 0.1]],
}
MEASURES = ["nDCG@3", "nDCG@10", "RR@10", "P@3", "P@10", "R@3", "R@10", "AP"]

# --- second fixture: deep cutoffs + degenerate runs (VERDICT r3 item 9) ----
OUT_DEEP = OUT.parent / "trec_golden_deep.json"
MEASURES_DEEP = [
    "nDCG@20", "nDCG@100", "RR@5", "RR@100",
    "P@20", "P@100", "R@20", "R@100", "AP",
]


def _deep_fixture():
    """Adversarial deep-cutoff fixture:

    - ``qA``: 120-doc run (cutoff 100 < run depth), graded rels up to 4,
      score ties in the interior AND at the rank-100 boundary;
    - ``qB``: duplicate docids in the run — same doc at two scores (the
      LAST occurrence's score wins, pytrec_eval dict semantics) and an
      exact duplicate row;
    - ``qC``: judged query present in the run with ZERO rows;
    - ``qD``: judged query entirely absent from the run;
    - ``qE``: cross-qid score ties — every score also appears in qA, so
      any accidental global (cross-query) sort would corrupt both;
    - ``qZ``: run-only query with no qrels row (must be ignored).
    """
    import random

    r = random.Random(13)
    qrels = {
        "qA": {f"a{i:03d}": r.choice([0, 0, 1, 2, 3, 4]) for i in range(60)},
        "qB": {"b1": 2, "b2": 1, "b3": 0},
        "qC": {"c1": 1, "c2": 3},
        "qD": {"d1": 1},
        "qE": {"e1": 1, "e2": 2},
    }
    # qA: 120 retrieved docs; half judged, half not; tie plateaus at
    # scores 0.500 (ranks ~40-45) and 0.100 (straddling rank 100)
    rows_a = []
    for i in range(120):
        doc = f"a{i:03d}" if i < 60 else f"u{i:03d}"
        if 40 <= i < 46:
            score = 0.500
        elif 96 <= i < 106:
            score = 0.100
        else:
            score = round(1.0 - i * 0.007, 4)
        rows_a.append([doc, score])
    r.shuffle(rows_a)  # file order must not matter
    run = {
        "qA": rows_a,
        # b1 repeated at different scores (last wins -> 0.9 outranks b2);
        # b3 exact duplicate row
        "qB": [["b1", 0.2], ["b2", 0.5], ["b1", 0.9], ["b3", 0.1], ["b3", 0.1]],
        "qC": [],
        "qE": [["e2", 0.500], ["e1", 0.100], ["x9", 0.300]],
        "qZ": [["z1", 0.7]],
    }
    return qrels, run


def standalone_expected_deep():
    qrels, run = _deep_fixture()
    scored_qids = [q for q in qrels]  # qrels-driven iteration; qZ ignored
    perquery = {
        q: {m: _metrics(qrels[q], run.get(q, []), m) for m in MEASURES_DEEP}
        for q in scored_qids
    }
    agg = {
        m: sum(perquery[q][m] for q in scored_qids) / len(scored_qids)
        for m in MEASURES_DEEP
    }
    return qrels, run, perquery, agg


# --- standalone reference implementation (independent of evals.metrics) ----

def _ranked(rows):
    # pytrec_eval's run is {qid: {docid: score}} — duplicate docids
    # collapse to the LAST occurrence before ranking
    dedup = {}
    for d, s in rows:
        dedup[d] = s
    # trec_eval: score desc, then docid lexicographically DESCENDING
    return [d for d, s in sorted(dedup.items(), key=lambda r: (-r[1], [-ord(c) for c in r[0]]))]


def _metrics(qrels, rows, measure):
    order = _ranked(rows)
    gains = [qrels.get(d, 0) for d in order]
    positives = sorted((g for g in qrels.values() if g > 0), reverse=True)
    fam, _, cut = measure.partition("@")
    k = int(cut) if cut else None
    if fam == "nDCG":
        dcg = sum(g / math.log2(r + 2) for r, g in enumerate(gains[:k]))
        idcg = sum(g / math.log2(r + 2) for r, g in enumerate(positives[:k]))
        return 0.0 if idcg == 0 else dcg / idcg
    if fam == "RR":
        for r, g in enumerate(gains[:k]):
            if g > 0:
                return 1.0 / (r + 1)
        return 0.0
    if fam == "P":
        return sum(g > 0 for g in gains[:k]) / k
    if fam == "R":
        return 0.0 if not positives else sum(g > 0 for g in gains[:k]) / len(positives)
    if fam == "AP":
        if not positives:
            return 0.0
        hits, total = 0, 0.0
        for r, g in enumerate(gains):
            if g > 0:
                hits += 1
                total += hits / (r + 1)
        return total / len(positives)
    raise ValueError(measure)


def standalone_expected():
    perquery = {
        q: {m: _metrics(QRELS[q], RUN.get(q, []), m) for m in MEASURES}
        for q in QRELS
    }
    agg = {
        m: sum(perquery[q][m] for q in QRELS) / len(QRELS) for m in MEASURES
    }
    return "standalone", perquery, agg


def ir_measures_expected():
    import ir_measures
    from ir_measures import Qrel, ScoredDoc

    qrel_rows = [Qrel(q, d, r) for q, ds in QRELS.items() for d, r in ds.items()]
    run_rows = [ScoredDoc(q, d, s) for q, rs in RUN.items() for d, s in rs]
    names = [m.replace("nDCG", "nDCG") for m in MEASURES]
    measures = list(ir_measures.parse_measure(n) for n in names)
    perquery = {q: {} for q in QRELS}
    for m in ir_measures.iter_calc(measures, qrel_rows, run_rows):
        perquery[m.query_id][str(m.measure)] = float(m.value)
    # ir_measures omits queries absent from the run in iter_calc for some
    # measures; fill zeros to match the evaluator's qrels-driven iteration
    for q in QRELS:
        for name in MEASURES:
            perquery[q].setdefault(name, 0.0)
    agg = {
        name: sum(perquery[q][name] for q in QRELS) / len(QRELS)
        for name in MEASURES
    }
    return "ir_measures", perquery, agg


def main():
    try:
        source, perquery, agg = ir_measures_expected()
    except ImportError:
        source, perquery, agg = standalone_expected()
    OUT.parent.mkdir(parents=True, exist_ok=True)
    OUT.write_text(json.dumps({
        "source": source,
        "measures": MEASURES,
        "qrels": QRELS,
        "run": RUN,
        "expected_perquery": perquery,
        "expected_agg": agg,
    }, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT} (source={source})")

    qrels_d, run_d, perquery_d, agg_d = standalone_expected_deep()
    OUT_DEEP.write_text(json.dumps({
        "source": "standalone",
        "measures": MEASURES_DEEP,
        "qrels": qrels_d,
        "run": run_d,
        "expected_perquery": perquery_d,
        "expected_agg": agg_d,
    }, indent=1, sort_keys=True) + "\n")
    print(f"wrote {OUT_DEEP} (source=standalone)")


if __name__ == "__main__":
    main()
