"""Evaluator golden-number tests (VERDICT round-1 item 10).

``tests/fixtures/trec_golden.json`` pins exact metric values for an
adversarial qrels/run pair (graded rels, score ties exercising
trec_eval's docid-descending tie order, unjudged docs, a query missing
from the run, a rel-0-only query). The fixture is committed; regenerate
with scripts/gen_trec_golden.py — in an ir_measures-capable environment
the expected values come from pytrec_eval itself (``source`` records
which). q1's values are additionally hand-derived inline below, so the
golden numbers do not rest solely on any single implementation.

Also pins the agg.json KEY SET to the reference's shipped artifact
(`results/repro_en_zh_example/mmarco-100000-bilingual-en-zh-5bands-
bge-m3/cm0_base_dev_20260118-183924-agg.json`).
"""

import json
import math
import pathlib

import pytest

from codemix_dense_retrieval_tpu.evals import metrics as M

FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "trec_golden.json"

# key set of the reference's shipped agg.json (evaluate.py:68-74 defaults):
# nDCG@k carries std/stderr/CI90/CI95 sidecars; other families are bare.
REFERENCE_AGG_KEYS = sorted(
    [f"nDCG@{k}{suf}" for k in (1, 3, 5, 10, 100)
     for suf in ("", "_std", "_stderr", "_ci90_low", "_ci90_high",
                 "_ci95_low", "_ci95_high")]
    + [f"{fam}@{k}" for fam in ("RR", "P", "R") for k in (1, 3, 5, 10, 100)]
    + ["AP"]
)


@pytest.fixture(scope="module")
def golden():
    return json.loads(FIXTURE.read_text())


def _as_run(run_json):
    return {q: [(d, float(s)) for d, s in rows] for q, rows in run_json.items()}


class TestGoldenNumbers:
    def test_aggregate_matches_golden(self, golden):
        measures = M.parse_measures(golden["measures"])
        agg = M.aggregate(measures, golden["qrels"], _as_run(golden["run"]))
        for name, want in golden["expected_agg"].items():
            assert agg[name] == pytest.approx(want, abs=1e-12), name

    def test_perquery_matches_golden(self, golden):
        measures = M.parse_measures(golden["measures"])
        got = {q: {} for q in golden["qrels"]}
        for qid, name, val in M.iter_calc(
            measures, golden["qrels"], _as_run(golden["run"])
        ):
            got[qid][name] = val
        for qid, vals in golden["expected_perquery"].items():
            for name, want in vals.items():
                assert got[qid][name] == pytest.approx(want, abs=1e-12), (qid, name)

    def test_q1_hand_derived(self, golden):
        """q1 by hand: order (score desc, docid desc) = d1,d3,d2,d9,d8;
        gains 3,0,1,2,0; positives {3,2,1}."""
        pq = golden["expected_perquery"]["q1"]
        idcg3 = 3 / math.log2(2) + 2 / math.log2(3) + 1 / math.log2(4)
        assert pq["nDCG@3"] == pytest.approx((3 + 0 + 0.5) / idcg3, abs=1e-12)
        assert pq["nDCG@10"] == pytest.approx(
            (3 + 0.5 + 2 / math.log2(5)) / idcg3, abs=1e-12)
        assert pq["RR@10"] == 1.0
        assert pq["P@3"] == pytest.approx(2 / 3, abs=1e-12)
        assert pq["R@3"] == pytest.approx(2 / 3, abs=1e-12)
        assert pq["AP"] == pytest.approx((1 + 2 / 3 + 3 / 4) / 3, abs=1e-12)

    def test_zero_queries(self, golden):
        """q3 (absent from run) and q4 (no positive judgments) contribute
        exact zeros — the qrels-driven aggregation convention."""
        for q in ("q3", "q4"):
            assert all(v == 0.0 for v in golden["expected_perquery"][q].values())


DEEP_FIXTURE = pathlib.Path(__file__).parent / "fixtures" / "trec_golden_deep.json"


@pytest.fixture(scope="module")
def golden_deep():
    return json.loads(DEEP_FIXTURE.read_text())


class TestDeepGolden:
    """Deep-cutoff + degenerate-run golden (VERDICT r3 item 9): 120-doc
    run with tie plateaus straddling rank 100, duplicate docids, an
    empty-but-present run query, an absent query, cross-qid score ties,
    and a run-only qid."""

    def test_aggregate_matches_golden(self, golden_deep):
        measures = M.parse_measures(golden_deep["measures"])
        agg = M.aggregate(measures, golden_deep["qrels"], _as_run(golden_deep["run"]))
        for name, want in golden_deep["expected_agg"].items():
            assert agg[name] == pytest.approx(want, abs=1e-12), name

    def test_perquery_matches_golden(self, golden_deep):
        measures = M.parse_measures(golden_deep["measures"])
        got = {q: {} for q in golden_deep["qrels"]}
        for qid, name, val in M.iter_calc(
            measures, golden_deep["qrels"], _as_run(golden_deep["run"])
        ):
            got[qid][name] = val
        assert "qZ" not in got  # run-only query ignored (qrels-driven)
        for qid, vals in golden_deep["expected_perquery"].items():
            for name, want in vals.items():
                assert got[qid][name] == pytest.approx(want, abs=1e-12), (qid, name)

    def test_duplicate_docids_collapse_last_wins(self, golden_deep):
        """qB by hand: run [b1@0.2, b2@0.5, b1@0.9, b3@0.1, b3@0.1] —
        pytrec_eval's {docid: score} run collapses b1 to its LAST score
        0.9, so ranking is b1(rel2), b2(rel1), b3(rel0): AP = 1.0,
        P@20 = 2/20. Counting the duplicate twice would give AP < 1."""
        pq = golden_deep["expected_perquery"]["qB"]
        assert pq["AP"] == pytest.approx(1.0, abs=1e-12)
        assert pq["RR@5"] == pytest.approx(1.0, abs=1e-12)
        assert pq["P@20"] == pytest.approx(2 / 20, abs=1e-12)
        assert pq["nDCG@20"] == pytest.approx(1.0, abs=1e-12)

    def test_degenerate_queries_zero(self, golden_deep):
        """qC (present with zero rows) and qD (absent) both contribute
        exact zeros to every metric."""
        for q in ("qC", "qD"):
            assert all(
                v == 0.0 for v in golden_deep["expected_perquery"][q].values()
            ), q

    def test_cross_qid_ties_stay_per_query(self, golden_deep):
        """qE shares every score with qA rows; its ranking must be purely
        per-query: e2(0.5, rel2) then x9(0.3, unjudged) then e1(0.1,
        rel1) -> RR@5 = 1, R@20 = 1, nDCG@20 hand-derived."""
        pq = golden_deep["expected_perquery"]["qE"]
        assert pq["RR@5"] == pytest.approx(1.0, abs=1e-12)
        assert pq["R@20"] == pytest.approx(1.0, abs=1e-12)
        dcg = 2 / math.log2(2) + 1 / math.log2(4)
        idcg = 2 / math.log2(2) + 1 / math.log2(3)
        assert pq["nDCG@20"] == pytest.approx(dcg / idcg, abs=1e-12)

    def test_rank100_boundary_tie_order(self, golden_deep):
        """The 0.100 plateau spans ranks 97-106 pre-truncation; trec_eval
        breaks those ties docid-DESCENDING, so which docs survive the @100
        cutoff depends on tie ordering. Recompute R@100 from first
        principles to pin it."""
        qrels = golden_deep["qrels"]["qA"]
        rows = [(d, float(s)) for d, s in golden_deep["run"]["qA"]]
        ranked = M.sort_run_rows(rows)
        top100 = [d for d, _ in ranked[:100]]
        n_rel = sum(1 for r in qrels.values() if r > 0)
        want = sum(1 for d in top100 if qrels.get(d, 0) > 0) / n_rel
        assert golden_deep["expected_perquery"]["qA"]["R@100"] == pytest.approx(
            want, abs=1e-12
        )


class TestAggJsonSchemaParity:
    def test_evaluator_emits_reference_key_set(self, golden, tmp_path):
        """Full evaluator CLI on the fixture -> agg.json keys are exactly
        the reference artifact's."""
        run_path = tmp_path / "golden.trec"
        lines = []
        for q, rows in golden["run"].items():
            ranked = sorted(rows, key=lambda r: -r[1])
            for rank, (d, s) in enumerate(ranked, 1):
                lines.append(f"{q} Q0 {d} {rank} {s} golden")
        run_path.write_text("\n".join(lines) + "\n")
        qrels_path = tmp_path / "qrels.tsv"
        qrels_path.write_text("\n".join(
            f"{q}\t{d}\t{r}" for q, ds in golden["qrels"].items()
            for d, r in ds.items()
        ) + "\n")
        from codemix_dense_retrieval_tpu.evals.evaluate import main as eval_main

        outdir = tmp_path / "out"
        eval_main([
            "--dataset", "golden", "--run", str(run_path),
            "--qrels", str(qrels_path), "--outdir", str(outdir),
        ])
        agg = json.loads(next(outdir.glob("*-agg.json")).read_text())
        assert sorted(agg.keys()) == REFERENCE_AGG_KEYS
        # x100 scaling convention (reference evaluate.py:76)
        assert agg["RR@10"] == pytest.approx(
            golden["expected_agg"]["RR@10"] * 100, abs=1e-9)
        assert agg["nDCG@10"] == pytest.approx(
            golden["expected_agg"]["nDCG@10"] * 100, abs=1e-9)
