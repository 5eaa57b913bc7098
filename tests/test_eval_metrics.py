"""Metric-parity tests for the native evaluator (replaces ir_measures)."""

import json
import math

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.evals import metrics as M
from codemix_dense_retrieval_tpu.evals.evaluate import evaluate_run, main as eval_main


def pq(measure, qrels, rows):
    m = M.parse_measure(measure)
    return M._per_query([m], qrels, rows)[str(m)]


class TestHandComputed:
    QRELS = {"d1": 1, "d2": 1}
    RUN = [("d3", 0.9), ("d1", 0.8), ("d2", 0.7)]

    def test_rr(self):
        assert pq("RR@10", self.QRELS, self.RUN) == pytest.approx(0.5)
        assert pq("RR@1", self.QRELS, self.RUN) == 0.0

    def test_p(self):
        assert pq("P@1", self.QRELS, self.RUN) == 0.0
        assert pq("P@3", self.QRELS, self.RUN) == pytest.approx(2 / 3)

    def test_r(self):
        assert pq("Recall@1", self.QRELS, self.RUN) == 0.0
        assert pq("Recall@2", self.QRELS, self.RUN) == pytest.approx(0.5)
        assert pq("Recall@3", self.QRELS, self.RUN) == pytest.approx(1.0)

    def test_ndcg(self):
        dcg = 1 / math.log2(3) + 1 / math.log2(4)
        idcg = 1 / math.log2(2) + 1 / math.log2(3)
        assert pq("nDCG@3", self.QRELS, self.RUN) == pytest.approx(dcg / idcg)

    def test_ap(self):
        assert pq("AP", self.QRELS, self.RUN) == pytest.approx((1 / 2 + 2 / 3) / 2)

    def test_graded_ndcg(self):
        qrels = {"d1": 2, "d2": 1}
        run = [("d2", 0.9), ("d1", 0.8)]
        dcg = 1 / math.log2(2) + 2 / math.log2(3)
        idcg = 2 / math.log2(2) + 1 / math.log2(3)
        assert pq("nDCG@10", qrels, run) == pytest.approx(dcg / idcg)

    def test_no_relevant_gives_zero(self):
        qrels = {"d9": 0}
        run = [("d9", 1.0)]
        for m in ["nDCG@10", "RR@10", "P@10", "Recall@10", "AP"]:
            assert pq(m, qrels, run) == 0.0


class TestTieBreaking:
    def test_trec_eval_docid_desc_on_ties(self):
        # equal scores: trec_eval ranks by docid DESCENDING, so "b" precedes "a"
        qrels = {"b": 1}
        run = [("a", 0.5), ("b", 0.5)]
        assert pq("RR@1", qrels, run) == 1.0
        qrels2 = {"a": 1}
        assert pq("RR@1", qrels2, run) == 0.0
        assert pq("RR@2", qrels2, run) == pytest.approx(0.5)


class TestSklearnOracle:
    """Independent oracle: sklearn's ndcg_score / average_precision_score
    agree with trec_eval definitions when all docs are retrieved, scores
    are untied, and gains are linear."""

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_ndcg_matches_sklearn(self, seed):
        from sklearn.metrics import ndcg_score

        rng = np.random.default_rng(seed)
        n = 50
        rels = (rng.random(n) < 0.2).astype(int)
        if rels.sum() == 0:
            rels[0] = 1
        scores = rng.permutation(n).astype(float)  # distinct scores
        docids = [f"d{i}" for i in range(n)]
        qrels = {d: int(r) for d, r in zip(docids, rels)}
        run = list(zip(docids, scores.tolist()))
        for k in (5, 10, 50):
            ours = pq(f"nDCG@{k}", qrels, run)
            theirs = ndcg_score([rels], [scores], k=k, ignore_ties=True)
            assert ours == pytest.approx(theirs, abs=1e-9)

    @pytest.mark.parametrize("seed", [0, 1])
    def test_ap_matches_sklearn(self, seed):
        from sklearn.metrics import average_precision_score

        rng = np.random.default_rng(seed)
        n = 40
        rels = (rng.random(n) < 0.3).astype(int)
        if rels.sum() == 0:
            rels[0] = 1
        scores = rng.permutation(n).astype(float)
        docids = [f"d{i}" for i in range(n)]
        qrels = {d: int(r) for d, r in zip(docids, rels)}
        run = list(zip(docids, scores.tolist()))
        ours = pq("AP", qrels, run)
        theirs = average_precision_score(rels, scores)
        assert ours == pytest.approx(theirs, abs=1e-9)


class TestAggregate:
    def test_missing_query_counts_as_zero(self):
        qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
        run = {"q1": [("d1", 1.0)]}  # q2 absent
        measures = M.parse_measures(["RR@10"])
        agg = M.aggregate(measures, qrels, run)
        assert agg["RR@10"] == pytest.approx(0.5)

    def test_iter_calc_covers_qrels_queries(self):
        qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
        run = {"q1": [("d1", 1.0)], "q3": [("dX", 1.0)]}
        rows = list(M.iter_calc(M.parse_measures(["P@1"]), qrels, run))
        qids = {q for q, _, _ in rows}
        assert qids == {"q1", "q2"}  # q3 (run-only) ignored


class TestMeasureParsing:
    def test_aliases_collapse(self):
        ms = M.parse_measures(["MRR@10", "RR@10", "Recall@5", "AP", "MAP"])
        assert [str(m) for m in ms] == ["RR@10", "R@5", "AP"]

    def test_reference_default_set_keys(self):
        """The default metric set must produce exactly the reference's
        agg.json key family: nDCG@k(+6 stats each), RR@k, P@k, R@k, AP."""
        from codemix_dense_retrieval_tpu.evals.evaluate import _DEFAULT_METRICS

        ms = M.parse_measures(_DEFAULT_METRICS)
        assert [str(m) for m in ms] == [
            "nDCG@1", "nDCG@3", "nDCG@5", "nDCG@10", "nDCG@100",
            "RR@1", "RR@3", "RR@5", "RR@10", "RR@100",
            "P@1", "P@3", "P@5", "P@10", "P@100",
            "R@1", "R@3", "R@5", "R@10", "R@100",
            "AP",
        ]

    def test_bad_measures_raise(self):
        with pytest.raises(ValueError):
            M.parse_measure("bogus@5")
        with pytest.raises(ValueError):
            M.parse_measure("AP@5")
        with pytest.raises(ValueError):
            M.parse_measure("nDCG")


class TestEvaluateRun:
    def test_scaling_and_stats(self):
        qrels = {"q1": {"d1": 1}, "q2": {"d2": 1}}
        run = {"q1": [("d1", 1.0)], "q2": [("d2", 1.0)]}
        ordered, _, diag = evaluate_run(run, qrels, ["nDCG@10", "MRR@10"])
        assert ordered["nDCG@10"] == pytest.approx(100.0)
        assert ordered["RR@10"] == pytest.approx(100.0)
        assert ordered["nDCG@10_std"] == pytest.approx(0.0)
        assert diag["num_queries"] == 2
        assert diag["num_overlap"] == 2
        assert diag["pct_unjudged"] == pytest.approx(0.0)

    def test_ndcg_ci_matches_reference_formula(self):
        # 4 queries with distinct ndcg values; verify t-based CI
        qrels = {f"q{i}": {"d1": 1} for i in range(4)}
        run = {
            "q0": [("d1", 1.0)],                      # ndcg 1.0
            "q1": [("x", 1.0), ("d1", 0.9)],          # 1/log2(3)
            "q2": [("x", 1.0), ("y", 0.9), ("d1", 0.8)],  # 1/log2(4)
            "q3": [("x", 1.0)],                        # 0
        }
        ordered, _, _ = evaluate_run(run, qrels, ["nDCG@10"])
        vals = [100.0, 100 / math.log2(3), 100 / math.log2(4), 0.0]
        mean = float(np.mean(vals))
        std = float(np.std(vals, ddof=1))
        se = std / 2.0
        from scipy import stats

        t95 = stats.t.ppf(0.975, df=3)
        assert ordered["nDCG@10"] == pytest.approx(mean)
        assert ordered["nDCG@10_std"] == pytest.approx(std)
        assert ordered["nDCG@10_ci95_high"] == pytest.approx(mean + t95 * se)


class TestEvaluateCli:
    def test_full_artifact_quartet(self, tmp_path):
        qrels = tmp_path / "qrels.tsv"
        qrels.write_text("q1\td1\t1\nq2\td2\t1\nq3\tdz\t1\n")
        run = tmp_path / "cm-alpha-0.5.trec"
        run.write_text(
            "q1 Q0 d1 1 0.9 t\nq1 Q0 dx 2 0.8 t\nq2 Q0 dy 1 0.9 t\nq2 Q0 d2 2 0.8 t\n"
        )
        qids = tmp_path / "qids.tsv"
        qids.write_text("q1\nq2\n")
        outdir = tmp_path / "results"
        eval_main([
            "--dataset", "synthetic",
            "--run", str(run),
            "--qrels", str(qrels),
            "--outdir", str(outdir),
            "--filter_qids", str(qids),
            "--perquery",
        ])
        files = sorted(outdir.iterdir())
        suffixes = {f.name.split("-")[-1] for f in files}
        assert {"agg.csv", "agg.json", "perquery.csv", "diagnostic.txt"} <= suffixes

        agg = json.loads(next(f for f in files if f.name.endswith("-agg.json")).read_text())
        # exact key-set parity with the reference agg.json schema
        ref_keys = []
        for k in (1, 3, 5, 10, 100):
            ref_keys.append(f"nDCG@{k}")
            ref_keys += [f"nDCG@{k}_{s}" for s in (
                "std", "stderr", "ci90_low", "ci90_high", "ci95_low", "ci95_high")]
        ref_keys += [f"RR@{k}" for k in (1, 3, 5, 10, 100)]
        ref_keys += [f"P@{k}" for k in (1, 3, 5, 10, 100)]
        ref_keys += [f"R@{k}" for k in (1, 3, 5, 10, 100)]
        ref_keys.append("AP")
        assert list(agg.keys()) == ref_keys
        # q3 was filtered out; q1/q2 each have rel at measured ranks
        assert agg["RR@10"] == pytest.approx(100 * (1.0 + 0.5) / 2)

        diag_f = next(f for f in files if f.name.endswith("-diagnostic.txt"))
        diag = dict(l.split(": ") for l in diag_f.read_text().strip().splitlines())
        assert diag["num_queries"] == "2"
        assert diag["num_retrieved"] == "4"


class TestIrMeasuresParity:
    """Cross-check against ir_measures/pytrec_eval when installed (absent in
    this image; runs in environments that have it — SURVEY §2.2 'host-side
    ir_measures-compatible path for parity checks')."""

    def test_matches_ir_measures(self, rng):
        irm = pytest.importorskip("ir_measures")
        from ir_measures import Qrel, ScoredDoc

        qrels_rows, run_rows = [], []
        qrels, run = {}, {}
        for qi in range(10):
            qid = f"q{qi}"
            rels = rng.choice(50, size=3, replace=False)
            qrels[qid] = {f"d{j}": 1 for j in rels}
            qrels_rows += [Qrel(qid, f"d{j}", 1) for j in rels]
            scores = rng.standard_normal(50)
            run[qid] = [(f"d{j}", float(scores[j])) for j in range(50)]
            run_rows += [ScoredDoc(qid, f"d{j}", float(scores[j])) for j in range(50)]
        measures = M.parse_measures(["nDCG@10", "MRR@10", "P@10", "Recall@10", "AP"])
        ours = M.aggregate(measures, qrels, run)
        theirs = irm.calc_aggregate(
            list(irm.parse(" ".join(["nDCG@10", "RR@10", "P@10", "R@10", "AP"]))),
            qrels_rows, run_rows,
        )
        for m, v in theirs.items():
            assert ours[str(m)] == pytest.approx(float(v), abs=1e-8), str(m)
