"""CLI surface, scheduler (resume/fail-fast), and collector tests."""

import json
import os
import pathlib
import sys

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.cli import main as cli_main


def write_corpus_tsv(path, lang, n=60):
    rows = [f"{i}\t{lang} passage number {i} tok{i % 5} tok{i % 9}" for i in range(n)]
    pathlib.Path(path).write_text("\n".join(rows) + "\n")
    return {str(i): f"{lang} passage number {i} tok{i % 5} tok{i % 9}" for i in range(n)}


class TestCliEndToEnd:
    def test_encode_run_mix_evaluate(self, tmp_path, capsys):
        docs_en = write_corpus_tsv(tmp_path / "corpus.en.tsv", "en")
        docs_zh = write_corpus_tsv(tmp_path / "corpus.zh.tsv", "zh")

        cli_main([
            "encode-corpus",
            "--corpus_tsv", f"en={tmp_path/'corpus.en.tsv'}", f"zh={tmp_path/'corpus.zh.tsv'}",
            "--out", str(tmp_path / "idx"),
            "--storage_dtype", "float32",
            "--smoke_dim", "32",
        ])
        assert (tmp_path / "idx" / "en" / "manifest.json").exists()
        assert (tmp_path / "idx" / "zh" / "manifest.json").exists()
        assert (tmp_path / "idx" / "meta.json").exists()

        # queries: copies of en passages -> perfect retrieval provable
        qids = [f"q{i}" for i in range(8)]
        rel = [str(6 * i) for i in range(8)]
        (tmp_path / "queries.en.tsv").write_text(
            "\n".join(f"{q}\t{docs_en[d]}" for q, d in zip(qids, rel)) + "\n"
        )
        (tmp_path / "queries.zh.tsv").write_text(
            "\n".join(f"{q}\t{docs_zh[d]}" for q, d in zip(qids, rel)) + "\n"
        )

        cli_main([
            "run-mono",
            "--index", str(tmp_path / "idx" / "en"),
            "--queries", str(tmp_path / "queries.en.tsv"),
            "--outdir", str(tmp_path / "runs"),
            "--k", "10",
            "--smoke_dim", "32",
        ])
        run_path = tmp_path / "runs" / "queries.en.trec"
        assert run_path.exists()

        cli_main([
            "run-mix",
            "--index", str(tmp_path / "idx" / "zh"),
            "--query_tsv", f"en={tmp_path/'queries.en.tsv'}", f"zh={tmp_path/'queries.zh.tsv'}",
            "--cm_alphas", "0", "0.5", "1",
            "--query_cache", str(tmp_path / "qcache"),
            "--outdir", str(tmp_path / "mixruns"),
            "--k", "10",
            "--smoke_dim", "32",
        ])
        assert (tmp_path / "mixruns" / "cm-alpha-0.5.trec").exists()
        assert (tmp_path / "qcache" / "en" / "queries.npz").exists()

        cli_main([
            "run-bilingual",
            "--index", str(tmp_path / "idx" / "en"), str(tmp_path / "idx" / "zh"),
            "--queries", str(tmp_path / "queries.en.tsv"),
            "--outdir", str(tmp_path / "hubrubs"),
            "--k", "20",
            "--smoke_dim", "32",
        ])
        assert (tmp_path / "hubrubs" / "queries.en_base.trec").exists()

        # evaluate via the passthrough command
        qrels = tmp_path / "qrels.tsv"
        qrels.write_text("\n".join(f"{q}\t{d}#en\t1" for q, d in zip(qids, rel)) + "\n")
        cli_main([
            "evaluate",
            "--dataset", "synthetic",
            "--run", str(run_path),
            "--qrels", str(qrels),
            "--outdir", str(tmp_path / "results"),
        ])
        aggs = list((tmp_path / "results").glob("*-agg.json"))
        assert aggs
        agg = json.loads(aggs[0].read_text())
        assert agg["RR@10"] == pytest.approx(100.0)

    def test_query_cache_reused_and_validated(self, tmp_path):
        # identical smoke encoder across runs -> second run hits the cache
        docs_zh = write_corpus_tsv(tmp_path / "c.zh.tsv", "zh", 40)
        cli_main([
            "encode-corpus", "--corpus_tsv", f"zh={tmp_path/'c.zh.tsv'}",
            "--out", str(tmp_path / "idx"), "--storage_dtype", "float32",
            "--smoke_dim", "32",
        ])
        qids = ["a", "b", "c"]
        for lang in ("en", "zh"):
            (tmp_path / f"q.{lang}.tsv").write_text(
                "\n".join(f"{q}\t{lang} text {q}" for q in qids) + "\n"
            )
        for _ in range(2):
            cli_main([
                "run-mix",
                "--index", str(tmp_path / "idx" / "zh"),
                "--query_tsv", f"en={tmp_path/'q.en.tsv'}", f"zh={tmp_path/'q.zh.tsv'}",
                "--cm_alphas", "0.5",
                "--query_cache", str(tmp_path / "qc"),
                "--outdir", str(tmp_path / "r"),
                "--k", "5",
                "--smoke_dim", "32",
            ])
        assert (tmp_path / "qc" / "en" / "queries.npz").exists()


class TestScheduler:
    def _eval_job(self, tmp_path, name, bad_run=False):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Job

        run = tmp_path / f"{name}.trec"
        if not bad_run:
            run.write_text("q1 Q0 d1 1 0.9 t\n")
        qrels = tmp_path / "qrels.tsv"
        qrels.write_text("q1\td1\t1\n")
        outdir = tmp_path / f"results_{name}"
        return Job(
            name=name,
            argv=[
                "evaluate", "--dataset", "x", "--run", str(run),
                "--qrels", str(qrels), "--outdir", str(outdir),
            ],
            outdir=str(outdir),
            expected=[f"{name}_dev_*-agg.json"],
            env={"PYTHONPATH": str(pathlib.Path(__file__).resolve().parents[1])},
        )

    def test_run_and_resume(self, tmp_path):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Scheduler

        jobs = [self._eval_job(tmp_path, "jobA"), self._eval_job(tmp_path, "jobB")]
        res = Scheduler(jobs, slots=2).run()
        assert sorted(res.ran) == ["jobA", "jobB"]
        assert not res.failed
        # resume: both complete now -> skipped
        res2 = Scheduler(jobs, slots=2).run()
        assert sorted(res2.skipped) == ["jobA", "jobB"]
        assert not res2.ran

    def test_fail_fast(self, tmp_path):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Scheduler

        jobs = [self._eval_job(tmp_path, "bad", bad_run=True)]
        res = Scheduler(jobs, max_failures=1).run()
        assert res.failed == ["bad"]

    def test_plan_roundtrip(self, tmp_path):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Job, load_plan

        plan = {
            "jobs": [
                {
                    "name": "j1",
                    "argv": ["evaluate", "--run", "x"],
                    "outdir": "/tmp/o",
                    "expected": ["*.json"],
                }
            ]
        }
        p = tmp_path / "plan.json"
        p.write_text(json.dumps(plan))
        jobs = load_plan(p)
        assert jobs[0].name == "j1" and jobs[0].expected == ["*.json"]


class TestCollector:
    def _make_tree(self, root):
        exp = root / "mmarco-100000-chinese-en-zh-5bands-bge-m3" / "vector_mix"
        exp.mkdir(parents=True)
        for alpha, ndcg in [("0", 30.0), ("0.5", 35.0), ("1", 28.0)]:
            (exp / f"cm-alpha-{alpha}_dev_20260101-000000-agg.json").write_text(
                json.dumps({"nDCG@10": ndcg, "RR@10": ndcg - 5, "R@10": 50.0})
            )
        # an OLDER duplicate for alpha=0.5 that must be ignored
        (exp / "cm-alpha-0.5_dev_20250101-000000-agg.json").write_text(
            json.dumps({"nDCG@10": 1.0})
        )
        word = root / "mmarco-100000-bilingual-en-zh-5bands-bge-m3"
        word.mkdir(parents=True)
        for band, ndcg in [("cm0_base", 40.0), ("cm40-60_base", 42.0), ("cm100_base", 39.0)]:
            (word / f"{band}_dev_20260101-000000-agg.json").write_text(
                json.dumps({"nDCG@10": ndcg})
            )

    def test_collect_and_summary(self, tmp_path):
        from codemix_dense_retrieval_tpu.analysis.collect import (
            collect_results,
            compute_summary,
            mix_ratio_from_runstem,
        )

        self._make_tree(tmp_path)
        rows = collect_results(tmp_path)
        assert len(rows) == 6  # 3 alphas + 3 bands (old dup dropped)
        embed = [r for r in rows if r["mix_mode"] == "embed"]
        assert {r["mix_ratio"] for r in embed} == {0.0, 50.0, 100.0}
        mid = next(r for r in embed if r["mix_ratio"] == 50.0)
        assert mid["ndcg10"] == 35.0  # latest timestamp won
        assert mid["pair"] == "EN-ZH" and mid["doc_side"] == "chinese"

        summary = compute_summary(rows)
        emb = next(s for s in summary if s["mix_mode"] == "embed")
        assert emb["best_endpoint_ndcg"] == 30.0
        assert emb["best_mixed_ndcg"] == 35.0
        assert emb["delta_ndcg"] == pytest.approx(5.0)
        assert emb["lambda_star_mid"] == 50.0
        word = next(s for s in summary if s["mix_mode"] == "word")
        assert word["delta_ndcg"] == pytest.approx(2.0)

    def test_mix_ratio_parsing(self):
        from codemix_dense_retrieval_tpu.analysis.collect import mix_ratio_from_runstem

        assert mix_ratio_from_runstem("cm-alpha-0.5") == ("embed", 50.0)
        assert mix_ratio_from_runstem("cm-alpha-0.5_base") == ("embed", 50.0)
        assert mix_ratio_from_runstem("cm40-60_base") == ("word", 50.0)
        assert mix_ratio_from_runstem("cm0") == ("word", 0.0)
        assert mix_ratio_from_runstem("cm100_base") == ("word", 100.0)
        assert mix_ratio_from_runstem("notarun") is None


class TestFusedCli:
    def test_run_mix_fused_with_device_metrics(self, tmp_path, capsys):
        docs_zh = write_corpus_tsv(tmp_path / "c.zh.tsv", "zh", 50)
        cli_main([
            "encode-corpus", "--corpus_tsv", f"zh={tmp_path/'c.zh.tsv'}",
            "--out", str(tmp_path / "idx"), "--storage_dtype", "float32",
            "--smoke_dim", "32",
        ])
        qids = [f"q{i}" for i in range(6)]
        rel = [str(4 * i) for i in range(6)]
        (tmp_path / "q.en.tsv").write_text(
            "\n".join(f"{q}\tunrelated english {q}" for q in qids) + "\n"
        )
        (tmp_path / "q.zh.tsv").write_text(
            "\n".join(f"{q}\t{docs_zh[d]}" for q, d in zip(qids, rel)) + "\n"
        )
        qrels = tmp_path / "qrels.tsv"
        qrels.write_text("\n".join(f"{q}\t{d}#zh\t1" for q, d in zip(qids, rel)) + "\n")
        capsys.readouterr()  # drop earlier commands' stdout
        cli_main([
            "run-mix",
            "--index", str(tmp_path / "idx" / "zh"),
            "--query_tsv", f"en={tmp_path/'q.en.tsv'}", f"zh={tmp_path/'q.zh.tsv'}",
            "--cm_alphas", "0", "1",
            "--outdir", str(tmp_path / "r"),
            "--k", "10",
            "--smoke_dim", "32",
            "--fused", "--qrels", str(qrels),
        ])
        out = capsys.readouterr().out
        payload = json.loads(out[out.index("{"):])
        # alpha=1: queries == their relevant docs -> on-device RR@10 == 100
        assert payload["1"]["RR@10"] == pytest.approx(100.0)
        assert pathlib.Path(payload["1"]["run"]).exists()

    def test_fused_ignores_judged_nonrelevant(self, tmp_path, capsys):
        """rel=0 (judged non-relevant) qrels rows must not count as
        relevant in the fused on-device metrics (ADVICE r1 #2)."""
        docs_zh = write_corpus_tsv(tmp_path / "c.zh.tsv", "zh", 50)
        cli_main([
            "encode-corpus", "--corpus_tsv", f"zh={tmp_path/'c.zh.tsv'}",
            "--out", str(tmp_path / "idx"), "--storage_dtype", "float32",
            "--smoke_dim", "32",
        ])
        qids = [f"q{i}" for i in range(6)]
        top = [str(4 * i) for i in range(6)]       # doc each query will rank #1
        rel = [str(4 * i + 1) for i in range(6)]   # the actually-relevant doc
        (tmp_path / "q.en.tsv").write_text(
            "\n".join(f"{q}\tunrelated english {q}" for q in qids) + "\n"
        )
        (tmp_path / "q.zh.tsv").write_text(
            "\n".join(f"{q}\t{docs_zh[d]}" for q, d in zip(qids, top)) + "\n"
        )
        qrels = tmp_path / "qrels.tsv"
        qrels.write_text(
            "\n".join(
                f"{q}\t{t}#zh\t0\n{q}\t{r}#zh\t1"
                for q, t, r in zip(qids, top, rel)
            ) + "\n"
        )
        capsys.readouterr()
        cli_main([
            "run-mix",
            "--index", str(tmp_path / "idx" / "zh"),
            "--query_tsv", f"en={tmp_path/'q.en.tsv'}", f"zh={tmp_path/'q.zh.tsv'}",
            "--cm_alphas", "1",
            "--outdir", str(tmp_path / "r"),
            "--k", "10",
            "--smoke_dim", "32",
            "--fused", "--qrels", str(qrels),
        ])
        out = capsys.readouterr().out
        payload = json.loads(out[out.index("{"):])
        # the rank-1 doc is judged NON-relevant: perfect RR would mean the
        # rel=0 judgment leaked into the relevance matrix
        assert payload["1"]["RR@10"] < 100.0

    def test_bilingual_fused_matches_host_collapse(self, tmp_path, capsys):
        """run-bilingual-mix --fused (2k-deep raw search + on-device
        collapse) must reproduce the host raw->collapse path exactly on
        the same inputs (VERDICT r1 #5)."""
        from codemix_dense_retrieval_tpu.io.trec import read_run

        write_corpus_tsv(tmp_path / "c.en.tsv", "en", 50)
        write_corpus_tsv(tmp_path / "c.zh.tsv", "zh", 50)
        cli_main([
            "encode-corpus",
            "--corpus_tsv", f"en={tmp_path/'c.en.tsv'}", f"zh={tmp_path/'c.zh.tsv'}",
            "--out", str(tmp_path / "idx"), "--storage_dtype", "float32",
            "--smoke_dim", "32",
        ])
        qids = [f"q{i}" for i in range(7)]
        for lang in ("en", "zh"):
            (tmp_path / f"q.{lang}.tsv").write_text(
                "\n".join(f"{q}\t{lang} query text {q} tok{i%3}" for i, q in enumerate(qids)) + "\n"
            )
        k = 10
        common = [
            "--index", str(tmp_path / "idx" / "en"), str(tmp_path / "idx" / "zh"),
            "--query_tsv", f"en={tmp_path/'q.en.tsv'}", f"zh={tmp_path/'q.zh.tsv'}",
            "--cm_alphas", "0.3", "0.7",
            "--smoke_dim", "32",
        ]
        # host path at raw depth 2k (what the fused path searches), then
        # truncate its collapsed output to k per query
        cli_main(["run-bilingual-mix", *common, "--k", str(2 * k),
                  "--outdir", str(tmp_path / "host")])
        cli_main(["run-bilingual-mix", *common, "--k", str(k), "--fused",
                  "--outdir", str(tmp_path / "fused")])
        capsys.readouterr()
        for label in ("0.3", "0.7"):
            host = read_run(tmp_path / "host" / f"cm-alpha-{label}_base.trec")
            fused = read_run(tmp_path / "fused" / f"cm-alpha-{label}_base.trec")
            by_q_host = {}
            for e in host:
                by_q_host.setdefault(e.qid, []).append(e)
            by_q_fused = {}
            for e in fused:
                by_q_fused.setdefault(e.qid, []).append(e)
            assert set(by_q_fused) == set(qids)
            for q in qids:
                h = by_q_host[q][:k]
                f = by_q_fused[q]
                assert len(f) == k
                assert [e.docid for e in f] == [e.docid for e in h]
                # host collapse writes 4-decimal scores, fused writes 6
                np.testing.assert_allclose(
                    [e.score for e in f], [e.score for e in h], atol=6e-5
                )

    def test_fused_rejects_non_parallel_hub_with_pointer(self, tmp_path, capsys):
        """--fused on a NON-parallel hub (different docid sets per
        language) must fail with a message pointing at the host collapse
        (VERDICT r2 item 9)."""
        import pytest

        write_corpus_tsv(tmp_path / "c.en.tsv", "en", 40)
        # different docids: offset the zh corpus ids
        rows = [f"z{i}\tzh passage {i} tok{i % 5}" for i in range(40)]
        (tmp_path / "c.zh.tsv").write_text("\n".join(rows) + "\n")
        for lang, tsv in (("en", "c.en.tsv"), ("zh", "c.zh.tsv")):
            cli_main([
                "encode-corpus", "--corpus_tsv", f"{lang}={tmp_path/tsv}",
                "--out", str(tmp_path / f"idx_{lang}"),
                "--storage_dtype", "float32", "--smoke_dim", "32",
            ])
        qids = [f"q{i}" for i in range(4)]
        for lang in ("en", "zh"):
            (tmp_path / f"q.{lang}.tsv").write_text(
                "\n".join(f"{q}\t{lang} query {q}" for q in qids) + "\n"
            )
        capsys.readouterr()
        with pytest.raises(SystemExit) as ei:
            cli_main([
                "run-bilingual-mix",
                "--index", str(tmp_path / "idx_en" / "en"),
                str(tmp_path / "idx_zh" / "zh"),
                "--query_tsv", f"en={tmp_path/'q.en.tsv'}",
                f"zh={tmp_path/'q.zh.tsv'}",
                "--cm_alphas", "0.5", "--smoke_dim", "32", "--fused",
                "--outdir", str(tmp_path / "out"),
            ])
        msg = str(ei.value)
        assert "parallel hub" in msg and "without --fused" in msg


class TestAnalyzeCli:
    def test_analyze_triplets(self, tmp_path, capsys):
        qids = [f"q{i}" for i in range(40)]
        (tmp_path / "en.tsv").write_text(
            "\n".join(f"{q}\tenglish query number {i} alpha beta" for i, q in enumerate(qids)) + "\n")
        (tmp_path / "zh.tsv").write_text(
            "\n".join(f"{q}\tchinese query number {i} gamma delta" for i, q in enumerate(qids)) + "\n")
        (tmp_path / "cm.tsv").write_text(
            "\n".join(f"{q}\tenglish chinese mixed {i} alpha gamma" for i, q in enumerate(qids)) + "\n")
        cli_main([
            "analyze",
            "--query_tsv", f"en={tmp_path/'en.tsv'}", f"zh={tmp_path/'zh.tsv'}",
            f"cm={tmp_path/'cm.tsv'}",
            "--outdir", str(tmp_path / "analysis"),
            "--smoke_dim", "32",
        ])
        assert (tmp_path / "analysis" / "report.md").exists()
        assert (tmp_path / "analysis" / "projection.png").exists()
        assert (tmp_path / "analysis" / "per_query_metrics.csv").exists()
        out = capsys.readouterr().out
        payload = json.loads(out[out.index("{"):])
        assert "r_mean" in payload and "probe_accuracy" in payload

    def test_analyze_cm_subset_stays_aligned(self, tmp_path, capsys):
        """When the CM TSV is missing some intersected qids, texts must be
        FILTERED by index, not truncated by zip (ADVICE r1 #1). CM == EN
        text per kept qid, so per-query r must be identical across rows;
        misalignment would scramble the pairs and spread r."""
        import csv

        qids = [f"q{i}" for i in range(30)]
        (tmp_path / "en.tsv").write_text(
            "\n".join(f"{q}\tenglish query number {i} alpha beta" for i, q in enumerate(qids)) + "\n")
        (tmp_path / "zh.tsv").write_text(
            "\n".join(f"{q}\tchinese query number {i} gamma delta" for i, q in enumerate(qids)) + "\n")
        kept = [q for i, q in enumerate(qids) if i not in (0, 7, 8)]
        (tmp_path / "cm.tsv").write_text(
            "\n".join(
                f"{q}\tenglish query number {qids.index(q)} alpha beta" for q in kept
            ) + "\n")
        cli_main([
            "analyze",
            "--query_tsv", f"en={tmp_path/'en.tsv'}", f"zh={tmp_path/'zh.tsv'}",
            f"cm={tmp_path/'cm.tsv'}",
            "--outdir", str(tmp_path / "analysis"),
            "--smoke_dim", "32",
        ])
        with open(tmp_path / "analysis" / "per_query_metrics.csv") as f:
            rows = list(csv.DictReader(f))
        assert [r["qid"] for r in rows] == kept
        r_vals = [float(r["r"]) for r in rows]
        assert max(r_vals) - min(r_vals) < 1e-4  # every CM == its EN endpoint


class TestSchedulerPlacement:
    """Per-device slot table + per-type caps + process-group kill
    (reference `run_all_vector_pairs.sh:529-624`)."""

    def _fake_job(self, tmp_path, name, dur=0.5, jtype="", device=None, rc=0):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Job

        out = tmp_path / "rec" / f"{name}.json"
        argv = [str(out), str(dur)] + ([str(rc)] if rc else [])
        return Job(
            name=name, argv=argv, outdir=str(out.parent),
            expected=[out.name] if rc == 0 else [],
            env={"PYTHONPATH": str(pathlib.Path(__file__).resolve().parents[1])},
            jtype=jtype, device=device,
        )

    def _run(self, tmp_path, jobs, **kw):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Scheduler

        return Scheduler(jobs, module="tests.fake_job", poll_interval=0.05, **kw).run()

    def _records(self, tmp_path):
        recs = {}
        for f in (tmp_path / "rec").glob("*.json"):
            recs[f.stem] = json.loads(f.read_text())
        return recs

    @staticmethod
    def _max_concurrent(intervals):
        events = [(r["start"], 1) for r in intervals] + [(r["end"], -1) for r in intervals]
        events.sort()
        cur = peak = 0
        for _, d in events:
            cur += d
            peak = max(peak, cur)
        return peak

    def test_device_slots_honored(self, tmp_path):
        jobs = [self._fake_job(tmp_path, f"j{i}", dur=0.4) for i in range(6)]
        res = self._run(tmp_path, jobs, device_slots={"a": 2, "b": 1})
        assert sorted(res.ran) == sorted(j.name for j in jobs)
        recs = self._records(tmp_path)
        assert set(r["device"] for r in recs.values()) <= {"a", "b"}
        for dev, cap in (("a", 2), ("b", 1)):
            ivs = [r for r in recs.values() if r["device"] == dev]
            if ivs:
                assert self._max_concurrent(ivs) <= cap
        # placements recorded in the result too
        assert set(res.placements) == set(recs)

    def test_device_pin(self, tmp_path):
        jobs = [
            self._fake_job(tmp_path, "pinned", dur=0.2, device="b"),
            self._fake_job(tmp_path, "free", dur=0.2),
        ]
        res = self._run(tmp_path, jobs, device_slots={"a": 1, "b": 1})
        assert res.placements["pinned"] == "b"
        assert self._records(tmp_path)["pinned"]["device"] == "b"

    def test_unknown_pin_rejected(self, tmp_path):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import Scheduler

        jobs = [self._fake_job(tmp_path, "x", device="nope")]
        with pytest.raises(ValueError, match="unknown device"):
            Scheduler(jobs, module="tests.fake_job", device_slots={"a": 1})

    def test_type_caps(self, tmp_path):
        jobs = [self._fake_job(tmp_path, f"h{i}", dur=0.4, jtype="heavy") for i in range(3)]
        jobs += [self._fake_job(tmp_path, f"l{i}", dur=0.4, jtype="light") for i in range(2)]
        res = self._run(
            tmp_path, jobs, device_slots={"a": 4}, type_caps={"heavy": 1},
        )
        assert not res.failed
        recs = self._records(tmp_path)
        heavy = [r for n, r in recs.items() if n.startswith("h")]
        assert self._max_concurrent(heavy) <= 1
        # light jobs were NOT starved behind the capped heavy queue
        light = [r for n, r in recs.items() if n.startswith("l")]
        assert self._max_concurrent(light) == 2

    def test_fail_fast_kills_process_group(self, tmp_path):
        import time as _time

        jobs = [
            self._fake_job(tmp_path, "sleeper", dur=30.0),
            self._fake_job(tmp_path, "bad", dur=0.1, rc=1),
        ]
        t0 = _time.monotonic()
        res = self._run(tmp_path, jobs, device_slots={"a": 2}, max_failures=1)
        assert "bad" in res.failed
        # the 30s sleeper was killed, not awaited
        assert _time.monotonic() - t0 < 15
        assert "sleeper" not in self._records(tmp_path)

    def test_plan_options_roundtrip(self, tmp_path):
        from codemix_dense_retrieval_tpu.orchestrate.scheduler import (
            load_plan, load_plan_options,
        )

        plan = {
            "jobs": [{"name": "j1", "argv": ["x"], "outdir": "/tmp/o",
                      "type": "bilingual", "device": "a"}],
            "device_slots": {"a": 2, "b": 1},
            "type_caps": {"bilingual": 1},
        }
        p = tmp_path / "plan.json"
        p.write_text(json.dumps(plan))
        jobs = load_plan(p)
        assert jobs[0].jtype == "bilingual" and jobs[0].device == "a"
        ds, tc = load_plan_options(p)
        assert ds == {"a": 2, "b": 1} and tc == {"bilingual": 1}
