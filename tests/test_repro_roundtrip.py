"""EN-ZH reproduction plan round-trip (VERDICT r3 item 10).

The executable analog of the reference's `reproduce_en_zh.sh:96-449`:
``make-plan en-zh-repro`` -> ``sweep`` (real Scheduler subprocesses) ->
``collect`` -> ``paper-values`` -> ``plots``, all through the public CLI
surface on a synthetic corpus, asserting the full artifact tree appears
(6 jobs: mono-EN/ZH x word/vector mix + bilingual word/vector mix, each
band/alpha evaluated to -agg.json).
"""

import json
import os
import pathlib
import sys

import pytest

from codemix_dense_retrieval_tpu.cli import main as cli_main

REPO_ROOT = pathlib.Path(__file__).resolve().parents[1]


def _write_corpus(path, lang, n=60):
    rows = [f"{i}\t{lang} passage number {i} tok{i % 5} tok{i % 9}" for i in range(n)]
    pathlib.Path(path).write_text("\n".join(rows) + "\n")
    return {str(i): f"{lang} passage number {i} tok{i % 5} tok{i % 9}" for i in range(n)}


@pytest.mark.slow
def test_en_zh_repro_plan_roundtrip(tmp_path, monkeypatch, capsys):
    # scheduler children run `python -m codemix_dense_retrieval_tpu` and
    # must find the package (repo is not pip-installed)
    monkeypatch.setenv(
        "PYTHONPATH",
        f"{REPO_ROOT}:{os.environ.get('PYTHONPATH', '')}".rstrip(":"),
    )

    # --- corpus + indexes (both languages) --------------------------------
    docs_en = _write_corpus(tmp_path / "corpus.en.tsv", "en")
    docs_zh = _write_corpus(tmp_path / "corpus.zh.tsv", "zh")
    cli_main([
        "encode-corpus",
        "--corpus_tsv", f"en={tmp_path/'corpus.en.tsv'}", f"zh={tmp_path/'corpus.zh.tsv'}",
        "--out", str(tmp_path / "idx"),
        "--storage_dtype", "float32",
        "--smoke_dim", "32",
    ])

    # --- queries, word-mix bands, qrels ------------------------------------
    qids = [f"q{i}" for i in range(6)]
    rel = [str(7 * i) for i in range(6)]
    qdir = tmp_path / "queries"
    qdir.mkdir()
    (qdir / "queries.en.tsv").write_text(
        "\n".join(f"{q}\t{docs_en[d]}" for q, d in zip(qids, rel)) + "\n")
    (qdir / "queries.zh.tsv").write_text(
        "\n".join(f"{q}\t{docs_zh[d]}" for q, d in zip(qids, rel)) + "\n")
    bands = tmp_path / "bands"
    bands.mkdir()
    (bands / "queries-cm0.tsv").write_text(
        "\n".join(f"{q}\t{docs_en[d]}" for q, d in zip(qids, rel)) + "\n")
    (bands / "queries-cm40-60.tsv").write_text(
        "\n".join(f"{q}\t{docs_en[d]} {docs_zh[d]}" for q, d in zip(qids, rel)) + "\n")
    (bands / "queries-cm100.tsv").write_text(
        "\n".join(f"{q}\t{docs_zh[d]}" for q, d in zip(qids, rel)) + "\n")
    # one qrels file serves every run shape: mono runs retrieve per-lang
    # derived ids (d#en / d#zh), collapsed bilingual runs retrieve base ids
    qrels = tmp_path / "qrels.tsv"
    qrels.write_text("\n".join(
        f"{q}\t{d}{suffix}\t1"
        for q, d in zip(qids, rel) for suffix in ("", "#en", "#zh")
    ) + "\n")

    # --- make-plan ----------------------------------------------------------
    result_root = tmp_path / "results"
    plan_path = tmp_path / "plan.json"
    cli_main([
        "make-plan", "en-zh-repro",
        "--index_root", str(tmp_path / "idx"),
        "--query_tsv_root", str(qdir),
        "--band_dir", str(bands),
        "--result_root", str(result_root),
        "--qrels", str(qrels),
        "--size", "60",
        "--k", "10",
        "--runner_arg", "--smoke_dim 32",
        "--out", str(plan_path),
    ])
    plan = json.loads(plan_path.read_text())
    assert len(plan["jobs"]) == 6
    assert all("--smoke_dim" in j["argv"] for j in plan["jobs"])
    word_jobs = [j for j in plan["jobs"] if j["name"].startswith("wordmix")]
    assert len(word_jobs) == 3
    assert all(j["eval_after"] for j in plan["jobs"])  # per-band/alpha evals

    # --- sweep (real subprocess scheduler) ---------------------------------
    capsys.readouterr()  # drain encode/make-plan output before parsing sweep's
    with pytest.raises(SystemExit) as exc_ok:
        try:
            cli_main([
                "sweep", "--plan", str(plan_path), "--slots", "2",
                "--max_failures", "1",
            ])
        except SystemExit:
            raise
        else:
            raise SystemExit(0)
    assert exc_ok.value.code in (0, None), capsys.readouterr().out

    out = capsys.readouterr().out
    sweep = json.loads(out[out.index("{"):])
    assert sorted(sweep["ran"]) and not sweep["failed"]
    assert len(sweep["ran"]) == 6

    # --- artifact tree ------------------------------------------------------
    alphas = ("0", "0.1", "0.25", "0.5", "0.75", "0.9", "1")
    for side in ("english", "chinese"):
        exp = result_root / f"mmarco-60-{side}-en-zh-5bands-bge-m3"
        for a in alphas:
            assert (exp / "vector_mix" / f"cm-alpha-{a}.trec").exists(), (side, a)
            assert list((exp / "vector_mix").glob(f"cm-alpha-{a}_dev_*-agg.json")), (side, a)
        for b in ("cm0", "cm40-60", "cm100"):
            assert (exp / f"{b}.trec").exists(), (side, b)
            assert list(exp.glob(f"{b}_dev_*-agg.json")), (side, b)
    bexp = result_root / "mmarco-60-bilingual-en-zh-5bands-bge-m3"
    for a in alphas:
        assert (bexp / "vector_mix" / f"cm-alpha-{a}_base.trec").exists(), a
    for b in ("cm0", "cm40-60", "cm100"):
        assert (bexp / f"{b}_base.trec").exists(), b
        assert list(bexp.glob(f"{b}_base_dev_*-agg.json")), b

    # resume: a second sweep skips everything (artifact completeness)
    with pytest.raises(SystemExit) as exc2:
        try:
            cli_main(["sweep", "--plan", str(plan_path), "--slots", "2"])
        except SystemExit:
            raise
        else:
            raise SystemExit(0)
    assert exc2.value.code in (0, None)
    out2 = capsys.readouterr().out
    sweep2 = json.loads(out2[out2.index("{"):])
    assert len(sweep2["skipped"]) == 6 and not sweep2["ran"]

    # --- collectors / paper values / plots ---------------------------------
    csv_out = tmp_path / "collected.csv"
    cli_main(["collect", "--results_root", str(result_root), "--out", str(csv_out)])
    rows = csv_out.read_text().strip().splitlines()
    assert len(rows) > 10  # header + (7 alphas + 3 bands) x 3 doc sides

    pv_out = tmp_path / "paper_values.txt"
    cli_main([
        "paper-values", "--results_root", str(result_root),
        "--out", str(pv_out), "--n_boot", "50",
    ])
    assert pv_out.exists() and pv_out.stat().st_size > 0

    figdir = tmp_path / "figs"
    cli_main(["plots", "--results_root", str(result_root), "--outdir", str(figdir)])
    assert any(figdir.iterdir())
