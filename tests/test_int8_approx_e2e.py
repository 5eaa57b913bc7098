"""End-to-end CLI: int8 index + certified sketch tier (r4).

encode-corpus --storage_dtype int8 -> run-mix --approx guaranteed ->
evaluate, all through the public CLI surface — the quantized-index
analog of the reference's bitsandbytes + FAISS flow
(`onepass_dense_run.py:177-187` + `onepass_dense_mix_run_custom_lang.py`).
Guaranteed mode must produce byte-identical TREC output to the exact
int8 run.
"""

import pathlib

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.cli import main as cli_main


@pytest.fixture
def corpus_tree(tmp_path):
    rows = [f"{i}\tpassage number {i} tok{i % 7} tok{i % 11}" for i in range(300)]
    (tmp_path / "c.tsv").write_text("\n".join(rows) + "\n")
    (tmp_path / "q.en.tsv").write_text("\n".join(
        f"q{i}\tpassage number {7 * i} tok{(7 * i) % 7}" for i in range(6)) + "\n")
    (tmp_path / "q.zh.tsv").write_text("\n".join(
        f"q{i}\tpassage number {7 * i + 1} tok{(7 * i + 1) % 7}" for i in range(6)) + "\n")
    (tmp_path / "qrels.tsv").write_text("\n".join(
        f"q{i}\t{7 * i}#en\t1" for i in range(6)) + "\n")
    return tmp_path


def test_int8_index_guaranteed_run_and_eval(corpus_tree):
    t = corpus_tree
    cli_main([
        "encode-corpus", "--corpus_tsv", f"en={t/'c.tsv'}",
        "--out", str(t / "idx"), "--storage_dtype", "int8",
        "--smoke_dim", "32",
    ])

    def run(outdir, extra):
        cli_main([
            "run-mix", "--index", str(t / "idx" / "en"),
            "--query_tsv", f"en={t/'q.en.tsv'}", f"zh={t/'q.zh.tsv'}",
            "--cm_alphas", "0", "0.5", "1",
            "--outdir", str(t / outdir), "--smoke_dim", "32", "--k", "10",
            *extra,
        ])
        return {
            p.name: p.read_text()
            for p in sorted((t / outdir).glob("cm-alpha-*.trec"))
        }

    exact = run("runs-exact", [])
    guar = run("runs-guar", ["--approx", "guaranteed"])
    assert set(exact) == set(guar) and len(exact) == 3
    # guaranteed over int8 is byte-identical to the exact int8 run
    for name in exact:
        assert exact[name] == guar[name], name

    cli_main([
        "evaluate", "--dataset", "mmarco",
        "--run", str(t / "runs-guar" / "cm-alpha-0.trec"),
        "--qrels", str(t / "qrels.tsv"), "--outdir", str(t / "runs-guar"),
    ])
    aggs = list((t / "runs-guar").glob("cm-alpha-0_*-agg.json"))
    assert aggs, "evaluation wrote no agg.json"

    # the collector surfaces the approx audit trail (certified_frac from
    # the per-run meta) in its native schema
    from codemix_dense_retrieval_tpu.analysis.collect import collect_results

    tree = t / "results" / "mmarco-300-english-en-zh-5bands-bge-m3" / "vector_mix"
    tree.mkdir(parents=True)
    for p in (t / "runs-guar").iterdir():
        (tree / p.name).write_bytes(p.read_bytes())
    rows = collect_results(t / "results")
    assert rows, "collector found no rows"
    assert rows[0]["certified_frac"] == 1.0  # guaranteed => all certified
    assert rows[0]["approx"] == "guaranteed"
