"""Sweep-plan builder tests."""

import json

from codemix_dense_retrieval_tpu.orchestrate.plans import (
    BILINGUAL_PAIRS_DEFAULT,
    build_all_pairs_plan,
    build_en_zh_repro_plan,
    mono_jobs_for_pairs,
    vector_mix_job,
    write_plan,
)
from codemix_dense_retrieval_tpu.orchestrate.scheduler import load_plan


def test_default_matrix_sizes():
    assert len(BILINGUAL_PAIRS_DEFAULT) == 35
    assert len(mono_jobs_for_pairs()) == 70


def test_full_plan_job_count_and_loadable(tmp_path):
    plan = build_all_pairs_plan(
        index_root="/idx", query_tsv_root="/q", result_root="/r",
        qrels="/qrels.tsv",
    )
    assert len(plan["jobs"]) == 105
    path = write_plan(plan, tmp_path / "plan.json")
    jobs = load_plan(path)
    assert len(jobs) == 105
    names = [j.name for j in jobs]
    assert len(set(names)) == 105  # unique job names


def test_vector_mix_job_shape():
    job = vector_mix_job(
        doc_side="zh", lang_a="en", lang_b="zh", index_root="/idx",
        query_tsv_a="/q/queries.en.tsv", query_tsv_b="/q/queries.zh.tsv",
        result_root="/r", qrels="/qrels.tsv", alphas=(0.0, 0.5, 1.0),
    )
    assert job["argv"][0] == "run-mix"
    assert "mmarco-8841823-chinese-en-zh-5bands-bge-m3" in job["outdir"]
    assert "cm-alpha-0.5.trec" in job["expected"]
    assert any("agg.json" in e for e in job["expected"])
    assert len(job["eval_after"]) == 3


def test_bilingual_job_uses_base_runs():
    job = vector_mix_job(
        doc_side="bilingual", lang_a="en", lang_b="zh", index_root="/idx",
        query_tsv_a="/a.tsv", query_tsv_b="/b.tsv", result_root="/r",
        alphas=(0.5,),
    )
    assert job["argv"][0] == "run-bilingual-mix"
    assert job["expected"] == ["cm-alpha-0.5_base.trec"]


def test_en_zh_repro_plan(tmp_path):
    plan = build_en_zh_repro_plan(
        index_root="/idx", query_tsv_en="/en.tsv", query_tsv_zh="/zh.tsv",
        band_dir="/bands", result_root="/r",
    )
    names = [j["name"] for j in plan["jobs"]]
    assert len(plan["jobs"]) == 6
    assert sum("wordmix" in n for n in names) == 3
    assert sum("vecmix" in n for n in names) == 3


def test_ablation_plan():
    from codemix_dense_retrieval_tpu.orchestrate.plans import (
        ABLATION_MODELS,
        CORE_MODELS,
        SIZE_MODELS,
        build_ablation_plan,
    )

    roots = {m: f"/idx/{m}" for m in ABLATION_MODELS}
    plan = build_ablation_plan(
        index_root_by_model=roots, query_tsv_root="/q", result_root="/r",
    )
    names = [j["name"] for j in plan["jobs"]]
    assert len(names) == len(set(names))
    # core models: 6 composition + dedup(hub 2 + 13 high-signal) + 1 script
    per_core = 6 + len({(d, a, b) for d, a, b in
                        (("zh","id","zh"),("de","de","en"))} |
                       set()) + 13 + 1 - 2  # two hub jobs duplicate high-signal entries
    core_jobs = [n for n in names if any(m in n for m in ["me5", "gte", "jina"])]
    assert len(plan["jobs"]) > 50
    # size block only for qwen models
    size_jobs = [n for n in names if n.startswith("abl-size-")]
    assert len(size_jobs) == 3 * 5 - 5  # qwen3-0.6B size pairs dedup against composition? no: different model keys


def test_enc_batch_overrides(monkeypatch):
    from codemix_dense_retrieval_tpu.orchestrate.plans import enc_batch_for, get_override

    assert enc_batch_for("qwen3-embedding-8B") == 32
    assert enc_batch_for("unknown-model") == 256
    monkeypatch.setenv("ENC_BATCH_QWEN3_EMBEDDING_8B", "16")
    assert enc_batch_for("qwen3-embedding-8B") == 16
    monkeypatch.setenv("FOO_BAR_BAZ", "7")
    assert get_override("FOO", "bar-baz", 3) == 7


def test_rerank_job_mono_and_bilingual(tmp_path):
    from codemix_dense_retrieval_tpu.orchestrate.plans import rerank_job

    j = rerank_job(
        doc_langs=["zh"], queries="/data/bands", index_root="/idx",
        result_root=str(tmp_path), qrels="/q.tsv", k=100, k_dense=400,
        query_cache_root="/cache",
    )
    assert j["argv"][0] == "run-rerank"
    assert "/idx/zh" in j["argv"]
    assert "--k_dense" in j["argv"] and "400" in j["argv"]
    assert "--query_cache" in j["argv"]
    assert "cm0.trec" in j["expected"]
    assert len(j["eval_after"]) == 5

    jb = rerank_job(
        doc_langs=["en", "zh"], queries="/data/bands", index_root="/idx",
        result_root=str(tmp_path), k=500,
    )
    assert "/idx/en" in jb["argv"] and "/idx/zh" in jb["argv"]
    assert "cm0_base.trec" in jb["expected"]  # collapsed bilingual runs
    assert "--query_cache" not in jb["argv"]
