"""Ablation collector tests."""

import json

import pytest

from codemix_dense_retrieval_tpu.analysis.ablation import (
    collect_ablation_results,
    compute_ablation_summary,
    parse_ablation_dirname,
)


class TestParse:
    def test_bilingual_with_block(self):
        info = parse_ablation_dirname("mmarco-100000-bilingual-en-zh-hub-5bands-me5")
        assert info["exp_type"] == "bilingual"
        assert info["q1"] == "en" and info["q2"] == "zh"
        assert info["block"] == "hub"
        assert info["model"] == "me5"
        assert info["doc_lang"] == "en-zh"

    def test_mono_with_block(self):
        info = parse_ablation_dirname("mmarco-100000-mono-zh-en-zh-composition-5bands-bge-m3")
        assert info["exp_type"] == "mono"
        assert info["doc_lang"] == "zh"
        assert info["q1"] == "en" and info["q2"] == "zh"
        assert info["block"] == "composition"
        assert info["model"] == "bge-m3"

    def test_rN_suffix_stripped(self):
        a = parse_ablation_dirname("mmarco-100000-bilingual-en-zh-hub-5bands-me5-r2")
        b = parse_ablation_dirname("mmarco-100000-bilingual-en-zh-hub-5bands-me5")
        assert a == b

    def test_invalid(self):
        assert parse_ablation_dirname("nonsense") is None
        assert parse_ablation_dirname("a-b-c") is None


class TestCollect:
    def test_collect_and_summary(self, tmp_path):
        exp = tmp_path / "mmarco-100000-mono-zh-en-zh-size-5bands-qwen3-0.6b" / "vector_mix"
        exp.mkdir(parents=True)
        for alpha, ndcg in [("0", 20.0), ("0.5", 26.0), ("1", 22.0)]:
            (exp / f"cm-alpha-{alpha}_dev_20260101-000000-agg.json").write_text(
                json.dumps({"nDCG@10": ndcg})
            )
        rows = collect_ablation_results(tmp_path)
        assert len(rows) == 3
        assert rows[0]["block"] == "size"
        assert rows[0]["model"] == "qwen3-0.6b"
        summary = compute_ablation_summary(rows)
        assert len(summary) == 1
        s = summary[0]
        assert s["model"] == "qwen3-0.6b" and s["block"] == "size"
        assert s["delta_ndcg"] == pytest.approx(4.0)
