"""Per-query bootstrap CI in the collector summary."""

import json

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.analysis.collect import (
    bootstrap_delta_ci,
    collect_results,
    compute_summary,
)


def test_bootstrap_ci_brackets_true_delta(rng):
    qids = [f"q{i}" for i in range(200)]
    endpoint = {q: float(rng.normal(50, 10)) for q in qids}
    interior = {q: endpoint[q] + float(rng.normal(2.0, 3.0)) for q in qids}
    ci = bootstrap_delta_ci(endpoint, interior, n_boot=500, seed=0)
    assert ci is not None
    assert ci["delta_ndcg_ci95_low"] < 2.0 < ci["delta_ndcg_ci95_high"]
    assert ci["delta_ndcg_ci90_low"] >= ci["delta_ndcg_ci95_low"]


def test_bootstrap_ci_none_when_disjoint():
    assert bootstrap_delta_ci({"a": 1.0}, {"b": 2.0}) is None


def _write_eval(dirpath, stem, ndcg, perquery):
    (dirpath / f"{stem}_dev_20260101-000000-agg.json").write_text(
        json.dumps({"nDCG@10": ndcg})
    )
    lines = ["qid,nDCG@10"] + [f"{q},{v}" for q, v in perquery.items()]
    (dirpath / f"{stem}_dev_20260101-000000-perquery.csv").write_text("\n".join(lines))


def test_summary_gets_ci_from_perquery_files(tmp_path, rng):
    exp = tmp_path / "mmarco-1000-chinese-en-zh-5bands-bge-m3" / "vector_mix"
    exp.mkdir(parents=True)
    qids = [f"q{i}" for i in range(50)]
    base = {q: float(rng.normal(30, 5)) for q in qids}
    _write_eval(exp, "cm-alpha-0", np.mean(list(base.values())), base)
    mid = {q: base[q] + 3.0 for q in qids}
    _write_eval(exp, "cm-alpha-0.5", np.mean(list(mid.values())), mid)
    _write_eval(exp, "cm-alpha-1", np.mean(list(base.values())) - 1, base)

    rows = collect_results(tmp_path)
    assert any("perquery" in r for r in rows)
    summary = compute_summary(rows)
    s = summary[0]
    assert s["delta_ndcg"] == pytest.approx(3.0, abs=1e-6)
    assert "delta_ndcg_ci95_low" in s
    # constant +3 shift -> CI degenerates around 3
    assert abs(s["delta_ndcg_ci95_low"] - 3.0) < 0.2
    assert abs(s["delta_ndcg_ci95_high"] - 3.0) < 0.2


def test_pair_factors_in_summary(tmp_path):
    exp = tmp_path / "mmarco-1000-chinese-en-zh-5bands-bge-m3" / "vector_mix"
    exp.mkdir(parents=True)
    for alpha, ndcg in [("0", 30.0), ("0.5", 32.0), ("1", 28.0)]:
        (exp / f"cm-alpha-{alpha}_dev_20260101-000000-agg.json").write_text(
            json.dumps({"nDCG@10": ndcg})
        )
    rows = collect_results(tmp_path)
    summary = compute_summary(rows)
    s = summary[0]
    assert s["same_script"] is False  # latin vs han
    assert s["lang2vec_knn"] == 0.3316  # published EN-ZH distance
    assert s["glot_tree"] == 1.0


def test_pair_factors_direct():
    from codemix_dense_retrieval_tpu.analysis.lang_factors import pair_factors

    f = pair_factors("DE-NL")
    assert f["same_script"] is True and f["same_family"] is True
    assert f["lang2vec_knn"] == 0.0849
    # order-insensitive
    assert pair_factors("NL-DE")["lang2vec_knn"] == 0.0849
    assert pair_factors("XX-YY") == {}
