"""Figure generation smoke tests (files exist, non-empty) covering every
reference figure family (`plot_diagram_2.py:79-1198`): delta hist, ratio
curves, lambda*, EN split, pair triad, typology scatter, headroom,
ablation dumbbells, model scale, projection panel, interactive 3D HTML."""

import numpy as np

from codemix_dense_retrieval_tpu.analysis.plots import (
    _model_size_b,
    generate_all,
    plot_ablation_dumbbells,
    plot_headroom,
    plot_model_scale,
    plot_pair_triad,
    plot_projection_panel,
    plot_typology_scatter,
    write_projection_html,
)


def _rows():
    rows = []
    for pair, side in (("EN-ZH", "chinese"), ("EN-ZH", "english"),
                       ("EN-ZH", "bilingual-en-zh"), ("AR-ZH", "arabic")):
        for mode in ("embed", "word"):
            for r in (0.0, 25.0, 50.0, 75.0, 100.0):
                rows.append({
                    "pair": pair, "doc_side": side, "mix_mode": mode,
                    "mix_ratio": r, "ndcg10": 25 + 5 * np.sin(r / 30),
                })
    return rows


def _summary():
    out = []
    for i, (pair, side, model) in enumerate([
        ("EN-ZH", "chinese", "qwen3-embedding-0.6b"),
        ("EN-ZH", "chinese", "qwen3-embedding-4b"),
        ("EN-ZH", "chinese", "qwen3-embedding-8b"),
        ("EN-ZH", "english", "bge-m3"),
        ("AR-ZH", "arabic", "bge-m3"),
        ("AR-ZH", "chinese", "bge-m3"),
    ]):
        out.append({
            "pair": pair, "doc_side": side, "model": model,
            "delta_ndcg": 1.0 - 0.3 * i, "lambda_star_mid": 50.0,
            "best_endpoint_ndcg": 25.0 + i, "best_mixed_ndcg": 26.0 + 0.8 * i,
            "lang2vec_knn": 0.33 if pair == "EN-ZH" else 0.41,
            "same_script": pair == "AR-ZH",
        })
    return out


def test_generate_all(tmp_path):
    paths = generate_all(_rows(), _summary(), tmp_path)
    assert len(paths) >= 16
    names = {p.stem for p in paths}
    for family in ("delta_hist", "lambda_star", "en_split", "triad_en_zh",
                   "typology_scatter", "headroom", "ablation_dumbbells",
                   "model_scale"):
        assert family in names, family
    for p in paths:
        assert p.exists() and p.stat().st_size > 500


def test_pair_triad_panels(tmp_path):
    paths = plot_pair_triad(_rows(), tmp_path, pair="EN-ZH")
    assert paths and all(p.exists() for p in paths)
    assert plot_pair_triad(_rows(), tmp_path, pair="XX-YY") == []


def test_typology_headroom_dumbbells_scale(tmp_path):
    s = _summary()
    assert plot_typology_scatter(s, tmp_path)
    assert plot_headroom(s, tmp_path)
    assert plot_ablation_dumbbells(s, tmp_path)
    assert plot_model_scale(s, tmp_path)
    # empty inputs -> no files, no crash
    assert plot_typology_scatter([], tmp_path) == []
    assert plot_model_scale([{"model": "bge-m3", "best_mixed_ndcg": 1.0}], tmp_path) == []


def test_model_size_parse():
    assert _model_size_b("qwen3-embedding-0.6b") == 0.6
    assert _model_size_b("Qwen3-Embedding-8B") == 8.0
    assert _model_size_b("bge-m3") is None


def test_projection_panel(tmp_path, rng):
    paths = plot_projection_panel(
        rng.standard_normal(100) + 2,
        rng.standard_normal(100) - 2,
        rng.standard_normal(100),
        tmp_path,
    )
    assert all(p.exists() for p in paths)


def test_projection_html(tmp_path, rng):
    pts = rng.standard_normal((90, 3))
    groups = [i % 3 for i in range(90)]
    out = write_projection_html(
        pts, groups, ["EN", "ZH", "CM"], tmp_path / "proj.html",
    )
    html = out.read_text()
    assert html.startswith("<!DOCTYPE html>")
    assert "EN" in html and "ZH" in html and "CM" in html
    # self-contained: all 90 points embedded, no external scripts
    assert html.count("[") >= 90
    assert "http" not in html.lower().replace("http-equiv", "")


def test_hub_examples_panel(tmp_path):
    """Per-doc-lang partner panel (reference `plot_diagram_2.py:182-320`):
    EN vs top-2 non-EN partner bars for each monolingual doc language."""
    from codemix_dense_retrieval_tpu.analysis.plots import plot_hub_examples

    summary = [
        {"pair": "EN-ZH", "doc_side": "chinese", "delta_ndcg": 1.7},
        {"pair": "AR-ZH", "doc_side": "chinese", "delta_ndcg": 0.9},
        {"pair": "ID-ZH", "doc_side": "chinese", "delta_ndcg": 1.1},
        {"pair": "ZH-RU", "doc_side": "chinese", "delta_ndcg": 0.5},
        {"pair": "EN-AR", "doc_side": "arabic", "delta_ndcg": 2.9},
        {"pair": "AR-ZH", "doc_side": "arabic", "delta_ndcg": 1.5},
        # bilingual + partnerless rows must be ignored
        {"pair": "EN-ZH", "doc_side": "bilingual-en-zh", "delta_ndcg": 0.3},
        {"pair": "DE-FR", "doc_side": "german", "delta_ndcg": 0.8},
    ]
    paths = plot_hub_examples(summary, tmp_path)
    assert paths and all(p.exists() and p.stat().st_size > 500 for p in paths)
    assert any(p.stem == "hub_examples" for p in paths)
    # no EN partner anywhere -> no figure
    assert plot_hub_examples(
        [{"pair": "DE-FR", "doc_side": "german", "delta_ndcg": 0.8}], tmp_path
    ) == []


def test_mono_alignment_curve(tmp_path):
    """Mono alignment curve (reference `plot_diagram_2.py:438-489`):
    p_doc pooling across mono settings, bilingual rows excluded."""
    from codemix_dense_retrieval_tpu.analysis.plots import (
        plot_mono_alignment_curve,
    )

    paths = plot_mono_alignment_curve(_rows(), tmp_path)
    assert paths and all(p.exists() and p.stat().st_size > 500 for p in paths)
    assert any(p.stem == "mono_alignment_curve" for p in paths)
    # bilingual-only rows -> no curve
    bi = [r for r in _rows() if str(r["doc_side"]).startswith("bilingual")]
    assert plot_mono_alignment_curve(bi, tmp_path / "none") == []


def test_generate_all_includes_new_families(tmp_path):
    paths = generate_all(_rows(), _summary(), tmp_path)
    names = {p.stem for p in paths}
    assert "mono_alignment_curve" in names
    # _summary has no EN-partner mono rows with EN... hub panel presence
    # depends on data; the dedicated test covers it
