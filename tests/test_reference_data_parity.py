"""Validation against the reference's shipped data files (skipped when the
reference checkout is absent). These tests prove the host-side contracts
read the REAL artifacts, and that the script-aware mix counter agrees with
the banding of the GPT-generated code-mix data."""

import pathlib

import numpy as np
import pytest

REF = pathlib.Path("/root/reference")
BANDS_DIR = REF / "data" / "mmarco_dev" / "queries_cm_5_bands_5-mini"

pytestmark = pytest.mark.skipif(not REF.exists(), reason="reference checkout not present")


def test_band_tsvs_parse():
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv

    rows = read_queries_tsv(BANDS_DIR / "queries-cm40-60.tsv")
    assert len(rows) > 100
    qid, text = rows[0]
    assert qid.isdigit() and len(text) > 0


def test_qids_common_subset_of_all_bands():
    from codemix_dense_retrieval_tpu.io.tsv import read_id_list, read_queries_tsv

    common = set(read_id_list(BANDS_DIR / "qids-common.tsv"))
    assert len(common) > 100
    for band in ("0-20", "20-40", "40-60", "60-80", "80-100"):
        qids = {q for q, _ in read_queries_tsv(BANDS_DIR / f"queries-cm{band}.tsv")}
        assert common <= qids


def test_mix_counter_agrees_with_band_labels():
    """The generated bands were measured with Stanza+langid; our
    script-aware counter must place the bulk of each band's queries inside
    (or near) the labelled range."""
    from codemix_dense_retrieval_tpu.datagen.mix_count import mix_ratio
    from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv

    for lo, hi in [(0, 20), (40, 60), (80, 100)]:
        rows = read_queries_tsv(BANDS_DIR / f"queries-cm{lo}-{hi}.tsv")[:300]
        ratios = [mix_ratio(text) for _, text in rows]
        ratios = [r for r in ratios if r is not None]
        in_band = np.mean([(lo - 10) <= r <= (hi + 10) for r in ratios])
        assert in_band > 0.8, f"band {lo}-{hi}: only {in_band:.0%} within ±10"


def test_reference_agg_json_readable_by_collector():
    from codemix_dense_retrieval_tpu.analysis.collect import collect_results

    tree = REF / "results" / "repro_en_zh_example"
    rows = collect_results(tree)
    assert len(rows) >= 15  # 3 experiment dirs x bands/alphas
    by_mode = {r["mix_mode"] for r in rows}
    assert by_mode == {"word", "embed"}
    # the documented headline: bilingual cm0 nDCG@10 == 85.04 (BASELINE.md)
    cm0 = [
        r for r in rows
        if r["doc_side"] == "bilingual-en-zh" and r["run"].startswith("cm0_")
    ]
    assert cm0 and abs(cm0[0]["ndcg10"] - 85.0417) < 0.01


def test_analyzer_artifact_schema_matches_shipped_example():
    """Our embedding-space analyzer must emit the reference's artifact
    key sets (cm_analysis_dev_5_bge-m3/{hubness_stats,anisotropy}.json),
    so downstream consumers of the shipped example work unchanged."""
    import json
    import pathlib

    import numpy as np

    from codemix_dense_retrieval_tpu.analysis.embedding_space import (
        anisotropy,
        hubness_stats,
    )

    ref = pathlib.Path("/root/reference/cm_analysis_dev_5_bge-m3")
    if not ref.exists():
        import pytest

        pytest.skip("reference checkout not present")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((128, 16)).astype(np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    ref_hub = set(json.loads((ref / "hubness_stats.json").read_text()))
    assert ref_hub <= set(hubness_stats(x, k=5, use_device=False))
    ref_ani = set(json.loads((ref / "anisotropy.json").read_text()))
    assert ref_ani <= set(anisotropy(x, num_pairs=200))
