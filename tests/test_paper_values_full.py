"""Full paper-values pipeline test: synthetic results tree -> collect ->
every report section of `calculate_paper_values.py` / `paper_values.txt`
(VERDICT round-1 item 7).

The tree is constructed so each headline is analytically known: four
pairs (EN-ZH, EN-AR, AR-ZH, HI-ZH) x three doc regimes each, vector-mix
alphas {0, 0.5, 1}, with EN-in-index deltas negative, EN-absent deltas
positive, EN the strongest partner everywhere, one EN-pair nuance
setting (delta nDCG < 0 but delta R@10 > 0), and all interior peaks at
lambda* = 50.
"""

import json
import math

import pytest

from codemix_dense_retrieval_tpu.analysis.collect import collect_results, compute_summary
from codemix_dense_retrieval_tpu.analysis import paper_values as PV

# (pair, doc_side_name) -> {alpha_pct: ndcg10}; lambda=0 is the pure-qa
# endpoint. recall10 = ndcg + 10 except the EN-ZH english-docs nuance row.
SETTINGS = {
    ("en", "zh", "english"): {0: 33.0, 50: 32.0, 100: 20.0},      # delta -1.0
    ("en", "zh", "chinese"): {0: 18.0, 50: 27.8, 100: 26.0},      # delta +1.8
    ("en", "zh", "bilingual"): {0: 33.5, 50: 33.0, 100: 26.5},    # delta -0.5
    ("en", "ar", "english"): {0: 33.0, 50: 32.5, 100: 19.0},      # delta -0.5
    ("en", "ar", "arabic"): {0: 17.0, 50: 26.9, 100: 24.0},       # delta +2.9
    ("en", "ar", "bilingual"): {0: 33.6, 50: 33.8, 100: 24.5},    # delta +0.2
    ("ar", "zh", "arabic"): {0: 24.0, 50: 24.8, 100: 15.0},       # delta +0.8
    ("ar", "zh", "chinese"): {0: 16.0, 50: 27.0, 100: 26.0},      # delta +1.0
    ("ar", "zh", "bilingual"): {0: 24.2, 50: 27.4, 100: 26.2},    # delta +1.2
    ("hi", "zh", "hindi"): {0: 22.0, 50: 22.5, 100: 14.0},        # delta +0.5
    ("hi", "zh", "chinese"): {0: 15.0, 50: 26.6, 100: 26.0},      # delta +0.6
    ("hi", "zh", "bilingual"): {0: 22.1, 50: 26.7, 100: 26.1},    # delta +0.6
}
# nuance: EN-ZH english docs loses on nDCG but gains on R@10
NUANCE_R10 = {("en", "zh", "english"): {0: 50.0, 50: 51.0, 100: 40.0}}


@pytest.fixture(scope="module")
def tree(tmp_path_factory):
    root = tmp_path_factory.mktemp("results")
    for (qa, qb, side), vals in SETTINGS.items():
        side_name = f"bilingual-{qa}-{qb}" if side == "bilingual" else side
        if side == "bilingual":
            dirname = f"mmarco-1000-bilingual-{qa}-{qb}-5bands-bge-m3"
        else:
            dirname = f"mmarco-1000-{side}-{qa}-{qb}-5bands-bge-m3"
        exp = root / dirname / "vector_mix"
        exp.mkdir(parents=True)
        for pct, ndcg in vals.items():
            alpha = {0: "0.0", 50: "0.5", 100: "1.0"}[pct]
            r10 = NUANCE_R10.get((qa, qb, side), {}).get(pct, ndcg + 10.0)
            (exp / f"cm-alpha-{alpha}_dev_20260101-000000-agg.json").write_text(
                json.dumps({
                    "nDCG@10": ndcg, "RR@10": ndcg - 2.0,
                    "R@10": r10, "R@100": r10 + 20.0, "AP": ndcg - 1.0,
                })
            )
        del side_name
    return root


@pytest.fixture(scope="module")
def collected(tree):
    rows = collect_results(tree)
    summary = compute_summary(rows)
    return rows, summary


class TestCollectedShape:
    def test_rows_and_summary_counts(self, collected):
        rows, summary = collected
        assert len(rows) == 12 * 3
        assert len(summary) == 12

    def test_deltas_by_construction(self, collected):
        _, summary = collected
        by_key = {(r["pair"], r["doc_side"]): r for r in summary}
        assert by_key[("EN-ZH", "english")]["delta_ndcg"] == pytest.approx(-1.0)
        assert by_key[("EN-AR", "arabic")]["delta_ndcg"] == pytest.approx(2.9)
        assert by_key[("AR-ZH", "bilingual-ar-zh")]["delta_ndcg"] == pytest.approx(1.2)


class TestReportSections:
    def test_input_coverage(self, collected):
        _, summary = collected
        cov = PV.input_coverage(summary)
        assert sorted(cov["valid_pairs"]) == ["AR-ZH", "EN-AR", "EN-ZH", "HI-ZH"]
        assert cov["missing_pairs"] == []

    def test_delta_distribution(self, collected):
        _, summary = collected
        dd = PV.delta_distribution(summary)
        assert dd["n_groups"] == 12
        assert dd["delta_max"] == pytest.approx(2.9)
        assert dd["delta_min"] == pytest.approx(-1.0)
        assert dd["n_positive"] == 9

    def test_en_split(self, collected):
        _, summary = collected
        split = PV.en_absent_split(summary)
        # EN in index: en docs x2, bilingual en-zh/en-ar -> 4 settings
        assert split["en_in_index"]["n"] == 4
        assert split["en_absent"]["n"] == 8
        assert split["en_absent"]["frac_positive"] == 1.0  # reference Finding 1

    def test_en_best_partner(self, collected):
        _, summary = collected
        ebp = PV.en_best_partner(summary)
        # doc langs with an EN partner: zh (en 1.8 vs ar 1.0, hi 0.6),
        # ar (en 2.9 vs zh 0.8)
        assert ebp["en_total"] == 2
        assert ebp["en_best"] == 2
        assert ebp["per_doc_lang"]["zh"]["en_delta"] == pytest.approx(1.8)
        assert ebp["per_doc_lang"]["zh"]["best_non_en"][0] == "ar"
        assert ebp["per_doc_lang"]["ar"]["en_is_best"] is True

    def test_bilingual_gains(self, collected):
        _, summary = collected
        gains = PV.bilingual_gains(summary)
        # EN-ZH: 33.0 - max(32.0, 27.8) = 1.0; EN-AR: 33.8 - 32.5 = 1.3
        assert gains["en_pairs"]["n"] == 2
        assert gains["en_pairs"]["mean"] == pytest.approx((1.0 + 1.3) / 2)
        # AR-ZH: 27.4 - max(24.8, 27.0) = 0.4; HI-ZH: 26.7 - 26.6 = 0.1
        assert gains["non_en_pairs"]["n"] == 2
        assert gains["non_en_pairs"]["gains_gt0"] == 2
        assert gains["non_en_pairs"]["gains_gt0p1"] == 1

    def test_endpoint_alignment(self, collected):
        rows, _ = collected
        align = PV.endpoint_alignment(rows)
        assert align["n"] == 8  # mono settings
        assert align["match_better"] == 8
        assert align["match_worse"] == 0 and align["missing"] == 0

    def test_peak_lambda_counts(self, collected):
        _, summary = collected
        assert PV.peak_lambda_counts(summary) == {50.0: 12}

    def test_metric_sweep_and_nuance(self, collected):
        rows, _ = collected
        sweep = PV.metric_delta_sweep(rows)
        pm = sweep["per_metric"]
        assert pm["ndcg10"]["n"] == 12
        assert pm["ndcg10"]["pos"] == 9 and pm["ndcg10"]["neg"] == 3
        # recall10 tracks ndcg except the nuance row (always +10 offset)
        assert pm["recall10"]["pos"] == 10
        # exactly the constructed nuance setting; EN pair + EN in index
        assert len(sweep["nuance_settings"]) == 1
        assert sweep["nuance_settings"][0][:2] == ("EN-ZH", "english")
        assert sweep["nuance_violations"] == []

    def test_headroom_spearman(self, collected):
        _, summary = collected
        hs = PV.headroom_spearman(summary)
        assert hs["all"]["n"] == 12
        assert -1.0 <= hs["all"]["rho"] <= 1.0
        assert hs["en_pairs"]["n"] == 6
        assert hs["en_absent_index"]["n"] == 8
        # high endpoints (EN settings) have low deltas here -> negative rho
        assert hs["all"]["rho"] < 0

    def test_language_factor_probes(self, collected):
        _, summary = collected
        probes = PV.language_factor_probes(summary, n_boot=200)
        # controlled subset: AR-ZH + HI-ZH mono rows
        assert probes["n_settings"] == 4
        assert probes["n_pairs"] == 2
        assert "typology_lang2vec" in probes
        rho = probes["typology_lang2vec"]["rho"]
        assert -1.0 <= rho <= 1.0
        assert "family_glot_tree" in probes
        assert "resource_eta2" in probes  # min_resource 4 (HI-ZH) vs 5 (AR-ZH)

    def test_full_report_renders_every_section(self, collected):
        rows, summary = collected
        text = PV.paper_values_report(summary, rows, n_boot=100)
        for section in (
            "Input coverage",
            "Global picture: delta distribution",
            "Finding 1: English in index split",
            "Finding 2: English as strongest partner",
            "Finding 4: Bilingual indexing gains",
            "Finding 3: Monolingual endpoint alignment",
            "Finding 3: Peak location counts",
            "Mixing effects across metrics",
            "EN-pair nuance",
            "Headroom effect",
            "Language factor probes",
        ):
            assert section in text, section
        assert "EN best among partners: 2/2" in text
        assert "Match endpoint better: 8, worse: 0" in text

    def test_omega_squared(self):
        # hand-checkable: two tight groups far apart -> omega^2 near 1
        g = {"a": [0.0, 0.1, -0.1], "b": [10.0, 10.1, 9.9]}
        w2 = PV.omega_squared(g)
        assert 0.9 < w2 <= 1.0
        assert math.isnan(PV.omega_squared({"a": [1.0]}))
