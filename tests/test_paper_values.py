"""Statistics-calculator tests vs scipy oracles."""

import math

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.analysis.paper_values import (
    anova_f,
    cluster_bootstrap_stats,
    delta_distribution,
    en_absent_split,
    eta_squared,
    paper_values_report,
    peak_lambda_counts,
    perm_anova,
    perm_mean_diff,
    perm_spearman,
    quantile,
    spearman_rho,
)


class TestStatOracles:
    def test_spearman_vs_scipy(self, rng):
        from scipy import stats

        x = rng.standard_normal(40).tolist()
        y = (np.asarray(x) * 2 + rng.standard_normal(40)).tolist()
        ours = spearman_rho(x, y)
        theirs = stats.spearmanr(x, y).statistic
        assert ours == pytest.approx(theirs, abs=1e-10)

    def test_spearman_with_ties(self):
        from scipy import stats

        x = [1, 2, 2, 3, 4, 4, 4]
        y = [2, 1, 4, 4, 5, 7, 6]
        assert spearman_rho(x, y) == pytest.approx(stats.spearmanr(x, y).statistic, abs=1e-10)

    def test_anova_f_vs_scipy(self, rng):
        from scipy import stats

        groups = {
            "a": rng.standard_normal(20).tolist(),
            "b": (rng.standard_normal(25) + 0.5).tolist(),
            "c": (rng.standard_normal(15) - 0.2).tolist(),
        }
        ours = anova_f(groups)
        theirs = stats.f_oneway(*groups.values()).statistic
        assert ours == pytest.approx(theirs, abs=1e-10)

    def test_perm_mean_diff_detects_effect(self, rng):
        groups = {
            "a": (rng.standard_normal(50) + 2.0).tolist(),
            "b": rng.standard_normal(50).tolist(),
        }
        obs, p = perm_mean_diff(groups, n_perm=500, seed=1)
        assert obs == pytest.approx(2.0, abs=0.6)
        assert p < 0.01

    def test_perm_mean_diff_null(self):
        # own deterministic rng: the session rng's state depends on test
        # order, and a null test needs a known-null sample
        local = np.random.default_rng(2)
        groups = {"a": local.standard_normal(40).tolist(), "b": local.standard_normal(40).tolist()}
        _, p = perm_mean_diff(groups, n_perm=500, seed=1)
        assert p > 0.05

    def test_perm_spearman_signal(self, rng):
        x = list(range(30))
        y = [v + rng.standard_normal() * 2 for v in x]
        rho, p = perm_spearman(x, y, n_perm=300, seed=0)
        assert rho > 0.8 and p < 0.01

    def test_perm_anova_runs(self, rng):
        groups = {
            "a": (rng.standard_normal(15) + 1).tolist(),
            "b": rng.standard_normal(15).tolist(),
            "c": (rng.standard_normal(15) - 1).tolist(),
        }
        f, p = perm_anova(groups, n_perm=300, seed=0)
        assert f > 1 and p < 0.05

    def test_eta_squared_bounds(self, rng):
        same = {"a": [1.0, 1.0], "b": [1.0, 1.0]}
        assert math.isnan(eta_squared(same))  # zero total variance
        groups = {"a": [0.0, 0.1], "b": [10.0, 10.1]}
        assert eta_squared(groups) > 0.95

    def test_quantile_matches_numpy(self, rng):
        vals = sorted(rng.standard_normal(37).tolist())
        for q in (0.025, 0.5, 0.975):
            assert quantile(vals, q) == pytest.approx(np.quantile(vals, q), abs=1e-12)

    def test_cluster_bootstrap_brackets_mean(self, rng):
        clusters = {
            f"c{i}": (rng.standard_normal(5) + 3.0).tolist() for i in range(20)
        }
        obs, lo, hi, n = cluster_bootstrap_stats(
            clusters, lambda rs: float(np.mean(rs)), n_boot=300, seed=0
        )
        assert lo < obs < hi
        assert obs == pytest.approx(3.0, abs=0.5)
        assert n == 300


class TestHeadlineReport:
    ROWS = [
        {"delta_ndcg": 1.0, "lambda_star_mid": 50.0, "doc_side": "chinese"},
        {"delta_ndcg": -0.5, "lambda_star_mid": 25.0, "doc_side": "english"},
        {"delta_ndcg": 2.0, "lambda_star_mid": 50.0, "doc_side": "bilingual-en-zh"},
        {"delta_ndcg": 0.7, "lambda_star_mid": 75.0, "doc_side": "arabic"},
    ]

    def test_delta_distribution(self):
        dd = delta_distribution(self.ROWS)
        assert dd["n_groups"] == 4
        assert dd["n_positive"] == 3
        assert dd["delta_max"] == 2.0
        assert dd["delta_mean"] == pytest.approx(0.8)

    def test_en_absent_split(self):
        split = en_absent_split(self.ROWS)
        assert split["en_in_index"]["n"] == 2  # english + bilingual-en-zh
        assert split["en_absent"]["n"] == 2  # chinese + arabic
        assert split["en_absent"]["frac_positive"] == 1.0

    def test_peak_lambda_counts(self):
        counts = peak_lambda_counts(self.ROWS)
        assert counts == {25.0: 1, 50.0: 2, 75.0: 1}

    def test_report_renders(self):
        text = paper_values_report(self.ROWS)
        assert "delta > 0 in 3/4 groups" in text
        assert "50%:2" in text
