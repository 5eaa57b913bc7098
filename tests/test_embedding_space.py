"""Analytic fixtures for the embedding-space analyzer."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.analysis.embedding_space import (
    abtt_remove_top_pcs,
    analyze_triplets,
    anisotropy,
    detect_outliers,
    gini_coefficient,
    hubness_stats,
    line_metrics,
    linear_reconstruction,
    train_language_probe,
    write_report,
)


def unit(x):
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


class TestLineMetrics:
    def test_exact_interpolation_known_r(self, rng):
        b, d = 20, 16
        en = rng.standard_normal((b, d))
        zh = rng.standard_normal((b, d))
        t = 0.3
        cm = en + t * (zh - en)
        r, delta, p, axis = line_metrics(en, zh, cm)
        np.testing.assert_allclose(r, t, atol=1e-10)
        np.testing.assert_allclose(delta, 0.0, atol=1e-9)
        np.testing.assert_allclose(axis, np.linalg.norm(zh - en, axis=1))

    def test_perpendicular_offset_measured(self, rng):
        d = 8
        en = np.zeros((1, d))
        zh = np.zeros((1, d)); zh[0, 0] = 2.0
        cm = np.zeros((1, d)); cm[0, 0] = 1.0; cm[0, 1] = 0.5  # mid + perp 0.5
        r, delta, p, axis = line_metrics(en, zh, cm)
        assert r[0] == pytest.approx(0.5)
        assert delta[0] == pytest.approx(0.5)

    def test_degenerate_axis_nan(self):
        e = np.ones((1, 4))
        r, delta, p, d = line_metrics(e, e, e)
        assert np.isnan(r[0]) and np.isnan(delta[0])


class TestLinearReconstruction:
    def test_exact_mix_recovered(self, rng):
        b, d = 10, 12
        en = rng.standard_normal((b, d))
        zh = rng.standard_normal((b, d))
        alpha_true = 0.7
        cm = alpha_true * en + (1 - alpha_true) * zh
        alpha, resid, r2 = linear_reconstruction(en, zh, cm)
        np.testing.assert_allclose(alpha, alpha_true, atol=1e-10)
        np.testing.assert_allclose(resid, 0.0, atol=1e-9)
        np.testing.assert_allclose(r2, 1.0, atol=1e-9)


class TestProbe:
    def test_separable_clusters(self, rng):
        d = 16
        en = rng.standard_normal((100, d)) + np.eye(d)[0] * 4
        zh = rng.standard_normal((100, d)) - np.eye(d)[0] * 4
        w, acc = train_language_probe(en, zh)
        assert acc > 0.95
        assert np.mean(en @ w) > np.mean(zh @ w)


class TestHubnessAnisotropy:
    def test_gini_uniform_vs_concentrated(self):
        assert gini_coefficient(np.ones(100)) == pytest.approx(0.0, abs=1e-9)
        conc = np.zeros(100); conc[0] = 100
        assert gini_coefficient(conc) > 0.9

    def test_hub_vector_raises_gini(self, rng):
        d = 16
        base = unit(rng.standard_normal((200, d)))
        hub = unit(rng.standard_normal(d))
        hubby = np.vstack([base * 0.2 + hub * 0.8, base])  # half the points near hub
        s1 = hubness_stats(unit(hubby), k=5, use_device=False)
        s2 = hubness_stats(base, k=5, use_device=False)
        assert s1["gini_indegree"] > s2["gini_indegree"]

    def test_device_and_numpy_hubness_agree(self, rng):
        emb = unit(rng.standard_normal((300, 16)))
        a = hubness_stats(emb, k=5, use_device=True)
        b = hubness_stats(emb, k=5, use_device=False)
        assert a["gini_indegree"] == pytest.approx(b["gini_indegree"], abs=0.05)

    def test_anisotropy_shifted_vs_centered(self, rng):
        centered = rng.standard_normal((500, 16))
        shifted = centered + 10.0
        a_c = anisotropy(centered, num_pairs=5000)
        a_s = anisotropy(shifted, num_pairs=5000)
        assert a_s["avg_random_cosine"] > 0.9
        assert abs(a_c["avg_random_cosine"]) < 0.2


class TestAbtt:
    def test_removes_dominant_direction(self, rng):
        d = 16
        dom = np.eye(d)[0]
        X = rng.standard_normal((200, d)) * 0.1 + np.outer(
            rng.standard_normal(200) * 5, dom
        )
        Xab, U = abtt_remove_top_pcs(X, 1)
        # dominant direction is (close to) the removed PC
        assert abs(np.dot(U[0], dom)) > 0.99
        assert np.abs(Xab @ dom).max() < 1.0


class TestOutliers:
    def test_masks(self):
        r = np.array([0.5, 0.5, 2.0])
        delta = np.array([0.1, 0.1, 5.0])
        cos_mid = np.array([0.99, 0.5, 0.99])
        out = detect_outliers(r, delta, cos_mid)
        assert list(out["delta_mad"]) == [False, False, True]
        assert list(out["low_cos_mid"]) == [False, True, False]
        assert list(out["r_out_of_band"]) == [False, False, True]


class TestFullAnalysis:
    def test_analyze_and_report(self, tmp_path, rng):
        b, d = 60, 24
        en = unit(rng.standard_normal((b, d)) + np.eye(d)[0] * 2)
        zh = unit(rng.standard_normal((b, d)) - np.eye(d)[0] * 2)
        cm = unit(0.5 * en + 0.5 * zh)
        res = analyze_triplets(en, zh, cm)
        s = res.summary()
        assert 0.3 < s["r_mean"] < 0.7  # mixes sit midway
        assert s["probe_accuracy"] > 0.9
        write_report(res, tmp_path / "analysis", qids=[f"q{i}" for i in range(b)])
        assert (tmp_path / "analysis" / "report.md").exists()
        assert (tmp_path / "analysis" / "hubness_stats.json").exists()
        assert (tmp_path / "analysis" / "anisotropy.json").exists()
        csv_lines = (tmp_path / "analysis" / "per_query_metrics.csv").read_text().splitlines()
        assert len(csv_lines) == b + 1


class TestProjection:
    def test_project_and_plot(self, tmp_path, rng):
        from codemix_dense_retrieval_tpu.analysis.embedding_space import (
            plot_projection,
            project_embeddings,
        )

        d = 16
        en = unit(rng.standard_normal((80, d)) + np.eye(d)[0] * 3)
        zh = unit(rng.standard_normal((80, d)) - np.eye(d)[0] * 3)
        cm = unit(0.5 * en + 0.5 * zh)
        proj = project_embeddings(en, zh, cm, method="pca")
        assert proj["en"].shape == (80, 2)
        # separable clusters should stay separated in the projection
        assert abs(proj["en"][:, 0].mean() - proj["zh"][:, 0].mean()) > 0.5
        plot_projection(proj, tmp_path / "proj.png")
        assert (tmp_path / "proj.png").stat().st_size > 1000

    def test_tsne_path(self, rng):
        from codemix_dense_retrieval_tpu.analysis.embedding_space import project_embeddings

        d = 8
        en = unit(rng.standard_normal((30, d)))
        zh = unit(rng.standard_normal((30, d)))
        cm = unit(en + zh)
        proj = project_embeddings(en, zh, cm, method="tsne")
        assert proj["cm"].shape == (30, 2)
