"""Figure generation smoke tests (files exist, non-empty)."""

import numpy as np

from codemix_dense_retrieval_tpu.analysis.plots import (
    generate_all,
    plot_projection_panel,
)


def test_generate_all(tmp_path, rng):
    rows = [
        {"pair": "EN-ZH", "doc_side": "chinese", "mix_mode": "embed",
         "mix_ratio": r, "ndcg10": 25 + 5 * np.sin(r / 30)}
        for r in (0.0, 25.0, 50.0, 75.0, 100.0)
    ]
    summary = [
        {"delta_ndcg": d, "lambda_star_mid": l, "doc_side": s}
        for d, l, s in [(1.0, 50.0, "chinese"), (-0.2, 25.0, "english"), (0.7, 50.0, "arabic")]
    ]
    paths = generate_all(rows, summary, tmp_path)
    assert len(paths) >= 8
    for p in paths:
        assert p.exists() and p.stat().st_size > 500


def test_projection_panel(tmp_path, rng):
    paths = plot_projection_panel(
        rng.standard_normal(100) + 2,
        rng.standard_normal(100) - 2,
        rng.standard_normal(100),
        tmp_path,
    )
    assert all(p.exists() for p in paths)
