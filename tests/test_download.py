"""Query downloader tests (datasets mocked — no network)."""

import sys
import types

import pytest

from codemix_dense_retrieval_tpu.io.tsv import read_queries_tsv


def test_download_mmarco_queries(tmp_path, monkeypatch):
    calls = []

    def fake_load_dataset(repo, cfg, split, streaming):
        calls.append((repo, cfg, split, streaming))
        return [
            {"id": 30, "text": "third"},
            {"id": 4, "text": "fourth"},
            {"id": 100, "text": "hundredth"},
        ]

    fake_datasets = types.ModuleType("datasets")
    fake_datasets.load_dataset = fake_load_dataset
    monkeypatch.setitem(sys.modules, "datasets", fake_datasets)

    from codemix_dense_retrieval_tpu.datagen.download import download_mmarco_queries

    out = download_mmarco_queries(["english", "chinese"], tmp_path)
    assert set(out) == {"english", "chinese"}
    assert (tmp_path / "queries.en.tsv").exists()
    assert (tmp_path / "queries.zh.tsv").exists()
    rows = read_queries_tsv(tmp_path / "queries.en.tsv")
    # numeric qid sort
    assert [q for q, _ in rows] == ["4", "30", "100"]
    assert calls[0] == ("unicamp-dl/mmarco", "queries-english", "dev", True)
