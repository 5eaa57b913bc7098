import json
import pathlib

from codemix_dense_retrieval_tpu.config import ExperimentConfig, Roots


def test_defaults_serialize():
    cfg = ExperimentConfig()
    d = json.loads(cfg.to_json())
    assert d["search"]["k"] == 100
    assert d["index"]["storage_dtype"] == "bfloat16"


def test_env_root_overrides(monkeypatch):
    monkeypatch.setenv("INDEX_ROOT", "/tmp/my_indexes")
    roots = Roots()
    assert roots.index == pathlib.Path("/tmp/my_indexes")


def test_dotted_overrides():
    cfg = ExperimentConfig.from_overrides({"search.k": 500, "encoder.name": "x/y", "seed": 7})
    assert cfg.search.k == 500
    assert cfg.encoder.name == "x/y"
    assert cfg.seed == 7
    # untouched sections keep defaults
    assert cfg.index.dim == 1024


def test_unknown_override_raises():
    import pytest

    with pytest.raises(KeyError):
        ExperimentConfig.from_overrides({"search.nonexistent": 1})
