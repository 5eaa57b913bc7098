"""Typed configuration system.

Replaces the reference's three config tiers (argparse flags, env-var root
overrides, bash experiment matrices — see reference
`onepass_dense_mix_run_custom_lang.py:155-168`, `README.md:21-23`,
`run_all_vector_pairs.sh:11-18`) with one dataclass-based system that keeps
the env-var root overrides (``DATA_ROOT``, ``INDEX_ROOT``, ``RUN_ROOT``,
``RESULT_ROOT``, ``QUERY_CACHE_ROOT``, ``QRELS_CACHE``).
"""

from __future__ import annotations

import dataclasses
import json
import os
import pathlib
from dataclasses import dataclass, field
from typing import Any, Dict, Optional, Tuple


def _env_path(name: str, default: str) -> pathlib.Path:
    return pathlib.Path(os.environ.get(name, default)).expanduser()


@dataclass(frozen=True)
class Roots:
    """Filesystem roots, overridable by environment variables.

    Mirrors the env contract of the reference (`README.md:21-23`).
    """

    data: pathlib.Path = field(default_factory=lambda: _env_path("DATA_ROOT", "data"))
    index: pathlib.Path = field(default_factory=lambda: _env_path("INDEX_ROOT", "indexes"))
    run: pathlib.Path = field(default_factory=lambda: _env_path("RUN_ROOT", "runs"))
    result: pathlib.Path = field(default_factory=lambda: _env_path("RESULT_ROOT", "results"))
    query_cache: pathlib.Path = field(
        default_factory=lambda: _env_path("QUERY_CACHE_ROOT", "query_cache")
    )
    qrels_cache: pathlib.Path = field(
        default_factory=lambda: _env_path("QRELS_CACHE", "qrels_cache")
    )


@dataclass(frozen=True)
class MeshConfig:
    """TPU device-mesh layout.

    ``shard`` is the corpus-row sharding axis (the index's data-parallel
    axis); ``tp`` is tensor parallelism for large encoders (replaces the
    reference's accelerate ``device_map="auto"`` layer placement,
    `onepass_dense_run.py:202-213`).
    """

    shard: int = -1  # -1 = all available devices
    tp: int = 1
    axis_names: Tuple[str, str] = ("shard", "tp")


@dataclass(frozen=True)
class EncoderConfig:
    """Which encoder to run and how.

    ``name`` selects the family dialect (prompt prefixes / task kwargs),
    mirroring reference `onepass_dense_mix_run_custom_lang.py:34-58`.
    """

    name: str = "BAAI/bge-m3"
    checkpoint_dir: Optional[pathlib.Path] = None  # converted weights; None = random init
    max_length: int = 512
    batch_size: int = 256
    dtype: str = "bfloat16"
    pooling: str = "cls"  # cls | mean | last_token
    normalize: bool = True
    quantize: Optional[str] = None  # None | "int8"


@dataclass(frozen=True)
class IndexConfig:
    """Dense flat-IP index parameters (FAISS IndexFlatIP replacement)."""

    dim: int = 1024
    storage_dtype: str = "bfloat16"  # on-HBM/on-disk embedding dtype
    accum_dtype: str = "float32"  # in-kernel accumulation
    rows_per_shard_file: int = 1_000_000  # on-disk shard file granularity
    pad_multiple: int = 1024  # device shards padded to this many rows


@dataclass(frozen=True)
class SearchConfig:
    k: int = 100
    query_block: int = 1024  # queries per device dispatch
    doc_tile: int = 2048  # index rows per kernel tile


@dataclass(frozen=True)
class SelectionConfig:
    """Corpus subset-selection semantics (parity with reference
    `encode_multilingual_corpus.py:400-421`): relevant docids are always
    kept; non-relevant docids are sampled with probability ``neg_prob``
    until ``subset_neg_cap`` negatives are kept; languages after the first
    mirror the first language's selected docid set."""

    subset_neg_cap: int = 0  # 0 = keep everything
    neg_prob: float = 1.0
    seed: int = 42
    max_docs: int = 0  # 0 = unlimited


@dataclass(frozen=True)
class EvalConfig:
    metrics: Tuple[str, ...] = (
        "nDCG@1", "nDCG@3", "nDCG@5", "nDCG@10", "nDCG@100",
        "MRR@1", "MRR@3", "MRR@5", "MRR@10", "MRR@100",
        "P@1", "P@3", "P@5", "P@10", "P@100",
        "Recall@1", "Recall@3", "Recall@5", "Recall@10", "Recall@100",
        "AP", "MAP",
    )
    percent_scale: float = 100.0


@dataclass(frozen=True)
class ExperimentConfig:
    """Top-level config for one experiment run."""

    roots: Roots = field(default_factory=Roots)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    encoder: EncoderConfig = field(default_factory=EncoderConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
    search: SearchConfig = field(default_factory=SearchConfig)
    selection: SelectionConfig = field(default_factory=SelectionConfig)
    eval: EvalConfig = field(default_factory=EvalConfig)
    seed: int = 42

    def to_json(self) -> str:
        def _default(o: Any):
            if isinstance(o, pathlib.Path):
                return str(o)
            raise TypeError(f"not JSON serializable: {o!r}")

        return json.dumps(dataclasses.asdict(self), indent=2, default=_default)

    @classmethod
    def from_overrides(cls, overrides: Optional[Dict[str, Any]] = None) -> "ExperimentConfig":
        """Build a config from a flat dict of dotted overrides, e.g.
        ``{"search.k": 500, "encoder.name": "intfloat/multilingual-e5-large"}``."""
        cfg = cls()
        if not overrides:
            return cfg
        by_section: Dict[str, Dict[str, Any]] = {}
        top: Dict[str, Any] = {}
        for key, val in overrides.items():
            if "." in key:
                section, leaf = key.split(".", 1)
                by_section.setdefault(section, {})[leaf] = val
            else:
                top[key] = val
        kwargs: Dict[str, Any] = dict(top)
        for section, leaves in by_section.items():
            current = getattr(cfg, section)
            coerced = {}
            fields = {f.name: f for f in dataclasses.fields(type(current))}
            for leaf, val in leaves.items():
                if leaf not in fields:
                    raise KeyError(f"unknown config key {section}.{leaf}")
                coerced[leaf] = val
            kwargs[section] = dataclasses.replace(current, **coerced)
        return dataclasses.replace(cfg, **kwargs)


DEFAULT_ALPHAS: Tuple[float, ...] = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)

# The five word-mix bands shipped with the reference (`data/mmarco_dev/...`).
DEFAULT_BANDS: Tuple[str, ...] = ("0-20", "20-40", "40-60", "60-80", "80-100")


def format_alpha(alpha: float) -> str:
    """Canonical alpha label used in run filenames.

    Parity with reference `onepass_dense_mix_run_custom_lang.py:304-309`:
    integers render bare ("0", "1"), fractions render trimmed ("0.5").
    """
    if abs(alpha - round(alpha)) < 1e-8:
        return str(int(round(alpha)))
    text = f"{alpha:.4f}".rstrip("0").rstrip(".")
    return text if text else "0"
