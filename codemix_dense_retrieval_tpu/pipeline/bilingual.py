"""Bilingual hub runners: combined two-language index, k=500 search,
raw -> max-collapsed runs.

Replaces `onepass_bilingual_hub.py` (#4) and
`onepass_bilingual_mix_hub_custom_lang.py` (#5): the combined index is a
manifest concat of the per-language stores (`DenseFlatIndex.merged`), not
a reconstruct loop; searches write ``<set>_raw.trec`` then collapse
``docid#lang`` by max score into ``<set>_base.trec``
(`onepass_bilingual_hub.py:594-611,123-138`) plus a per-set meta.json
(`:613-640`).
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from codemix_dense_retrieval_tpu.config import format_alpha
from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.trec import collapse_run_max, write_run
from codemix_dense_retrieval_tpu.pipeline.runs import run_vector_mix_search
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("bilingual")


def _write_set_meta(outdir: pathlib.Path, set_name: str, meta: Dict) -> None:
    (outdir / f"{set_name}_meta.json").write_text(json.dumps(meta, indent=2))


def run_bilingual_word_mix(
    hub_index: DenseFlatIndex,
    encoder,
    query_sets: Dict[str, List[Tuple[str, str]]],
    outdir,
    *,
    k: int = 500,
    batch_size: int = 64,
    query_block: int = 256,
    tag: str = "bilingual-onepass",
) -> Dict[str, pathlib.Path]:
    """Pre-encode all band sets, search the combined index, write raw and
    collapsed runs per set. Returns {set_name: collapsed run path}."""
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    # pre-encode all sets first (reference frees the model before cloning
    # the index to GPU, `:546-582`; here it just batches host work)
    encoded = {}
    for set_name, rows in query_sets.items():
        qids = [q for q, _ in rows]
        vecs = encoder.encode_queries([t for _, t in rows], batch_size=batch_size)
        encoded[set_name] = (qids, vecs)
    out: Dict[str, pathlib.Path] = {}
    for set_name, (qids, vecs) in encoded.items():
        vals, docids = hub_index.search(vecs, k, query_block=query_block)
        raw = outdir / f"{set_name}_raw.trec"
        base = outdir / f"{set_name}_base.trec"
        write_run(raw, qids, docids, vals, tag=tag, precision=6)
        collapse_run_max(raw, base, tag=tag)
        _write_set_meta(
            outdir,
            set_name,
            {
                "set": set_name,
                "num_queries": len(qids),
                "k": k,
                "index_count": hub_index.count,
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            },
        )
        out[set_name] = base
        log.info("bilingual run: %s -> %s", raw.name, base.name)
    return out


def run_bilingual_vector_mix(
    hub_index: DenseFlatIndex,
    qids: Sequence[str],
    primary_vecs: np.ndarray,
    secondary_vecs: np.ndarray,
    alphas: Sequence[float],
    outdir,
    *,
    k: int = 500,
    query_block: int = 1024,
    tag: str = "bilingual-onepass",
) -> Dict[float, pathlib.Path]:
    """Alpha sweep against the combined index; per alpha: raw run ->
    collapsed ``cm-alpha-<a>_base.trec`` + ``_meta.json``
    (`onepass_bilingual_mix_hub_custom_lang.py:901-996`)."""
    outdir = pathlib.Path(outdir)
    raw_runs = run_vector_mix_search(
        hub_index, qids, primary_vecs, secondary_vecs, alphas, outdir,
        k=k, query_block=query_block, tag=tag,
        run_prefix="cm-alpha-", write_meta=False,
    )
    out: Dict[float, pathlib.Path] = {}
    for alpha, raw_path in raw_runs.items():
        label = format_alpha(alpha)
        raw = raw_path.rename(outdir / f"cm-alpha-{label}_raw.trec")
        base = outdir / f"cm-alpha-{label}_base.trec"
        collapse_run_max(raw, base, tag=tag)
        (outdir / f"cm-alpha-{label}_meta.json").write_text(
            json.dumps(
                {
                    "alpha": alpha,
                    "num_queries": len(qids),
                    "k": k,
                    "index_count": hub_index.count,
                    "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
                },
                indent=2,
            )
        )
        out[alpha] = base
    return out
