"""Monolingual search runners: word-mix band sets and vector-mix alpha
sweeps over a device-resident index.

Replaces the reference's `onepass_dense_run.py` (#2) and
`onepass_dense_mix_run_custom_lang.py` (#3): encode-or-load the index,
search one or many query sets (k=100 default), write one TREC run per
band / alpha, with the reference's filenames and line format.

The alpha sweep keeps the index HBM-resident across all alphas and mixes
on-device (`ops.mix.mix_and_renorm`) — amortizing what the reference pays
per alpha at `onepass_dense_mix_run_custom_lang.py:846-891`.
"""

from __future__ import annotations

import json
import pathlib
import time
from typing import Dict, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.config import format_alpha
from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.trec import write_run
from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm_jit
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("runs")


def run_word_mix_search(
    index: DenseFlatIndex,
    encoder,
    query_sets: Dict[str, List[Tuple[str, str]]],
    outdir,
    *,
    k: int = 100,
    batch_size: int = 64,
    query_block: int = 256,
    tag: str = "onepass",
    max_queries: int = 0,
    approx=False,
) -> Dict[str, pathlib.Path]:
    """Encode + search each band's query set; one ``<set>.trec`` per set
    (reference `onepass_dense_run.py:382-466`).

    ``approx``: search through the sketch tier (True = fast approximate,
    ``"guaranteed"`` = certificate-escalated, output provably identical
    to exact search)."""
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    out: Dict[str, pathlib.Path] = {}
    for set_name, rows in query_sets.items():
        if max_queries:
            rows = rows[:max_queries]
        qids = [q for q, _ in rows]
        texts = [t for _, t in rows]
        qvecs = encoder.encode_queries(texts, batch_size=batch_size)
        vals, docids = index.search(qvecs, k, query_block=query_block, approx=approx)
        run_path = outdir / f"{set_name}.trec"
        write_run(run_path, qids, docids, vals, tag=tag)
        out[set_name] = run_path
        if approx and index.last_certified is not None:
            (outdir / f"{set_name}_meta.json").write_text(json.dumps({
                "approx": str(approx),
                "certified_frac": float(index.last_certified.mean()),
                "num_queries": len(qids), "k": k,
            }, indent=2))
        log.info("run saved: %s (%d queries)", run_path, len(qids))
    return out


def run_vector_mix_search(
    index: DenseFlatIndex,
    qids: Sequence[str],
    primary_vecs: np.ndarray,
    secondary_vecs: np.ndarray,
    alphas: Sequence[float],
    outdir,
    *,
    k: int = 100,
    query_block: int = 1024,
    tag: str = "onepass-cm",
    run_prefix: str = "cm-alpha-",
    write_meta: bool = False,
    meta_extra: Optional[Dict] = None,
    precision: int = 4,
    approx=False,
    cert_out: Optional[Dict[float, float]] = None,
) -> Dict[float, pathlib.Path]:
    """Alpha-sweep search with on-device mix+renorm.

    ``primary_vecs``/``secondary_vecs`` are the two monolingual query
    embedding matrices over the SAME qid order (the qid intersection —
    reference `:765-768`). Writes ``cm-alpha-<label>.trec`` per alpha.
    """
    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    p = jnp.asarray(primary_vecs, jnp.float32)
    s = jnp.asarray(secondary_vecs, jnp.float32)
    out: Dict[float, pathlib.Path] = {}
    for alpha in alphas:
        label = format_alpha(alpha)
        q_matrix = np.asarray(mix_and_renorm_jit(p, s, float(alpha)))
        vals, docids = index.search(q_matrix, k, query_block=query_block, approx=approx)
        if cert_out is not None and index.last_certified is not None:
            # per-alpha certificate rate, captured INSIDE the loop (the
            # index only holds the most recent search's certificates)
            cert_out[alpha] = float(index.last_certified.mean())
        run_path = outdir / f"{run_prefix}{label}.trec"
        write_run(run_path, list(qids), docids, vals, tag=tag, precision=precision)
        out[alpha] = run_path
        if write_meta:
            meta = {
                "alpha": alpha,
                "num_queries": len(qids),
                "k": k,
                "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
            }
            if approx and index.last_certified is not None:
                meta["approx"] = str(approx)
                meta["certified_frac"] = float(index.last_certified.mean())
            meta.update(meta_extra or {})
            (outdir / f"{run_prefix}{label}_meta.json").write_text(json.dumps(meta, indent=2))
        log.info("run saved: %s (%d queries, alpha=%s)", run_path, len(qids), label)
    return out


def intersect_query_sets(
    primary: Sequence[Tuple[str, str]], secondary: Sequence[Tuple[str, str]]
) -> Tuple[List[str], List[str], List[str]]:
    """qid intersection preserving primary order (reference `:737-774`).
    Returns (common_qids, primary_texts, secondary_texts)."""
    sec = dict(secondary)
    qids, p_texts, s_texts = [], [], []
    for qid, text in primary:
        if qid in sec:
            qids.append(qid)
            p_texts.append(text)
            s_texts.append(sec[qid])
    return qids, p_texts, s_texts
