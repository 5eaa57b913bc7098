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
    approx=False,
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
        vals, docids = hub_index.search(
            vecs, k, query_block=query_block, approx=approx
        )
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
                **(
                    {"approx": str(approx),
                     "certified_frac": float(hub_index.last_certified.mean())}
                    if approx and hub_index.last_certified is not None else {}
                ),
            },
        )
        out[set_name] = base
        log.info("bilingual run: %s -> %s", raw.name, base.name)
    return out


def validate_parallel_hub(hub_index: DenseFlatIndex) -> int:
    """Check the hub is a PARALLEL two-language concat (mirrored base
    docids, equal counts) and return ``n_first`` — the precondition for
    the on-device ``base = gid mod n_first`` collapse (`ops.collapse`)."""
    docids = hub_index.store.docids
    n = len(docids)
    if n % 2:
        raise ValueError(
            f"fused bilingual collapse needs a parallel 2-language hub; "
            f"index has odd row count {n}"
        )
    n_first = n // 2
    if docids[:n_first] != docids[n_first:]:
        raise ValueError(
            "fused bilingual collapse needs mirrored base docids "
            "(language stores encoded over the same docid stream); "
            "the two halves of the hub differ"
        )
    return n_first


def run_bilingual_vector_mix_fused(
    hub_index: DenseFlatIndex,
    qids: Sequence[str],
    primary_vecs: np.ndarray,
    secondary_vecs: np.ndarray,
    alphas: Sequence[float],
    outdir,
    *,
    k: int = 500,
    qrels: Optional[Dict[str, Dict[str, int]]] = None,
    tag: str = "bilingual-onepass",
    approx: bool = False,
) -> Tuple[Dict[float, pathlib.Path], Optional[Dict[str, Dict[str, float]]]]:
    """ONE-JIT bilingual alpha sweep: mix -> sharded raw search (2k deep)
    -> on-device max-collapse to k base ids -> optional on-device metrics.

    The flagship fused path (`pipeline.fused.fused_alpha_sweep` with
    ``collapse_n_first``): the hub index stays HBM-resident across the
    whole sweep; the host receives only (A, B, k) collapsed ids. Output
    artifacts match :func:`run_bilingual_vector_mix`'s collapsed runs
    (``cm-alpha-<a>_base.trec`` + ``_meta.json``); raw runs are never
    materialized on host.

    ``approx=True`` (``--fused --approx fast``) routes every alpha's raw
    search through the sketch tier inside the same jit; per-alpha
    certified fractions land in ``_meta.json`` (a certified raw top
    collapses to the exact collapsed top, so the certificate survives
    the collapse). ``approx="guaranteed"`` additionally escalates every
    uncertified (alpha, query) pair through the exact path outside the
    jit — output byte-identical to the exact fused sweep.
    """
    from codemix_dense_retrieval_tpu.pipeline.fused import fused_alpha_sweep

    outdir = pathlib.Path(outdir)
    outdir.mkdir(parents=True, exist_ok=True)
    n_first = validate_parallel_hub(hub_index)
    base_docids = np.asarray(hub_index.store.docids[:n_first], dtype=object)
    if hub_index._docs_dev is None:
        hub_index.to_device()

    rel_matrix = None
    extra_zero = 0
    if qrels is not None:
        from codemix_dense_retrieval_tpu.evals.device_metrics import build_rel_matrix

        # docids absent from the hub are dropped — the reference's
        # subset-eval convention (`evaluate.py:268-276` filter_docids)
        row_of = {d: i for i, d in enumerate(base_docids)}
        rel_matrix = build_rel_matrix([
            [row_of[d] for d, r in qrels.get(qid, {}).items()
             if r > 0 and d in row_of]
            for qid in qids
        ])
        # host-evaluator denominator parity: qrels queries (with >=1
        # indexed relevant doc) that are NOT in the run count as zeros
        run_qids = set(qids)
        extra_zero = sum(
            1 for qid, judged in qrels.items()
            if qid not in run_qids
            and any(r > 0 and d in row_of for d, r in judged.items())
        )

    sketch = None
    if approx == "adaptive":
        raise ValueError(
            "the fused sweep does not support approx='adaptive' (the "
            "probed-exact escalation is host-driven); use 'guaranteed' "
            "for exact output or the unfused path"
        )
    if approx:
        if hub_index._sketch is None:
            hub_index.enable_sketch()
        sketch = hub_index._sketch
    if approx == "guaranteed":
        from codemix_dense_retrieval_tpu.pipeline.fused import (
            fused_alpha_sweep_guaranteed,
        )

        vals, ids, metrics, cert = fused_alpha_sweep_guaranteed(
            primary_vecs, secondary_vecs, list(alphas),
            hub_index._docs_dev, hub_index._counts_dev, k,
            mesh=hub_index.mesh, sketch=sketch, rel_ids=rel_matrix,
            metric_extra_zero_queries=extra_zero,
            search_kwargs=hub_index.search_kwargs,
            collapse_n_first=n_first,
        )
    else:
        vals, ids, metrics, cert = fused_alpha_sweep(
            primary_vecs, secondary_vecs, list(alphas),
            hub_index._docs_dev, hub_index._counts_dev, k,
            mesh=hub_index.mesh, rel_ids=rel_matrix,
            metric_extra_zero_queries=extra_zero,
            search_kwargs=hub_index.search_kwargs,
            collapse_n_first=n_first,
            sketch=sketch,
        )
    vals_np, ids_np = np.asarray(vals), np.asarray(ids)
    out: Dict[float, pathlib.Path] = {}
    metric_out: Optional[Dict[str, Dict[str, float]]] = {} if metrics else None
    for ai, alpha in enumerate(alphas):
        label = format_alpha(alpha)
        base = outdir / f"cm-alpha-{label}_base.trec"
        gid = ids_np[ai]
        if (gid >= 0).all():
            write_run(base, qids, base_docids[gid], vals_np[ai], tag=tag, precision=6)
        else:
            # -1 slots (fewer distinct bases than k) are padding, not hits
            from codemix_dense_retrieval_tpu.io.trec import RunEntry, write_run_entries

            entries = []
            for qi, qid in enumerate(qids):
                rank = 0
                for j in range(gid.shape[1]):
                    if gid[qi, j] < 0:
                        break
                    rank += 1
                    entries.append(RunEntry(
                        qid, str(base_docids[gid[qi, j]]), rank,
                        float(vals_np[ai, qi, j]), tag,
                    ))
            write_run_entries(base, entries)
        meta = {
            "alpha": alpha,
            "num_queries": len(qids),
            "k": k,
            # the depth ACTUALLY searched: fused_alpha_sweep clamps the
            # 2k raw depth to the count / shard capacity, and the
            # certificate semantics below are over the clamped depth
            "k_raw": min(2 * k, hub_index.count, hub_index._rows_per_shard),
            "fused": True,
            "index_count": hub_index.count,
            "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        }
        if cert is not None:
            meta["approx"] = approx if isinstance(approx, str) else "fast"
            meta["certified_frac"] = round(float(np.asarray(cert)[ai].mean()), 4)
        (outdir / f"cm-alpha-{label}_meta.json").write_text(
            json.dumps(meta, indent=2)
        )
        out[alpha] = base
        if metrics:
            metric_out[label] = {
                name: round(float(v[ai]) * 100, 4) for name, v in metrics.items()
            }
    return out, metric_out


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
    approx=False,
) -> Dict[float, pathlib.Path]:
    """Alpha sweep against the combined index; per alpha: raw run ->
    collapsed ``cm-alpha-<a>_base.trec`` + ``_meta.json``
    (`onepass_bilingual_mix_hub_custom_lang.py:901-996`)."""
    outdir = pathlib.Path(outdir)
    cert_by_alpha: Dict[float, float] = {}
    raw_runs = run_vector_mix_search(
        hub_index, qids, primary_vecs, secondary_vecs, alphas, outdir,
        k=k, query_block=query_block, tag=tag, approx=approx,
        cert_out=cert_by_alpha,
        run_prefix="cm-alpha-", write_meta=False,
        # collapse parity needs the 6-decimal convention: 4-decimal
        # truncation manufactures ties that reorder the collapsed run
        precision=6,
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
                    **(
                        {"approx": str(approx),
                         "certified_frac": cert_by_alpha[alpha]}
                        if approx and alpha in cert_by_alpha
                        else {}
                    ),
                },
                indent=2,
            )
        )
        out[alpha] = base
    return out
