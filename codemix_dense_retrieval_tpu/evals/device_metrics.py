"""On-device IR metrics (jnp) for the fused search+eval path.

The reference computes metrics host-side through pytrec_eval
(`evaluate.py:298,312`); the fused TPU pipeline scores its top-k output
on-device so an alpha-band sweep never leaves HBM (BASELINE.json north
star: "MRR@10/recall@k scoring executes on-device").

Relevance is provided densely: ``rel_ids`` (B, R) int32 global row ids
padded with -1 (binary relevance — mMARCO qrels are binary). Metrics
match the host evaluator (`evals.metrics`) on binary qrels; the host
path remains the source of truth for graded relevance and CI stats.
"""

from __future__ import annotations

from typing import Dict, Sequence

import jax.numpy as jnp
import numpy as np


def build_rel_matrix(rel_rows: Sequence[Sequence[int]], pad: int = -1) -> np.ndarray:
    """Ragged per-query relevant row-id lists -> (B, R) int32 padded."""
    width = max((len(r) for r in rel_rows), default=1) or 1
    out = np.full((len(rel_rows), width), pad, dtype=np.int32)
    for i, row in enumerate(rel_rows):
        out[i, : len(row)] = list(row)
    return out


def topk_metrics(
    topk_ids: jnp.ndarray,  # (B, k) int32 global row ids
    rel_ids: jnp.ndarray,  # (B, R) int32, -1 padded
    cutoffs: Sequence[int] = (1, 3, 5, 10, 100),
    extra_zero_queries: int = 0,
) -> Dict[str, jnp.ndarray]:
    """Binary-relevance MRR/recall/precision/nDCG at the given cutoffs.

    Returns scalars, values in 0..1 (callers scale x100 for the
    reference's percent convention). Aggregation matches the host
    evaluator (`evals.metrics.aggregate`): the mean runs over JUDGED
    queries — rows with no valid rel id (unjudged queries in the run)
    are excluded from the denominator, and ``extra_zero_queries`` adds
    qrels queries absent from the run (they contribute zeros on the
    host path).
    """
    b, k = topk_ids.shape
    valid_rel = rel_ids >= 0  # (B, R)
    num_rel = valid_rel.sum(axis=1)  # (B,)
    judged = (num_rel > 0).astype(jnp.float32)  # (B,)
    denom = jnp.maximum(judged.sum() + extra_zero_queries, 1.0)

    def agg(per_query: jnp.ndarray) -> jnp.ndarray:
        return (per_query * judged).sum() / denom

    hits = jnp.any(
        (topk_ids[:, :, None] == rel_ids[:, None, :]) & valid_rel[:, None, :], axis=-1
    )  # (B, k) bool
    ranks = jnp.arange(1, k + 1, dtype=jnp.float32)[None, :]  # (1, k)

    out: Dict[str, jnp.ndarray] = {}
    hits_f = hits.astype(jnp.float32)
    # reciprocal rank of first hit (inf when none)
    first_rank = jnp.min(jnp.where(hits, ranks, jnp.inf), axis=1)  # (B,)
    discounts = 1.0 / jnp.log2(ranks + 1.0)  # (1, k)
    csum = jnp.cumsum(hits_f, axis=1)  # hits within prefix
    dcg_prefix = jnp.cumsum(hits_f * discounts, axis=1)  # (B, k)
    # ideal DCG runs over the FULL cutoff horizon, not the k retrieved:
    # nDCG@c with num_rel > k must divide by sum of min(num_rel, c)
    # discounts (host parity) even though only k docs were retrieved
    c_max = max(max(cutoffs), k)
    ideal_prefix = jnp.cumsum(
        1.0 / jnp.log2(jnp.arange(1, c_max + 1, dtype=jnp.float32) + 1.0)
    )  # (c_max,) ideal dcg for j rels

    for c in cutoffs:
        c_eff = min(c, k)
        rr = jnp.where(first_rank <= c_eff, 1.0 / first_rank, 0.0)
        out[f"RR@{c}"] = agg(rr)
        hits_at_c = csum[:, c_eff - 1]
        out[f"P@{c}"] = agg(hits_at_c / c)
        recall = jnp.where(num_rel > 0, hits_at_c / jnp.maximum(num_rel, 1), 0.0)
        out[f"R@{c}"] = agg(recall)
        # binary nDCG@c: ideal = sum of first min(num_rel, c) discounts
        ideal_n = jnp.clip(num_rel, 0, c)
        idcg = jnp.where(ideal_n > 0, ideal_prefix[jnp.maximum(ideal_n - 1, 0)], 0.0)
        ndcg = jnp.where(idcg > 0, dcg_prefix[:, c_eff - 1] / idcg, 0.0)
        out[f"nDCG@{c}"] = agg(ndcg)
    # AP over the k-truncated ranking (exact when k >= num docs retrieved)
    prec_at_rank = csum / ranks
    ap = (prec_at_rank * hits_f).sum(axis=1) / jnp.maximum(num_rel, 1)
    out["AP"] = agg(jnp.where(num_rel > 0, ap, 0.0))
    return out
