"""On-device bilingual collapse-max.

The host path (`io.trec.collapse_run_max` + C++ fast path) collapses
``docid#lang`` duplicates after writing the raw run. For the FUSED
bilingual pipeline, this op performs the same max-score collapse on the
top-k tensors directly (SURVEY §7 step 6: "collapse-max as an on-device
segment-max"), so the alpha sweep + collapse + metrics never leave HBM.

Applicability: hub indexes whose two language stores are PARALLEL corpora
(mirrored docid sets in the same stream order — what ``encode_corpus``'s
mirror mode produces), so base identity is ``gid mod n_first``.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp
from jax import lax

NEG_INF = float(-3.4e38)


def collapse_topk_parallel_hub(
    vals: jnp.ndarray,  # (B, k) scores, descending
    gids: jnp.ndarray,  # (B, k) global row ids in the concat hub index
    n_first: int,  # rows of the first language store
    k_out: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Collapse per-query results by base id = gid % n_first, keeping the
    max score per base, re-ranked by (score desc, base asc). Slots past
    the number of distinct bases come back with score -inf and id -1.
    """
    base = jnp.where(gids >= n_first, gids - n_first, gids)
    # sort by (base asc, -val asc) so the max-score entry of each base
    # group comes first
    b_sorted, negv_sorted = lax.sort((base, -vals.astype(jnp.float32)), num_keys=2)
    # mark non-first entries of each base group as duplicates
    dup = jnp.concatenate(
        [
            jnp.zeros((base.shape[0], 1), bool),
            b_sorted[:, 1:] == b_sorted[:, :-1],
        ],
        axis=1,
    )
    v_kept = jnp.where(dup, NEG_INF, -negv_sorted)
    b_kept = jnp.where(dup, jnp.int32(2**30), b_sorted)
    # final order: score desc, base asc
    neg2, base_out = lax.sort((-v_kept, b_kept), num_keys=2)
    vals_out = -neg2[:, :k_out]
    ids_out = jnp.where(vals_out <= NEG_INF / 2, -1, base_out[:, :k_out])
    return vals_out, ids_out
