"""MaxSim late-interaction scoring (ColBERT-style multi-vector rerank).

Beyond-parity capability: BGE-M3 exposes a multi-vector (ColBERT) head in
addition to the dense CLS vector the reference uses. The standard serving
pattern is two-stage — dense recall with the flat index, then MaxSim
rerank of the top-k candidates:

    score(q, d) = sum_i max_j  q_i . d_j

This module provides the rerank stage: an XLA reference implementation
and a fused Pallas kernel that streams candidate token blocks through
VMEM with a running per-query-token max (never materializing the full
(Tq x Td) similarity matrix per pair in HBM).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def maxsim_scores_xla(
    q_tokens: jnp.ndarray,  # (B, Tq, d)
    q_mask: jnp.ndarray,  # (B, Tq) 1 = valid query token
    d_tokens: jnp.ndarray,  # (B, K, Td, d) candidate doc token embeddings
    d_mask: jnp.ndarray,  # (B, K, Td)
) -> jnp.ndarray:
    """Reference MaxSim: (B, K) scores."""
    sim = jnp.einsum(
        "bqd,bktd->bkqt", q_tokens, d_tokens, preferred_element_type=jnp.float32
    )
    sim = jnp.where(d_mask[:, :, None, :] > 0, sim, -jnp.inf)
    best = jnp.max(sim, axis=-1)  # (B, K, Tq)
    best = jnp.where(q_mask[:, None, :] > 0, best, 0.0)
    # candidates with no valid tokens score 0
    best = jnp.where(jnp.isfinite(best), best, 0.0)
    return best.sum(axis=-1)


def _maxsim_kernel(qm_ref, dm_ref, q_ref, d_ref, o_ref, *, chunk):
    """One (batch-row, candidate-chunk) program.

    Iterates over DOC-TOKEN slots, not candidates: each step is one
    (Tq, dim) x (chunk, dim)^T matmul scoring slot t of ALL chunk
    candidates at once, with a running per-(query-token, candidate) max.
    chunk >= Td in practice, so the static loop is shorter (smaller
    Mosaic programs, faster compiles) and each matmul is chunk-wide on
    the MXU; measured on-chip kernel time is comparable to the
    candidate-loop formulation, marginally faster at rerank shapes
    (A/B in BENCH_NOTES round 2 — the serving wall is the candidate
    transfer, not this kernel)."""
    q = q_ref[0].astype(jnp.float32)  # (Tq, dim)
    qmask = qm_ref[0, 0].astype(jnp.float32)  # (Tq,)
    td = d_ref.shape[1]  # d block is TOKEN-MAJOR: (1, Td, chunk, dim)
    # one in-VMEM transpose of the mask so the loop slices sublane rows,
    # not lane columns (lane slicing forced huge scoped-VMEM copies)
    dmask_t = dm_ref[0].astype(jnp.float32).T  # (Td, chunk)
    best = jnp.full((q.shape[0], chunk), -jnp.inf, jnp.float32)
    for t in range(td):  # static doc-token depth
        dt = d_ref[0, t].astype(jnp.float32)  # (chunk, dim) leading-axis slice
        sim = lax.dot_general(
            q, dt, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (Tq, chunk)
        sim = jnp.where(dmask_t[t][None, :] > 0, sim, -jnp.inf)
        best = jnp.maximum(best, sim)
    best = jnp.where((qmask[:, None] > 0) & jnp.isfinite(best), best, 0.0)
    # single vector store (scalar VMEM stores are not lowerable); chunk
    # rides the SECOND-to-last output dim (8-aligned) with a trailing
    # singleton, because Mosaic's last-dim rule would demand 128-aligned
    # chunks otherwise
    o_ref[0] = jnp.sum(best, axis=0)[:, None]


# VMEM budget for the candidate block (~half of the ~16MB/core VMEM,
# leaving room for the query block, similarity tile, and double buffering)
_MAXSIM_VMEM_BUDGET = 6 * 1024 * 1024


def _auto_candidate_chunk(k: int, td: int, dim: int, itemsize: int) -> int:
    """Largest chunk <= k whose (chunk, Td, dim) candidate block fits the
    VMEM budget (>= 1: a single candidate must always fit)."""
    per_cand = td * dim * itemsize
    chunk = max(1, min(k, _MAXSIM_VMEM_BUDGET // max(per_cand, 1)))
    # Mosaic sublane rule: the chunk is the second-to-last dim of the
    # mask/output blocks, so it must be 8-aligned (unless it covers the
    # whole padded candidate axis). 8 may overshoot the budget for huge
    # per-candidate blocks; VMEM headroom (~16MB/core vs the 6MB budget)
    # absorbs that.
    return chunk if chunk >= k else max(8, chunk - chunk % 8)


def maxsim_scores_pallas(
    q_tokens: jnp.ndarray,
    q_mask: jnp.ndarray,
    d_tokens: jnp.ndarray,
    d_mask: jnp.ndarray,
    *,
    candidate_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jnp.ndarray:
    """Fused MaxSim; grid = (B, K/chunk); each program streams one chunk of
    candidates' (Tq x Td) similarity tiles through VMEM and reduces them
    without an HBM round-trip. Rerank depth is NOT VMEM-bound: candidates
    are processed in chunks sized to the VMEM budget (``candidate_chunk``
    overrides the automatic choice). Candidates are padded to a chunk
    multiple with zero-mask rows, which score exactly 0 and are sliced off.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, tq, dim = q_tokens.shape
    _, k, td, _ = d_tokens.shape
    if candidate_chunk is None:
        candidate_chunk = _auto_candidate_chunk(k, td, dim, d_tokens.dtype.itemsize)
    chunk = max(1, min(candidate_chunk, k))
    if chunk < k:
        chunk = max(8, chunk - chunk % 8)  # sublane rule, see _auto_candidate_chunk
    k_pad = ((k + chunk - 1) // chunk) * chunk
    if k_pad != k:
        d_tokens = jnp.pad(d_tokens, ((0, 0), (0, k_pad - k), (0, 0), (0, 0)))
        d_mask = jnp.pad(d_mask, ((0, 0), (0, k_pad - k), (0, 0)))
    kernel = functools.partial(_maxsim_kernel, chunk=chunk)
    # Mosaic checks the LAST TWO dims of every block: 2-D operands with a
    # (1, X) block fail the sublane rule, so masks/output carry a singleton
    # middle axis making their trailing dims block-complete.
    out = pl.pallas_call(
        kernel,
        grid=(b, k_pad // chunk),
        in_specs=[
            pl.BlockSpec((1, 1, tq), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk, td), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, dim), lambda i, c: (i, 0, 0), memory_space=pltpu.VMEM),
            # candidate block TOKEN-MAJOR so the kernel's doc-token loop
            # takes leading-axis slices (cheap) instead of lane slices
            pl.BlockSpec(
                (1, td, chunk, dim), lambda i, c: (i, 0, c, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, chunk, 1), lambda i, c: (i, c, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k_pad, 1), jnp.float32),
        interpret=interpret,
    )(
        q_mask.astype(jnp.float32)[:, None, :],
        d_mask.astype(jnp.float32),
        q_tokens,
        d_tokens.transpose(0, 2, 1, 3),  # (B, Td, K, dim)
    )
    return out[:, :k, 0]


def maxsim_rerank(
    q_tokens: jnp.ndarray,
    q_mask: jnp.ndarray,
    d_tokens: jnp.ndarray,
    d_mask: jnp.ndarray,
    candidate_ids: jnp.ndarray,  # (B, K) global ids from the dense stage
    *,
    use_pallas: bool = True,
    candidate_chunk: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Rerank dense-stage candidates by MaxSim; returns (scores sorted desc,
    reordered candidate ids), ties broken by lower id."""
    if use_pallas:
        scores = maxsim_scores_pallas(
            q_tokens, q_mask, d_tokens, d_mask,
            candidate_chunk=candidate_chunk, interpret=interpret,
        )
    else:
        scores = maxsim_scores_xla(q_tokens, q_mask, d_tokens, d_mask)
    neg, ids = lax.sort((-scores, candidate_ids.astype(jnp.int32)), num_keys=2)
    return -neg, ids
