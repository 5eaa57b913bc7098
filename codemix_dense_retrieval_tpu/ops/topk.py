"""Exact inner-product top-k over a dense embedding shard.

This is the TPU-native replacement for FAISS ``IndexFlatIP.search``
(reference `onepass_dense_run.py:305`, `encode_multilingual_corpus.py:367`).
FAISS does a brute-force GEMM + heap-select on CUDA; the idiomatic TPU
design is different:

**The bin-max cover algorithm (exact).** ``lax.top_k`` over an (B, N)
score matrix is sort-dominated for N in the millions (measured ~35x the
matmul cost on v5e). Instead:

1. *Fused pass* — one kernel computes the score tile ``Q @ D_tile^T``
   (MXU, f32 accumulation) and reduces it to per-bin maxima (bins of ``G``
   consecutive rows), writing both the score matrix and the tiny
   ``(B, N/G)`` bin-max matrix. Implemented both as a Pallas kernel
   (`_bin_scores_pallas`) and as plain XLA (`_bin_scores_xla`).
2. *Cover selection* — ``lax.top_k`` over the bin maxima picks ``k`` bins
   per query. **Exactness**: for any true top-k element x in bin b, every
   bin ranked above b either has max > score(x) — and so contains one of
   the at-most-(k-1) elements strictly greater than x — or ties b's max
   with a lower bin id, contributing an element that also outranks x
   under the (score desc, id asc) order. Hence at most k-1 bins rank
   above b, so b is among the selected k bins and x is in the candidate
   set. (Ties included: ``lax.top_k`` prefers lower indices, matching the
   id-ascending tie-break.)
3. *Candidate select* — gather the k*G candidate scores and pick the
   final top-k by the lexicographic key (score desc, id asc) via a
   two-key ``lax.sort``. Deterministic tie-break parity with FAISS
   (lower id wins).

Cost: the sort shrinks from N to N/G + k*G elements per query; HBM
traffic is one D read + one score write per query block. k-selection is
no longer the bottleneck — the kernel runs at matmul/HBM speed.
"""

from __future__ import annotations

import functools
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = float(np.finfo(np.float32).min)


#: smallest shard (rows) where tile_b=1024 two-level programs compile on
#: the remote TPU compiler — below this every tb1024 config (any bin
#: size) dies with "exceeded scoped vmem limit" (probe_vmem_boundary,
#: bench_logs/r4i: fails at 131072/262144/524288, passes at 1.1M).
#: Set to the verified-PASSING row count, not the nearest power of two:
#: the [2^20, 1.1M) gap was never probed (advisor r4 finding).
_TILE_B_1024_MIN_ROWS = 1_100_000


def _tuned_tile_b(k: int, n_rows: int, default=None) -> int:
    """Per-depth tuned tile_b, gated by shard size: tuned values > 512
    only apply at >= _TILE_B_1024_MIN_ROWS rows (probe_vmem_boundary
    r4i: every tb1024 program scoped-vmem-OOMs the remote compiler at
    <= 524288 rows, any bin size, while 1.1M compiles fine)."""
    from codemix_dense_retrieval_tpu.utils.autotune import get_tuned

    tile_b = int(get_tuned("topk.tile_b", k=k, default=default))
    if tile_b > 512 and n_rows < _TILE_B_1024_MIN_ROWS:
        return 512
    return tile_b


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m



def _auto_bin_size(k: int) -> int:
    """Default bin size: candidates scale as k*G, so deeper k favors
    smaller bins (measured on v5e: G=16 best at k=100, G=8 best at k>=500)."""
    return 8 if k > 200 else 16


def _auto_bin_size_two_level(k: int) -> int:
    """Two-level-cover bin size, tunable per depth (``tune`` persists
    ``topk.bin_size.k<k>``). The slice-gather tail is issue-bound (cost ~
    slice COUNT = k, not volume), so larger G halves the super-top_k
    domain at unchanged gather cost — but also doubles the final top_k's
    candidate domain; the winner is chip- and depth-specific (G8 was the
    r3 winner at k=1000; G16's lane-legality fallback only exists since
    r4s3, so it was never in that race)."""
    from codemix_dense_retrieval_tpu.utils.autotune import get_tuned

    return int(get_tuned("topk.bin_size", k=k, default=8))

# --------------------------------------------------------------------------
# numpy oracle (tests only)
# --------------------------------------------------------------------------

def _prep_shard(
    k: int,
    n_valid,
    tile_b: int,
    tile_n: int,
    interpret,
    doc_arrays,
    query_arrays,
    chunk: Optional[int] = None,
):
    """Shared entry-point boilerplate for the binned kernels: the
    ``k > n_valid`` fail-fast, the interpret default, padding every doc
    array's row axis to the (lcm of tile and two-level ``chunk``) tile,
    and padding every query array's batch axis to ``tile_b``.

    Returns ``(doc_arrays, query_arrays, n_valid, eff_tile_b, b, b_pad,
    interpret)`` with ``b`` the ORIGINAL batch (callers slice outputs
    back to it when ``b_pad != b``).
    """
    n_rows = doc_arrays[0].shape[0]
    if n_valid is None:
        n_valid = n_rows
    if isinstance(n_valid, int) and k > n_valid:
        raise ValueError(f"k={k} > num docs {n_valid}")
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    lcm_tile = tile_n
    if chunk is not None and tile_n % chunk != 0:
        lcm_tile = tile_n * chunk // math.gcd(tile_n, chunk)
    n_pad = _ceil_to(n_rows, lcm_tile)
    if n_pad != n_rows:
        doc_arrays = [
            jnp.pad(a, [(0, n_pad - n_rows)] + [(0, 0)] * (a.ndim - 1))
            for a in doc_arrays
        ]
        if isinstance(n_valid, int):
            n_valid = min(n_valid, n_rows)
    b = query_arrays[0].shape[0]
    if b <= tile_b:
        # single query block == full array dim; pad tiny batches to the
        # 8-sublane tile — Mosaic rejects a degenerate (1, dim) q tile
        # ('vector.broadcast' element-type verification error at B=1)
        eff_tile_b = b_pad = _ceil_to(b, 8)
    else:
        eff_tile_b = tile_b
        b_pad = _ceil_to(b, tile_b)
    if b_pad != b:
        query_arrays = [
            jnp.pad(a, [(0, b_pad - b)] + [(0, 0)] * (a.ndim - 1))
            for a in query_arrays
        ]
    return doc_arrays, query_arrays, n_valid, eff_tile_b, b, b_pad, interpret


# Rescore working-set budget (bytes). The candidate gather materializes
# (chunk, kb*bin_size, d) doc rows PLUS an f32 broadcast the size of the
# score operands (XLA lowers the batched GEMV as a fused multiply-reduce
# and remats a full f32 copy of one operand): at b=1024, probe=416,
# d=1024 that is 6.5 G gathered + 13 G broadcast — a live OOM on a
# 16 G-HBM chip (bench_logs/r4s3/guaranteed_quick). Chunking the query
# axis through ``lax.map`` bounds the peak regardless of how far a
# calibration run pushes ``probe_bins``. Tests monkeypatch the budget.
_RESCORE_BUDGET = 2 << 30


def _rescore_chunk(b: int, kb: int, bin_size: int, d: int, itemsize: int) -> int:
    """Largest divisor of ``b`` whose rescore working set fits the budget
    (per query: the gathered rows + one f32-sized operand copy + scores)."""
    c = kb * bin_size
    per_q = c * d * (itemsize + 4) + c * 16
    chunk = max(1, min(b, _RESCORE_BUDGET // max(per_q, 1)))
    while b % chunk:
        chunk -= 1
    return chunk


def _rescore_block(docs, queries, bin_ids, bin_size, n_valid, k):
    b, kb = bin_ids.shape
    cand_idx = (
        bin_ids[:, :, None] * bin_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    cand_rows = jnp.take(docs, cand_idx.reshape(-1), axis=0).reshape(
        b, kb * bin_size, docs.shape[1]
    )
    cand_scores = jnp.einsum(
        "bcd,bd->bc", cand_rows, queries, preferred_element_type=jnp.float32
    )
    cand_scores = jnp.where(cand_idx < n_valid, cand_scores, NEG_INF)
    vals, pos = lax.top_k(cand_scores, k)
    return vals, jnp.take_along_axis(cand_idx, pos, axis=1)


def _rescore_candidates(
    docs: jnp.ndarray,
    queries: jnp.ndarray,
    bin_ids: jnp.ndarray,  # (B, kb), sorted ascending
    bin_size: int,
    n_valid,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared rescore tail: expand covered bins to candidate row ids,
    gather those DOC ROWS (contiguous G-row slices), recompute their
    scores with a batched MXU contraction, mask pad rows, final top_k.
    Ties break to the lower id because ``bin_ids`` arrive sorted
    ascending (``lax.top_k``'s lower-position preference).

    Memory-bounded: query chunks run sequentially under ``lax.map`` when
    the candidate working set would exceed ``_RESCORE_BUDGET`` (deep k or
    a calibration-inflated probe) — each chunk is HBM-bound streaming, so
    serializing chunks costs nothing while capping peak HBM."""
    b, kb = bin_ids.shape
    chunk = _rescore_chunk(
        b, kb, bin_size, docs.shape[1], jnp.dtype(docs.dtype).itemsize
    )
    if chunk < b:
        vals, idx = lax.map(
            lambda args: _rescore_block(docs, args[1], args[0], bin_size, n_valid, k),
            (
                bin_ids.reshape(b // chunk, chunk, kb),
                queries.reshape(b // chunk, chunk, queries.shape[1]),
            ),
        )
        return vals.reshape(b, k), idx.reshape(b, k)
    return _rescore_block(docs, queries, bin_ids, bin_size, n_valid, k)


def _rescore_candidates_int8(
    d_vals: jnp.ndarray,  # (N, d) int8
    d_scales: jnp.ndarray,  # (N,) f32
    q_vals: jnp.ndarray,  # (B, d) int8
    q_scales: jnp.ndarray,  # (B,) f32
    bin_ids: jnp.ndarray,  # (B, kb), sorted ascending
    bin_size: int,
    n_valid,
    k: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Int8 rescore tail (sketch refine over a quantized index): int8 x
    int8 -> int32 accumulation (EXACT), then the same ``(acc * d_scale) *
    q_scale`` f32 rescale order as the fused int8 kernel
    (:func:`_bin_scores_pallas_int8_kernel`) so refined scores match the
    exact int8 path bit-for-bit. Gathered candidate rows cost 1 byte per
    element — half the bf16 rescore's HBM gather volume. Query-chunked
    under the same ``_RESCORE_BUDGET`` as the float rescore."""
    b, kb = bin_ids.shape
    chunk = _rescore_chunk(b, kb, bin_size, d_vals.shape[1], 1)
    if chunk < b:
        vals, idx = lax.map(
            lambda args: _rescore_int8_block(
                d_vals, d_scales, args[1], args[2], args[0], bin_size, n_valid, k
            ),
            (
                bin_ids.reshape(b // chunk, chunk, kb),
                q_vals.reshape(b // chunk, chunk, q_vals.shape[1]),
                q_scales.reshape(b // chunk, chunk),
            ),
        )
        return vals.reshape(b, k), idx.reshape(b, k)
    return _rescore_int8_block(
        d_vals, d_scales, q_vals, q_scales, bin_ids, bin_size, n_valid, k
    )


def _rescore_int8_block(
    d_vals, d_scales, q_vals, q_scales, bin_ids, bin_size, n_valid, k
):
    b, kb = bin_ids.shape
    cand_idx = (
        bin_ids[:, :, None] * bin_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    flat = cand_idx.reshape(-1)
    cand_rows = jnp.take(d_vals, flat, axis=0).reshape(
        b, kb * bin_size, d_vals.shape[1]
    )
    cand_sc = jnp.take(d_scales, flat, axis=0).reshape(b, kb * bin_size)
    acc = jnp.einsum(
        "bcd,bd->bc", cand_rows, q_vals, preferred_element_type=jnp.int32
    )
    cand_scores = acc.astype(jnp.float32) * cand_sc * q_scales[:, None]
    cand_scores = jnp.where(cand_idx < n_valid, cand_scores, NEG_INF)
    vals, pos = lax.top_k(cand_scores, k)
    return vals, jnp.take_along_axis(cand_idx, pos, axis=1)


def topk_ip_oracle(queries: np.ndarray, docs: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
    """Exact reference: f32 matmul + (score desc, id asc) argsort."""
    scores = queries.astype(np.float32) @ docs.astype(np.float32).T
    n = docs.shape[0]
    order = np.lexsort((np.arange(n)[None, :].repeat(len(queries), 0), -scores), axis=1)
    idx = order[:, :k]
    vals = np.take_along_axis(scores, idx, axis=1)
    return vals, idx.astype(np.int32)


# --------------------------------------------------------------------------
# full-sort path (small N / oracle on device)
# --------------------------------------------------------------------------

def topk_ip_full(queries: jnp.ndarray, docs: jnp.ndarray, k: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact top-k via full matmul + lax.top_k. O(N)-sort per query: fine
    for small shards, the baseline the binned kernel is measured against."""
    scores = lax.dot_general(
        queries, docs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    return lax.top_k(scores, k)


# --------------------------------------------------------------------------
# phase 1: fused scores + bin maxima
# --------------------------------------------------------------------------

def _bin_scores_xla(
    queries: jnp.ndarray, docs: jnp.ndarray, bin_size: int, n_valid
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plain-XLA phase 1 (docs already padded to a multiple of bin_size).

    ``n_valid`` may be a Python int or a traced scalar (sharded path).
    Returns (scores (B, Npad) f32 with padding = -inf, bin_max (B, Npad/G)).
    """
    scores = lax.dot_general(
        queries, docs, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    n_pad = docs.shape[0]
    if not (isinstance(n_valid, int) and n_valid >= n_pad):
        col = lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)
        scores = jnp.where(col < n_valid, scores, NEG_INF)
    bin_max = scores.reshape(scores.shape[0], n_pad // bin_size, bin_size).max(axis=-1)
    return scores, bin_max


def _bin_scores_pallas_kernel(
    nv_ref, qt_ref, d_ref, scores_ref, binmax_ref, *, bin_size, tile_n
):
    # scores_ref's dtype controls the score-write precision: f32 keeps the
    # exact FAISS-parity ordering; bf16 halves the write+gather traffic for
    # ~+8% qps at the cost of near-tie reordering (opt-in, see score_dtype).
    # The tile is computed TRANSPOSED — scores (T, B) with doc rows on
    # sublanes and queries on lanes — because the bin reduction then splits
    # the leading (sublane) dim, (T, B) -> (T/G, G, B), which Mosaic
    # supports; splitting the lane dim of a (B, T) layout is rejected
    # ("infer-vector-layout: unsupported shape cast").
    # Queries arrive as (tile_b, dim); both operands contract their LANE
    # dim (measured faster on Mosaic than a (dim, tile_b) rhs layout).
    j = pl.program_id(1)
    s = jax.lax.dot_general(
        d_ref[:], qt_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (tile_n, tile_b)
    # mask rows beyond the valid count (padded shard tail)
    n_valid = nv_ref[0]
    row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * tile_n
    s = jnp.where(row < n_valid, s, NEG_INF)
    scores_ref[:] = s.astype(scores_ref.dtype)
    binmax_ref[:] = jnp.max(s.reshape(tile_n // bin_size, bin_size, s.shape[1]), axis=1)


def _bin_scores_pallas(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    bin_size: int,
    n_valid: int,
    *,
    tile_b: int = 256,
    tile_n: int = 1024,
    interpret: bool = False,
    score_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused Pallas phase 1: one HBM pass over the shard computes the score
    matrix and its bin maxima (never re-reading the B x N scores).

    Returns (scores_t (N_pad, B) in ``score_dtype``, bin_max_t (num_bins, B)).
    """
    b, dim = queries.shape
    n_pad = docs.shape[0]
    assert n_pad % tile_n == 0 and tile_n % bin_size == 0
    tile_b = min(tile_b, b)
    assert b % tile_b == 0, (b, tile_b)
    grid = (b // tile_b, n_pad // tile_n)
    kernel = functools.partial(
        _bin_scores_pallas_kernel, bin_size=bin_size, tile_n=tile_n
    )
    flops = 2 * b * n_pad * dim
    bytes_accessed = (
        b * dim * queries.dtype.itemsize
        + n_pad * dim * docs.dtype.itemsize
        + b * n_pad * jnp.dtype(score_dtype).itemsize
    )
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n // bin_size, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, b), score_dtype),
            jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(nv, queries, docs)


def _binmax_bm_legal(tile_n: int, bin_size: int, n_pad: int) -> bool:
    """Mosaic requires a block's LANE (last) dim to be a multiple of 128
    or equal to the full array dim. The bin-major bin-max block is
    ``tile_n // bin_size`` lanes wide — illegal for e.g. tile_n=1024 /
    G=16 (64 lanes) unless the grid has a single n-tile. Callers fall
    back to the transposed (nb, B) layout + an XLA transpose outside the
    kernel (~4% extra HBM traffic at N=1.1M) when this returns False.
    (Found on hardware: Mosaic lowering rejected (256, 64) blocks that
    CPU interpret mode accepted silently — r4s3 guaranteed_full.)"""
    return (tile_n // bin_size) % 128 == 0 or tile_n == n_pad


def _bin_scores_pallas_bm_kernel(
    nv_ref, qt_ref, d_ref, scores_ref, binmax_ref, *, bin_size, tile_n,
    binmax_bm=True,
):
    # BIN-MAJOR variant: scores land as (B, N) and bin maxima as (B, nb),
    # so the two-level tail's candidate reads are CONTIGUOUS G-element
    # slices instead of per-element gathers (measured 3.5x faster on v5e,
    # probe_slice_gather r3). The matmul still runs in the Mosaic-friendly
    # (tile_n, tile_b) orientation (bin reduce must split the sublane
    # dim); both outputs are transposed in-kernel — an MXU transpose of
    # the (tile_n, tile_b) tile costs ~15% of its matmul.
    # ``binmax_bm=False`` keeps the bin maxima in the (nb, B) orientation
    # when the bin-major block would be lane-illegal (_binmax_bm_legal).
    j = pl.program_id(1)
    s = jax.lax.dot_general(
        d_ref[:], qt_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (tile_n, tile_b)
    n_valid = nv_ref[0]
    row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * tile_n
    s = jnp.where(row < n_valid, s, NEG_INF)
    scores_ref[:] = s.T.astype(scores_ref.dtype)
    bm = jnp.max(s.reshape(tile_n // bin_size, bin_size, s.shape[1]), axis=1)
    binmax_ref[:] = bm.T if binmax_bm else bm


def _bin_scores_pallas_bm(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    bin_size: int,
    n_valid,
    *,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: bool = False,
    score_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused phase 1 emitting BIN-MAJOR outputs:
    (scores (B, N_pad) in ``score_dtype``, bin_max (B, N_pad/G) f32)."""
    b, dim = queries.shape
    n_pad = docs.shape[0]
    assert n_pad % tile_n == 0 and tile_n % bin_size == 0
    tile_b = min(tile_b, b)
    assert b % tile_b == 0, (b, tile_b)
    grid = (b // tile_b, n_pad // tile_n)
    binmax_bm = _binmax_bm_legal(tile_n, bin_size, n_pad)
    kernel = functools.partial(
        _bin_scores_pallas_bm_kernel, bin_size=bin_size, tile_n=tile_n,
        binmax_bm=binmax_bm,
    )
    flops = 2 * b * n_pad * dim
    bytes_accessed = (
        b * dim * queries.dtype.itemsize
        + n_pad * dim * docs.dtype.itemsize
        + b * n_pad * jnp.dtype(score_dtype).itemsize
    )
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    if binmax_bm:
        binmax_spec = pl.BlockSpec(
            (tile_b, tile_n // bin_size), lambda i, j: (i, j), memory_space=pltpu.VMEM
        )
        binmax_shape = jax.ShapeDtypeStruct((b, n_pad // bin_size), jnp.float32)
    else:
        binmax_spec = pl.BlockSpec(
            (tile_n // bin_size, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
        )
        binmax_shape = jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32)
    scores, binmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((tile_b, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            binmax_spec,
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, n_pad), score_dtype),
            binmax_shape,
        ],
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=interpret,
    )(nv, queries, docs)
    if not binmax_bm:
        binmax = binmax.T
    return scores, binmax


def _bin_scores_pallas_int8_kernel(
    nv_ref, qv_ref, qs_ref, dv_ref, ds_ref, scores_ref, binmax_ref,
    *, bin_size, tile_n, bin_major=False, binmax_bm=True,
):
    # int8 x int8 -> int32 on the MXU, rescaled to f32 by the per-row
    # symmetric scales (ops.quant); same transposed (T, B) layout as the
    # bf16 kernel. Index reads drop to 1 byte/element. ``bin_major``
    # transposes both outputs in-kernel (see _bin_scores_pallas_bm).
    j = pl.program_id(1)
    acc = jax.lax.dot_general(
        dv_ref[:], qv_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )  # (tile_n, tile_b) int32
    ds = ds_ref[:, 0]  # (tile_n,)
    qs = qs_ref[:, 0]  # (tile_b,)
    s = acc.astype(jnp.float32) * ds[:, None] * qs[None, :]
    n_valid = nv_ref[0]
    row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * tile_n
    s = jnp.where(row < n_valid, s, NEG_INF)
    bm = jnp.max(s.reshape(tile_n // bin_size, bin_size, s.shape[1]), axis=1)
    if bin_major:
        scores_ref[:] = s.T.astype(scores_ref.dtype)
        binmax_ref[:] = bm.T if binmax_bm else bm
    else:
        scores_ref[:] = s.astype(scores_ref.dtype)
        binmax_ref[:] = bm


def _bin_scores_pallas_int8(
    q_vals: jnp.ndarray,  # (B, dim) int8
    q_scales: jnp.ndarray,  # (B,) f32
    d_vals: jnp.ndarray,  # (Npad, dim) int8
    d_scales: jnp.ndarray,  # (Npad,) f32
    bin_size: int,
    n_valid,
    *,
    tile_b: int = 256,
    tile_n: int = 1024,
    interpret: bool = False,
    score_dtype=jnp.float32,
    bin_major: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, dim = q_vals.shape
    n_pad = d_vals.shape[0]
    assert n_pad % tile_n == 0 and tile_n % bin_size == 0
    tile_b = min(tile_b, b)
    assert b % tile_b == 0, (b, tile_b)
    grid = (b // tile_b, n_pad // tile_n)
    binmax_bm = bin_major and _binmax_bm_legal(tile_n, bin_size, n_pad)
    kernel = functools.partial(
        _bin_scores_pallas_int8_kernel, bin_size=bin_size, tile_n=tile_n,
        bin_major=bin_major, binmax_bm=binmax_bm,
    )
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    # one invocation; only the OUTPUT layout differs between the
    # bin-major (B, N) and transposed (N, B) variants
    if bin_major:
        if binmax_bm:
            bm_spec = pl.BlockSpec(
                (tile_b, tile_n // bin_size), lambda i, j: (i, j),
                memory_space=pltpu.VMEM,
            )
            bm_shape = jax.ShapeDtypeStruct((b, n_pad // bin_size), jnp.float32)
        else:  # lane-illegal bin-major block: transposed out + XLA .T below
            bm_spec = pl.BlockSpec(
                (tile_n // bin_size, tile_b), lambda i, j: (j, i),
                memory_space=pltpu.VMEM,
            )
            bm_shape = jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32)
        out_specs = [
            pl.BlockSpec((tile_b, tile_n), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            bm_spec,
        ]
        out_shape = [
            jax.ShapeDtypeStruct((b, n_pad), score_dtype),
            bm_shape,
        ]
    else:
        out_specs = [
            pl.BlockSpec((tile_n, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (tile_n // bin_size, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
            ),
        ]
        out_shape = [
            jax.ShapeDtypeStruct((n_pad, b), score_dtype),
            jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32),
        ]
    scores, binmax = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(nv, q_vals, q_scales.reshape(-1, 1), d_vals, d_scales.reshape(-1, 1))
    if bin_major and not binmax_bm:
        binmax = binmax.T
    return scores, binmax


def topk_ip_bins_int8(
    queries: jnp.ndarray,  # (B, dim) float — quantized on-device
    d_vals: jnp.ndarray,  # (N, dim) int8
    d_scales: jnp.ndarray,  # (N,) f32
    k: int,
    *,
    bin_size: Optional[int] = None,
    tile_b: Optional[int] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    score_dtype=jnp.float32,
    super_size: Optional[int] = None,
    two_level: bool = False,
    bin_major: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bin-max-cover top-k over an int8 index (per-row scales): the fused
    int8 MXU path of the quantized index (`ops.quant`). ``two_level``
    finishes with the super-bin cover (deep k — same selection tail as
    ``topk_ip_bins_two_level``); ``bin_major`` (two-level only) uses the
    r3 slice-gather layout."""
    from codemix_dense_retrieval_tpu.ops.quant import quantize_rows

    if bin_size is None:
        bin_size = _auto_bin_size_two_level(k) if two_level else _auto_bin_size(k)
    if super_size is None:
        super_size = _auto_super_size(k)
    if tile_b is None:
        tile_b = _tuned_tile_b(k, d_vals.shape[0], default=256)
    q_vals, q_scales = quantize_rows(queries.astype(jnp.float32))
    (
        (d_vals, d_scales), (q_vals, q_scales),
        n_valid, eff_tile_b, b, b_pad, interpret,
    ) = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret,
        [d_vals, d_scales], [q_vals, q_scales],
        chunk=bin_size * super_size if two_level else None,
    )
    if two_level and bin_major:
        scores_bm, binmax_bm = _bin_scores_pallas_int8(
            q_vals, q_scales, d_vals, d_scales, bin_size, n_valid,
            tile_b=eff_tile_b, tile_n=tile_n, interpret=interpret,
            score_dtype=score_dtype, bin_major=True,
        )
        if b_pad != b:
            scores_bm = scores_bm[:b]
            binmax_bm = binmax_bm[:b]
        return _topk_from_bins_two_level_bm(
            scores_bm, binmax_bm, k, bin_size, super_size
        )
    scores_t, bin_max_t = _bin_scores_pallas_int8(
        q_vals, q_scales, d_vals, d_scales, bin_size, n_valid,
        tile_b=eff_tile_b, tile_n=tile_n, interpret=interpret,
        score_dtype=score_dtype,
    )
    if b_pad != b:
        scores_t = scores_t[:, :b]
        bin_max_t = bin_max_t[:, :b]
    if two_level:
        return _topk_from_bins_two_level(scores_t, bin_max_t, k, bin_size, super_size)
    return _topk_from_bins(scores_t, bin_max_t.T, k, bin_size, scores_transposed=True)


def _binmax_only_pallas_kernel(nv_ref, qt_ref, d_ref, binmax_ref, *, bin_size, tile_n):
    # scores are reduced to bin maxima in VMEM and NEVER written to HBM —
    # phase-1 traffic collapses to the index read + a tiny (N/G, B) output.
    j = pl.program_id(1)
    s = jax.lax.dot_general(
        d_ref[:], qt_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    n_valid = nv_ref[0]
    row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + j * tile_n
    s = jnp.where(row < n_valid, s, NEG_INF)
    binmax_ref[:] = jnp.max(s.reshape(tile_n // bin_size, bin_size, s.shape[1]), axis=1)


def _binmax_only_pallas(
    queries, docs, bin_size, n_valid, *, tile_b=256, tile_n=1024, interpret=False
):
    b, dim = queries.shape
    n_pad = docs.shape[0]
    assert n_pad % tile_n == 0 and tile_n % bin_size == 0
    tile_b = min(tile_b, b)
    assert b % tile_b == 0, (b, tile_b)
    kernel = functools.partial(_binmax_only_pallas_kernel, bin_size=bin_size, tile_n=tile_n)
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    return pl.pallas_call(
        kernel,
        grid=(b // tile_b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, dim), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, dim), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_n // bin_size, tile_b), lambda i, j: (j, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32),
        interpret=interpret,
    )(nv, queries, docs)


def topk_ip_bins_rescore(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    bin_size: Optional[int] = None,
    slack_bins: int = 16,
    tile_b: int = 256,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Bin-max cover with candidate RESCORING — the minimal-HBM variant.

    Phase 1 writes only the (N/G, B) bin maxima (the B x N score matrix
    never exists in HBM). Phase 2 selects the top (k + slack_bins) bins,
    gathers those bins' DOC ROWS (contiguous 2KB-row gathers — tile
    friendly), and recomputes their scores with a small batched matmul.

    Cover exactness holds for kernel-computed scores; rescoring recomputes
    the same bf16xbf16->f32 products with a (possibly) different
    accumulation order, so results can differ from the stored-scores path
    by float round-off on near-ties; ``slack_bins`` absorbs boundary
    effects. Use the stored-scores path when bit-exact parity matters.
    """
    if bin_size is None:
        bin_size = _auto_bin_size(k)
    (docs,), (queries,), n_valid, eff_tile_b, b, b_pad, interpret = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret, [docs], [queries]
    )
    binmax_t = _binmax_only_pallas(
        queries, docs, bin_size, n_valid, tile_b=eff_tile_b, tile_n=tile_n,
        interpret=interpret,
    )
    bin_max = binmax_t.T
    if b_pad != b:
        bin_max = bin_max[:b]
        queries = queries[:b]
    num_bins = bin_max.shape[1]
    kb = min(k + slack_bins, num_bins)
    _, bin_ids = lax.top_k(bin_max, kb)
    bin_ids = lax.sort(bin_ids, dimension=1)  # ascending ids -> top_k tie-break
    return _rescore_candidates(docs, queries, bin_ids, bin_size, n_valid, k)


def _select_bins_two_level(
    bin_max: jnp.ndarray,  # (B, nb) BIN-MAJOR bin maxima
    k_bins: int,
    super_size: int,
    *,
    return_unselected_bound: bool = False,
):
    """Two-level bin selection with SLICE gathers only (no element
    gathers): super-max reduce -> top_k over ns supers -> gather the
    covered supers' M-contiguous bin maxima -> top_k -> k bin ids
    (ascending). Measured r3: gathering M-contiguous slices from the
    bin-major layout is ~3.5x faster than the element gather from the
    transposed layout (probe_slice_gather).

    ``return_unselected_bound=True`` additionally returns, per query, the
    max ``bin_max`` over every UNSELECTED bin (the sketch tier's
    exactness-certificate bound, ops/sketch.py): the max of the best
    unselected super's max (bounds all its bins) and the best
    covered-but-unselected bin — each one extra ``top_k`` column."""
    b, nb = bin_max.shape
    ns = nb // super_size
    bm3 = bin_max.reshape(b, ns, super_size)
    super_max = bm3.max(axis=2)
    ks = min(k_bins, ns)
    extra = 1 if return_unselected_bound else 0
    sup_vals, sup_ids = lax.top_k(super_max, min(ks + extra, ns))
    unsel_super = (
        sup_vals[:, ks] if (return_unselected_bound and ns > ks)
        else jnp.full((b,), NEG_INF, jnp.float32)
    )
    sup_ids = lax.sort(sup_ids[:, :ks], dimension=1)
    cand_bm = jnp.take_along_axis(bm3, sup_ids[:, :, None], axis=1)  # (b, ks, M)
    cand_bins = (
        sup_ids[:, :, None] * super_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, super_size), 2)
    ).reshape(b, ks * super_size)
    n_cand = cand_bins.shape[1]
    kb = min(k_bins, n_cand)
    vals2, pos = lax.top_k(cand_bm.reshape(b, -1), min(kb + extra, n_cand))
    unsel_cand = (
        vals2[:, kb] if (return_unselected_bound and n_cand > kb)
        else jnp.full((b,), NEG_INF, jnp.float32)
    )
    bin_ids = jnp.take_along_axis(cand_bins, pos[:, :kb], axis=1)
    bin_ids = lax.sort(bin_ids, dimension=1)
    if return_unselected_bound:
        return bin_ids, jnp.maximum(unsel_super, unsel_cand)
    return bin_ids


def topk_ip_rescore_two_level(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    bin_size: int = 8,
    super_size: Optional[int] = None,
    slack_bins: int = 16,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact deep-k top-k with NO score matrix and NO element gathers —
    the r3 redesign of the deep-k wall (VERDICT r3 item 1a/1b):

    1. fused kernel emits ONLY (N/G, B) bin maxima (the B x N score
       matrix never exists in HBM — phase-1 write traffic drops ~G*B/x);
    2. two-level bin selection entirely via contiguous SLICE gathers in
       the bin-major layout (`_select_bins_two_level`);
    3. the (k + slack) covered bins' DOC ROWS are gathered (contiguous
       row slices from the natural (N, d) layout) and RESCORED with a
       batched MXU contraction; final top_k over (k+slack)*G candidates.

    Exactness: the transitive-cover argument of
    ``topk_ip_bins_two_level`` selects a bin superset of the true top-k
    by phase-1 scores; rescoring recomputes the same contraction on the
    same operands (single-pass f32 accumulation on the MXU), with
    ``slack_bins`` absorbing any near-tie round-off at the cover
    boundary. Ties break to the lower id (FAISS parity) because bin ids
    are re-sorted ascending before the final top_k.
    """
    if super_size is None:
        super_size = _auto_super_size(k)
    if tile_b is None:
        tile_b = _tuned_tile_b(k, docs.shape[0])
    (docs,), (queries,), n_valid, eff_tile_b, b, b_pad, interpret = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret, [docs], [queries],
        chunk=bin_size * super_size,
    )
    binmax_t = _binmax_only_pallas(
        queries, docs, bin_size, n_valid, tile_b=eff_tile_b, tile_n=tile_n,
        interpret=interpret,
    )
    bin_max = binmax_t.T  # (B, nb) bin-major (285 MB at serving shapes)
    if b_pad != b:
        bin_max = bin_max[:b]
        queries = queries[:b]
    bin_ids = _select_bins_two_level(bin_max, min(k + slack_bins, bin_max.shape[1]),
                                     super_size)
    return _rescore_candidates(docs, queries, bin_ids, bin_size, n_valid, k)


# --------------------------------------------------------------------------
# phase 2: bin cover -> candidate gather -> lexicographic select
# --------------------------------------------------------------------------

def _gather_bins_transposed(
    scores_t: jnp.ndarray, cand_idx: jnp.ndarray
) -> jnp.ndarray:
    """Gather candidate scores from (N, B)-layout scores.

    ``take_along_axis`` over axis 0 measured ~2x faster than the
    equivalent ``lax.gather`` with (G, 1) slice sizes on v5e, so this is
    deliberately the simple formulation. Returns (B, kb*G).
    """
    return jnp.take_along_axis(scores_t, cand_idx.T, axis=0).T


def _topk_from_bins(
    scores: jnp.ndarray,
    bin_max: jnp.ndarray,
    k: int,
    bin_size: int,
    *,
    scores_transposed: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """``bin_max`` is (B, num_bins); ``scores`` is (B, N) or — from the
    Pallas kernel — transposed (N, B)."""
    b, num_bins = bin_max.shape
    kb = min(k, num_bins)
    _, bin_ids = lax.top_k(bin_max, kb)  # ties -> lower bin id first
    # sort selected bins ASCENDING: candidate ids then ascend globally, so
    # lax.top_k's lower-position tie preference IS the id-ascending
    # (FAISS) tie-break — a single top_k replaces the two-key full sort
    bin_ids = lax.sort(bin_ids, dimension=1)
    cand_idx = (
        bin_ids[:, :, None] * bin_size + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    if scores_transposed:
        cand_scores = _gather_bins_transposed(scores, cand_idx)
    else:
        cand_scores = jnp.take_along_axis(scores, cand_idx, axis=1)
    cand_scores = cand_scores.astype(jnp.float32)
    vals, pos = lax.top_k(cand_scores, k)
    return vals, jnp.take_along_axis(cand_idx, pos, axis=1)


# --------------------------------------------------------------------------
# deep-k: two-level bin-max cover
# --------------------------------------------------------------------------

def _auto_super_size(k: int) -> int:
    """Measured on v5e: under the r2 element-gather tail the k*M bin-max
    gather grew with M (M=4 won at k=1000); the r3 bin-major SLICE
    gathers are issue-bound, not volume-bound, so larger M only shrinks
    the super top_k domain — M=8 wins at every depth (probe_bm_two_level
    r3: k=1000 G8M8 6,494 qps vs G8M4 5,578). A `tune` run on the live
    chip overrides this per depth (utils/autotune.py)."""
    from codemix_dense_retrieval_tpu.utils.autotune import get_tuned

    return int(get_tuned("topk.super_size", k=k))


def _topk_from_bins_two_level(
    scores_t: jnp.ndarray,  # (N, B) transposed scores
    bin_max_t: jnp.ndarray,  # (nb, B) transposed bin maxima
    k: int,
    bin_size: int,
    super_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-level selection tail shared by the f32 and int8 fused kernels:
    super-max reduce -> super top_k -> covered-bin gather+top_k ->
    element gather+top_k (exactness proof in ``topk_ip_bins_two_level``).
    ``nb`` must divide by ``super_size``; pad rows carry NEG_INF maxima."""
    nb, b = bin_max_t.shape
    ns = nb // super_size
    super_max = jnp.max(bin_max_t.reshape(ns, super_size, b), axis=1).T  # (B, ns)
    ks = min(k, ns)
    _, sup_ids = lax.top_k(super_max, ks)
    sup_ids = lax.sort(sup_ids, dimension=1)
    bin_idx = (
        sup_ids[:, :, None] * super_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, super_size), 2)
    ).reshape(b, ks * super_size)
    cand_binmax = jnp.take_along_axis(bin_max_t, bin_idx.T, axis=0).T
    kb = min(k, cand_binmax.shape[1])
    _, pos = lax.top_k(cand_binmax, kb)
    bin_ids = jnp.take_along_axis(bin_idx, pos, axis=1)
    bin_ids = lax.sort(bin_ids, dimension=1)
    cand_idx = (
        bin_ids[:, :, None] * bin_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    cand_scores = _gather_bins_transposed(scores_t, cand_idx).astype(jnp.float32)
    vals, p2 = lax.top_k(cand_scores, k)
    return vals, jnp.take_along_axis(cand_idx, p2, axis=1)


def _topk_from_bins_two_level_bm(
    scores_bm: jnp.ndarray,  # (B, N) bin-major scores
    binmax_bm: jnp.ndarray,  # (B, nb) bin-major bin maxima
    k: int,
    bin_size: int,
    super_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-level selection tail on BIN-MAJOR layouts: every candidate
    read is a contiguous slice (supers' bin maxima, then bins' scores) —
    no element gathers (probe_slice_gather r3: 3.5x)."""
    b = scores_bm.shape[0]
    bin_ids = _select_bins_two_level(binmax_bm, k, super_size)
    kb = bin_ids.shape[1]
    cand = jnp.take_along_axis(
        scores_bm.reshape(b, binmax_bm.shape[1], bin_size),
        bin_ids[:, :, None],
        axis=1,
    ).reshape(b, kb * bin_size).astype(jnp.float32)
    cand_idx = (
        bin_ids[:, :, None] * bin_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    vals, pos = lax.top_k(cand, k)
    return vals, jnp.take_along_axis(cand_idx, pos, axis=1)


def _topk_from_bins_two_level_bm_probed(
    scores_bm: jnp.ndarray,  # (B, N) bin-major scores
    binmax_bm: jnp.ndarray,  # (B, nb) bin-major bin maxima
    k: int,
    bin_size: int,
    super_size: int,
    probe_bins: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """PROBED two-level selection tail with a per-query EXACTNESS bound.
    Covers only ``probe_bins`` bins (instead of k), so every selection
    domain and slice gather shrinks by ``k / probe_bins`` — the deep-k
    tail (top_k domains + issue-bound slice gathers) is the measured
    wall at k=1000 (BENCH_NOTES deep-k phase table).

    Returns ``(vals, ids, unsel)`` where ``unsel`` is the TRUE maximum
    over every unselected bin (``_select_bins_two_level``'s unselected
    bound — exact phase-1 maxima, zero slack, unlike the sketch tier's
    Cauchy-Schwarz tail bound which never fires on realistic score
    gaps). ``vals[:, k-1] > unsel`` certifies the probe: every element
    outside the probed bins scores strictly below the kth candidate, so
    the candidate set contains the true top-k; ties at the kth boundary
    fail the strict comparison and escalate. In the SHARDED merge the
    bound composes: merged-kth > max over shards' bounds certifies the
    global result, which lets distant shards (whose bins all score low)
    certify without concentrating. Probe quality is a ROW-ORDER
    property: cluster-ordered rows (ops.sketch.cluster_kmeans_order)
    concentrate a query's top-k into few bins, firing certificates on
    topical data.
    """
    b = scores_bm.shape[0]
    bin_ids, unsel = _select_bins_two_level(
        binmax_bm, probe_bins, super_size, return_unselected_bound=True
    )
    kb = bin_ids.shape[1]
    cand = jnp.take_along_axis(
        scores_bm.reshape(b, binmax_bm.shape[1], bin_size),
        bin_ids[:, :, None],
        axis=1,
    ).reshape(b, kb * bin_size).astype(jnp.float32)
    cand_idx = (
        bin_ids[:, :, None] * bin_size
        + lax.broadcasted_iota(jnp.int32, (1, 1, bin_size), 2)
    ).reshape(b, kb * bin_size)
    vals, pos = lax.top_k(cand, k)
    ids = jnp.take_along_axis(cand_idx, pos, axis=1)
    return vals, ids, unsel


def topk_full_tail_bm(
    scores_bm: jnp.ndarray,  # (B, N) bin-major scores (retained phase 1)
    binmax_bm: jnp.ndarray,  # (B, nb)
    qsel: jnp.ndarray,  # (B_esc,) int32 query rows to escalate
    k: int,
    bin_size: int,
    super_size: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Escalation tail for the probed cover: re-run the FULL two-level
    selection for the uncertified queries on the RETAINED phase-1 score
    matrix — the matmul (the dominant fixed cost) is never recomputed.
    Results are exactly those of ``topk_ip_bins_two_level`` for the
    selected rows."""
    s = jnp.take(scores_bm, qsel, axis=0)
    m = jnp.take(binmax_bm, qsel, axis=0)
    return _topk_from_bins_two_level_bm(s, m, k, bin_size, super_size)


def topk_ip_bins_two_level_probed(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    probe_bins: int,
    bin_size: Optional[int] = None,
    super_size: Optional[int] = None,
    tile_b: Optional[int] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    score_dtype=jnp.float32,
    keep_scores: bool = False,
):
    """Certified probed-exact deep-k: the two-level cover probes only
    ``probe_bins`` bins and certifies per-query exactness against the
    true unselected-bin maxima (`_topk_from_bins_two_level_bm_probed`).

    Returns ``(vals, ids, cert, unsel)`` — or with ``keep_scores=True``
    ``(vals, ids, cert, unsel, scores_bm, binmax_bm)`` so the caller can
    escalate uncertified queries through :func:`topk_full_tail_bm`
    without re-running phase 1 (``unsel`` lets a sharded merge recompute
    the certificate against the MERGED kth value). The combination is
    ALWAYS exact; the adaptive tail just prices easy (clustered)
    workloads at the probed cost. Replaces the reference's fixed FAISS
    search cost model (`onepass_dense_run.py:326` searches every query
    at full depth).
    """
    if bin_size is None:
        bin_size = _auto_bin_size_two_level(k)
    if probe_bins * bin_size < k:
        raise ValueError(
            f"probe_bins={probe_bins} x bin_size={bin_size} < k={k}: "
            "the probed cover cannot hold k candidates"
        )
    if super_size is None:
        super_size = _auto_super_size(k)
    if tile_b is None:
        tile_b = _tuned_tile_b(k, docs.shape[0])
    (docs,), (queries,), n_valid, eff_tile_b, b, b_pad, interpret = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret, [docs], [queries],
        chunk=bin_size * super_size,
    )
    scores_bm, binmax_bm = _bin_scores_pallas_bm(
        queries, docs, bin_size, n_valid, tile_b=eff_tile_b,
        tile_n=tile_n, interpret=interpret, score_dtype=score_dtype,
    )
    if b_pad != b:
        scores_bm = scores_bm[:b]
        binmax_bm = binmax_bm[:b]
    nb = binmax_bm.shape[1]
    vals, ids, unsel = _topk_from_bins_two_level_bm_probed(
        scores_bm, binmax_bm, k, bin_size, super_size, min(probe_bins, nb)
    )
    cert = vals[:, k - 1] > unsel
    if keep_scores:
        return vals, ids, cert, unsel, scores_bm, binmax_bm
    return vals, ids, cert, unsel


def topk_ip_bins_two_level(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    bin_size: Optional[int] = None,
    super_size: Optional[int] = None,
    tile_b: Optional[int] = None,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    score_dtype=jnp.float32,
    bin_major: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact deep-k (k >= ~300) top-k via a TWO-LEVEL bin-max cover.

    The single-level path pays one ``lax.top_k`` over N/G bin maxima —
    at k=1000 on 1.1M rows that sort (137k elements/query) costs ~70% of
    the wall (measured, BENCH_NOTES round 2). Adding super-bins of M
    bins shrinks every selection domain:

    1. fused kernel: scores (N, B) + bin maxima (N/G, B)    [1 HBM pass]
    2. super maxima (N/(G*M), B) by an XLA reshape-max      [tiny]
    3. ``top_k`` over N/(G*M) supers -> k super-bins
    4. gather the k*M covered bin maxima -> ``top_k`` -> k bins
    5. gather the k*G covered element scores -> final ``top_k``

    **Exactness (transitive cover).** For any true top-k element x in
    bin b inside super-bin S: every super ranked above S has max >
    score(x) (or ties with a lower id, whose max element then outranks x
    under (score desc, id asc)) — so it contains one of the <= k-1
    elements outranking x; distinct supers contribute distinct elements,
    hence S is selected. The same argument at the bin level keeps b
    among the k bins chosen from the gathered k*M, and x is in the k*G
    candidates. Ties: selected ids are re-sorted ascending at each level
    so ``lax.top_k``'s lower-position preference IS the id-ascending
    (FAISS) tie-break.
    """
    if bin_size is None:
        bin_size = _auto_bin_size_two_level(k)
    if super_size is None:
        super_size = _auto_super_size(k)
    if tile_b is None:
        tile_b = _tuned_tile_b(k, docs.shape[0])
    (docs,), (queries,), n_valid, eff_tile_b, b, b_pad, interpret = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret, [docs], [queries],
        chunk=bin_size * super_size,
    )
    if bin_major:
        # r3 layout: contiguous slice reads in the tail (no element
        # gathers); the kernel transposes tiles in-VMEM on the MXU
        scores_bm, binmax_bm = _bin_scores_pallas_bm(
            queries, docs, bin_size, n_valid, tile_b=eff_tile_b,
            tile_n=tile_n, interpret=interpret, score_dtype=score_dtype,
        )
        if b_pad != b:
            scores_bm = scores_bm[:b]
            binmax_bm = binmax_bm[:b]
        return _topk_from_bins_two_level_bm(
            scores_bm, binmax_bm, k, bin_size, super_size
        )
    scores_t, bin_max_t = _bin_scores_pallas(
        queries, docs, bin_size, n_valid, tile_b=eff_tile_b, tile_n=tile_n,
        interpret=interpret, score_dtype=score_dtype,
    )
    if b_pad != b:
        scores_t = scores_t[:, :b]
        bin_max_t = bin_max_t[:, :b]
    return _topk_from_bins_two_level(scores_t, bin_max_t, k, bin_size, super_size)


# --------------------------------------------------------------------------
# public API
# --------------------------------------------------------------------------

def topk_ip_bins(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    bin_size: Optional[int] = None,
    use_pallas: bool = True,
    tile_b: int = 256,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    score_dtype=jnp.float32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact IP top-k via the bin-max cover algorithm.

    ``docs`` may have any row count; it is padded (statically) to a tile
    multiple and padded rows can never be selected (masked to -inf).
    ``n_valid`` (optional, defaults to ``docs.shape[0]``) may be a traced
    scalar — the sharded path passes each device's local valid row count.
    ``score_dtype=jnp.bfloat16`` halves score-write traffic (~+8% qps)
    but rounds scores, so near-ties may reorder vs FAISS — keep f32 where
    exact parity matters.
    Returns (values f32 (B, k), indices int32 (B, k)); ties broken by
    lower doc index (FAISS parity).
    """
    n_rows = docs.shape[0]  # static
    if bin_size is None:
        bin_size = _auto_bin_size(k)
    if use_pallas:
        (docs,), (queries,), n_valid, eff_tile_b, b, b_pad, interpret = (
            _prep_shard(k, n_valid, tile_b, tile_n, interpret, [docs], [queries])
        )
        scores_t, bin_max_t = _bin_scores_pallas(
            queries, docs, bin_size, n_valid, tile_b=eff_tile_b, tile_n=tile_n,
            interpret=interpret, score_dtype=score_dtype,
        )
        bin_max = bin_max_t.T  # (B, num_bins) — small
        if b_pad != b:
            scores_t, bin_max = scores_t[:, :b], bin_max[:b]
        return _topk_from_bins(scores_t, bin_max, k, bin_size, scores_transposed=True)
    if n_valid is None:
        n_valid = n_rows
    if isinstance(n_valid, int) and k > n_valid:
        raise ValueError(f"k={k} > num docs {n_valid}")
    n_pad = _ceil_to(n_rows, bin_size)
    if n_pad != n_rows:
        docs = jnp.pad(docs, ((0, n_pad - n_rows), (0, 0)))
        if isinstance(n_valid, int):
            n_valid = min(n_valid, n_rows)
    scores, bin_max = _bin_scores_xla(queries, docs, bin_size, n_valid)
    return _topk_from_bins(scores, bin_max, k, bin_size)


def topk_ip(
    queries: jnp.ndarray,
    docs: jnp.ndarray,
    k: int,
    *,
    bin_size: Optional[int] = None,
    method: str = "auto",
    **kwargs,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact inner-product top-k. ``method``: auto | full | bins_xla | bins_pallas.

    ``auto`` uses the binned kernel above ~16k rows (where full-sort cost
    overtakes), the plain full-sort below.
    """
    n = docs.shape[0]
    if method == "auto":
        if n < 16384:
            method = "full"
        elif n >= 262144:
            # big shards: the bin-major two-level cover wins at EVERY
            # depth once slice gathers replaced element gathers
            # (probe_k100_bm r3: k=100 +12%, k=500 2.48x, k=1000 2.07x)
            method = "bins_two_level"
        else:
            method = "bins_pallas"
    if method == "full":
        k_eff = min(k, n)
        if k_eff < k:
            raise ValueError(f"k={k} > num docs {n}")
        return topk_ip_full(queries, docs, k)
    if method == "bins_xla":
        return topk_ip_bins(queries, docs, k, bin_size=bin_size, use_pallas=False, **kwargs)
    if method == "bins_pallas":
        return topk_ip_bins(queries, docs, k, bin_size=bin_size, use_pallas=True, **kwargs)
    if method == "bins_two_level":
        if bin_size is not None:
            kwargs["bin_size"] = bin_size
        return topk_ip_bins_two_level(queries, docs, k, **kwargs)
    if method == "bins_rescore":
        return topk_ip_bins_rescore(queries, docs, k, bin_size=bin_size, **kwargs)
    raise ValueError(f"unknown method {method!r}")
