"""Approximate IP search via a PCA sketch, with per-query exactness
certificates.

This is the approximate tier of the index — the TPU-native analog of the
FAISS capabilities the reference installs but never configures
(``PCAMatrix`` pre-transforms + ``IndexRefineFlat`` refinement; the
pipeline itself only ever builds ``IndexFlatIP``, reference
`encode_multilingual_corpus.py:367`). Exact search's phase-1 kernel must
stream every index byte per query block — an HBM floor no exact
algorithm beats. This module breaks it for workloads that can tolerate
(or verify) approximation:

1. **Build**: fit an orthonormal projection ``P (d, ds)`` by *uncentered*
   PCA over a row sample (uncentered because IP decomposes only under a
   linear map: ``q.x = (P^T q).(P^T x) + q_tail.x_tail``). Store the
   sketch ``S = bf16(X P)`` (bf16 so phase 2's matmul runs the MXU at
   native rate — f32 would force a 6-pass HIGHEST emulation costing
   almost as much as exact search) and per-row tail norms
   ``t_x = ||x - P f32(S_x)||`` — computed against the ROUNDED stored
   sketch, so storage quantization is inside the bound.
2. **Probe**: a fused kernel computes per-bin maxima of the score UPPER
   BOUND ``ub(x) = s_q . s_x + ||q_tail|| * t_x >= q . x`` (Cauchy-
   Schwarz on the orthogonal complement) — reading ``ds/d`` of the
   index bytes. The two-level bin-max cover selects the top
   ``probe_bins`` bins by ``ub``.
3. **Refine**: covered bins' full-d rows are gathered (contiguous G-row
   slices) and rescored exactly on the MXU; final top-k.
4. **Certify**: the cover's (probe_bins+1)-th bound is the max ``ub``
   over every *unselected* bin. If it is below the k-th refined score,
   no unselected row can enter the true top-k — that query's result is
   PROVABLY the exact answer (modulo f32 accumulation, covered by a
   small margin). Certification costs one extra top-k column.

Recall/speed trade via ``probe_bins`` (the FAISS ``nprobe`` analog);
``certified`` lets callers escalate uncertified queries to the exact
path instead of trusting a recall estimate.

Storage overhead: ``N*(ds*2+4)`` bytes — ~1/7 of a bf16 index at
ds=d/8. Real sentence-embedding matrices are strongly anisotropic (the
reference measures this itself: `cm_embedding_space_analysis.py`
anisotropy/ABTT sections), so a small ``ds`` captures most energy and
tail bounds stay tight.
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

from codemix_dense_retrieval_tpu.ops.topk import (
    NEG_INF,
    _binmax_bm_legal,
    _ceil_to,
    _prep_shard,
    _rescore_candidates,
    _select_bins_two_level,
)

# covers f32 accumulation round-off in the ub / refined-score comparison
DEFAULT_CERT_MARGIN = 3e-5
# the sketch tier's bin geometry (index/flat.py's calibrate/search must
# agree with the sharded sketch path on this)
DEFAULT_BIN_SIZE = 8
DEFAULT_SUPER_SIZE = 8
# the kernel-geometry kwargs the sketch path understands — the single
# definition every caller (DenseFlatIndex, the fused sweep) filters by,
# so fused and unfused approx runs use identical kernel constants
SKETCH_KERNEL_KWARGS = ("bin_size", "super_size", "tile_n", "tile_b")


# --------------------------------------------------------------------------
# build side
# --------------------------------------------------------------------------

def cluster_bisect_order(
    sketch: np.ndarray, leaf: int = DEFAULT_BIN_SIZE
) -> np.ndarray:
    """Variance-guided recursive bisection order over sketch space (host).

    Returns a permutation ``perm`` such that ``rows[perm]`` places
    sketch-space neighbors in contiguous ``leaf``-row blocks — the
    TPU-native analog of FAISS IVF's cluster assignment
    (`faiss.IndexIVFFlat`; the reference installs FAISS but only ever
    builds flat indexes, `encode_multilingual_corpus.py:367`). Instead of
    inverted lists + a coarse quantizer, the CLUSTERING IS THE ROW ORDER:
    the fused bin-max kernels already reduce over contiguous ``bin_size``
    row groups, so after this reorder each bin is a tight sketch-space
    cell. That concentrates a query's true top-k into few bins (recall
    at a given ``probe_bins`` jumps) and tightens every unselected bin's
    upper bound (exactness certificates start firing). Search kernels,
    sharding, and the cover/certificate math are untouched — exactness
    never depended on row order.

    Each level splits every block at its median along the block's
    maximum-variance sketch dimension (balanced k-d bisection), fully
    vectorized: per-block moments via cumulative sums over the
    block-sorted sketch, one ``np.lexsort`` per level. Split-dim
    candidates are the ``max_split_dims`` leading sketch dims — the
    sketch is PCA-ordered, so within-block variance concentrates there.
    O(N log(N/leaf)) with ~2 passes over the sketch per level.
    """
    sketch = np.ascontiguousarray(np.asarray(sketch, np.float32))
    n, ds = sketch.shape
    order = np.arange(n, dtype=np.int64)
    if n <= leaf:
        return order
    dv = min(ds, 32)  # split-dim candidates (PCA-leading dims)
    levels = int(math.ceil(math.log2(n / leaf)))
    bounds = np.array([0, n], dtype=np.int64)
    for _ in range(levels):
        so = sketch[order, :dv]
        starts = bounds[:-1]
        sizes = np.diff(bounds)
        cnt = sizes.astype(np.float64)[:, None]
        # per-block sums via cumsum differences (reduceat is ~10x slower);
        # f32 running-sum drift (~1e-4 relative at 1M rows) is far below
        # what a split-dim argmax can feel
        cs = np.cumsum(so, axis=0)
        cs2 = np.cumsum(so * so, axis=0)
        ends = bounds[1:] - 1
        sums = cs[ends].astype(np.float64)
        sqs = cs2[ends].astype(np.float64)
        sums[1:] -= cs[ends[:-1]]
        sqs[1:] -= cs2[ends[:-1]]
        var = sqs / cnt - (sums / cnt) ** 2
        dsel = var.argmax(axis=1)  # split dim per block
        rowblock = np.repeat(np.arange(len(starts)), sizes)
        key = so[np.arange(n), dsel[rowblock]]
        order = order[np.lexsort((key, rowblock))]
        mids = starts + sizes // 2
        bounds = np.unique(np.concatenate([bounds, mids]))
        if np.all(np.diff(bounds) <= leaf):
            break
    return order


def fit_sketch(
    rows: np.ndarray, sketch_dim: int, *, sample: int = 131072, seed: int = 0
) -> np.ndarray:
    """Fit an orthonormal (d, ds) projection by uncentered PCA on a row
    sample: top eigenvectors of ``E[x x^T]``. Deterministic."""
    rows = np.asarray(rows)
    n, d = rows.shape
    if not 0 < sketch_dim <= d:
        raise ValueError(f"sketch_dim={sketch_dim} not in (0, {d}]")
    if n > sample:
        idx = np.random.default_rng(seed).choice(n, size=sample, replace=False)
        idx.sort()
        rows = rows[idx]
    x = rows.astype(np.float32)
    cov = (x.T @ x) / max(1, len(x))
    eigvals, eigvecs = np.linalg.eigh(cov.astype(np.float64))
    order = np.argsort(eigvals)[::-1][:sketch_dim]
    return np.ascontiguousarray(eigvecs[:, order].astype(np.float32))


# round-to-nearest bf16 relative rounding bound: 8 mantissa bits
# (incl. implicit) -> |v - bf16(v)| <= 2^-8 |v|
_BF16_EPS = 2.0 ** -8


def _sketch_with_err(
    x: jnp.ndarray, proj: jnp.ndarray, sketch_dtype
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared sketch projection: returns (stored sketch ``s`` in
    ``sketch_dtype``, tail norms ``t = ||x - P f32(s)||``, in-range
    rounding norms ``e = ||P^T x - f32(s)||``) — all bounds are for the
    STORED (possibly bf16-rounded) sketch, so the score-bound
    decomposition ``q.x <= s_q.s_d + t_q t_d + e_q||s_d|| + ||s_q||e_d``
    holds with the exact values the phase-1 kernel multiplies."""
    x = x.astype(jnp.float32)
    # HIGHEST precision: TPU f32 matmuls otherwise round operands to
    # bf16 on the MXU and the projection itself would be silently lossy
    # beyond the accounted sketch_dtype rounding
    s_full = lax.dot_general(
        x, proj.astype(jnp.float32), (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
    )
    s = s_full.astype(sketch_dtype)
    s32 = s.astype(jnp.float32)
    err = s_full - s32
    e = jnp.sqrt(jnp.sum(err * err, axis=1))
    # ||x - P s32||^2 = ||x||^2 - 2 (P^T x).s32 + ||s32||^2 (P
    # orthonormal); relu guards round-off at near-zero tails
    t2 = jnp.maximum(
        jnp.sum(x * x, axis=1)
        - 2.0 * jnp.sum(s_full * s32, axis=1)
        + jnp.sum(s32 * s32, axis=1),
        0.0,
    )
    return s, jnp.sqrt(t2), e


def sketch_rows(
    docs: jnp.ndarray, proj: jnp.ndarray, sketch_dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row sketch + tail-norm bound (jit-able; row-sharded inputs stay
    row-sharded — the matmul has no cross-row contraction).

    Returns (sketch (N, ds) ``sketch_dtype``, tails (N,) f32) with
    ``tails[i] >= ||x_i - P f32(sketch_i)||`` for the f32 value of row i
    — the tail is computed against the ROUNDED stored sketch, so it
    absorbs the storage quantization except the in-range component
    (bounded by ``_BF16_EPS * ||sketch_i||`` and folded into the
    per-query certificate slack by :func:`topk_ip_sketch`).

    bf16 storage is the fast path: phase 1's ub matmul runs the MXU at
    native bf16 rate (one pass) instead of the f32 HIGHEST 6-pass
    emulation that made the sketch tier 0.75x of EXACT search's cost at
    ds=d/8 (bench_logs r4c: fused sketch 0.48x exact). Pass
    ``sketch_dtype=jnp.float32`` to reproduce the legacy tier.
    """
    s, t, _ = _sketch_with_err(docs, proj, sketch_dtype)
    return s, t


# shared jitted instance — every jax.jit(sketch_rows) call would own a
# separate trace cache, recompiling per call site
sketch_rows_jit = jax.jit(sketch_rows, static_argnames=("sketch_dtype",))


def sketch_queries(
    queries: jnp.ndarray, proj: jnp.ndarray, sketch_dtype=jnp.bfloat16
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Query-side sketch: (q_sketch (B, ds), q_tail_norm (B,) f32)."""
    return sketch_rows(queries, proj, sketch_dtype)


# --------------------------------------------------------------------------
# phase 1: fused upper-bound bin maxima (bin-major output)
# --------------------------------------------------------------------------

def _binub_pallas_kernel(nv_ref, qs_ref, qt_ref, ds_ref, dt_ref, binub_ref,
                         *, bin_size, tile_n, binub_bm=True):
    # ub tile = sketch scores + per-row tail bound * per-query tail norm,
    # computed in the Mosaic-friendly (tile_n, tile_b) orientation (bin
    # reduce splits the sublane dim), transposed in-VMEM to the bin-major
    # output (see ops.topk._bin_scores_pallas_bm for why). ``binub_bm=
    # False`` keeps the (nb, B) orientation when the bin-major block
    # would be lane-illegal (ops.topk._binmax_bm_legal).
    j = pl.program_id(1)
    # bf16 sketches (the fast default): bf16 x bf16 products are exact in
    # the f32 accumulator at DEFAULT precision — one native-rate MXU pass.
    # f32 sketches (legacy) need HIGHEST or the MXU silently rounds the
    # operands to bf16, undercutting the bound by ~2^-8.
    prec = (
        jax.lax.Precision.HIGHEST
        if ds_ref.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    s = jax.lax.dot_general(
        ds_ref[:], qs_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=prec,
    )  # (tile_n, tile_b)
    ub = s + dt_ref[:] * qt_ref[:].reshape(1, -1)
    n_valid = nv_ref[0]
    row = lax.broadcasted_iota(jnp.int32, ub.shape, 0) + j * tile_n
    ub = jnp.where(row < n_valid, ub, NEG_INF)
    bm = jnp.max(ub.reshape(tile_n // bin_size, bin_size, ub.shape[1]), axis=1)
    binub_ref[:] = bm.T if binub_bm else bm


def _binub_pallas(
    q_sketch: jnp.ndarray,  # (B, ds) f32
    q_tail: jnp.ndarray,  # (B, 1) f32
    d_sketch: jnp.ndarray,  # (Npad, ds) f32
    d_tail: jnp.ndarray,  # (Npad, 1) f32
    bin_size: int,
    n_valid,
    *,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused phase 1 over the SKETCH: one pass emits bin-major per-bin
    maxima of the score upper bound, (B, Npad/G) f32. The full-d score
    matrix never exists."""
    b, ds = q_sketch.shape
    n_pad = d_sketch.shape[0]
    assert n_pad % tile_n == 0 and tile_n % bin_size == 0
    tile_b = min(tile_b, b)
    assert b % tile_b == 0, (b, tile_b)
    binub_bm = _binmax_bm_legal(tile_n, bin_size, n_pad)
    kernel = functools.partial(
        _binub_pallas_kernel, bin_size=bin_size, tile_n=tile_n,
        binub_bm=binub_bm,
    )
    nv = jnp.asarray(n_valid, jnp.int32).reshape(1)
    if binub_bm:
        out_spec = pl.BlockSpec(
            (tile_b, tile_n // bin_size), lambda i, j: (i, j),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((b, n_pad // bin_size), jnp.float32)
    else:  # lane-illegal bin-major block: transposed out + XLA .T below
        out_spec = pl.BlockSpec(
            (tile_n // bin_size, tile_b), lambda i, j: (j, i),
            memory_space=pltpu.VMEM,
        )
        out_shape = jax.ShapeDtypeStruct((n_pad // bin_size, b), jnp.float32)
    binub = pl.pallas_call(
        kernel,
        grid=(b // tile_b, n_pad // tile_n),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((tile_b, ds), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_b, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, ds), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=out_spec,
        out_shape=out_shape,
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n_pad * ds,
            bytes_accessed=(
                b * ds * q_sketch.dtype.itemsize
                + n_pad * ds * d_sketch.dtype.itemsize
                + n_pad * 4
                + b * (n_pad // bin_size) * 4
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(nv, q_sketch, q_tail, d_sketch, d_tail)
    if not binub_bm:
        binub = binub.T
    return binub


# --------------------------------------------------------------------------
# phase 2: cover + certificate bound
# --------------------------------------------------------------------------

def _sketch_round_slack(d_sketch, q_sketch, q_err):
    """Per-query certificate slack for ROUNDED (bf16-stored) sketches —
    0 when the sidecar is f32. The phase-1 kernel's ub misses the two
    in-range rounding cross terms of the decomposition
        q.x <= s_q.s_d + t_q t_d + e_q ||s_d|| + ||s_q|| e_d
    (tails are already computed vs the ROUNDED sketches — sketch_rows).
    e_q is exact per query; e_d is bounded by
    _BF16_EPS * ||s_d_full|| <= _BF16_EPS/(1-eps) * max ||s_d||.

    The max-norm reduction re-reads the sidecar per call (~0.3 ms at
    1.1M x 128 bf16 — the ub kernel streams the same operand, so XLA can
    share the read); a per-index precomputed scalar was considered and
    rejected: it would thread a new argument through four call sites and
    the shard_map cache keys to save <1% of a search call."""
    if d_sketch.dtype == jnp.float32:
        return jnp.zeros((), jnp.float32)
    d_sk32 = d_sketch.astype(jnp.float32)
    d_snorm_max = jnp.sqrt(jnp.max(jnp.sum(d_sk32 * d_sk32, axis=1)))
    q_snorm = jnp.sqrt(jnp.sum(q_sketch.astype(jnp.float32) ** 2, axis=1))
    return d_snorm_max * (q_err + _BF16_EPS * 1.01 * q_snorm)


def _default_probe_bins(k: int, bin_size: int, nb: int, expand: float) -> int:
    min_bins = -(-k // bin_size)
    return max(min(nb, int(math.ceil(min_bins * expand))), min(min_bins + 4, nb))


def topk_ip_sketch(
    queries: jnp.ndarray,  # (B, d)
    docs: jnp.ndarray,  # (N, d) full-precision rows (bf16/f32)
    d_sketch: jnp.ndarray,  # (N, ds) f32 from sketch_rows
    d_tail: jnp.ndarray,  # (N,) f32 from sketch_rows
    proj: jnp.ndarray,  # (d, ds) f32 from fit_sketch
    k: int,
    *,
    probe_bins: Optional[int] = None,
    expand: float = 4.0,
    bin_size: int = DEFAULT_BIN_SIZE,
    super_size: int = DEFAULT_SUPER_SIZE,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    cert_margin: float = DEFAULT_CERT_MARGIN,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approximate top-k with per-query exactness certificates.

    Returns (values f32 (B, k), indices int32 (B, k), certified bool (B,)).
    ``certified[q]`` True means row q's result is PROVABLY identical to
    exact search (no unselected bin's upper bound reaches the k-th
    refined score; strict comparison with ``cert_margin`` absorbing f32
    accumulation order). Recall of uncertified rows depends on the data's
    spectral decay; tune ``probe_bins``/``expand`` (``nprobe`` analog).

    Queries are rounded to ``docs.dtype`` before scoring (the same cast
    ``DenseFlatIndex.search`` applies), so "exact search" means the exact
    top-k of ``round(q) . docs`` — the operands the score kernels see.
    """
    if probe_bins is None:
        nb_est = _ceil_to(docs.shape[0], tile_n) // bin_size
        probe_bins = _default_probe_bins(k, bin_size, nb_est, expand)
    # The certificate must bound the operands the SCORE KERNELS see, not
    # the caller's full-precision queries: the refine einsum and the
    # exact-path kernels run at DEFAULT precision, which feeds bf16-
    # rounded operands to the MXU (~1e-3 for unit vectors — 30x
    # DEFAULT_CERT_MARGIN). Rounding queries to docs.dtype up front makes
    # ub and refined scores see the same query values (and matches
    # DenseFlatIndex.search, which casts queries to the index dtype).
    # Round-TRIP back to f32 so the sketch/tail/bound math stays full
    # precision over the (now exactly-representable) rounded values.
    if queries.dtype != docs.dtype and jnp.issubdtype(docs.dtype, jnp.floating):
        queries = queries.astype(docs.dtype).astype(jnp.float32)
    sketch_dt = d_sketch.dtype
    q_sketch, q_tail, q_err = _sketch_with_err(queries, proj, sketch_dt)
    # With sub-f32 docs the products are exact (bf16 x bf16 fits f32) and
    # only f32 accumulation remains, which DEFAULT_CERT_MARGIN covers.
    # f32 docs still get operand-rounded inside the DEFAULT-precision
    # kernels, so the margin must absorb the product rounding:
    # |kernel - true| <= 2 eps_bf16 * ||q|| * max_row_norm (eps = 2^-9).
    # This applies on EVERY backend, not just TPU: this JAX build's CPU
    # DEFAULT f32 matmul also rounds operands to bf16 (measured 5.8e-4 on
    # unit vectors) — a backend == "tpu" gate here certified falsely on
    # CPU f32 indexes.
    cert_margin = jnp.asarray(cert_margin, jnp.float32)
    cert_margin = cert_margin + _sketch_round_slack(d_sketch, q_sketch, q_err)
    if jnp.dtype(docs.dtype).itemsize >= 4:
        eps = 2.0 ** -9
        # reconstruct ||row|| from the sidecars in f32; the stored sketch
        # may be rounded, so inflate its norm by the in-range rounding
        # bound (||x||^2 <= (||s32|| + e_d)^2 + t^2)
        d_sk32 = d_sketch.astype(jnp.float32)
        d_snorm = jnp.sqrt(jnp.sum(d_sk32 * d_sk32, axis=1))
        if sketch_dt != jnp.float32:
            d_snorm = d_snorm * (1.0 + 1.01 * _BF16_EPS)
        row_norm_max = jnp.sqrt(jnp.max(d_snorm * d_snorm + d_tail * d_tail))
        q_sk32 = q_sketch.astype(jnp.float32)
        # ||q|| upper bound with a ROUNDED query sketch: ||P^T q|| <=
        # ||s_q32|| + e_q (triangle inequality — the plain sum-of-squares
        # form drops the 2*s.e cross term and can UNDERestimate ||q||,
        # shrinking the margin below the bound it claims)
        q_snorm = jnp.sqrt(jnp.sum(q_sk32 * q_sk32, axis=1)) + q_err
        q_norm = jnp.sqrt(q_snorm * q_snorm + q_tail * q_tail)
        cert_margin = cert_margin + 2.0 * eps * q_norm * row_norm_max

    def rescore(doc_payload, q_payload, bin_ids, nv):
        return _rescore_candidates(
            doc_payload[0], q_payload[0], bin_ids, bin_size, nv, k
        )

    return _probe_rescore_certify(
        k, n_valid, tile_b, tile_n, interpret, bin_size, super_size,
        probe_bins, cert_margin,
        [docs], [queries], d_sketch, d_tail, q_sketch, q_tail, rescore,
    )


def _probe_rescore_certify(
    k, n_valid, tile_b, tile_n, interpret, bin_size, super_size,
    probe_bins, cert_margin,
    doc_payload, q_payload, d_sketch, d_tail, q_sketch, q_tail, rescore,
):
    """The certified probe core shared by the float and int8 sketch
    tiers: pad/prep, fused upper-bound bin maxima, two-level cover with
    the (probe+1)-th bound, payload-specific rescore, certificate
    comparison. ``rescore(doc_payload, q_payload, bin_ids, n_valid)``
    returns the refined (vals, idx)."""
    (
        (*doc_payload, d_sketch, d_tail),
        (*q_payload, q_sketch, q_tail),
        n_valid, eff_tile_b, b, b_pad, interpret,
    ) = _prep_shard(
        k, n_valid, tile_b, tile_n, interpret,
        [*doc_payload, d_sketch, d_tail.reshape(-1, 1)],
        [*q_payload, q_sketch, q_tail.reshape(-1, 1)],
        chunk=bin_size * super_size,
    )
    bin_ub = _binub_pallas(
        q_sketch, q_tail, d_sketch, d_tail, bin_size, n_valid,
        tile_b=eff_tile_b, tile_n=tile_n, interpret=interpret,
    )
    if b_pad != b:
        bin_ub = bin_ub[:b]
        q_payload = [a[:b] for a in q_payload]
    kb = min(probe_bins, bin_ub.shape[1])
    bin_ids, unsel_ub = _select_bins_two_level(
        bin_ub, kb, super_size, return_unselected_bound=True
    )
    if kb * bin_size < k:
        raise ValueError(
            f"probe_bins={kb} x bin_size={bin_size} < k={k}: too few candidates"
        )
    vals, idx = rescore(doc_payload, q_payload, bin_ids, n_valid)
    certified = (unsel_ub + cert_margin) < vals[:, -1]
    return vals, idx, certified


def sketch_rows_int8(
    d_vals: jnp.ndarray, d_scales: jnp.ndarray, proj: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Sketch + tail bounds over a quantized index's EFFECTIVE corpus —
    the dequantized rows ``vals * scale`` (what the int8 score kernels
    actually rank; `ops/quant.py` int8_ip_scores). jit-able, shard-local."""
    from codemix_dense_retrieval_tpu.ops.quant import dequantize

    return sketch_rows(dequantize(d_vals, d_scales), proj)


sketch_rows_int8_jit = jax.jit(sketch_rows_int8)


def topk_ip_sketch_int8(
    queries: jnp.ndarray,  # (B, d) float
    d_vals: jnp.ndarray,  # (N, d) int8
    d_scales: jnp.ndarray,  # (N,) f32 per-row scales
    d_sketch: jnp.ndarray,  # (N, ds) f32 from sketch_rows_int8
    d_tail: jnp.ndarray,  # (N,) f32
    proj: jnp.ndarray,  # (d, ds) f32
    k: int,
    *,
    probe_bins: Optional[int] = None,
    expand: float = 4.0,
    bin_size: int = DEFAULT_BIN_SIZE,
    super_size: int = DEFAULT_SUPER_SIZE,
    tile_b: int = 512,
    tile_n: int = 1024,
    interpret: Optional[bool] = None,
    n_valid=None,
    cert_margin: float = DEFAULT_CERT_MARGIN,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approximate top-k over an INT8 index with exactness certificates.

    "Exact" here is the int8 path's own contract: the top-k of the int8
    MXU scores (`topk_ip_bins_int8` — int32-exact accumulation, f32
    rescale; reference analog: the bitsandbytes 8-bit model variants,
    `onepass_dense_run.py:177-187`). The math reduces to the float case
    because integer accumulation is exact: the effective corpus is the
    dequantized rows (sketch/tails built over them —
    :func:`sketch_rows_int8`) and the effective query is the dequantized
    quantized query ``q_eff = q_i8 * q_scale`` (exactly representable),
    so ``score = q_eff . x_eff`` exactly, modulo two f32 scale multiplies
    (~2 ulp, inside ``cert_margin``). The Cauchy-Schwarz upper bound then
    applies verbatim to ``q_eff``; phase 1 runs the SAME fused f32-sketch
    kernel, and the refine gathers 1-byte rows — half the bf16 tier's
    dominant gather volume at deep k.
    """
    from codemix_dense_retrieval_tpu.ops.quant import quantize_rows
    from codemix_dense_retrieval_tpu.ops.topk import _rescore_candidates_int8

    if probe_bins is None:
        nb_est = _ceil_to(d_vals.shape[0], tile_n) // bin_size
        probe_bins = _default_probe_bins(k, bin_size, nb_est, expand)
    # quantize the query ONCE; every downstream phase (bound + rescore)
    # sees the same effective query the exact int8 kernels see
    q_i8, q_sc = quantize_rows(queries.astype(jnp.float32))
    q_eff = q_i8.astype(jnp.float32) * q_sc[:, None]
    q_sketch, q_tail, q_err = _sketch_with_err(q_eff, proj, d_sketch.dtype)
    # no TPU-f32 operand-rounding margin needed for the SCORES here: the
    # rescore accumulates in int32 (exact) over exactly-representable
    # values; only the sketch-STORAGE rounding terms apply (same slack as
    # the float tier when the sidecar is bf16)
    cert_margin = jnp.asarray(cert_margin, jnp.float32)
    cert_margin = cert_margin + _sketch_round_slack(d_sketch, q_sketch, q_err)

    def rescore(doc_payload, q_payload, bin_ids, nv):
        dv, dsc = doc_payload
        qv, qsc = q_payload
        return _rescore_candidates_int8(
            dv, dsc[:, 0], qv, qsc[:, 0], bin_ids, bin_size, nv, k
        )

    return _probe_rescore_certify(
        k, n_valid, tile_b, tile_n, interpret, bin_size, super_size,
        probe_bins, cert_margin,
        [d_vals, d_scales.reshape(-1, 1)],
        [q_i8, q_sc.reshape(-1, 1)],
        d_sketch, d_tail, q_sketch, q_tail, rescore,
    )
