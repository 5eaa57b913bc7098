"""Fused alpha-sweep: mix -> sharded search -> on-device metrics, ONE jit.

The reference pays index residency, host mixing, and host eval per alpha
(`onepass_dense_mix_run_custom_lang.py:846-891` + per-band evaluate.py
subprocesses in `run_all_vector_pairs.sh:694-706`). Here the whole sweep
is a single traced program: the row-sharded index stays in HBM, each
alpha's mixed queries are built on-device, searched, and scored on-device
— the host only receives (A, k) ids and a small metric dict per alpha.
"""

from __future__ import annotations

import functools
from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from codemix_dense_retrieval_tpu.evals.device_metrics import topk_metrics
from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm
from codemix_dense_retrieval_tpu.parallel.sharded_search import sharded_topk_ip
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("fused")


@functools.lru_cache(maxsize=64)
def _build_sweep(
    alphas: Tuple[float, ...],
    k: int,
    k_raw: int,
    cutoffs: Tuple[int, ...],
    extra_zero_queries: int,
    collapse_n_first: Optional[int],
    mesh: Mesh,
    skw: Tuple[Tuple[str, object], ...],
    use_sketch: bool = False,
    probe_bins: Optional[int] = None,
    expand: float = 4.0,
):
    """One jitted sweep program per static config (mirrors the
    `_build_sharded_search` cache): repeated calls — query sets, language
    pairs — reuse the compiled executable instead of paying a fresh
    multi-alpha XLA/Mosaic compile per invocation."""
    from codemix_dense_retrieval_tpu.ops.sketch import SKETCH_KERNEL_KWARGS

    alphas_arr = jnp.asarray(list(alphas), jnp.float32)
    kwargs = dict(skw)
    if use_sketch:
        # the sketch path takes kernel-geometry kwargs only (no `method`)
        kwargs = {
            kk: vv for kk, vv in kwargs.items() if kk in SKETCH_KERNEL_KWARGS
        }

    def sweep(p, s, d, cnt, rel, doc_scales, sk, tails, proj):
        from codemix_dense_retrieval_tpu.ops.collapse import collapse_topk_parallel_hub
        from codemix_dense_retrieval_tpu.parallel.sharded_search import (
            sharded_topk_ip_sketch,
        )

        # SEQUENTIAL alpha loop (lax.map, not Python unrolling): each
        # alpha's (B, N) score buffer is provably dead before the next
        # starts. The unrolled form let XLA overlap the per-alpha search
        # lifetimes — A x B x N HLO temps, a measured 31.25 GiB ask on a
        # 15.75 GiB chip at A=7, B=1024, N=1.1M (bench_logs r4b). One
        # traced body also compiles ~A x faster.
        def body(alpha):
            q = mix_and_renorm(p, s, alpha)
            if use_sketch:
                # sketch tier wants the f32 query (it rounds/quantizes to
                # the docs dtype itself so the certificate covers it)
                vals, gids, cert = sharded_topk_ip_sketch(
                    q, d, cnt, sk, tails, proj, k_raw, mesh=mesh,
                    probe_bins=probe_bins, expand=expand,
                    doc_scales=doc_scales, **kwargs
                )
            else:
                # int8 indexes quantize queries inside the sharded path;
                # casting floats straight to int8 here would truncate them
                if jnp.issubdtype(d.dtype, jnp.floating):
                    q = q.astype(d.dtype)
                vals, gids = sharded_topk_ip(
                    q, d, cnt, k_raw, mesh=mesh, doc_scales=doc_scales, **kwargs
                )
                cert = jnp.zeros((), jnp.bool_)  # unused placeholder
            if collapse_n_first is not None:
                # a certified raw top-k_raw collapses to the exact
                # collapsed top-k, so the certificate survives the
                # collapse unchanged
                vals, gids = collapse_topk_parallel_hub(
                    vals, gids, collapse_n_first, k_out=k
                )
            else:
                vals, gids = vals[:, :k], gids[:, :k]
            mets = (
                topk_metrics(gids, rel, cutoffs, extra_zero_queries)
                if rel is not None else {}
            )
            return vals, gids, mets, cert

        vals_st, ids_st, metrics, cert_st = jax.lax.map(body, alphas_arr)
        return (
            vals_st,
            ids_st,
            metrics if rel is not None else None,
            cert_st if use_sketch else None,
        )

    return jax.jit(sweep)


def _resolve_depths(
    k, collapse_k_raw, collapse_n_first, docs_sharded, counts, mesh, axis
) -> Tuple[int, int]:
    """(k, k_raw) with the same clamp as DenseFlatIndex.search (count /
    shard capacity) — shared by the sweep and its guaranteed escalation
    so both always search the same depth."""
    k_raw = collapse_k_raw or (2 * k if collapse_n_first is not None else k)
    n_shards = mesh.shape[axis]
    rows_per_shard = docs_sharded.shape[0] // n_shards
    count = int(np.asarray(counts).sum())
    k_raw_eff = min(k_raw, count, rows_per_shard)
    if k_raw_eff < k_raw:
        log.warning(
            "fused sweep k_raw=%d clamped to %d (count=%d, rows_per_shard=%d)",
            k_raw, k_raw_eff, count, rows_per_shard,
        )
    return min(k, k_raw_eff), k_raw_eff


def fused_alpha_sweep(
    primary: jnp.ndarray,  # (B, d) query embeddings lang A
    secondary: jnp.ndarray,  # (B, d) lang B (same qid order)
    alphas: Sequence[float],
    docs_sharded: jax.Array,
    counts: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    rel_ids: Optional[jnp.ndarray] = None,  # (B, R) int32 -1-padded
    metric_cutoffs: Sequence[int] = (1, 3, 5, 10, 100),
    metric_extra_zero_queries: int = 0,
    search_kwargs: Optional[Dict] = None,
    collapse_n_first: Optional[int] = None,
    collapse_k_raw: Optional[int] = None,
    axis: str = "shard",
    sketch: Optional[tuple] = None,
) -> Tuple[
    jnp.ndarray, jnp.ndarray, Optional[Dict[str, jnp.ndarray]],
    Optional[jnp.ndarray],
]:
    """Returns (values (A, B, k), ids (A, B, k), metrics {name: (A,)},
    certified (A, B) bool — None unless ``sketch`` is given).

    ``sketch``: the index's armed sketch tier
    (``DenseFlatIndex._sketch`` — (sketch, tails, proj, kwargs)) routes
    every alpha's search through the approximate tier INSIDE the one-jit
    sweep (``--fused --approx fast``): phase 1 reads ds/d of the index
    bytes per alpha, and the returned per-query certificates mark rows
    that are provably identical to the exact sweep. For byte-exact
    output at near-sketch throughput, :func:`fused_alpha_sweep_guaranteed`
    wraps this sweep with host-driven exact escalation of the
    uncertified pairs.

    The alpha loop is traced sequentially (static ``len(alphas)``) so the
    per-alpha score buffer is reused and the index is read once per alpha
    without host round-trips.

    Bilingual parallel-hub mode: pass ``collapse_n_first`` (rows of the
    first language store) to search ``collapse_k_raw`` (default 2k) raw
    hits and max-collapse them ON-DEVICE to k base ids (the fused analog
    of the raw->base collapse, `onepass_bilingual_hub.py:594-611`);
    ``rel_ids`` then refer to BASE row ids.

    **Exactness of the 2k default (two languages, distinct scores).** Let
    base b be the k-th collapsed base and s_b its max score. Any raw row
    outranking b's best row has score > s_b, so it belongs to a base whose
    collapsed max > s_b — one of the at-most k-1 bases above b — and each
    base contributes at most 2 raw rows. Hence b's best row sits at raw
    rank <= 2(k-1)+1 = 2k-1, inside the top-2k. Also 2k raw rows span >= k
    distinct bases (<= 2 rows each), so k collapsed outputs always exist.
    On TIED scores two caveats apply, both with reference-side analogues:
    (a) the collapsed base SET at the boundary can differ from a
    full-depth collapse (a tied base's best row can be pushed past any
    bounded raw depth by equal-score rows), exactly as the reference's
    host collapse over its raw k=500 run can (`onepass_bilingual_hub.py:
    594-611`); (b) the ORDER of bases with exactly tied collapsed scores
    is base-id-ascending here, while `collapse_run_max` (reference
    parity) keeps first-appearance order. Collapsed SCORES are exact
    either way; `tests/test_device_collapse.py` pins the behavior against
    a same-depth (score desc, base asc) oracle.
    """
    search_kwargs = dict(search_kwargs or {})
    # doc_scales is a device array: it must be a jit ARGUMENT. Closed
    # over, it would be baked into the HLO as a constant — replicated
    # instead of sharded, and the remote compile ships the whole blob
    # (the compile-service failure mode in BENCH_NOTES).
    doc_scales = search_kwargs.pop("doc_scales", None)
    k, k_raw = _resolve_depths(
        k, collapse_k_raw, collapse_n_first, docs_sharded, counts, mesh, axis
    )

    sk = tails = proj = None
    probe_bins = None
    expand = 4.0
    if sketch is not None:
        sk, tails, proj, skw = sketch
        # same probe resolution as DenseFlatIndex.search(approx=True):
        # calibrated probe for this depth, else probe_bins, else the
        # expand-factor default computed inside the sharded path
        probe_bins = skw.get("probe_by_k", {}).get(k_raw, skw.get("probe_bins"))
        expand = float(skw.get("expand", 4.0))
    sweep = _build_sweep(
        tuple(float(a) for a in alphas), k, k_raw, tuple(metric_cutoffs),
        int(metric_extra_zero_queries), collapse_n_first, mesh,
        tuple(sorted(search_kwargs.items())),
        use_sketch=sketch is not None, probe_bins=probe_bins, expand=expand,
    )
    return sweep(
        jnp.asarray(primary, jnp.float32),
        jnp.asarray(secondary, jnp.float32),
        docs_sharded,
        counts,
        None if rel_ids is None else jnp.asarray(rel_ids, jnp.int32),
        doc_scales,
        sk, tails, proj,
    )


def fused_alpha_sweep_guaranteed(
    primary: jnp.ndarray,
    secondary: jnp.ndarray,
    alphas: Sequence[float],
    docs_sharded: jax.Array,
    counts: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    sketch: tuple,
    rel_ids: Optional[jnp.ndarray] = None,
    metric_cutoffs: Sequence[int] = (1, 3, 5, 10, 100),
    metric_extra_zero_queries: int = 0,
    search_kwargs: Optional[Dict] = None,
    collapse_n_first: Optional[int] = None,
    collapse_k_raw: Optional[int] = None,
    axis: str = "shard",
) -> Tuple[np.ndarray, np.ndarray, Optional[Dict[str, np.ndarray]], np.ndarray]:
    """``--fused --approx guaranteed``: the fused SKETCH sweep plus exact
    escalation of every uncertified (alpha, query) pair OUTSIDE the jit —
    output is byte-identical to the exact fused sweep (certified rows by
    the certificate proof, escalated rows by construction) at near-sketch
    throughput when certificates hold. Escalated queries re-mix on device
    with the same ``mix_and_renorm`` program, search the exact sharded
    path at the same clamped raw depth (pow2-bucketed), re-collapse when
    bilingual, and patched alphas recompute their on-device metrics.

    Returns numpy (values (A,B,k), ids (A,B,k), metrics, certified (A,B)
    — the certificate state BEFORE escalation, i.e. the fraction that
    avoided exact work).
    """
    from codemix_dense_retrieval_tpu.ops.collapse import collapse_topk_parallel_hub
    from codemix_dense_retrieval_tpu.parallel.sharded_search import sharded_topk_ip
    from codemix_dense_retrieval_tpu.utils import next_pow2

    search_kwargs = dict(search_kwargs or {})
    vals, ids, metrics, cert = fused_alpha_sweep(
        primary, secondary, alphas, docs_sharded, counts, k,
        mesh=mesh, rel_ids=rel_ids, metric_cutoffs=metric_cutoffs,
        metric_extra_zero_queries=metric_extra_zero_queries,
        search_kwargs=search_kwargs, collapse_n_first=collapse_n_first,
        collapse_k_raw=collapse_k_raw, axis=axis, sketch=sketch,
    )
    cert_np = np.asarray(cert)
    vals_np, ids_np = np.array(np.asarray(vals)), np.array(np.asarray(ids))
    metrics_np = (
        {name: np.array(np.asarray(v)) for name, v in metrics.items()}
        if metrics else None
    )
    if cert_np.all():
        return vals_np, ids_np, metrics_np, cert_np

    doc_scales = search_kwargs.pop("doc_scales", None)
    k_eff, k_raw = _resolve_depths(
        k, collapse_k_raw, collapse_n_first, docs_sharded, counts, mesh, axis
    )
    primary = jnp.asarray(primary, jnp.float32)
    secondary = jnp.asarray(secondary, jnp.float32)
    mix_fn = jax.jit(mix_and_renorm)
    dtype = docs_sharded.dtype
    for ai, alpha in enumerate(alphas):
        bad = np.flatnonzero(~cert_np[ai])
        if not len(bad):
            continue
        bucket = next_pow2(len(bad))
        sel = np.zeros(bucket, np.int32)
        sel[: len(bad)] = bad
        # the SAME device mix program as the sweep (host numpy mixing
        # could differ in ulps and flip exact-path near-ties)
        q = mix_fn(primary[sel], secondary[sel], float(alpha))
        if jnp.issubdtype(dtype, jnp.floating):
            q = q.astype(dtype)
        e_vals, e_gids = sharded_topk_ip(
            q, docs_sharded, counts, k_raw, mesh=mesh,
            doc_scales=doc_scales, **search_kwargs
        )
        if collapse_n_first is not None:
            e_vals, e_gids = jax.jit(functools.partial(
                collapse_topk_parallel_hub,
                n_first=collapse_n_first, k_out=k_eff,
            ))(e_vals, e_gids)
        else:
            e_vals, e_gids = e_vals[:, :k_eff], e_gids[:, :k_eff]
        vals_np[ai, bad] = np.asarray(e_vals)[: len(bad)]
        ids_np[ai, bad] = np.asarray(e_gids)[: len(bad)]
        if metrics_np is not None:
            patched = jax.jit(functools.partial(
                topk_metrics,
                cutoffs=tuple(metric_cutoffs),
                extra_zero_queries=int(metric_extra_zero_queries),
            ))(jnp.asarray(ids_np[ai]), jnp.asarray(rel_ids, jnp.int32))
            for name in metrics_np:
                metrics_np[name][ai] = float(patched[name])
    return vals_np, ids_np, metrics_np, cert_np
