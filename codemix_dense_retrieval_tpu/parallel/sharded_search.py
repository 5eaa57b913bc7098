"""Row-sharded exact search over a device mesh.

This replaces FAISS's single-GPU clone (`faiss.index_cpu_to_gpu`,
reference `onepass_dense_run.py:306-310`) with the idiomatic TPU design
(SURVEY §2.3, §5): corpus embeddings are sharded on the row axis across
the mesh's ``shard`` dimension (HBM-resident, bf16); each device runs the
fused bin-max-cover top-k on its local rows; the only collective is an
``all_gather`` of the per-device (k values, k global ids) — a few hundred
KB riding ICI — followed by a local lexicographic merge-select.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P
from jax import shard_map

from codemix_dense_retrieval_tpu.ops import topk as topk_ops


def _ceil_to(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def shard_rows(
    embeddings: np.ndarray,
    mesh: Mesh,
    *,
    axis: str = "shard",
    pad_multiple: int = 1024,
) -> Tuple[jax.Array, jax.Array, int]:
    """Place an (N, d) host array row-sharded on the mesh.

    Rows are padded so every device gets an equal ``rows_per_shard``
    (itself a multiple of ``pad_multiple`` for kernel tiling). Returns
    (device array (S*rows_per_shard, d) sharded P(axis, None),
     per-shard valid-row counts (S,) sharded P(axis),
     rows_per_shard).
    """
    n, d = embeddings.shape
    s = mesh.shape[axis]
    rows_per_shard = _ceil_to(max(1, -(-n // s)), pad_multiple)
    n_pad = rows_per_shard * s
    counts = np.clip(n - rows_per_shard * np.arange(s), 0, rows_per_shard).astype(np.int32)

    sharding = NamedSharding(mesh, P(axis, None))

    def _cb(index):
        # index is the global slice this device holds; materialize with pad
        rows = np.zeros((rows_per_shard, d), dtype=embeddings.dtype)
        start = index[0].start or 0
        stop = min(index[0].stop or n_pad, n)
        if start < n:
            rows[: stop - start] = embeddings[start:stop]
        return rows

    docs = jax.make_array_from_callback((n_pad, d), sharding, _cb)
    counts_dev = jax.device_put(counts, NamedSharding(mesh, P(axis)))
    return docs, counts_dev, rows_per_shard


def shard_row_sidecar(
    values: np.ndarray, mesh: Mesh, rows_per_shard: int, *, axis: str = "shard"
) -> jax.Array:
    """Shard a per-row (N,) sidecar (e.g. int8 scales) with the same padded
    layout as :func:`shard_rows`."""
    s = mesh.shape[axis]
    n_pad = rows_per_shard * s
    padded = np.zeros(n_pad, dtype=values.dtype)
    padded[: len(values)] = values
    return jax.device_put(padded, NamedSharding(mesh, P(axis)))


def _resolve_tile_b(tile_b, k: int, default: int, rows_per_shard: int) -> int:
    """tile_b=None -> the per-depth tuned store (hardware-measured
    winners from `tune`/probe_g16_deepk), falling back to each path's
    measured-on-dev-chip default so untuned hosts keep today's configs.
    Tuned tile_b > 512 only applies on shards large enough to compile
    (ops.topk._TILE_B_1024_MIN_ROWS — probe_vmem_boundary r4i: every
    tb1024 program scoped-vmem-OOMs the remote compiler at <= 524288
    rows, any bin size)."""
    if tile_b is not None:
        return int(tile_b)
    from codemix_dense_retrieval_tpu.ops.topk import _tuned_tile_b
    from codemix_dense_retrieval_tpu.utils.autotune import load_tuned

    store = load_tuned()
    if f"topk.tile_b.k{k}" not in store and "topk.tile_b" not in store:
        return default
    return _tuned_tile_b(k, rows_per_shard, default=default)


@functools.lru_cache(maxsize=128)
def _build_sharded_search(
    mesh: Mesh,
    axis: str,
    k: int,
    method: str,
    bin_size: int,
    tile_n: int,
    tile_b: int,
    interpret: bool,
    int8_mode: bool,
    rows_per_shard: int,
):
    """Compiled sharded-search program, cached by its static config.

    The shard_map MUST be wrapped in jit: called eagerly it executes one
    primitive per dispatch, which on the axon relay turns a ~30 ms search
    into ~17 s of round trips (measured, BENCH_NOTES round 2). The cache
    keys on every trace-relevant static so repeated searches (query
    blocks, alpha sweeps) reuse one executable.
    """

    def _scores(q, d, scales):
        if int8_mode:
            from codemix_dense_retrieval_tpu.ops.quant import int8_ip_scores, quantize_rows

            qv, qs = quantize_rows(q.astype(jnp.float32))
            return int8_ip_scores(qv, qs, d, scales)
        return lax.dot_general(
            q, d, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )

    def local_search(q, d, cnt, scales):
        shard_id = lax.axis_index(axis)
        n_valid = cnt[0]
        if int8_mode and method in ("bins_pallas", "bins_two_level"):
            # fused int8 MXU kernel: 1-byte index reads, f32 rescale in-kernel
            vals, idx = topk_ops.topk_ip_bins_int8(
                q, d, scales, k, bin_size=bin_size, tile_b=tile_b, tile_n=tile_n,
                interpret=interpret, n_valid=n_valid,
                two_level=(method == "bins_two_level"),
            )
        elif method == "full" or int8_mode:
            # full-sort path / int8 XLA fallback: mask pad rows BEFORE select
            scores = _scores(q, d, scales)
            col = lax.broadcasted_iota(jnp.int32, (1, scores.shape[1]), 1)
            scores = jnp.where(col < n_valid, scores, topk_ops.NEG_INF)
            if method in ("bins_xla", "bins_pallas"):
                # pad the tail UP to a bin multiple (NEG_INF, never
                # selectable) — truncating would make tail rows
                # permanently unselectable (silently wrong top-k)
                n_pad_b = -(-scores.shape[1] // bin_size) * bin_size
                if n_pad_b != scores.shape[1]:
                    scores = jnp.pad(
                        scores, ((0, 0), (0, n_pad_b - scores.shape[1])),
                        constant_values=topk_ops.NEG_INF,
                    )
                bin_max = scores.reshape(
                    scores.shape[0], -1, bin_size
                ).max(axis=-1)
                vals, idx = topk_ops._topk_from_bins(scores, bin_max, k, bin_size)
            else:
                vals, idx = lax.top_k(scores, k)
        elif method == "bins_two_level":
            vals, idx = topk_ops.topk_ip_bins_two_level(
                q, d, k, bin_size=bin_size, tile_b=tile_b, tile_n=tile_n,
                interpret=interpret, n_valid=n_valid,
            )
        else:
            vals, idx = topk_ops.topk_ip_bins(
                q,
                d,
                k,
                bin_size=bin_size,
                use_pallas=(method == "bins_pallas"),
                tile_b=tile_b,
                tile_n=tile_n,
                interpret=interpret,
                n_valid=n_valid,
            )
        gids = idx + shard_id * rows_per_shard
        # ICI collective: gather every shard's candidates, then local select
        vals_all = lax.all_gather(vals, axis, axis=1, tiled=True)  # (B, S*k)
        gids_all = lax.all_gather(gids, axis, axis=1, tiled=True)
        neg, ids = lax.sort((-vals_all, gids_all), num_keys=2)
        return -neg[:, :k], ids[:, :k]

    return jax.jit(
        shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis), P(axis)),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _build_sharded_sketch_search(
    mesh: Mesh,
    axis: str,
    k: int,
    probe_bins: int,
    bin_size: int,
    super_size: int,
    tile_n: int,
    tile_b: int,
    interpret: bool,
    rows_per_shard: int,
    int8_mode: bool = False,
):
    """Compiled sharded SKETCH search (approximate + certified), cached by
    static config like :func:`_build_sharded_search`.

    Each shard probes its local bins; the all-gather merge is identical to
    the exact path. A query's global certificate is the AND of its
    per-shard certificates — every shard's local top-k being provably
    exact makes the merged global top-k provably exact. With
    ``int8_mode`` the per-shard kernel is
    :func:`~codemix_dense_retrieval_tpu.ops.sketch.topk_ip_sketch_int8`
    (certificates prove parity with the int8 exact path).
    """
    from codemix_dense_retrieval_tpu.ops import sketch as sketch_ops

    def local_search(q, d, cnt, scales, d_sk, d_tail, proj):
        shard_id = lax.axis_index(axis)
        if int8_mode:
            vals, idx, cert = sketch_ops.topk_ip_sketch_int8(
                q, d, scales, d_sk, d_tail, proj, k,
                probe_bins=probe_bins, bin_size=bin_size,
                super_size=super_size, tile_b=tile_b, tile_n=tile_n,
                interpret=interpret, n_valid=cnt[0],
            )
        else:
            vals, idx, cert = sketch_ops.topk_ip_sketch(
                q, d, d_sk, d_tail, proj, k,
                probe_bins=probe_bins, bin_size=bin_size, super_size=super_size,
                tile_b=tile_b, tile_n=tile_n, interpret=interpret,
                n_valid=cnt[0],
            )
        gids = idx + shard_id * rows_per_shard
        vals_all = lax.all_gather(vals, axis, axis=1, tiled=True)  # (B, S*k)
        gids_all = lax.all_gather(gids, axis, axis=1, tiled=True)
        cert_all = lax.all_gather(cert[:, None], axis, axis=1, tiled=True)
        neg, ids = lax.sort((-vals_all, gids_all), num_keys=2)
        return -neg[:, :k], ids[:, :k], cert_all.all(axis=1)

    return jax.jit(
        shard_map(
            local_search,
            mesh=mesh,
            in_specs=(
                P(), P(axis, None), P(axis), P(axis), P(axis, None), P(axis),
                P(),
            ),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
    )


def sharded_topk_ip_sketch(
    queries: jnp.ndarray,
    docs_sharded: jax.Array,
    counts: jax.Array,
    sketch_sharded: jax.Array,
    tails_sharded: jax.Array,
    proj: jnp.ndarray,
    k: int,
    *,
    mesh: Mesh,
    axis: str = "shard",
    probe_bins: Optional[int] = None,
    expand: float = 4.0,
    bin_size: Optional[int] = None,
    super_size: Optional[int] = None,
    tile_n: int = 1024,
    tile_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    doc_scales: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Approximate global top-k over a row-sharded index with per-query
    exactness certificates (:mod:`~codemix_dense_retrieval_tpu.ops.sketch`).

    ``sketch_sharded``/``tails_sharded`` as produced by jitting
    :func:`~codemix_dense_retrieval_tpu.ops.sketch.sketch_rows` over the
    sharded rows (for int8 docs: ``sketch_rows_int8`` and per-row
    ``doc_scales`` sharded like counts — certificates then prove parity
    with the int8 exact path). Returns replicated (values (B, k), global
    ids (B, k), certified (B,) bool).
    """
    from codemix_dense_retrieval_tpu.ops.sketch import (
        DEFAULT_BIN_SIZE, DEFAULT_SUPER_SIZE, _default_probe_bins,
    )

    if bin_size is None:
        bin_size = DEFAULT_BIN_SIZE
    if super_size is None:
        super_size = DEFAULT_SUPER_SIZE
    s = mesh.shape[axis]
    rows_per_shard = docs_sharded.shape[0] // s
    if k > rows_per_shard:
        raise ValueError(
            f"k={k} > rows_per_shard={rows_per_shard}; lower k or use fewer shards"
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if probe_bins is None:
        probe_bins = _default_probe_bins(
            k, bin_size, rows_per_shard // bin_size, expand
        )
    int8_mode = docs_sharded.dtype == jnp.int8
    if int8_mode and doc_scales is None:
        raise ValueError("int8 index requires doc_scales")
    if doc_scales is None:
        # dummy per-shard scalar keeps the program signature static (see
        # sharded_topk_ip: an N-sized dummy would bake into outer-jit HLO)
        doc_scales = jax.device_put(
            np.zeros(s, np.float32), NamedSharding(mesh, P(axis))
        )
    tile_b = _resolve_tile_b(tile_b, k, 512, rows_per_shard)
    fn = _build_sharded_sketch_search(
        mesh, axis, k, probe_bins, bin_size, super_size, tile_n, tile_b,
        bool(interpret), rows_per_shard, int8_mode,
    )
    return fn(
        queries, docs_sharded, counts, doc_scales, sketch_sharded,
        tails_sharded, proj,
    )


@functools.lru_cache(maxsize=64)
def _build_sharded_adaptive_search(
    mesh: Mesh,
    axis: str,
    k: int,
    probe_bins: int,
    bin_size: int,
    super_size: int,
    tile_n: int,
    tile_b: int,
    interpret: bool,
    rows_per_shard: int,
):
    """Compiled sharded PROBED-EXACT search: each shard runs the probed
    two-level cover (`ops.topk.topk_ip_bins_two_level_probed`) and
    RETAINS its phase-1 score matrix; the merge is the exact path's
    all-gather + sort. The global certificate composes the per-shard
    TRUE unselected-bin bounds against the MERGED kth value:
    merged-kth > max_s bound_s ⇒ every non-candidate row on every shard
    scores strictly below the merged kth ⇒ the merged top-k is exact.
    (A per-shard AND would be needlessly strict: a query's topical rows
    live on one shard; distant shards certify because ALL their bins
    score low, not because their local top-k concentrates.) The retained
    (B, N) scores stay column-sharded on the mesh for the escalation
    tail (`_build_sharded_adaptive_tail`)."""

    def local_search(q, d, cnt):
        shard_id = lax.axis_index(axis)
        vals, idx, _cert, unsel, scores_bm, binmax_bm = (
            topk_ops.topk_ip_bins_two_level_probed(
                q, d, k, probe_bins=probe_bins, bin_size=bin_size,
                super_size=super_size, tile_b=tile_b, tile_n=tile_n,
                interpret=interpret, n_valid=cnt[0], keep_scores=True,
            )
        )
        gids = idx + shard_id * rows_per_shard
        vals_all = lax.all_gather(vals, axis, axis=1, tiled=True)  # (B, S*k)
        gids_all = lax.all_gather(gids, axis, axis=1, tiled=True)
        unsel_max = lax.pmax(unsel, axis)  # (B,) max unselected bound
        neg, ids = lax.sort((-vals_all, gids_all), num_keys=2)
        merged_vals = -neg[:, :k]
        cert = merged_vals[:, k - 1] > unsel_max
        return merged_vals, ids[:, :k], cert, scores_bm, binmax_bm

    return jax.jit(
        shard_map(
            local_search,
            mesh=mesh,
            in_specs=(P(), P(axis, None), P(axis)),
            out_specs=(P(), P(), P(), P(None, axis), P(None, axis)),
            check_vma=False,
        )
    )


@functools.lru_cache(maxsize=64)
def _build_sharded_adaptive_tail(
    mesh: Mesh,
    axis: str,
    k: int,
    bin_size: int,
    super_size: int,
    rows_per_shard: int,
):
    """Escalation tail over the RETAINED column-sharded scores: full
    two-level selection for the escalated query rows only — phase 1 (the
    matmul, the dominant fixed cost) is never recomputed."""

    def local_tail(scores_bm, binmax_bm, qsel):
        shard_id = lax.axis_index(axis)
        vals, idx = topk_ops.topk_full_tail_bm(
            scores_bm, binmax_bm, qsel, k, bin_size, super_size
        )
        gids = idx + shard_id * rows_per_shard
        vals_all = lax.all_gather(vals, axis, axis=1, tiled=True)
        gids_all = lax.all_gather(gids, axis, axis=1, tiled=True)
        neg, ids = lax.sort((-vals_all, gids_all), num_keys=2)
        return -neg[:, :k], ids[:, :k]

    return jax.jit(
        shard_map(
            local_tail,
            mesh=mesh,
            in_specs=(P(None, axis), P(None, axis), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )


def sharded_topk_ip_adaptive(
    queries: jnp.ndarray,
    docs_sharded: jax.Array,
    counts: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    axis: str = "shard",
    probe_bins: Optional[int] = None,
    expand: float = 2.0,
    bin_size: int = 8,
    super_size: Optional[int] = None,
    tile_n: int = 1024,
    tile_b: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> Tuple[np.ndarray, np.ndarray, dict]:
    """ALWAYS-EXACT adaptive top-k over a row-sharded index.

    Probes ``probe_bins`` bins per shard with true-bin-max exactness
    certificates, then escalates only the uncertified queries:

    - escalated fraction <= 1/2: re-run ONLY the selection tail on the
      retained phase-1 scores (matmul never recomputed) — worst case a
      few % over the fixed cover, best case the probed tail's cost;
    - escalated fraction > 1/2 (adversarial/unclustered data): free the
      retained scores first, then run the fixed-cover path for the
      escalated set (bounds peak HBM to one score matrix).

    Returns ``(values (B, k) f32, global ids (B, k) int32, stats)`` with
    ``stats["certified_frac"]`` the probe's certificate rate. Results are
    bit-identical to :func:`sharded_topk_ip` for every query. Certificate
    rate is a row-order property — see
    :meth:`DenseFlatIndex.reorder_rows`.
    """
    from codemix_dense_retrieval_tpu.ops.sketch import _default_probe_bins
    from codemix_dense_retrieval_tpu.utils import next_pow2

    s = mesh.shape[axis]
    rows_per_shard = docs_sharded.shape[0] // s
    if k > rows_per_shard:
        raise ValueError(
            f"k={k} > rows_per_shard={rows_per_shard}; lower k or use fewer shards"
        )
    if docs_sharded.dtype == jnp.int8:
        raise NotImplementedError(
            "adaptive probed-exact search supports bf16/f32 indexes; "
            "int8 indexes use the fixed cover (sharded_topk_ip) or the "
            "int8 sketch tier"
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if super_size is None:
        from codemix_dense_retrieval_tpu.ops.topk import _auto_super_size

        super_size = _auto_super_size(k)
    nb_local = rows_per_shard // bin_size
    if probe_bins is None:
        probe_bins = _default_probe_bins(k, bin_size, nb_local, expand)
    probe_bins = max(min(probe_bins, nb_local), -(-k // bin_size))
    tile_b = _resolve_tile_b(tile_b, k, 512, rows_per_shard)
    fn = _build_sharded_adaptive_search(
        mesh, axis, k, probe_bins, bin_size, super_size, tile_n, tile_b,
        bool(interpret), rows_per_shard,
    )
    vals, gids, cert, scores_bm, binmax_bm = fn(queries, docs_sharded, counts)
    cert_np = np.asarray(cert)
    b = len(cert_np)
    stats = {"certified_frac": float(cert_np.mean()), "probe_bins": probe_bins}
    if cert_np.all():
        del scores_bm, binmax_bm
        return np.asarray(vals), np.asarray(gids), stats
    bad = np.flatnonzero(~cert_np)
    vals_np = np.asarray(vals).copy()
    gids_np = np.asarray(gids).copy()
    if len(bad) <= b // 2:
        # tail-only escalation on the retained scores, pow2-bucketed so
        # each distinct escalation size is one compile
        bucket = min(next_pow2(len(bad)), b)
        qsel = np.zeros(bucket, np.int32)
        qsel[: len(bad)] = bad
        tail = _build_sharded_adaptive_tail(
            mesh, axis, k, bin_size, super_size, rows_per_shard
        )
        ev, eg = tail(scores_bm, binmax_bm, jnp.asarray(qsel))
        del scores_bm, binmax_bm
        vals_np[bad] = np.asarray(ev)[: len(bad)]
        gids_np[bad] = np.asarray(eg)[: len(bad)]
    else:
        del scores_bm, binmax_bm  # free BEFORE the full-path score matrix
        bucket = min(next_pow2(len(bad)), b)
        q = jnp.asarray(queries)
        # keep the caller's query dtype: the probed main path scored the
        # queries as passed, so the escalation must too (bit-parity)
        sub = jnp.zeros((bucket, q.shape[1]), q.dtype).at[: len(bad)].set(q[bad])
        ev, eg = sharded_topk_ip(
            sub, docs_sharded, counts, k,
            mesh=mesh, axis=axis, bin_size=None, tile_n=tile_n,
            interpret=interpret,
        )
        vals_np[bad] = np.asarray(ev)[: len(bad)]
        gids_np[bad] = np.asarray(eg)[: len(bad)]
    stats["escalated"] = int(len(bad))
    return vals_np, gids_np, stats


def sharded_topk_ip(
    queries: jnp.ndarray,
    docs_sharded: jax.Array,
    counts: jax.Array,
    k: int,
    *,
    mesh: Mesh,
    axis: str = "shard",
    bin_size: Optional[int] = None,
    method: str = "auto",
    tile_n: int = 1024,
    tile_b: Optional[int] = None,
    interpret: Optional[bool] = None,
    doc_scales: Optional[jax.Array] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact global top-k over a row-sharded index.

    ``queries`` is replicated; ``docs_sharded``/``counts`` as produced by
    :func:`shard_rows`. With int8 docs, pass per-row ``doc_scales``
    (sharded like counts): queries are quantized per-row on-device and
    scoring runs the int8 MXU path (`ops.quant`). Returns replicated
    (values (B, k), global ids (B, k) int32), ties broken by lower global
    id (FAISS parity).
    """
    s = mesh.shape[axis]
    rows_per_shard = docs_sharded.shape[0] // s
    if k > rows_per_shard:
        raise ValueError(
            f"k={k} > rows_per_shard={rows_per_shard}; lower k or use fewer shards"
        )
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if method == "auto":
        # big shards: bin-major two-level wins at every depth (the
        # per-shard analog of ops.topk.topk_ip's r3 routing; int8
        # shares the selection tail)
        if rows_per_shard >= 262144:
            method = "bins_two_level"
        else:
            method = "bins_pallas"
    if bin_size is None:
        from codemix_dense_retrieval_tpu.ops.topk import (
            _auto_bin_size,
            _auto_bin_size_two_level,
        )

        # two-level's winner is tail-layout-specific: G8 native bin-major
        # was the measured k=100 winner (probe_k100_bm r3); G16 here used
        # to force the lane-illegal transposed-binmax fallback — the
        # production sharded path must run the config the bench measures
        bin_size = (
            _auto_bin_size_two_level(k)
            if method == "bins_two_level" else _auto_bin_size(k)
        )
    int8_mode = docs_sharded.dtype == jnp.int8
    if int8_mode and doc_scales is None:
        raise ValueError("int8 index requires doc_scales")
    if doc_scales is None:
        # dummy one-scalar-per-shard so the program signature is static;
        # an N-sized dummy would be baked as a multi-MB HLO constant when
        # this is called inside an outer jit (pipeline/fused.py)
        doc_scales = jax.device_put(
            np.zeros(s, np.float32), NamedSharding(mesh, P(axis))
        )
    if method == "bins_two_level":
        tile_b = _resolve_tile_b(tile_b, k, 256, rows_per_shard)
    elif tile_b is None:
        # tuned-store tile_b entries are measured on the two-level kernel
        # only; the single-level bins kernel keeps its benchmarked default
        # (advisor r4 finding)
        tile_b = 256
    fn = _build_sharded_search(
        mesh, axis, k, method, bin_size, tile_n, tile_b,
        bool(interpret), int8_mode, rows_per_shard,
    )
    return fn(queries, docs_sharded, counts, doc_scales)
