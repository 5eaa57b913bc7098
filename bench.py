"""Benchmark: exact-search throughput on the per-chip north-star workload.

Searches a synthetic 1.1M x 1024 bf16 index (the per-chip shard of the
8.8M-passage mMARCO EN-ZH index spread over a v5e-8) with the fused
bin-max-cover kernels at BOTH serving depths:

- k=100 (the mono runners' depth, the headline metric) via the
  single-level cover;
- k=1000 (BASELINE.json's "exact IP top-1000" smoke depth; the bilingual
  hub serves k=500) via the two-level cover — reported as the
  ``search_qps_k1000`` key on the same line.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` is k=100 qps / 10_000 (the full-pod target rate; a single
chip sustaining it on its shard means the 8-chip system does too, since
every chip searches its shard concurrently and the merge payload is ~KBs).
"""

import functools
import json
import os
import sys
import threading
import time

import numpy as np

# sitecustomize pins the TPU platform and ignores the env var; honor it
# in-process so `JAX_PLATFORMS=cpu python bench.py` is a real CPU smoke
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")

# ---------------------------------------------------------------------------
# Relay-proofing (VERDICT r3 weak 1): the TPU relay can be down in a mode
# where backend init raises after ~15 min or jax.devices() hangs outright —
# and even when up, the chip can run ~10x slower than nominal (bench_logs
# r4b: the r4s3 17-min program blew a 3000 s watchdog). The official record
# must ALWAYS be one parsable JSON line with a REAL number:
#   - a bounded subprocess probe decides TPU vs CPU-smoke before any
#     in-process backend touch;
#   - a cheap FIRST-LIGHT phase (128k-row shard) banks a genuine measured
#     qps within minutes, before the 2.2 GB full-shard upload is attempted;
#   - partial results accumulate in _RESULT and a watchdog emits them if
#     the deadline passes (a mid-run relay death can stall a device sync);
#   - later phases are skipped when the remaining budget can't fit them;
#   - main() wraps everything else in try/except -> error keys, rc 0.
# ---------------------------------------------------------------------------

_RESULT: dict = {
    "metric": "search_qps_1100000x1024_bf16_k100",
    "value": 0.0,
    "unit": "queries/sec",
    "vs_baseline": 0.0,
}
_EMITTED = threading.Event()
_T0 = time.time()
_DEADLINE = float(os.environ.get("CDR_BENCH_DEADLINE", "3000"))


# Pinned chip-state reference for normalized keys (VERDICT r4 item 6):
# the probe's chained-matmul TF/s on a DATASHEET v5e (bf16 peak). The
# relay chip's effective clock swings 2-4x between sessions (BENCH_NOTES
# r4f: 5,747 vs 11,139 qps, same program, one hour apart), so raw qps is
# not comparable round-over-round; qps x (pinned / measured probe) is.
_PINNED_PROBE_TFLOPS = 197.0


def _derive_normalized() -> None:
    tf = _RESULT.get("mxu_tflops_bf16_4k")
    if not tf:
        return
    ratio = _PINNED_PROBE_TFLOPS / tf
    _RESULT["normalization"] = (
        f"x{_PINNED_PROBE_TFLOPS:.0f}/{tf:.1f} (pinned datasheet v5e bf16 "
        "probe / this session's probe)"
    )
    if _RESULT.get("value") and str(_RESULT.get("metric", "")).startswith("search_qps"):
        _RESULT["qps_per_mxu_tf"] = round(_RESULT["value"] / tf, 1)
        _RESULT["vs_baseline_normalized"] = round(
            _RESULT["value"] * ratio / 10_000.0, 3)
    for key in list(_RESULT):
        if key.startswith("search_qps_k") and isinstance(_RESULT[key], (int, float)):
            depth = key.removeprefix("search_qps_")
            _RESULT[f"qps_per_mxu_tf_{depth}"] = round(_RESULT[key] / tf, 1)
            _RESULT[f"vs_baseline_{depth}_normalized"] = round(
                _RESULT[key] * ratio / 10_000.0, 3)


def _emit() -> None:
    if not _EMITTED.is_set():
        _EMITTED.set()
        try:
            _derive_normalized()
        except Exception:  # noqa: BLE001 — derivation must never sink emit
            pass
        print(json.dumps(_RESULT), flush=True)


def _left() -> float:
    if _DEADLINE <= 0:
        return float("inf")
    return _DEADLINE - (time.time() - _T0)


def _log(msg: str) -> None:
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _arm_watchdog() -> None:
    if _DEADLINE <= 0:
        return

    def _fire():
        _RESULT["timeout"] = True
        _RESULT.setdefault("error", f"watchdog: exceeded {_DEADLINE:.0f}s")
        _emit()
        os._exit(0)  # partial record beats a killed process with none

    t = threading.Timer(_DEADLINE, _fire)
    t.daemon = True
    t.start()


def _timed_pair(run, args, iters):
    # warmup/compile twice — force a scalar device->host transfer: on the
    # axon relay platform block_until_ready can return before a pallas
    # program has actually compiled+run, which would push the compile into
    # the first timed iteration
    out = run(*args)
    _ = float(out[0][0, 0])
    out = run(*args)
    _ = float(out[0][0, 0])
    # timed: force device completion AND host transfer each iteration so
    # async-dispatch platforms cannot under-report; MEDIAN of per-iteration
    # times (the relay adds occasional multi-hundred-ms outliers)
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = run(*args)
        _ = float(out[0][0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def _timed_run(run, queries, docs, iters):
    dt, (vals, idx) = _timed_pair(run, (queries, docs), iters)
    return dt, idx


def _overlap(idx, queries, oracle_docs_f32, k_check):
    """Exactness sanity vs the bf16-rounded f32 oracle (guards against a
    fast-but-wrong kernel)."""
    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle

    _, ri = topk_ip_oracle(
        np.asarray(queries[:8]).astype(np.float32), oracle_docs_f32, k_check
    )
    got = np.asarray(idx)[:8, :k_check]
    return float(np.mean([
        len(set(g.tolist()) & set(r.tolist())) / k_check for g, r in zip(got, ri)
    ]))


def _recall(got_idx, ref_idx, k) -> float:
    got, ref = np.asarray(got_idx), np.asarray(ref_idx)
    return float(np.mean([
        len(set(got[q, :k].tolist()) & set(ref[q, :k].tolist())) / k
        for q in range(got.shape[0])
    ]))


def main() -> None:
    _arm_watchdog()

    from codemix_dense_retrieval_tpu.utils.devices import (
        force_cpu_platform,
        tpu_available,
    )

    # Bounded TPU availability check BEFORE any in-process backend touch
    # (jax.default_backend() against a dead relay raises after ~15 min or
    # hangs — the exact BENCH_r03 failure).
    on_tpu = tpu_available(retries=2)
    if not on_tpu:
        force_cpu_platform(1)
        _RESULT["backend"] = "cpu"
        _RESULT["tpu_unavailable"] = True

    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from codemix_dense_retrieval_tpu.ops.topk import (
        topk_ip_bins,
        topk_ip_bins_two_level,
    )
    from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    n, dim, block = 1_100_000, 1024, 1024
    k, k_deep = 100, 1000
    n_first = 131_072  # first-light shard: real number banked in minutes
    if not on_tpu:  # keep the CPU smoke honest but fast
        n, block, k_deep = 20_000, 256, 300
        n_first = 0

    _log(f"backend={'tpu' if on_tpu else 'cpu'} generating host corpus n={n}")
    rng = np.random.default_rng(0)
    docs_np = rng.standard_normal((n, dim), dtype=np.float32)
    # cast on HOST: halves the tunnel upload (2.2 GB vs 4.5 GB) and gives
    # the bf16-rounded f32 oracle with zero device readback
    docs_bf16_np = docs_np.astype(ml_dtypes.bfloat16)
    del docs_np
    queries = jnp.asarray(
        rng.standard_normal((block, dim), dtype=np.float32)
    ).astype(jnp.bfloat16)

    def _mk_run100(interp):
        # k=100 routes through the bin-major two-level on big shards
        # (probe_k100_bm r3: +12% over single-level, identical ids); the
        # CPU smoke keeps the single-level binned path at its small shapes.
        # bin/super sizes come from the per-device tuned store (G8 M8
        # measured defaults when no store exists) so `tune` wins apply.
        if on_tpu:
            # tile_b=None -> per-depth tuned store (512 default)
            return jax.jit(functools.partial(
                topk_ip_bins_two_level, k=k,
                tile_b=None, tile_n=1024, interpret=False,
            ))
        return jax.jit(functools.partial(
            topk_ip_bins, k=k, bin_size=16, use_pallas=False, tile_b=512,
            tile_n=1024, interpret=True,
        ))

    def _mk_conservative(depth):
        # always-compilable config (G8 keeps the native bin-major binmax
        # tile; tb512 halves the scoped-vmem stack): the tuned G16xtb1024
        # winner VMEM-OOMs the remote compiler on SMALL shards (131k
        # first-light, bench_logs/r4i) while compiling fine at 1.1M
        return jax.jit(functools.partial(
            topk_ip_bins_two_level, k=depth, bin_size=8, super_size=8,
            tile_b=512, tile_n=1024, interpret=not on_tpu,
        ))

    def _timed_run_fb(run, depth, queries, docs, iters, tag):
        """Timed run that falls back to the conservative config when the
        tuned config fails to compile (remote VMEM OOM class), so one bad
        tuned entry can never zero the official record."""
        try:
            return _timed_run(run, queries, docs, iters)
        except Exception as exc:  # noqa: BLE001 — compile/runtime failure
            import traceback

            _RESULT[f"tuned_fallback_{tag}"] = f"{type(exc).__name__}: {exc}"[:120]
            # full traceback to the bench log so unrelated failures (OOM
            # mid-run, relay errors) still surface loudly even though the
            # conservative numbers become the official record (advisor r4)
            _log(f"{tag}: tuned config failed; conservative retry. Traceback:\n"
                 + traceback.format_exc())
            return _timed_run(_mk_conservative(depth), queries, docs, iters)

    run_100 = _mk_run100(not on_tpu)
    run_deep = jax.jit(functools.partial(
        topk_ip_bins_two_level, k=k_deep, tile_b=None, tile_n=1024,
        interpret=not on_tpu,
    ))
    iters = 12 if on_tpu else 3

    # ---------------- first-light (TPU only): bank a real headline early
    if n_first:
        _log(f"first-light: upload {n_first} rows")
        docs_fl = jnp.asarray(docs_bf16_np[:n_first])
        oracle_fl = docs_bf16_np[:n_first].astype(np.float32)
        dt, idx = _timed_run(_mk_conservative(k), queries, docs_fl, 6)
        qps_fl = block / dt
        ov_fl = _overlap(idx, queries, oracle_fl, 20)
        _RESULT.update({
            "metric": f"search_qps_{n_first}x{dim}_bf16_k{k}",
            "value": round(qps_fl, 1),
            # ratio of the full-shard target scaled by shard fraction —
            # provisional; overwritten by the full-size phase below
            "vs_baseline": round(qps_fl * (n_first / n) / 10_000.0, 3),
            "exact_overlap_at_20": round(ov_fl, 4),
            "block": block,
            "backend": jax.default_backend(),
            "first_light_only": True,
        })
        _log(f"first-light k=100: {qps_fl:.0f} qps overlap={ov_fl:.3f}")
        dt_dfl, _ = _timed_run(_mk_conservative(k_deep), queries, docs_fl, 4)
        _RESULT[f"search_qps_k{k_deep}"] = round(block / dt_dfl, 1)
        _log(f"first-light k={k_deep}: {block / dt_dfl:.0f} qps")
        del docs_fl, oracle_fl

    # chip-speed reference: the relay chip's effective clock swings 2-4x
    # between sessions (11.1k vs 5.7k qps for the same program measured
    # an hour apart, r4c/r4d logs) — one bf16 MXU probe on the record
    # lets any reader normalize the qps keys to the chip's state
    if on_tpu and _left() > 180:
        try:
            from jax import lax as _lax

            a = jnp.asarray(
                rng.standard_normal((4096, 4096), dtype=np.float32)
            ).astype(jnp.bfloat16)
            # 32 CHAINED matmuls per sync: one 4k matmul is 137 GFLOP —
            # under the ~25-40 ms relay round-trip, a single-op probe
            # measures dispatch latency, not the MXU (observed 5 TF/s
            # for a chip whose search phase-1 sustains ~27 TF/s)
            reps = 32
            mm = jax.jit(
                lambda x: _lax.fori_loop(0, reps, lambda i, y: y @ x, x)
            )
            dt_mm, _ = _timed_pair(lambda x: (mm(x),), (a,), 8)
            _RESULT["mxu_tflops_bf16_4k"] = round(
                reps * 2 * 4096**3 / dt_mm / 1e12, 1
            )
            _log(f"mxu probe: {_RESULT['mxu_tflops_bf16_4k']} TF/s")
            del a
        except Exception as exc:  # noqa: BLE001
            _RESULT["mxu_probe_error"] = f"{type(exc).__name__}: {exc}"[:120]

    # ---------------- full shard
    if _left() < 420 and n_first:
        _RESULT["full_shard_skipped"] = "budget"
        _log("budget too low for full shard — emitting first-light record")
        _emit()
        return
    _log(f"full shard: upload {n} rows ({n * dim * 2 / 2**30:.1f} GiB)")
    docs = jnp.asarray(docs_bf16_np)
    docs.block_until_ready()
    oracle_docs = docs_bf16_np.astype(np.float32)
    _log("upload done; k=100 compile+run")
    dt, idx = _timed_run_fb(run_100, k, queries, docs, iters, "k100")
    qps = block / dt
    overlap = _overlap(idx, queries, oracle_docs, 20)
    # bank the headline immediately — a later phase dying on the relay
    # must not erase the number already measured
    _RESULT.pop("first_light_only", None)
    _RESULT.update({
        "metric": f"search_qps_{n}x{dim}_bf16_k{k}",
        "value": round(qps, 1),
        "vs_baseline": round(qps / 10_000.0, 3),
        "exact_overlap_at_20": round(overlap, 4),
        "block": block,
        "backend": jax.default_backend(),
    })
    _log(f"k=100: {qps:.0f} qps overlap={overlap:.3f}")

    # deep-k (two-level cover, measured defaults)
    dt_deep, idx_deep = _timed_run_fb(
        run_deep, k_deep, queries, docs, max(3, iters // 2), f"k{k_deep}"
    )
    qps_deep = block / dt_deep
    overlap_deep = _overlap(idx_deep, queries, oracle_docs, min(k_deep, 200))
    _RESULT.update({
        f"search_qps_k{k_deep}": round(qps_deep, 1),
        f"exact_overlap_k{k_deep}": round(overlap_deep, 4),
        # BASELINE.md's throughput row is ">=10k qps at EXACT IP
        # top-1000" — report the ratio at that depth, not only at k=100
        # (VERDICT r2 weak 1)
        f"vs_baseline_k{k_deep}": round(qps_deep / 10_000.0, 3),
    })
    _log(f"k={k_deep}: {qps_deep:.0f} qps overlap={overlap_deep:.3f}")
    del docs_bf16_np, oracle_docs

    # within-session k=1000 floor attribution (VERDICT r4 item 2's
    # alternate done-condition): phase-1 matmul alone vs the selection
    # tail alone, same chip state as the headline — proves what the
    # remaining gap to the 10k north star is made of
    if on_tpu and _left() > 300:
        try:
            _bench_tail_split(jax, jnp, docs, queries, k_deep, dt_deep,
                              max(3, iters // 2))
        except Exception as exc:  # noqa: BLE001
            _RESULT["tail_split_error"] = f"{type(exc).__name__}: {exc}"[:200]

    if on_tpu:
        # mutation first: cheap (~1 min) and previously unmeasured on HW
        if _left() > 90:
            try:
                _bench_mutation_scatter(jax, jnp, docs, max(3, iters // 2))
            except Exception as exc:  # noqa: BLE001
                _RESULT["mutation_error"] = f"{type(exc).__name__}: {exc}"[:200]
        else:
            _RESULT["mutation_skipped"] = "budget"
        if _left() > 420:
            try:
                # banks keys into _RESULT incrementally — a mid-phase relay
                # death (watchdog) still records everything measured so far
                _bench_sketch(
                    jax, jnp, docs, queries, k, k_deep, block,
                    max(3, iters // 2),
                )
            except Exception as exc:  # noqa: BLE001 — never sink the record
                _RESULT["sketch_error"] = f"{type(exc).__name__}: {exc}"[:200]
        else:
            _RESULT["sketch_skipped"] = "budget"
        # adaptive probed-exact on the clustered workload it exists for
        # (VERDICT r4 item 7: promote the r4d cert=1.000 result from
        # bench_logs to the driver-captured record)
        if _left() > 420:
            try:
                _bench_adaptive_clustered(
                    jax, jnp, docs, k, k_deep, block, max(3, iters // 2)
                )
            except Exception as exc:  # noqa: BLE001
                _RESULT["adaptive_error"] = f"{type(exc).__name__}: {exc}"[:200]
        else:
            _RESULT["adaptive_skipped"] = "budget"
        # production-scale shard LAST (it derives a ~9 GiB corpus on-device
        # and frees the 1.1M shard first; VERDICT r4 item 3: measure the
        # qps-vs-N curve instead of asserting it)
        if _left() > 500:
            try:
                # hand the ONLY reference over in a container so the
                # helper can actually free the 2.2 GiB source shard
                # before searching the 9 GiB derived one
                box = [docs]
                docs = None
                _bench_big_shard(jax, jnp, box, queries, k, k_deep)
            except Exception as exc:  # noqa: BLE001
                _RESULT["big_shard_error"] = f"{type(exc).__name__}: {exc}"[:200]
        else:
            _RESULT["big_shard_skipped"] = "budget"

    _emit()


def _bench_sketch(jax, jnp, docs, queries, k, k_deep, block, iters,
                  interpret=False):
    """Approximate (sketch) tier at BOTH serving depths on a REALISTIC
    anisotropic workload (iid gaussian is the sketch's adversarial worst
    case; sentence embeddings concentrate — the reference's own
    anisotropy analysis). The anisotropic corpus is derived on-device
    from the already-uploaded rows (no second 2.2 GB tunnel transfer).

    Per depth, the probe is stepped until recall vs the exact kernel on
    the SAME corpus reaches 0.95 (or the step budget runs out) — a fixed
    probe said nothing at 1.1M rows (r4s3 banked recall 0.2557). Banks
    keys as measured, including the guaranteed-exact EFFECTIVE rate at
    k=1000 (sketch + escalating uncertified queries through exact — the
    k=1000 north-star answer, VERDICT r3 item 3); failures degrade to a
    sketch_error key."""
    from codemix_dense_retrieval_tpu.ops.sketch import (
        fit_sketch, sketch_rows_jit, topk_ip_sketch,
    )
    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

    dim = docs.shape[1]
    spec = jnp.asarray(np.exp(-0.009 * np.arange(dim)), jnp.float32)

    def _aniso(x, s):
        y = x.astype(jnp.float32) * s
        return (y / jnp.linalg.norm(y, axis=1, keepdims=True)).astype(jnp.bfloat16)

    reshape_fn = jax.jit(_aniso)
    docs_a = reshape_fn(docs, spec)
    queries_a = reshape_fn(queries, spec)
    # fit on a readback sample (64 MB down the tunnel)
    sample = np.asarray(docs_a[:32768]).astype(np.float32)
    proj = jnp.asarray(fit_sketch(sample, 128))
    d_sk, d_tail = sketch_rows_jit(docs_a, proj)
    _ = float(d_sk[0, 0])
    _log("sketch sidecar armed")

    def _exact(depth):
        # same static config as the main phases -> compile-cache hit
        run = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=depth, tile_b=None, tile_n=1024,
            interpret=interpret,
        ))
        return _timed_pair(run, (queries_a, docs_a), iters)

    def _sketch_at(depth, probe):
        run = jax.jit(functools.partial(
            topk_ip_sketch, k=depth, probe_bins=probe, interpret=interpret,
        ))
        return _timed_pair(run, (queries_a, docs_a, d_sk, d_tail, proj), iters)

    for depth, probes in ((k, (64, 256, 1024)), (k_deep, (256, 1024))):
        if _left() < 240:
            _RESULT[f"sketch_k{depth}_skipped"] = "budget"
            continue
        dt_e, (ev, ei) = _exact(depth)
        best = None  # (probe, dt, recall, cert_frac, viol, si, cert_np)
        for probe in probes:
            dt_s, (sv, si, cert) = _sketch_at(depth, probe)
            rec = _recall(si, ei, depth)
            cert_np = np.asarray(cert)
            si_np, ei_np = np.asarray(si), np.asarray(ei)
            viol = sum(
                not np.array_equal(si_np[q], ei_np[q])
                for q in np.flatnonzero(cert_np)
            )
            _log(
                f"sketch k={depth} probe={probe}: {block / dt_s:.0f} qps "
                f"recall={rec:.3f} cert={cert_np.mean():.3f}"
            )
            best = (probe, dt_s, rec, float(cert_np.mean()), viol, si, cert_np)
            if rec >= 0.95 or _left() < 180:
                break
        probe, dt_s, rec, cert_frac, viol, si, cert_np = best
        _RESULT.update({
            f"sketch_qps_k{depth}": round(block / dt_s, 1),
            f"sketch_recall_k{depth}": round(rec, 4),
            f"sketch_probe_k{depth}": probe,
            f"sketch_cert_frac_k{depth}": round(cert_frac, 4),
            f"sketch_cert_violations_k{depth}": int(viol),
            f"sketch_speedup_vs_exact_k{depth}": round(dt_e / dt_s, 2),
        })
        if depth != k_deep:
            continue
        # guaranteed-exact effective rate at the deep depth: the sketch
        # pass plus one exact pass over the UNCERTIFIED queries (pow2-
        # bucketed, exactly DenseFlatIndex.search(approx="guaranteed")'s
        # escalation); certified rows already equal exact (viol above),
        # so this is the cost of provably exact results via the sketch
        esc = np.flatnonzero(~cert_np)
        dt_esc = 0.0
        if len(esc):
            from codemix_dense_retrieval_tpu.utils import next_pow2

            bucket = next_pow2(len(esc))  # flat.py's escalation bucketing
            sub = np.zeros((bucket, dim), np.float32)
            sub[: len(esc)] = np.asarray(queries_a[esc], np.float32)
            sub_dev = jnp.asarray(sub, queries_a.dtype)
            run_exact = jax.jit(functools.partial(
                topk_ip_bins_two_level, k=depth, tile_b=None, tile_n=1024,
                interpret=interpret,
            ))
            dt_esc, _ = _timed_pair(run_exact, (sub_dev, docs_a), iters)
        _RESULT.update({
            f"guaranteed_qps_k{depth}": round(block / (dt_s + dt_esc), 1),
            "guaranteed_escalated": int(len(esc)),
            f"vs_baseline_guaranteed_k{depth}": round(
                block / (dt_s + dt_esc) / 10_000.0, 3),
        })


def _bench_mutation_scatter(jax, jnp, docs, iters):
    """Online-mutation hot path on hardware: the donated row scatter +
    count-mask refresh that index.add()/remove() dispatch
    (`index/flat.py` _scatter_update — the exact jitted program, so
    Mosaic/relay behavior of donated scatters is measured, VERDICT r3
    weak 5). 256-row batch, median latency in ms."""
    from codemix_dense_retrieval_tpu.index.flat import _scatter_update

    n, dim = docs.shape
    rng = np.random.default_rng(7)
    rows = jnp.asarray(
        rng.standard_normal((256, dim), dtype=np.float32), docs.dtype
    )
    pos = jnp.asarray(rng.choice(n, 256, replace=False).astype(np.int32))
    # do NOT donate the shared corpus buffer: scatter into a copy so the
    # sketch phase can still read `docs` afterwards
    buf = _scatter_update(docs + 0, pos, rows)  # compile (donates the copy)
    _ = float(buf[0, 0])
    times = []
    for _ in range(iters * 2):
        t0 = time.perf_counter()
        buf = _scatter_update(buf, pos, rows)
        _ = float(buf[0, 0])
        times.append(time.perf_counter() - t0)
    times.sort()
    _RESULT["mutation_scatter_256rows_ms"] = round(
        times[len(times) // 2] * 1e3, 2)
    _log(f"mutation scatter: {_RESULT['mutation_scatter_256rows_ms']} ms")


def _bench_tail_split(jax, jnp, docs, queries, k_deep, dt_block, iters):
    """Bank the deep-k stage split in the official record: the full
    block cost (already measured) decomposes into [phase-1 matmul |
    score+binmax write | selection tail]. probe_tail_r5 (bench_logs/r5)
    measured the tail's components at the XLA issue-bound floor —
    gathers carry a ~17-20 ms FIXED cost regardless of slice count and
    top_k at the super domain is k-independent — so the driver record
    carries the evidence that the remaining k=1000 gap is clock-bound
    XLA select/gather issue, not kernel inefficiency."""
    import functools

    from jax import lax

    from codemix_dense_retrieval_tpu.ops import topk as tk

    block = queries.shape[0]
    # pure phase-1 matmul, no score write (the MXU floor)
    mm = jax.jit(lambda q, d: jnp.sum(lax.dot_general(
        q, d, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)).reshape(1, 1))
    dt_mm, _ = _timed_pair(lambda q, d: (mm(q, d),), (queries, docs), iters)

    # selection tail alone on precomputed bin-major scores + binmax
    g = tk._auto_bin_size_two_level(k_deep)
    m = tk._auto_super_size(k_deep)
    n = docs.shape[0]
    n_pad = -(-n // (g * m)) * (g * m)

    @jax.jit
    def mk_inputs(q, d):
        s = lax.dot_general(q, d, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        if n_pad != n:
            s = jnp.pad(s, ((0, 0), (0, n_pad - n)),
                        constant_values=tk.NEG_INF)
        return s, s.reshape(block, n_pad // g, g).max(axis=2)

    scores_bm, binmax_bm = mk_inputs(queries, docs)
    _ = float(binmax_bm[0, 0])
    tail = jax.jit(functools.partial(
        tk._topk_from_bins_two_level_bm, k=k_deep, bin_size=g, super_size=m))
    dt_tail, _ = _timed_pair(tail, (scores_bm, binmax_bm), iters)
    del scores_bm, binmax_bm
    _RESULT.update({
        "k1000_block_ms": round(dt_block * 1e3, 1),
        "k1000_phase1_matmul_ms": round(dt_mm * 1e3, 1),
        "k1000_phase1_matmul_tflops": round(
            2 * block * docs.shape[0] * docs.shape[1] / dt_mm / 1e12, 1),
        "k1000_tail_ms": round(dt_tail * 1e3, 1),
        "k1000_score_write_ms": round(
            max(dt_block - dt_mm - dt_tail, 0.0) * 1e3, 1),
        "k1000_tail_frac": round(dt_tail / dt_block, 3),
    })
    _log(
        f"tail split: block {dt_block*1e3:.0f} = matmul {dt_mm*1e3:.0f} + "
        f"write/bin {max(dt_block - dt_mm - dt_tail, 0)*1e3:.0f} + "
        f"tail {dt_tail*1e3:.0f} ms"
    )


def _bench_adaptive_clustered(jax, jnp, docs, k, k_deep, block, iters):
    """Adaptive probed-exact tier on a CLUSTERED (topical) corpus — the
    workload the tier exists for, derived ON-DEVICE from the uploaded
    gaussian rows (no second tunnel transfer): row i becomes
    normalize(center[assign_i] + 0.35/sqrt(d) * docs_i) with assign
    cluster-SORTED (the probed cover's win is a row-order property).
    Mirrors scripts/bench_adaptive.py's r4d result (cert=1.000,
    bit-parity) into the official driver record."""
    from codemix_dense_retrieval_tpu.ops.topk import (
        topk_ip_bins_two_level,
        topk_ip_bins_two_level_probed,
    )

    n, dim = docs.shape
    centers = 256
    rng = np.random.default_rng(11)
    c = rng.standard_normal((centers, dim), dtype=np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    assign = np.sort(rng.integers(0, centers, n)).astype(np.int32)
    qassign = rng.integers(0, centers, block).astype(np.int32)
    scale = np.float32(0.35 / np.sqrt(dim))
    c_dev = jnp.asarray(c)

    def _mk(noise, a):
        y = jnp.take(c_dev, a, axis=0) + scale * noise.astype(jnp.float32)
        return (y / jnp.linalg.norm(y, axis=1, keepdims=True)).astype(jnp.bfloat16)

    mk = jax.jit(_mk)
    docs_c = mk(docs, jnp.asarray(assign))
    # query noise from the corpus TAIL rows (occasional shared noise with
    # a same-center row just plants a perfect hit — a realistic query)
    queries_c = mk(docs[-block:], jnp.asarray(qassign))
    docs_c.block_until_ready()
    _log("adaptive: clustered corpus derived on-device")

    for depth in (k, k_deep):
        if _left() < 240:
            _RESULT[f"adaptive_k{depth}_skipped"] = "budget"
            continue
        run_e = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=depth, tile_b=None, tile_n=1024,
        ))
        dt_e, (ev, ei) = _timed_pair(run_e, (queries_c, docs_c), iters)
        ei_np = np.asarray(ei)
        _log(f"adaptive k={depth}: exact {block / dt_e:.0f} qps")
        tried = []
        for probe in (max(64, depth // 4), 268, 806):
            run_p = jax.jit(functools.partial(
                topk_ip_bins_two_level_probed, k=depth, probe_bins=probe,
                tile_b=None, tile_n=1024,
            ))
            dt_p, (pv, pi, cert, _unsel) = _timed_pair(
                run_p, (queries_c, docs_c), iters)
            cert_np = np.asarray(cert)
            _log(f"adaptive k={depth} probe={probe}: {block / dt_p:.0f} qps "
                 f"cert={cert_np.mean():.3f}")
            tried.append((probe, dt_p, cert_np, pi))
            if cert_np.mean() >= 0.98 or _left() < 180:
                break
        # best operating point among those tried: highest certificate
        # rate, cheaper probe as tie-break (uncertified queries pay the
        # full exact escalation, so cert dominates effective cost)
        probe, dt_p, cert_np, pi = max(
            tried, key=lambda t: (t[2].mean(), -t[1]))
        # escalation: exact rerun over the uncertified queries (pow2
        # bucket, the flat.py adaptive-tier policy) — total = probed +
        # escalated cost, still provably exact
        esc = np.flatnonzero(~cert_np)
        dt_esc = 0.0
        if len(esc):
            from codemix_dense_retrieval_tpu.utils import next_pow2

            sub = np.zeros((next_pow2(len(esc)), dim), np.float32)
            sub[: len(esc)] = np.asarray(queries_c[esc], np.float32)
            dt_esc, _ = _timed_pair(
                run_e, (jnp.asarray(sub, queries_c.dtype), docs_c), iters)
        pi_np = np.asarray(pi)
        viol = sum(
            not np.array_equal(pi_np[q], ei_np[q]) for q in np.flatnonzero(cert_np)
        )
        _RESULT.update({
            f"adaptive_qps_k{depth}": round(block / (dt_p + dt_esc), 1),
            f"adaptive_cert_frac_k{depth}": round(float(cert_np.mean()), 4),
            f"adaptive_probe_k{depth}": probe,
            f"adaptive_escalated_k{depth}": int(len(esc)),
            f"adaptive_parity_violations_k{depth}": int(viol),
            f"adaptive_speedup_vs_exact_k{depth}": round(
                dt_e / (dt_p + dt_esc), 3),
            f"adaptive_exact_qps_clustered_k{depth}": round(block / dt_e, 1),
        })
    del docs_c, queries_c


def _bench_big_shard(jax, jnp, docs_box, queries, k, k_deep):
    """Production-scale shard: 4x the 1.1M rows via on-device sign-flip
    copies (bf16-exact, norm-preserving) -> a 4.4M x 1024 bf16 shard
    (~9 GiB — the per-chip shape of the real 8.8M two-language corpus on
    a 2-chip split, `encode_multilingual_corpus.py:367`). Measures the
    qps-vs-N curve the r4 record only asserted. Block shrinks to 256 so
    the (B, N) f32 score matrix fits beside the shard. ``docs_box`` is a
    single-element list holding the LAST reference to the 1.1M shard —
    popped and freed right after derivation."""
    from jax import lax

    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

    docs = docs_box.pop()
    n, dim = docs.shape
    rng = np.random.default_rng(21)
    q_small = queries[:256]
    # incremental donated builds: a one-shot concat holds input + every
    # part + the output simultaneously (~20 GiB at 4x -> the r5
    # validation run's RESOURCE_EXHAUSTED); dynamic_update_slice with a
    # donated accumulator writes each sign-flipped copy in place, so the
    # peak is output + source + one fused part
    import functools as _ft

    from jax import lax as _lax

    def _upd(buf, d, s, i):
        part = (d.astype(jnp.float32) * s).astype(jnp.bfloat16)
        return _lax.dynamic_update_slice(buf, part, (i * n, 0))

    docs_big = None
    for copies in (4, 2):
        try:
            signs = jnp.asarray(
                np.where(rng.random((copies, dim)) < 0.5, -1.0, 1.0)
                .astype(np.float32))
            # allocate PRE-PADDED to the kernel tile: a non-multiple row
            # count makes _prep_shard jnp.pad the corpus — a full
            # 8.39 GiB HLO-temp copy, the r5 validation OOM. Pad rows
            # stay zero and are masked via n_valid.
            n_pad_big = -(-copies * n // 1024) * 1024
            buf = jnp.zeros((n_pad_big, dim), jnp.bfloat16)
            upd = jax.jit(_ft.partial(_upd), donate_argnums=0,
                          static_argnums=3)
            for i in range(copies):
                buf = upd(buf, docs, signs[i], i)
            buf.block_until_ready()
            docs_big = buf
            break
        except Exception as exc:  # noqa: BLE001 — HBM OOM: halve
            _RESULT["big_shard_derive_retry"] = f"{copies}x: {exc}"[:120]
            docs_big = None
    if docs_big is None:
        raise RuntimeError("big-shard derivation failed at 4x and 2x")
    del docs
    n_big = copies * n  # VALID rows (docs_big carries tile-pad zeros)
    if copies == 4:
        # (B, 4.4M) f32 scores at B=256 is 4.5 GiB next to the 8.8 GiB
        # shard — B=128 keeps ~5 GiB of headroom
        q_small = q_small[:128]
    _log(f"big shard derived on-device: {n_big} rows "
         f"({n_big * dim * 2 / 2**30:.1f} GiB)")

    # on-device oracle (4 queries, plain XLA matmul + top_k): the 1.1M
    # host oracle cannot see the derived corpus without a 9 GiB readback.
    # Tile-pad zero rows are masked out (their IP of exactly 0 would
    # otherwise outrank negative true scores).
    def _oracle(q, d):
        s = lax.dot_general(q, d, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
        col = lax.broadcasted_iota(jnp.int32, (1, s.shape[1]), 1)
        return lax.top_k(jnp.where(col < n_big, s, -3.4e38), k_deep)

    ov, oi = jax.jit(_oracle)(q_small[:4], docs_big)
    oi_np = np.asarray(oi)

    for depth in (k, k_deep):
        if _left() < 200:
            _RESULT[f"big_shard_k{depth}_skipped"] = "budget"
            continue
        run = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=depth, tile_b=None, tile_n=1024,
            n_valid=n_big,
        ))
        try:
            dt, (vals, idx) = _timed_pair(run, (q_small, docs_big), 4)
        except Exception as exc:  # noqa: BLE001 — tuned config OOM class
            _RESULT[f"big_shard_k{depth}_fallback"] = f"{exc}"[:120]
            run = jax.jit(functools.partial(
                topk_ip_bins_two_level, k=depth, bin_size=8, super_size=8,
                tile_b=512, tile_n=1024, n_valid=n_big,
            ))
            dt, (vals, idx) = _timed_pair(run, (q_small, docs_big), 4)
        idx_np = np.asarray(idx)[:4, :depth]
        ov_frac = float(np.mean([
            len(set(idx_np[qi].tolist()) & set(oi_np[qi, :depth].tolist())) / depth
            for qi in range(4)
        ]))
        qps = q_small.shape[0] / dt
        _RESULT.update({
            f"search_qps_{n_big}x{dim}_bf16_k{depth}": round(qps, 1),
            f"exact_overlap_{n_big}_k{depth}": round(ov_frac, 4),
        })
        _log(f"big shard k={depth}: {qps:.0f} qps overlap={ov_frac:.3f}")
    _RESULT["big_shard_block"] = int(q_small.shape[0])


if __name__ == "__main__":
    try:
        main()
    except KeyboardInterrupt:
        raise
    except BaseException as exc:  # noqa: BLE001 — the record must parse
        import traceback

        traceback.print_exc()  # stderr keeps the full story
        _RESULT["error"] = f"{type(exc).__name__}: {exc}"[:300]
        _emit()  # stdout stays one honest, parsable JSON line (rc 0)
