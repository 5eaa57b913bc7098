"""DEVICE-TIME verdict for the sketch/adaptive tiers at small batch.

VERDICT r4 item 4: the serving-regime comparison (B in {32,64,128}) was
unmeasurable through the relay's ~40 ms RTT floor (BENCH_NOTES r4f).
Per-call device time = median wall of the production program minus the
median wall of a NO-OP dispatch (a tiny scalar program measured in the
same session) — the no-op wall IS the relay RTT + dispatch floor, so
the subtraction isolates device time without special chain programs.
(A first attempt compiled every combo as an 8-iteration fori_loop chain
to cancel the RTT exactly; that program class timed out the relay's
remote-compile service — bench_logs/r5 — so plain production programs
it is.)

Corpus: clustered + cluster-sorted, derived ON-DEVICE (the adaptive
tier's home workload; also the sketch tier's friendliest realistic
case). Methods: exact two-level | sketch (probe=calibration-free grid) |
adaptive probed-exact (p=806, the r4d operating point).

Output: one table -> paste into BENCH_NOTES + the route decision.
"""

import argparse
import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache


def wall(fn, *args, reps=5):
    # scalar host read per call: the axon relay's block_until_ready can
    # return before the program ran (bench.py quirk) — chain programs
    # return a scalar, so the read costs one RTT, which cancels in the
    # (t8 - t1)/7 subtraction
    float(fn(*args))
    float(fn(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        ts.append(time.perf_counter() - t0)
    ts.sort()
    return ts[len(ts) // 2]


def jit_scalar(run_vals):
    """jit( q -> summed scalar ) of the production program."""
    return jax.jit(lambda q: run_vals(q))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=524_288)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--bs", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--ks", type=int, nargs="+", default=[100, 1000])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()
    enable_compile_cache()
    n, dim = args.n, args.dim
    print(f"backend={jax.default_backend()} n={n}", flush=True)

    # clustered corpus derived on-device from UPLOADED gaussian noise —
    # the bench.py pattern (device-side threefry at corpus scale wedged
    # the relay worker; host noise + upload is the proven path)
    import ml_dtypes

    centers = 256
    rng = np.random.default_rng(11)
    c = rng.standard_normal((centers, dim), dtype=np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    assign = np.sort(rng.integers(0, centers, n)).astype(np.int32)
    scale = np.float32(0.35 / np.sqrt(dim))
    c_dev = jnp.asarray(c)
    noise_np = rng.standard_normal((n, dim), dtype=np.float32).astype(
        ml_dtypes.bfloat16)
    print("host noise ready; uploading", flush=True)
    noise = jnp.asarray(noise_np)
    del noise_np

    @jax.jit
    def mk(z, a):
        y = jnp.take(c_dev, a, axis=0) + scale * z.astype(jnp.float32)
        return (y / jnp.linalg.norm(y, axis=1, keepdims=True)).astype(jnp.bfloat16)

    docs = mk(noise, jnp.asarray(assign))
    _ = float(jnp.asarray(docs[0, 0]).astype(jnp.float32))
    qmax = max(args.bs)
    qassign = rng.integers(0, centers, qmax).astype(np.int32)
    q_all = mk(noise[-qmax:], jnp.asarray(qassign))
    del noise
    print("corpus ready", flush=True)

    # sketch sidecar: fit on a small readback sample (34 MB)
    from codemix_dense_retrieval_tpu.ops.sketch import (
        fit_sketch,
        sketch_rows_jit,
        topk_ip_sketch,
    )
    from codemix_dense_retrieval_tpu.ops.topk import (
        topk_ip_bins_two_level,
        topk_ip_bins_two_level_probed,
    )

    sample = np.asarray(docs[:8192]).astype(np.float32)
    proj = jnp.asarray(fit_sketch(sample, 128))
    d_sk, d_tail = sketch_rows_jit(docs, proj)
    jax.block_until_ready(d_sk)
    print("sketch armed", flush=True)

    def mk_exact(k):
        run = functools.partial(
            topk_ip_bins_two_level, k=k, tile_b=None, tile_n=1024)
        return lambda q: jnp.sum(run(q, docs)[0][:, -1])

    def mk_sketch(k, probe):
        run = functools.partial(topk_ip_sketch, k=k, probe_bins=probe)
        return lambda q: jnp.sum(run(q, docs, d_sk, d_tail, proj)[0][:, -1])

    def mk_adaptive(k, probe=806):
        run = functools.partial(
            topk_ip_bins_two_level_probed, k=k, probe_bins=probe,
            tile_b=None, tile_n=1024)
        return lambda q: jnp.sum(run(q, docs)[0][:, -1])

    # dispatch/RTT floor: a tiny scalar program, same call discipline
    tiny = jnp.zeros((8, 128), jnp.float32)
    noop = jax.jit(lambda x: jnp.sum(x * 1.0001))
    rtt_ms = wall(noop, tiny, reps=max(args.reps * 2, 10)) * 1e3
    print(f"dispatch/RTT floor: {rtt_ms:.1f} ms (subtracted)", flush=True)

    rows = []
    for k in args.ks:
        methods = [
            ("exact", mk_exact(k)),
            ("sketch_p256", mk_sketch(k, 256)),
            ("adaptive_p806", mk_adaptive(k)),
        ]
        for b in args.bs:
            q = q_all[:b]
            for name, run_vals in methods:
                try:
                    t1 = wall(jit_scalar(run_vals), q, reps=args.reps)
                    dev_ms = t1 * 1e3 - rtt_ms
                    if dev_ms <= 0:
                        print(
                            f"k={k:5d} B={b:4d} {name:14s} NOISE-DOMINATED "
                            f"(wall {t1*1e3:.1f} ms <= RTT {rtt_ms:.1f} ms)",
                            flush=True,
                        )
                        continue
                    qps = b / dev_ms * 1e3
                    rows.append((k, b, name, dev_ms, t1 * 1e3, qps))
                    print(
                        f"k={k:5d} B={b:4d} {name:14s} device "
                        f"{dev_ms:8.2f} ms/call  wall {t1*1e3:8.1f} ms  "
                        f"eff {qps:8.0f} q/s(device)",
                        flush=True,
                    )
                except Exception as exc:  # noqa: BLE001
                    print(f"k={k} B={b} {name} FAILED: {exc!r:.100}", flush=True)

    print("\nsummary (device ms/call):", flush=True)
    for k in args.ks:
        for b in args.bs:
            r = {nm: d for kk, bb, nm, d, _, _ in rows if kk == k and bb == b}
            if "exact" in r:
                line = f"k={k} B={b}: exact {r['exact']:.2f}"
                for nm in ("sketch_p256", "adaptive_p806"):
                    if nm in r:
                        line += (f" | {nm} {r[nm]:.2f} "
                                 f"({r['exact'] / max(r[nm], 1e-9):.2f}x)")
                print(line, flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
