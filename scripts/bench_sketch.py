"""Hardware bench: sketch (approximate + certified) search vs exact.

Synthetic anisotropic corpus (exponential spectrum; decay set so the
top-``ds`` components carry ~90% of row energy — milder than real
sentence embeddings). Measures, per (k, probe_bins) config:

- qps (median over blocks, sync-forced),
- recall@k vs the exact device path,
- certificate rate (and soundness: certified rows must match exact).

Usage:  python scripts/bench_sketch.py [--n 1100000] [--dim 1024]
          [--ds 128] [--b 1024] [--iters 5] [--quick]
"""

import argparse
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_100_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--ds", type=int, default=128)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--decay", type=float, default=0.009)
    ap.add_argument("--quick", action="store_true", help="65k rows, one config")
    args = ap.parse_args()
    if args.quick:
        args.n = 65536
        args.iters = 3

    import jax
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.sketch import (
        fit_sketch, sketch_rows, topk_ip_sketch,
    )
    from codemix_dense_retrieval_tpu.ops.topk import topk_ip

    print(f"backend={jax.default_backend()} n={args.n} dim={args.dim} ds={args.ds}")
    rng = np.random.default_rng(0)
    spectrum = np.exp(-args.decay * np.arange(args.dim)).astype(np.float32)

    def rows(n, seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal((n, args.dim)).astype(np.float32) * spectrum
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    docs_f32 = rows(args.n, 1)
    queries_f32 = rows(args.b, 2)
    docs = jnp.asarray(docs_f32, jnp.bfloat16)
    queries = jnp.asarray(queries_f32, jnp.bfloat16)
    del docs_f32

    proj = jnp.asarray(fit_sketch(np.asarray(docs, np.float32), args.ds))
    t0 = time.perf_counter()
    d_sketch, d_tail = jax.jit(sketch_rows)(docs, proj)
    _ = float(d_sketch[0, 0]); _ = float(d_tail[0])
    print(f"sketch build: {time.perf_counter() - t0:.1f}s "
          f"({d_sketch.nbytes / 1e6:.0f} MB sidecar)")
    energy = 1.0 - float(jnp.mean(d_tail.astype(jnp.float32) ** 2))
    print(f"sketch energy fraction ~{energy:.3f}")

    def timed(fn, *a, **kw):
        out = fn(*a, **kw)
        _ = float(out[0][0, 0])
        out = fn(*a, **kw)
        _ = float(out[0][0, 0])
        ts = []
        for _i in range(args.iters):
            t = time.perf_counter()
            out = fn(*a, **kw)
            _ = float(out[0][0, 0])
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2], out

    configs = [(100, 32), (100, 64), (100, 128)] if not args.quick else [(100, 64)]
    if not args.quick:
        configs += [(1000, 192), (1000, 256), (1000, 384)]

    import functools

    exact_cache = {}
    for k, probe in configs:
        if k not in exact_cache:
            # everything under ONE jit: eager XLA ops dispatch one
            # primitive per relay round trip (BENCH_NOTES round 2)
            exact_fn = jax.jit(functools.partial(topk_ip, k=k))
            dt, (ev, ei) = timed(exact_fn, queries, docs)
            exact_cache[k] = (dt, np.asarray(ev), np.asarray(ei))
            print(f"exact   k={k:5d}: {args.b / dt:9.1f} qps  ({dt * 1e3:.1f} ms)")
        edt, ev, ei = exact_cache[k]

        # big arrays passed as ARGUMENTS (closures bake them into the HLO)
        run = jax.jit(functools.partial(topk_ip_sketch, k=k, probe_bins=probe))
        dt, (vals, idx, cert) = timed(run, queries, docs, d_sketch, d_tail, proj)
        idx = np.asarray(idx); cert = np.asarray(cert)
        recall = np.mean([
            len(set(idx[q]) & set(ei[q])) / k for q in range(args.b)
        ])
        bad = [
            q for q in np.flatnonzero(cert)
            if not np.array_equal(idx[q], ei[q])
        ]
        print(
            f"sketch  k={k:5d} probe={probe:4d}: {args.b / dt:9.1f} qps "
            f"({dt * 1e3:.1f} ms, {edt / dt:.2f}x exact)  "
            f"recall={recall:.4f}  cert={cert.mean():.3f}  "
            f"cert_violations={len(bad)}"
        )
        if bad:
            print(f"  !! CERT VIOLATION rows: {bad[:5]}")


if __name__ == "__main__":
    main()
