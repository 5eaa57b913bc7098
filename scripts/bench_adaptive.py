"""Hardware bench: adaptive probed-exact search on a CLUSTERED corpus.

The adaptive tier prices easy (topical) workloads at the probed cost
while staying ALWAYS exact (`ops.topk.topk_ip_bins_two_level_probed` +
escalation; `DenseFlatIndex.search(approx="adaptive")`). Its win is a
row-order property, so this bench uses the workload it exists for: a
clustered corpus (mixture of unit centers + noise — the shape of real
topical passage embeddings), rows cluster-packed by
``DenseFlatIndex.reorder_rows()``.

Reports exact vs adaptive qps at k=100 and k=1000, certificate rate,
escalated count, and asserts bit-parity (adaptive is exact by
construction — `sharded_search.sharded_topk_ip_adaptive`).

Usage: python scripts/bench_adaptive.py [--quick] [--n 1100000]
"""

import argparse
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def clustered_rows(n, dim, centers, sigma, seed):
    # ``sigma`` is the TOTAL noise norm relative to the unit center
    # (per-coordinate std sigma/sqrt(dim)): sigma=0.35 gives within-
    # cluster cosines ~0.8 — a tight topical cluster. A per-coordinate
    # sigma would scale the noise by sqrt(dim) and drown the centers.
    r = np.random.default_rng(seed)
    c = r.standard_normal((centers, dim)).astype(np.float32)
    c /= np.linalg.norm(c, axis=1, keepdims=True)
    assign = r.integers(0, centers, n)
    scale = np.float32(sigma / np.sqrt(dim))
    # dtype=float32 at generation: the default f64 would allocate a
    # ~9 GiB transient at the 1.1M x 1024 default
    x = c[assign] + scale * r.standard_normal((n, dim), dtype=np.float32)
    x /= np.linalg.norm(x, axis=1, keepdims=True)
    return x, c, assign


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_100_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--b", type=int, default=1024)
    # topical-corpus model: cluster size (n/centers) >> k, so a query's
    # deep top-k lives inside its topical neighborhood — the regime the
    # probed certificates exist for (k=100/1000 vs ~4300-row clusters)
    ap.add_argument("--centers", type=int, default=256)
    ap.add_argument("--sigma", type=float, default=0.35)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--quick", action="store_true", help="65k rows, 3 iters")
    args = ap.parse_args()
    if args.quick:
        if args.n == 1_100_000:  # respect an explicit --n
            args.n = 65536
        args.iters, args.centers = 3, min(args.centers, 64)

    import jax

    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    print(f"backend={jax.default_backend()} n={args.n} dim={args.dim} "
          f"centers={args.centers} sigma={args.sigma}", flush=True)
    t0 = time.time()
    docs, c, assign = clustered_rows(
        args.n, args.dim, args.centers, args.sigma, 1
    )
    # queries drawn from the same mixture (in-distribution retrieval)
    r = np.random.default_rng(2)
    qc = r.integers(0, args.centers, args.b)
    q = c[qc] + np.float32(args.sigma / np.sqrt(args.dim)) * r.standard_normal(
        (args.b, args.dim), dtype=np.float32
    )
    q /= np.linalg.norm(q, axis=1, keepdims=True)
    print(f"host corpus built: {time.time() - t0:.1f}s", flush=True)

    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(args.n)])
    del docs
    t0 = time.time()
    idx.reorder_rows()  # cluster-pack: the adaptive tier's precondition
    print(f"reorder_rows: {time.time() - t0:.1f}s", flush=True)
    idx.to_device()

    def timed(kd, approx, probe=None):
        out = idx.search(q, kd, return_docids=False, approx=approx,
                         probe_bins=probe)
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            out = idx.search(q, kd, return_docids=False, approx=approx,
                             probe_bins=probe)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], out

    # probe sized to cover one topical cluster (+50% jitter slack) — the
    # per-query certificate needs the whole neighborhood probed
    cluster_probe = int(np.ceil(args.n / args.centers / 8 * 1.5))
    for kd in (100, 1000):
        dt_e, (ev, ei) = timed(kd, False)
        print(f"k={kd:5d} exact     : {args.b / dt_e:9.1f} qps "
              f"({dt_e * 1e3:.1f} ms)", flush=True)
        for probe in (None, cluster_probe):
            dt_a, (av, ai) = timed(kd, "adaptive", probe)
            st = idx.last_adaptive_stats or {}
            ok = np.array_equal(ei, ai)
            print(
                f"        adaptive p={st.get('probe_bins', -1):5d}: "
                f"{args.b / dt_a:9.1f} qps ({dt_a * 1e3:.1f} ms, "
                f"{dt_e / dt_a:.2f}x exact)  "
                f"cert={st.get('certified_frac', -1):.3f} "
                f"escalated={st.get('escalated', -1)} "
                f"parity={'OK' if ok else 'FAIL'}",
                flush=True,
            )
            if not ok:
                raise SystemExit("adaptive != exact — adaptive tier broken")


if __name__ == "__main__":
    main()
