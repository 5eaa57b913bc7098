"""Hardware bench: guaranteed-exact search end-to-end (VERDICT r3 item 3).

Measures ``DenseFlatIndex.search(approx="guaranteed")`` — the sketch
tier plus exact escalation of every uncertified query — against plain
exact search, on a realistic-anisotropy corpus (exponential spectrum,
as real sentence embeddings; `BENCH_NOTES.md` sketch section). The
reported guaranteed qps is EFFECTIVE: it includes certificate readback,
escalation batching, and the escalated exact dispatches, so it is the
number a caller actually sees for provably exact results.

Flow per depth k:
  1. calibrate_sketch picks the minimal probe_bins for --recall_target
     (FAISS ParameterSpace analog, on the live index);
  2. time exact search (query_block serving shape);
  3. time guaranteed search the same way; assert byte-parity.

Usage: python scripts/bench_guaranteed.py [--quick] [--n 1100000]
          [--dim 1024] [--ds 128] [--b 1024] [--k 100 1000]
"""

import argparse
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

# sitecustomize pins the axon TPU platform and ignores the env var; honor
# it in-process so `JAX_PLATFORMS=cpu` is a real CPU smoke (see bench.py)
if os.environ.get("JAX_PLATFORMS") == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")


def anisotropic_rows(n, dim, decay, seed):
    r = np.random.default_rng(seed)
    x = r.standard_normal((n, dim)).astype(np.float32)
    x *= np.exp(-decay * np.arange(dim)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_100_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--ds", type=int, default=128)
    ap.add_argument("--b", type=int, default=1024)
    ap.add_argument("--k", type=int, nargs="+", default=[100, 1000])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--decay", type=float, default=0.009)
    ap.add_argument("--recall_target", type=float, default=0.99)
    ap.add_argument("--dtype", default="bfloat16", choices=("bfloat16", "int8"),
                    help="index storage dtype (int8: certificates prove "
                         "parity with the int8 exact path; 1-byte gathers)")
    ap.add_argument("--quick", action="store_true", help="65k rows, k=100 only")
    args = ap.parse_args()
    if args.quick:
        args.n, args.k, args.iters = 65536, [100], 3

    import jax

    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    print(f"backend={jax.default_backend()} n={args.n} dim={args.dim} "
          f"ds={args.ds} dtype={args.dtype}")
    docs = anisotropic_rows(args.n, args.dim, args.decay, 1)
    queries = anisotropic_rows(args.b, args.dim, args.decay, 2)

    t0 = time.perf_counter()
    idx = DenseFlatIndex.build(
        docs, [f"d{i}" for i in range(args.n)], dtype=args.dtype
    )
    del docs
    idx.to_device()
    print(f"index resident: {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    idx.enable_sketch(args.ds, cache=False)
    print(f"sketch tier armed: {time.perf_counter() - t0:.1f}s")

    def timed(k, **kw):
        idx.search(queries, k, return_docids=False, **kw)  # compile
        ts = []
        out = None
        for _ in range(args.iters):
            t = time.perf_counter()
            out = idx.search(queries, k, return_docids=False, **kw)
            ts.append(time.perf_counter() - t)
        ts.sort()
        return ts[len(ts) // 2], out

    for k in args.k:
        cal_q = anisotropic_rows(256, args.dim, args.decay, 3)
        t0 = time.perf_counter()
        cal = idx.calibrate_sketch(cal_q, k, recall_target=args.recall_target)
        print(
            f"k={k:5d} calibrated: probe={cal['probe_bins']} "
            f"recall={cal['recall']:.4f} cert={cal['certified_frac']:.3f} "
            f"({time.perf_counter() - t0:.1f}s)"
        )
        edt, (ev, ei) = timed(k)
        print(f"k={k:5d} exact     : {args.b / edt:9.1f} qps ({edt * 1e3:.1f} ms)")
        # escalation volume: guaranteed resets last_certified to all-True,
        # so read the certificate rate from one plain-approx pass
        idx.search(queries, k, return_docids=False, approx=True)
        esc = int((~idx.last_certified).sum())
        gdt, (gv, gi) = timed(k, approx="guaranteed")
        # guaranteed means byte-parity with exact — enforce it on-record
        parity = np.array_equal(ei, gi) and np.allclose(ev, gv, atol=1e-5)
        route = "direct-exact" if getattr(idx, "last_guaranteed_direct", False) else "sketch"
        print(
            f"k={k:5d} guaranteed: {args.b / gdt:9.1f} qps ({gdt * 1e3:.1f} ms, "
            f"{edt / gdt:.2f}x exact)  escalated={esc}/{args.b} "
            f"route={route} parity={'OK' if parity else 'FAIL'}"
        )
        if not parity:
            bad = np.flatnonzero((ei != gi).any(axis=1))[:5]
            print(f"  !! PARITY FAIL rows {bad}")


if __name__ == "__main__":
    main()
