"""Hardware bench: the fused alpha sweep — exact vs sketch tier.

The reference's core workload is the per-pair alpha sweep
(`onepass_dense_mix_run_custom_lang.py:846-891`: 7 alphas x mix +
search + eval, paying host mixing and FAISS dispatch per alpha). The
fused path runs the whole sweep as ONE jit with the index resident;
this bench measures it at serving scale, exact and through the sketch
tier (`--fused --approx fast`), reporting effective queries/sec
ACROSS the sweep (B x A / wall) and the per-alpha certified fraction.

Usage: python scripts/bench_fused_sweep.py [--quick] [--n 1100000]
          [--dim 1024] [--b 1024] [--k 100] [--ds 128]
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

ALPHAS = (0.0, 0.1, 0.25, 0.5, 0.75, 0.9, 1.0)  # the reference's sweep


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
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--decay", type=float, default=0.009)
    ap.add_argument("--quick", action="store_true", help="65k rows, 3 iters")
    args = ap.parse_args()
    if args.quick:
        args.n, args.iters = 65536, 3

    import jax

    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.pipeline.fused import fused_alpha_sweep

    print(f"backend={jax.default_backend()} n={args.n} dim={args.dim} "
          f"alphas={len(ALPHAS)} k={args.k}")
    docs = anisotropic_rows(args.n, args.dim, args.decay, 1)
    qa = anisotropic_rows(args.b, args.dim, args.decay, 2)
    # planted relevance: the secondary query IS its relevant doc, so the
    # alpha=1 end of the sweep must score MRR ~100 — a legible sanity
    # check on the in-graph metrics for both paths
    rel = np.random.default_rng(4).choice(args.n, args.b, replace=False)
    qb = docs[rel]
    rel_ids = rel[:, None].astype(np.int32)
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(args.n)])
    del docs
    idx.to_device()
    idx.enable_sketch(args.ds, cache=False)
    # calibrate the operating point at the sweep's midpoint mix (the
    # fused path resolves probe_by_k at the same k) before timing
    mid = qa * 0.5 + qb * 0.5
    mid /= np.linalg.norm(mid, axis=1, keepdims=True)
    cal = idx.calibrate_sketch(mid[:256], args.k)
    print(f"calibrated: probe={cal['probe_bins']} recall={cal['recall']:.4f}")

    def timed(sketch):
        kw = dict(
            mesh=idx.mesh, rel_ids=rel_ids,
            search_kwargs=idx.search_kwargs, sketch=sketch,
        )
        out = fused_alpha_sweep(qa, qb, list(ALPHAS), idx._docs_dev,
                                idx._counts_dev, args.k, **kw)
        _ = float(np.asarray(out[0])[0, 0, 0])  # compile + sync
        ts = []
        for _i in range(args.iters):
            t0 = time.perf_counter()
            out = fused_alpha_sweep(qa, qb, list(ALPHAS), idx._docs_dev,
                                    idx._counts_dev, args.k, **kw)
            _ = float(np.asarray(out[0])[0, 0, 0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2], out

    dt_e, (ev, ei, em, _) = timed(None)
    qps_e = args.b * len(ALPHAS) / dt_e
    print(f"fused exact : {qps_e:9.1f} eff qps ({dt_e * 1e3:.1f} ms/sweep)")

    dt_s, (sv, si, sm, cert) = timed(idx._sketch)
    qps_s = args.b * len(ALPHAS) / dt_s
    cert_np = np.asarray(cert)
    # on-record soundness: certified rows must match the exact sweep
    viol = 0
    ei_np, si_np = np.asarray(ei), np.asarray(si)
    for a in range(len(ALPHAS)):
        for q in np.flatnonzero(cert_np[a]):
            if not np.array_equal(si_np[a, q], ei_np[a, q]):
                viol += 1
    print(
        f"fused sketch: {qps_s:9.1f} eff qps ({dt_s * 1e3:.1f} ms/sweep, "
        f"{dt_e / dt_s:.2f}x exact)  cert={cert_np.mean():.3f}  "
        f"cert_violations={viol}"
    )
    # metric sanity: MRR over planted relevants must match across paths
    # for the certified-dominant regime (report both for the record)
    print("MRR@10 exact :", [round(float(v) * 100, 2) for v in em["RR@10"]])
    print("MRR@10 sketch:", [round(float(v) * 100, 2) for v in sm["RR@10"]])


if __name__ == "__main__":
    main()
