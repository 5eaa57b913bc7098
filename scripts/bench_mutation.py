"""Hardware bench: online index mutation on a serving-scale corpus.

Measures, on a 1.1M x 1024 bf16 resident index:
- add/remove batch latency (after the first compiled scatter),
- search qps before vs after mutations (must be unchanged — counts are
  a traced argument, so no retrace),
- correctness spot checks (added rows retrievable, removed rows gone).

Usage: python scripts/bench_mutation.py [--n 1100000] [--dim 1024]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_100_000)
    ap.add_argument("--dim", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--k", type=int, default=100)
    args = ap.parse_args()

    import jax

    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    print(f"backend={jax.default_backend()} n={args.n}")
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((args.n, args.dim)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(args.n)])
    idx.to_device()
    queries = rng.standard_normal((args.batch, args.dim)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    def search_qps(iters=6):
        idx.search(queries, args.k, return_docids=False)  # compile/warm
        ts = []
        for _ in range(iters):
            t0 = time.perf_counter()
            idx.search(queries, args.k, return_docids=False)
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return args.batch / ts[len(ts) // 2]

    qps_before = search_qps()
    print(f"search before mutation: {qps_before:9.1f} qps")

    def rows(n, seed):
        r = np.random.default_rng(seed)
        x = r.standard_normal((n, args.dim)).astype(np.float32)
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    # first add pays the scatter compile; time the second
    idx.add(rows(64, 1), [f"w{i}" for i in range(64)])
    new = rows(64, 2)
    t0 = time.perf_counter()
    idx.add(new, [f"a{i}" for i in range(64)])
    t_add = time.perf_counter() - t0
    print(f"add 64 rows: {t_add * 1e3:8.1f} ms (steady-state)")
    _, got = idx.search(new[:4], 1)
    print("added rows self-retrieve:",
          [str(x) for x in np.asarray(got).ravel()])

    idx.remove([f"w{i}" for i in range(8)])  # compile the move path
    t0 = time.perf_counter()
    removed = idx.remove([f"w{i}" for i in range(8, 64)] + ["a0", "a1"])
    t_rm = time.perf_counter() - t0
    print(f"remove {removed} rows: {t_rm * 1e3:8.1f} ms (steady-state)")

    qps_after = search_qps()
    print(f"search after mutation:  {qps_after:9.1f} qps "
          f"({qps_after / qps_before:.3f}x of before — counts are traced, "
          "no retrace expected)")
    _, wide = idx.search(new[:4], 10)
    gone = {f"w{i}" for i in range(64)} | {"a0", "a1"}
    assert not (set(map(str, np.asarray(wide).ravel())) & gone)
    print("removed rows absent from results: ok")


if __name__ == "__main__":
    main()
