"""Quick deep-k config A/B on TODAY'S chip state: the tuned store holds
the r4-session winner (G16 M8 tb1024); the chip's relative stage costs
swing between sessions (probe_tail_r5: super top_k 3x cheaper than r4).
Times the tuned config against the G8 conservative and tb512 variants
at the official shape and prints the winner for persist_tuned_axon.py.
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
import ml_dtypes

from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

N, DIM, B = 1_100_000, 1024, 1024


def main():
    enable_compile_cache()
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, DIM), dtype=np.float32).astype(ml_dtypes.bfloat16))
    queries = jnp.asarray(
        rng.standard_normal((B, DIM), dtype=np.float32)).astype(jnp.bfloat16)
    docs.block_until_ready()
    print("upload done", flush=True)

    def timed(g, m, tb, k, iters=8):
        run = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=k, bin_size=g, super_size=m,
            tile_b=tb, tile_n=1024))
        out = run(queries, docs)
        _ = float(out[0][0, 0])
        ts = []
        for _i in range(iters):
            t0 = time.perf_counter()
            out = run(queries, docs)
            _ = float(out[0][0, 0])
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[len(ts) // 2]

    for k in (1000, 100):
        results = []
        for g, m, tb in ((16, 8, 1024), (8, 8, 512), (16, 8, 512), (8, 8, 1024)):
            try:
                dt = timed(g, m, tb, k)
                results.append((dt, g, m, tb))
                print(f"k={k} G{g} M{m} tb{tb}: {B/dt:.0f} qps "
                      f"({dt*1e3:.1f} ms)", flush=True)
            except Exception as exc:  # noqa: BLE001
                print(f"k={k} G{g} M{m} tb{tb} FAILED: {exc!r:.90}", flush=True)
        if results:
            dt, g, m, tb = min(results)
            print(f"WINNER k={k}: G{g} M{m} tb{tb} ({B/dt:.0f} qps) -> "
                  f"persist with k{k}={g},{m},{tb}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
