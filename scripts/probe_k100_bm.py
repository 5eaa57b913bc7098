"""Does the bin-major two-level tail also beat single-level at k=100?

Current k=100 production: single-level bins (G=16) with an element
gather of k*G=1600 scores/query. Candidate: two-level bin-major
(G8 M8) — contiguous slice reads, smaller top_k domains.
Shapes: bench standard (1.1M x 1024 bf16, B=1024).
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.ops.topk import (
    topk_ip_bins,
    topk_ip_bins_two_level,
)
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

N, DIM, B = 1_100_000, 1024, 1024


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[0])[0, 0])


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(
        rng.standard_normal((B, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)

    for k in (100, 500):
        configs = [
            (f"k{k} single G16", jax.jit(functools.partial(
                topk_ip_bins, k=k, bin_size=16, use_pallas=True,
                tile_b=512, tile_n=1024, interpret=False))),
            (f"k{k} 2lvl-bm G8M8", jax.jit(functools.partial(
                topk_ip_bins_two_level, k=k, bin_size=8, super_size=8,
                tile_b=512, tile_n=1024, interpret=False, bin_major=True))),
        ]
        base_ids = None
        for name, fn in configs:
            out = fn(queries, docs)
            sync(out)
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn(queries, docs)
            sync(out)
            dt = (time.perf_counter() - t0) / 8
            ids = np.asarray(out[1])
            if base_ids is None:
                base_ids = ids
                agree = 1.0
            else:
                agree = float(np.mean(ids == base_ids))
            print(f"{name}: {dt * 1000:7.1f} ms  {B / dt:8.1f} qps  "
                  f"id-agree {agree:.4f}", flush=True)


if __name__ == "__main__":
    main()
