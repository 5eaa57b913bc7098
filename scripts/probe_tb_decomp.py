"""Decompose the G16-M8-tb1024 deep-k win (probe_g16_deepk r4h: 141.9 ms
vs G8-tb512 154.7): is tile_b=1024 alone the lever, or the G16 x tb1024
combination? And does tb1024 help the k=100 bin-major path too?
1.1M x 1024 bf16, B=1024. One TPU process."""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

N, DIM, B = 1_100_000, 1024, 1024


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[0])[0, 0])


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    docs_np = rng.standard_normal((N, DIM), dtype=np.float32)
    docs = jnp.asarray(docs_np).astype(jnp.bfloat16)
    oracle_docs = np.asarray(docs.astype(jnp.float32))
    del docs_np
    queries = jnp.asarray(
        rng.standard_normal((B, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)
    q32 = np.asarray(queries.astype(jnp.float32))

    def overlap(ids, k, n_check=40):
        ids = np.asarray(ids)
        full = q32[:n_check] @ oracle_docs.T
        ok = 0.0
        for i in range(n_check):
            want = set(np.argsort(-full[i], kind="stable")[:k].tolist())
            ok += len(set(ids[i].tolist()) & want) / k
        return ok / n_check

    configs = [
        # k=1000 decomposition (first two compile-cached from r4h)
        (1000, "G8  tb512  (default)", dict(bin_size=8, super_size=8, tile_b=512)),
        (1000, "G16 tb1024 (winner) ", dict(bin_size=16, super_size=8, tile_b=1024)),
        (1000, "G8  tb1024          ", dict(bin_size=8, super_size=8, tile_b=1024)),
        (1000, "G16 tb512           ", dict(bin_size=16, super_size=8, tile_b=512)),
        # k=100: current bench config vs the same levers
        (100, "G8  tb512  (default)", dict(bin_size=8, super_size=8, tile_b=512)),
        (100, "G8  tb1024          ", dict(bin_size=8, super_size=8, tile_b=1024)),
        (100, "G16 tb1024          ", dict(bin_size=16, super_size=8, tile_b=1024)),
        (100, "G16 tb512           ", dict(bin_size=16, super_size=8, tile_b=512)),
    ]
    for k, name, kw in configs:
        fn = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=k, tile_n=1024, interpret=False, **kw,
        ))
        try:
            out = fn(queries, docs)
            sync(out)
        except Exception as e:
            print(f"k={k} {name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            continue
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(queries, docs)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"k={k} {name}: {dt * 1000:7.1f} ms  {B / dt:8.1f} qps  "
              f"overlap {overlap(out[1], k):.4f}", flush=True)


if __name__ == "__main__":
    main()
