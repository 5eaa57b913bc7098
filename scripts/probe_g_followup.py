"""Follow-up to probe_tb_decomp: is there headroom past G16 M8 tb1024?
- k=100: G32 (super domain quarters; final domain k*G=3200 still small)
  and G16 M16 (super top_k domain halves again; binmax gather doubles).
- k=1000: G16 M4 (binmax gather halves; super domain doubles) as the
  mirror check that M=8 is still the saddle at G16.
1.1M x 1024 bf16, B=1024. One TPU process."""

import functools
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax

if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

N = int(os.environ.get("PROBE_N", 1_100_000))
DIM = int(os.environ.get("PROBE_DIM", 1024))
B = int(os.environ.get("PROBE_B", 1024))


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
        # within-session baselines first (compile-cached from tb_decomp)
        (100, "G16 M8  tb1024 (base)", dict(bin_size=16, super_size=8, tile_b=1024)),
        (100, "G32 M8  tb1024       ", dict(bin_size=32, super_size=8, tile_b=1024)),
        (100, "G16 M16 tb1024       ", dict(bin_size=16, super_size=16, tile_b=1024)),
        (100, "G32 M16 tb1024       ", dict(bin_size=32, super_size=16, tile_b=1024)),
        (1000, "G16 M8  tb1024 (base)", dict(bin_size=16, super_size=8, tile_b=1024)),
        (1000, "G16 M4  tb1024       ", dict(bin_size=16, super_size=4, tile_b=1024)),
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
