"""Map the remote compiler's scoped-vmem OOM boundary for the G16
two-level config (bench_logs/r4i: every G16/G32 tb1024 config OOMs at
N=131072 — "Scoped allocation ... exceeded scoped vmem limit" — while
the same programs compile and run at N=1.1M).

One 524288-row upload, device-sliced to each N; compile-or-OOM result
per (N, config). The passing set decides how the tuned store is gated
by shard size in ops.topk/_resolve_tile_b."""

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

DIM, B = 1024, 1024
N_MAX = 524_288


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    import ml_dtypes

    docs_all = jnp.asarray(
        rng.standard_normal((N_MAX, DIM), dtype=np.float32).astype(ml_dtypes.bfloat16)
    )
    queries = jnp.asarray(
        rng.standard_normal((B, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)
    jax.block_until_ready((docs_all, queries))

    cases = []
    for n in (131_072, 262_144, 524_288):
        cases += [
            (n, 100, dict(bin_size=16, super_size=8, tile_b=1024)),
            (n, 100, dict(bin_size=16, super_size=8, tile_b=512)),
            (n, 100, dict(bin_size=8, super_size=8, tile_b=1024)),
        ]
    cases.append((262_144, 1000, dict(bin_size=16, super_size=8, tile_b=1024)))
    cases.append((262_144, 1000, dict(bin_size=16, super_size=8, tile_b=512)))

    for n, k, kw in cases:
        docs = docs_all[:n]
        fn = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=k, tile_n=1024, interpret=False, **kw,
        ))
        tag = f"N={n:7d} k={k:4d} G{kw['bin_size']:<2d} tb{kw['tile_b']}"
        try:
            t0 = time.perf_counter()
            out = fn(queries, docs)
            jax.block_until_ready(out)
            _ = float(np.asarray(out[0])[0, 0])
            # one timed rep for scale
            t0 = time.perf_counter()
            out = fn(queries, docs)
            _ = float(np.asarray(out[0])[0, 0])
            dt = time.perf_counter() - t0
            print(f"{tag}: OK {dt*1000:7.1f} ms  {B/dt:8.1f} qps", flush=True)
        except Exception as e:
            msg = str(e)
            kindmsg = "VMEM_OOM" if "vmem" in msg.lower() else type(e).__name__
            print(f"{tag}: FAILED {kindmsg}: {msg[:100]}", flush=True)


if __name__ == "__main__":
    main()
