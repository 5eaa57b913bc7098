"""Deep-k bin-size sweep at k=1000: the r3 note "G16 rejected by Mosaic"
predates the `_binmax_bm_legal` transposed-binmax fallback (r4s3), so
G=16 at k=1000 has never been measured on hardware. G16 halves the
super-top_k domain (23.7 ms at G8M8, the largest tail stage) and the
reshape-max; the slice gathers are issue-bound (cost ~ slice COUNT = k,
unchanged), so the expected move is ~-15 ms/block. 1.1M x 1024 bf16,
B=1024, k=1000. Run from /root/repo, one TPU process."""

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

N, DIM, B, K = 1_100_000, 1024, 1024, 1000


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

    def overlap(ids, n_check=40):
        ids = np.asarray(ids)
        full = q32[:n_check] @ oracle_docs.T
        ok = 0.0
        for i in range(n_check):
            want = set(np.argsort(-full[i], kind="stable")[:K].tolist())
            ok += len(set(ids[i].tolist()) & want) / K
        return ok / n_check

    import os

    configs = [
        # baseline (current default: G8 M8 tile_n 1024 tb 512)
        ("G8  M8  tn1024 tb512 ", dict(bin_size=8, super_size=8)),
        # G16: binmax block is 64 lanes at tn=1024 -> transposed fallback
        ("G16 M8  tn1024 tb512 ", dict(bin_size=16, super_size=8)),
        ("G16 M16 tn1024 tb512 ", dict(bin_size=16, super_size=16)),
        ("G16 M8  tn1024 tb1024", dict(bin_size=16, super_size=8, _tb=1024)),
        # tn=2048 makes the G16 bin-major binmax block 128 lanes (native)
        ("G16 M8  tn2048 tb512 ", dict(bin_size=16, super_size=8, _tn=2048)),
        ("G16 M8  tn2048 tb256 ", dict(bin_size=16, super_size=8, _tn=2048, _tb=256)),
        # G32: super domain = G16M16; score gather volume 32/bin
        ("G32 M8  tn1024 tb512 ", dict(bin_size=32, super_size=8)),
    ]
    skip = int(os.environ.get("PROBE_SKIP", "0"))
    if skip:
        # keep config[0] as the within-run baseline, drop the next `skip`
        configs = configs[:1] + configs[1 + skip:]
    for name, kw in configs:
        tb = kw.pop("_tb", 512)
        tn = kw.pop("_tn", 1024)
        fn = jax.jit(functools.partial(
            topk_ip_bins_two_level, k=K, tile_b=tb, tile_n=tn,
            interpret=False, **kw,
        ))
        try:
            out = fn(queries, docs)
            sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        iters = 6
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(queries, docs)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt * 1000:7.1f} ms  {B / dt:8.1f} qps  "
              f"overlap {overlap(out[1]):.4f}", flush=True)


if __name__ == "__main__":
    main()
