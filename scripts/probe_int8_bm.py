"""Validate the int8 bin-major two-level deep-k on hardware.

r3 made bin_major the default tail for topk_ip_bins_int8(two_level=True)
— this probe proves the int8 kernel's transposed outputs compile and
run on the chip, measures k=1000 qps, and checks exact overlap against
the dequantized-score host oracle (candidate-set identity; near-tie
order swaps expected from int32-rescale accumulation).
"""

import functools
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_int8
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

N, DIM, B, K = 1_100_000, 1024, 512, 1000


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x[0])[0, 0])


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    docs = rng.standard_normal((N, DIM), dtype=np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    d_q, d_s = quantize_rows_np(docs)
    queries = rng.standard_normal((B, DIM)).astype(np.float32)
    queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    dq = jnp.asarray(d_q)
    ds = jnp.asarray(d_s)
    qj = jnp.asarray(queries)

    for name, bm in (("int8 2lvl bm", True), ("int8 2lvl tm", False)):
        fn = jax.jit(functools.partial(
            topk_ip_bins_int8, k=K, bin_size=8, super_size=8, tile_b=512,
            tile_n=1024, interpret=False, two_level=True, bin_major=bm,
        ))
        try:
            out = fn(qj, dq, ds)
            sync(out)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:200]}", flush=True)
            continue
        t0 = time.perf_counter()
        for _ in range(6):
            out = fn(qj, dq, ds)
        sync(out)
        dt = (time.perf_counter() - t0) / 6
        # oracle on dequantized int8 scores (what the kernel computes)
        ids = np.asarray(out[1])
        deq = d_q.astype(np.float32) * d_s[:, None]
        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np as qn
        q_q, q_s = qn(queries)
        qdeq = q_q.astype(np.float32) * q_s[:, None]
        n_check = 16
        full = qdeq[:n_check] @ deq.T
        ov = 0.0
        for i in range(n_check):
            want = set(np.argsort(-full[i], kind="stable")[:K].tolist())
            ov += len(set(ids[i].tolist()) & want) / K
        print(f"{name}: {dt * 1000:7.1f} ms  {B / dt:8.1f} qps  "
              f"overlap {ov / n_check:.4f}", flush=True)


if __name__ == "__main__":
    main()
