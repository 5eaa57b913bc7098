"""Probe the deep-k selection TAIL alternatives at bench shapes.

r3 bin-major two-level (157.7 ms/block, k=1000, B=1024, N=1.1M, G8 M8)
still pays three lax.top_k calls: supers (B,17188)->1000, covered bin
maxima (B,8000)->1000, covered candidates (B,8000)->1000. This probe
times each stage in isolation plus cheaper candidates:

- lax.top_k at those shapes (baseline)
- lax.approx_max_k (TPU PartialReduce path; NOT exact — curiosity)
- full sort of the candidate block
- f32-bitwise binary-search threshold select (32 fused passes)
- top_k over bf16 inputs (does dtype change the cost?)
- lax.top_k at reduced k (does k or n dominate?)
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache


def timed(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / reps


def threshold_select(vals, k):
    """Per-query k-th-largest THRESHOLD by binary search on the
    monotone-int view of f32 (no sort, no gather). Returns int32
    thresholds (t such that count(vals >= decode(t)) >= k, tightest)."""
    # monotone map: flip sign bit for positives? standard trick:
    # x >= 0 -> bits | 0x80000000 ; x < 0 -> ~bits
    bits = lax.bitcast_convert_type(vals, jnp.int32)
    mono = jnp.where(bits >= 0, bits + jnp.int32(-2147483648), ~bits)
    # mono is int32, order-isomorphic to vals

    def body(i, carry):
        lo, hi = carry  # (B,) int64 bounds as int32 pair? use int32 mid
        mid = lo + ((hi - lo) >> 1)
        cnt = jnp.sum((mono >= mid[:, None]).astype(jnp.int32), axis=1)
        ge = cnt >= k
        lo = jnp.where(ge, mid + 1, lo)
        hi = jnp.where(ge, hi, mid)
        return lo, hi

    b = vals.shape[0]
    lo = jnp.full((b,), jnp.int32(-2147483648))
    hi = jnp.full((b,), jnp.int32(2147483647))
    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    return lo - 1  # largest t with count >= k


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    b = 1024

    for n, k in ((17188, 1000), (8000, 1000), (2048, 1000), (8000, 100),
                 (137500, 1000)):
        x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        t = timed(jax.jit(lambda a: lax.top_k(a, k)[0]), x)
        print(f"top_k f32 ({b},{n})->{k}: {t * 1e3:8.2f} ms", flush=True)

    n, k = 17188, 1000
    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
    xb = x.astype(jnp.bfloat16)
    t = timed(jax.jit(lambda a: lax.top_k(a, k)[0]), xb)
    print(f"top_k bf16 ({b},{n})->{k}: {t * 1e3:8.2f} ms", flush=True)

    t = timed(jax.jit(lambda a: jnp.sort(a, axis=1)), x)
    print(f"full sort f32 ({b},{n}): {t * 1e3:8.2f} ms", flush=True)

    for rt in (0.95, 0.99):
        t = timed(jax.jit(lambda a, r=rt: lax.approx_max_k(a, k, recall_target=r)[0]), x)
        print(f"approx_max_k rt={rt} ({b},{n})->{k}: {t * 1e3:8.2f} ms", flush=True)

    for n in (8000, 17188, 137500):
        x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)
        t = timed(jax.jit(lambda a: threshold_select(a, 1000)), x)
        # sanity: count elements above decoded threshold
        th = threshold_select(x, 1000)
        bits = lax.bitcast_convert_type(x, jnp.int32)
        mono = jnp.where(bits >= 0, bits + jnp.int32(-2147483648), ~bits)
        cnt = jnp.sum((mono > th[:, None]).astype(jnp.int32), axis=1)
        cmax, cmin = int(cnt.max()), int(cnt.min())
        print(f"threshold-select ({b},{n})->k=1000: {t * 1e3:8.2f} ms "
              f"(count> in [{cmin},{cmax}])", flush=True)


if __name__ == "__main__":
    main()
