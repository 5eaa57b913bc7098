"""Probe EXACT threshold+pack replacement for the super-level top_k.

Baseline: lax.top_k((1024, 17188)) -> 1000 ids = 23.7 ms (probe_topk_tail).
Candidate: (1) bitwise binary-search per-query k-th-value threshold
(exact, ~3.7 ms), (2) mask = mono >= tau, rank = cumsum(mask), (3) pack
selected ids into k + slack slots with a one-hot DOT on the MXU:
packed[b, j] = sum_i ids_i * (rank[b,i] == j+1 & mask). All stages are
exact — no recall slack, no verification pass; overflow (tie mass >
slack) is detected from count and falls back.
"""

import functools
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
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(jnp.asarray(leaf).ravel()[0])
    return (time.perf_counter() - t0) / reps


def monotone_i32(vals):
    bits = lax.bitcast_convert_type(vals, jnp.int32)
    return jnp.where(bits >= 0, bits, jnp.bitwise_xor(~bits, jnp.int32(-2147483648)))


def kth_threshold(mono, k):
    """Largest int32 t with count(mono >= t) >= k, by 32-step bisection."""

    def body(_, carry):
        lo, hi = carry
        # overflow-safe signed midpoint: (lo & hi) + ((lo ^ hi) >> 1)
        mid = (lo & hi) + ((lo ^ hi) >> 1)
        cnt = jnp.sum((mono >= mid[:, None]).astype(jnp.int32), axis=1)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    b = mono.shape[0]
    lo = jnp.full((b,), jnp.int32(-2147483648))
    hi = jnp.full((b,), jnp.int32(2147483647))
    lo, hi = lax.fori_loop(0, 32, body, (lo, hi))
    return lo


def pack_select(vals, k, slack=24):
    """Exact top-(>=k) id pack: ids of every element >= kth value, in
    ascending id order, padded to k+slack with n (out-of-range)."""
    b, n = vals.shape
    p = k + slack
    mono = monotone_i32(vals)
    tau = kth_threshold(mono, k)
    mask = mono >= tau[:, None]
    rank = jnp.cumsum(mask.astype(jnp.int32), axis=1)  # 1-based at set bits
    count = rank[:, -1]
    slot = lax.broadcasted_iota(jnp.int32, (1, p), 1) + 1  # (1, P)
    # one-hot (B, n, P) in bf16, contracted on the MXU against ids/vals
    onehot = ((rank[:, :, None] == slot[:, None, :]) & mask[:, :, None]).astype(jnp.bfloat16)
    ids = lax.broadcasted_iota(jnp.int32, (1, n), 1).astype(jnp.bfloat16)
    # bf16 mantissa cannot hold ids>256 exactly -> pack id hi/lo bytes
    id_hi = jnp.floor_divide(lax.broadcasted_iota(jnp.int32, (1, n), 1), 256).astype(jnp.bfloat16)
    id_lo = jnp.remainder(lax.broadcasted_iota(jnp.int32, (1, n), 1), 256).astype(jnp.bfloat16)
    hi = jnp.einsum("bnp,bn->bp", onehot, jnp.broadcast_to(id_hi, (b, n)))
    lo_ = jnp.einsum("bnp,bn->bp", onehot, jnp.broadcast_to(id_lo, (b, n)))
    packed = hi.astype(jnp.int32) * 256 + lo_.astype(jnp.int32)
    got = jnp.minimum(count, p)
    valid = lax.broadcasted_iota(jnp.int32, (1, p), 1) < got[:, None]
    packed = jnp.where(valid, packed, n)
    return packed, count


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    b, n, k = 1024, 17188, 1000

    x = jnp.asarray(rng.standard_normal((b, n)), jnp.float32)

    base = jax.jit(lambda a: lax.top_k(a, k)[1])
    t = timed(base, x)
    print(f"lax.top_k ({b},{n})->{k} ids: {t * 1e3:8.2f} ms", flush=True)

    fn = jax.jit(functools.partial(pack_select, k=k))
    t = timed(fn, x)
    print(f"threshold+pack-dot ({b},{n})->{k}+24: {t * 1e3:8.2f} ms", flush=True)

    # correctness: packed ids == sorted top-k ids (no ties in random data)
    packed, count = fn(x)
    ref_ids = np.sort(np.asarray(base(x))[:, :k], axis=1)
    got = np.asarray(packed)
    cnt = np.asarray(count)
    assert cnt.min() >= k, cnt.min()
    for i in range(0, b, 137):
        gi = got[i][got[i] < n]
        assert len(gi) == cnt[i], (len(gi), cnt[i])
        np.testing.assert_array_equal(gi[:k], ref_ids[i])
    print("pack ids match lax.top_k ids (sorted) on sampled queries", flush=True)

    # stage splits
    mono = monotone_i32(x)
    t = timed(jax.jit(lambda m: kth_threshold(m, k)), mono)
    print(f"  threshold alone: {t * 1e3:8.2f} ms", flush=True)
    t = timed(jax.jit(lambda a: jnp.cumsum(
        (monotone_i32(a) >= 0).astype(jnp.int32), axis=1)), x)
    print(f"  mask+cumsum alone: {t * 1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
