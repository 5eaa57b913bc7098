"""Round-5 deep-k tail probes: find what (if anything) beats the tuned
two-level tail at k=1000, B=1024, N=1.1M, and measure the pure-matmul
floor WITHIN THE SAME SESSION so every comparison is chip-state-fair.

Stages probed (all shapes at the bench config G16 M8 unless noted):

  A. chip state: bf16 4k matmul TF/s + HBM device copy GB/s
  B. pure phase-1 analog: (1024,1024)@(1024,1.1M) bf16->f32 matmul
  C. current tuned tail end-to-end (_topk_from_bins_two_level_bm)
  D. single-level direct: top_k(binmax (B,68750) -> 1000)  [kills 3 stages]
  E. top_k((B,8594) -> k) for k in {250,500,1000}           [k-dependence]
  F. slice gathers: count vs width at fixed 16k-cand volume
       (B,68750,16) take 1000 | (B,34375,32) take 500 | (B,8594,128) take 125
     plus count-scaling at fixed width: (B,68750,16) take {250,500,1000}
  G. bitwise kth-threshold over (B,68750) and (B,8594)
  H. cumsum int32 over (B,68750)
  I. final top_k (B,n)->1000 for n in {16000,32000}
  J. G32 variant: top_k((B,34375)->1000) + gather 1000x32 + final over 32k

Each timing is device-time-ish: outputs are sum-reduced on device and a
single scalar is read back (the ~40 ms relay RTT amortizes over reps).
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache


def _sync(out):
    # the axon relay's block_until_ready returns before the program has
    # run (bench.py's documented quirk) — force a scalar host transfer;
    # device execution is FIFO so this also fences earlier dispatches
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.asarray(leaf).ravel()[0])


def timed(fn, *args, reps=8):
    _sync(fn(*args))
    _sync(fn(*args))  # compile fully settled
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / reps


def _reduce(x):
    return jax.tree_util.tree_reduce(
        lambda a, b: a + jnp.sum(b.astype(jnp.float32)), x, jnp.float32(0)
    )


def main():
    enable_compile_cache()
    B, N, DIM = 1024, 1_100_800, 1024  # N divisible by 16*8 and 32*8
    G, M = 16, 8
    nb, ns = N // G, N // G // M
    rng = np.random.default_rng(0)
    print(f"backend={jax.default_backend()} B={B} N={N} nb={nb} ns={ns}",
          flush=True)

    # ALL large arrays are generated ON-DEVICE (jax.random): the relay
    # tunnel is ~40 MB/s, so host-side generation of the 4.5 GB score
    # matrix alone would eat the probe's whole budget in upload.
    key = jax.random.key(0)
    kq, kd, ks, kc = jax.random.split(key, 4)

    # ---- A. chip state
    a4 = jax.random.normal(kq, (4096, 4096), jnp.bfloat16)
    mm = jax.jit(lambda x: _reduce(
        lax.dot_general(x, x, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)))
    dt = timed(mm, a4, reps=16)
    tf = 2 * 4096**3 / dt / 1e12
    big = jax.random.normal(kd, (64, 1 << 20), jnp.float32)
    cp = jax.jit(lambda x: x + 1.0)
    dtc = timed(cp, big, reps=8)
    gbs = big.size * 4 * 2 / dtc / 1e9
    print(f"A chip: matmul {tf:.1f} TF/s  hbm-copy {gbs:.1f} GB/s", flush=True)
    del a4, big

    # ---- B. phase-1 analog matmul (no binning): Q @ D^T
    q = jax.random.normal(kq, (B, DIM), jnp.bfloat16)
    d = jax.random.normal(kd, (N, DIM), jnp.bfloat16)
    p1 = jax.jit(lambda q, d: _reduce(
        lax.dot_general(q, d, (((1,), (1,)), ((), ())),
                        preferred_element_type=jnp.float32)))
    dt_p1 = timed(p1, q, d, reps=6)
    print(f"B phase1-matmul(no write): {dt_p1*1e3:.1f} ms "
          f"({2*B*N*DIM/dt_p1/1e12:.1f} TF/s)", flush=True)
    del d

    # synthetic tail inputs (f32 scores bin-major + binmax)
    scores = jax.random.normal(ks, (B, N), jnp.float32)
    binmax = jax.jit(lambda s: s.reshape(B, nb, G).max(axis=2))(scores)
    jax.block_until_ready(binmax)

    # ---- C. current tuned tail end-to-end
    from codemix_dense_retrieval_tpu.ops.topk import (
        _select_bins_two_level,
        _topk_from_bins_two_level_bm,
    )
    tail = jax.jit(functools.partial(
        _topk_from_bins_two_level_bm, k=1000, bin_size=G, super_size=M))
    t_tail = timed(lambda s, m: _reduce(tail(s, m)), scores, binmax, reps=6)
    print(f"C current tail(two-level G16 M8): {t_tail*1e3:.1f} ms", flush=True)

    # ---- D. single-level direct top_k over all bins
    f_d = jax.jit(lambda m: _reduce(lax.top_k(m, 1000)))
    t_d = timed(f_d, binmax, reps=6)
    print(f"D top_k((B,{nb})->1000): {t_d*1e3:.1f} ms", flush=True)

    # ---- E. k-dependence at ns width
    smax = jax.jit(lambda m: m.reshape(B, ns, M).max(axis=2))(binmax)
    jax.block_until_ready(smax)
    for kk in (250, 500, 1000):
        f_e = jax.jit(functools.partial(
            lambda m, kk: _reduce(lax.top_k(m, kk)), kk=kk))
        t_e = timed(f_e, smax, reps=6)
        print(f"E top_k((B,{ns})->{kk}): {t_e*1e3:.1f} ms", flush=True)

    # ---- F. slice gathers
    def mk_gather(nrows, width, count):
        ids = jnp.asarray(
            np.sort(rng.integers(0, nrows, size=(B, count)), axis=1)
            .astype(np.int32))

        def g(s):
            c = jnp.take_along_axis(
                s.reshape(B, nrows, width), ids[:, :, None], axis=1)
            return _reduce(c)
        return jax.jit(g), ids

    for nrows, width, count in (
        (nb, G, 1000), (N // 32, 32, 500), (ns, M * G, 125),
        (nb, G, 500), (nb, G, 250), (N // 32, 32, 1000),
    ):
        gf, _ = mk_gather(nrows, width, count)
        t_g = timed(gf, scores, reps=6)
        print(f"F gather ({B},{nrows},{width}) take {count} "
              f"[{width*4}B x {count}]: {t_g*1e3:.1f} ms", flush=True)

    # binmax-style gather (second-level input): (B, ns, M) take 1000
    gf2, _ = mk_gather(ns, M, 1000)
    t_g2 = timed(gf2, binmax, reps=6)
    print(f"F gather ({B},{ns},{M}) take 1000 [binmax-style]: "
          f"{t_g2*1e3:.1f} ms", flush=True)

    # ---- G. bitwise kth-threshold
    def kth_threshold(vals, k, iters=31):
        bits = lax.bitcast_convert_type(vals, jnp.int32)
        mono = jnp.where(bits >= 0, bits + jnp.int32(-2147483648), ~bits)

        def body(i, carry):
            lo, hi = carry
            mid = lo + ((hi - lo) >> 1)
            cnt = jnp.sum((mono >= mid[:, None]).astype(jnp.int32), axis=1)
            ge = cnt >= k
            return jnp.where(ge, mid + 1, lo), jnp.where(ge, hi, mid)

        lo = jnp.full((vals.shape[0],), jnp.int32(-2147483648))
        hi = jnp.full((vals.shape[0],), jnp.int32(2147483647))
        lo, hi = lax.fori_loop(0, iters, body, (lo, hi))
        return lo  # first int t with count(mono >= t) < k; kth = t-1

    for arr, name in ((binmax, f"(B,{nb})"), (smax, f"(B,{ns})")):
        f_t = jax.jit(lambda v, a=arr: _reduce(kth_threshold(v, 1000)))
        t_t = timed(f_t, arr, reps=6)
        print(f"G kth-threshold {name}: {t_t*1e3:.1f} ms", flush=True)

    # ---- H. cumsum
    mask = jax.jit(lambda m: (m > 1.0).astype(jnp.int32))(binmax)
    jax.block_until_ready(mask)
    f_c = jax.jit(lambda m: _reduce(jnp.cumsum(m, axis=1)))
    t_c = timed(f_c, mask, reps=6)
    print(f"H cumsum (B,{nb}) int32: {t_c*1e3:.1f} ms", flush=True)

    # ---- I. final top_k domains
    for n_cand in (16000, 32000):
        cand = jnp.asarray(rng.standard_normal((B, n_cand), dtype=np.float32))
        f_i = jax.jit(lambda c: _reduce(lax.top_k(c, 1000)))
        t_i = timed(f_i, cand, reps=6)
        print(f"I top_k((B,{n_cand})->1000): {t_i*1e3:.1f} ms", flush=True)

    # ---- J. G32 single-level full-variant estimate pieces
    nb32 = N // 32
    binmax32 = jax.jit(lambda s: s.reshape(B, nb32, 32).max(axis=2))(scores)
    jax.block_until_ready(binmax32)
    t_j1 = timed(jax.jit(lambda m: _reduce(lax.top_k(m, 1000))),
                 binmax32, reps=6)
    print(f"J top_k((B,{nb32})->1000): {t_j1*1e3:.1f} ms", flush=True)

    # ---- K. reshape-max (B,N)->(B,nb) cost
    t_k = timed(jax.jit(lambda s: _reduce(s.reshape(B, nb, G).max(axis=2))),
                scores, reps=6)
    print(f"K reshape-max (B,N)->(B,{nb}): {t_k*1e3:.1f} ms", flush=True)

    # ---- L. composed variants, end to end on the same inputs
    def variant_direct(s, m):
        """single-level: top_k over ALL bin maxima -> gather -> final."""
        vals, bin_ids = lax.top_k(m, 1000)
        bin_ids = lax.sort(bin_ids, dimension=1)
        cand = jnp.take_along_axis(
            s.reshape(B, nb, G), bin_ids[:, :, None], axis=1
        ).reshape(B, 1000 * G)
        cand_idx = (bin_ids[:, :, None] * G
                    + lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
                    ).reshape(B, 1000 * G)
        v, p = lax.top_k(cand, 1000)
        return v, jnp.take_along_axis(cand_idx, p, axis=1)

    f_l = jax.jit(lambda s, m: _reduce(variant_direct(s, m)))
    t_l = timed(f_l, scores, binmax, reps=6)
    print(f"L variant direct-bins G16 (D+F+I): {t_l*1e3:.1f} ms", flush=True)

    print("done", flush=True)


if __name__ == "__main__":
    main()
