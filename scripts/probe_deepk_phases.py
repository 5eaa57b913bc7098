"""Phase breakdown of the deep-k two-level pipeline at the r4h winning
config (G16 M8 tb1024, k=1000, B=1024, 1.1M x 1024 bf16).

Stage A times the fused phase-1 kernel alone (scores_bm + binmax_bm).
Stage B times the selection tail on RESIDENT phase-1 outputs, in
cumulative prefixes, so differences attribute the tail wall:
  supermax   : reshape-max (B, nb) -> (B, ns)
  supertopk  : + lax.top_k over ns supers
  select     : + binmax slice gather + bin top_k (_select_bins_two_level)
  gather     : + candidate score slice gather (k*G per query)
  full tail  : + final lax.top_k over k*G candidates
Stage C probes cheaper alternatives for the dominant top_k stage(s):
  approx_max_k on the super domain (recall target printed, NOT exact —
  headroom gauge only), and a sort+slice final stage.

One TPU process. Writes human-readable lines; bank to bench_logs/.
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

from codemix_dense_retrieval_tpu.ops import topk as T
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

import os

N = int(os.environ.get("PROBE_N", 1_100_000))
DIM = int(os.environ.get("PROBE_DIM", 1024))
B = int(os.environ.get("PROBE_B", 1024))
K = int(os.environ.get("PROBE_K", 1000))
G, M, TB, TN = 16, 8, 1024, 1024


def timeit(fn, *args, iters=6):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    # the axon plugin registers regardless of the env var; honor an
    # explicit CPU request the way cli.main does (in-process pin)
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    docs = jnp.asarray(
        rng.standard_normal((N, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(
        rng.standard_normal((B, DIM), dtype=np.float32)
    ).astype(jnp.bfloat16)

    # ---- stage A: fused phase-1 kernel alone --------------------------
    (docs_p,), (queries_p,), n_valid, eff_tb, b, b_pad, interp = T._prep_shard(
        K, None, TB, TN, False, [docs], [queries], chunk=G * M,
    )

    p1 = jax.jit(functools.partial(
        T._bin_scores_pallas_bm, bin_size=G, n_valid=n_valid,
        tile_b=eff_tb, tile_n=TN, interpret=False,
    ))
    dt = timeit(p1, queries_p, docs_p)
    print(f"A  phase1 kernel (scores+binmax, bin-major): {dt*1000:7.1f} ms",
          flush=True)

    scores_bm, binmax_bm = p1(queries_p, docs_p)
    scores_bm = scores_bm[:B]
    binmax_bm = binmax_bm[:B]
    jax.block_until_ready((scores_bm, binmax_bm))
    nb = binmax_bm.shape[1]
    ns = nb // M
    print(f"   nb={nb} ns={ns} scores {scores_bm.shape} {scores_bm.dtype}",
          flush=True)

    # ---- stage B: cumulative tail prefixes on resident inputs --------
    @jax.jit
    def b_supermax(bm):
        return bm.reshape(B, ns, M).max(axis=2)

    @jax.jit
    def b_supertopk(bm):
        sm = bm.reshape(B, ns, M).max(axis=2)
        return lax.top_k(sm, min(K, ns))

    @jax.jit
    def b_select(bm):
        return T._select_bins_two_level(bm, K, M)

    @jax.jit
    def b_gather(sc, bm):
        bin_ids = T._select_bins_two_level(bm, K, M)
        kb = bin_ids.shape[1]
        cand = jnp.take_along_axis(
            sc.reshape(B, nb, G), bin_ids[:, :, None], axis=1,
        ).reshape(B, kb * G)
        return cand

    @jax.jit
    def b_full(sc, bm):
        return T._topk_from_bins_two_level_bm(sc, bm, K, G, M)

    t_sm = timeit(b_supermax, binmax_bm)
    t_st = timeit(b_supertopk, binmax_bm)
    t_se = timeit(b_select, binmax_bm)
    t_ga = timeit(b_gather, scores_bm, binmax_bm)
    t_fu = timeit(b_full, scores_bm, binmax_bm)
    print(f"B  supermax             : {t_sm*1000:7.1f} ms", flush=True)
    print(f"B  + super top_k        : {t_st*1000:7.1f} ms  (+{(t_st-t_sm)*1000:.1f})", flush=True)
    print(f"B  + select (bin top_k) : {t_se*1000:7.1f} ms  (+{(t_se-t_st)*1000:.1f})", flush=True)
    print(f"B  + cand slice gather  : {t_ga*1000:7.1f} ms  (+{(t_ga-t_se)*1000:.1f})", flush=True)
    print(f"B  + final top_k (FULL) : {t_fu*1000:7.1f} ms  (+{(t_fu-t_ga)*1000:.1f})", flush=True)

    # ---- stage C: alternatives ---------------------------------------
    @jax.jit
    def c_approx_super(bm):
        sm = bm.reshape(B, ns, M).max(axis=2)
        return lax.approx_max_k(sm, min(K, ns))

    @jax.jit
    def c_sort_final(sc, bm):
        bin_ids = T._select_bins_two_level(bm, K, M)
        kb = bin_ids.shape[1]
        cand = jnp.take_along_axis(
            sc.reshape(B, nb, G), bin_ids[:, :, None], axis=1,
        ).reshape(B, kb * G).astype(jnp.float32)
        cand_idx = (
            bin_ids[:, :, None] * G
            + lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
        ).reshape(B, kb * G)
        svals, sidx = lax.sort((-cand, cand_idx), dimension=1, num_keys=1)
        return -svals[:, :K], sidx[:, :K]

    @jax.jit
    def c_approx_final(sc, bm):
        bin_ids = T._select_bins_two_level(bm, K, M)
        kb = bin_ids.shape[1]
        cand = jnp.take_along_axis(
            sc.reshape(B, nb, G), bin_ids[:, :, None], axis=1,
        ).reshape(B, kb * G).astype(jnp.float32)
        return lax.approx_max_k(cand, K)

    try:
        t_as = timeit(c_approx_super, binmax_bm)
        print(f"C  approx_max_k supers  : {t_as*1000:7.1f} ms  "
              f"(vs exact super top_k +{(t_st-t_sm)*1000:.1f})", flush=True)
    except Exception as e:
        print(f"C  approx_max_k supers  : FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    try:
        t_sf = timeit(c_sort_final, scores_bm, binmax_bm)
        print(f"C  sort+slice final     : {t_sf*1000:7.1f} ms  (vs full {t_fu*1000:.1f})",
              flush=True)
    except Exception as e:
        print(f"C  sort+slice final     : FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    try:
        t_af = timeit(c_approx_final, scores_bm, binmax_bm)
        print(f"C  approx_max_k final   : {t_af*1000:7.1f} ms  (headroom gauge)",
              flush=True)
    except Exception as e:
        print(f"C  approx_max_k final   : FAILED {type(e).__name__}: {str(e)[:120]}",
              flush=True)

    # end-to-end sanity at this config
    full = jax.jit(functools.partial(
        T.topk_ip_bins_two_level, k=K, bin_size=G, super_size=M,
        tile_b=TB, tile_n=TN, interpret=False,
    ))
    t_e2e = timeit(full, queries, docs)
    print(f"E2E topk_ip_bins_two_level G{G} M{M} tb{TB}: {t_e2e*1000:7.1f} ms "
          f"{B/t_e2e:8.1f} qps", flush=True)


if __name__ == "__main__":
    main()
