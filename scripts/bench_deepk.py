"""Deep-k (k=500/1000) search-phase breakdown on the real chip.

BENCH_NOTES round 1: k=1000 collapses to ~2.3k qps because phase-2 work
scales as k*G (candidate gather + big lax.top_k over N/G bin maxima).
This script times each phase in isolation and prototypes a TWO-LEVEL
bin cover (super-bins of M bins) to shrink every top_k domain, so the
production kernel choice is measurement-driven, not guessed.

Run on TPU in the background; one JSON line per probe.
"""

import functools
import gc
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from codemix_dense_retrieval_tpu.ops.topk import (
    NEG_INF,
    _bin_scores_pallas,
    _binmax_only_pallas,
    topk_ip_bins,
    topk_ip_bins_rescore,
    topk_ip_oracle,
)


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    leaf = jax.tree.leaves(out)[0]
    _ = float(jnp.ravel(leaf)[0])  # axon relay: force scalar sync
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        out = fn(*args)
        leaf = jax.tree.leaves(out)[0]
        _ = float(jnp.ravel(leaf)[0])
        times.append(time.perf_counter() - t0)
    times.sort()
    return times[len(times) // 2], out


def report(name, dt, B=None):
    line = {"probe": name, "ms": round(dt * 1e3, 1)}
    if B:
        line["qps"] = round(B / dt, 0)
    print(json.dumps(line), flush=True)


def drop(*arrs):
    for a in arrs:
        if a is not None:
            try:
                a.delete()
            except Exception:
                pass
    gc.collect()


def two_level_topk(queries, docs, k, *, G, M, tile_b, score_dtype=jnp.float32):
    """Two-level bin-max cover: exact top-k with all top_k domains shrunk.

    Level 1: bins of G rows (bin_max). Level 2: super-bins of M bins
    (super_max). Cover argument applies at each granularity:
    top-k super-bins contain the top-k bins contain the top-k rows.
    """
    b = queries.shape[0]
    n_pad = docs.shape[0]
    scores_t, bin_max_t = _bin_scores_pallas(
        queries, docs, G, n_pad, tile_b=tile_b, tile_n=1024,
        interpret=False, score_dtype=score_dtype,
    )
    nb = bin_max_t.shape[0]
    super_max = jnp.max(bin_max_t.reshape(nb // M, M, b), axis=1).T  # (B, ns)
    _, sup_ids = lax.top_k(super_max, k)              # k super-bins cover
    sup_ids = lax.sort(sup_ids, dimension=1)
    # gather the selected super-bins' bin maxima: (B, k*M)
    bin_idx = (
        sup_ids[:, :, None] * M + lax.broadcasted_iota(jnp.int32, (1, 1, M), 2)
    ).reshape(b, k * M)
    cand_binmax = jnp.take_along_axis(bin_max_t, bin_idx.T, axis=0).T
    _, pos = lax.top_k(cand_binmax, k)                # k bins among k*M
    bin_ids = jnp.take_along_axis(bin_idx, pos, axis=1)
    bin_ids = lax.sort(bin_ids, dimension=1)
    cand_idx = (
        bin_ids[:, :, None] * G + lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
    ).reshape(b, k * G)
    cand_scores = jnp.take_along_axis(scores_t, cand_idx.T, axis=0).T
    vals, p2 = lax.top_k(cand_scores.astype(jnp.float32), k)
    return vals, jnp.take_along_axis(cand_idx, p2, axis=1)


def main():
    N, dim, B, k = 1_100_000, 1024, 1024, 1000
    rng = np.random.default_rng(0)
    docs_np = rng.standard_normal((N, dim), dtype=np.float32)
    n_pad = ((N + 1023) // 1024) * 1024
    docs_p = jnp.asarray(
        np.pad(docs_np, ((0, n_pad - N), (0, 0)))
    ).astype(jnp.bfloat16)
    queries = jnp.asarray(
        rng.standard_normal((B, dim), dtype=np.float32)
    ).astype(jnp.bfloat16)
    print(json.dumps({"workload": f"{N}x{dim} bf16, B={B}, k={k}",
                      "backend": jax.default_backend()}), flush=True)
    oracle_q = np.asarray(queries[:8].astype(jnp.float32))
    ov_ref = None  # computed lazily once

    def oracle_ids():
        nonlocal ov_ref
        if ov_ref is None:
            _, ri = topk_ip_oracle(
                oracle_q, docs_np.astype(np.float32), k)
            ov_ref = ri
        return ov_ref

    # --- baseline: current single-level stored-scores path ---------------
    f = jax.jit(functools.partial(
        topk_ip_bins, k=k, bin_size=8, use_pallas=True, tile_b=512,
        tile_n=1024, interpret=False))
    dt, out = timed(lambda q, d: f(q, d), queries, docs_p)
    report(f"current_stored_G8_k{k}", dt, B)
    drop(*out)

    # --- phase 1 alone -----------------------------------------------------
    f1 = jax.jit(functools.partial(
        _bin_scores_pallas, bin_size=8, n_valid=n_pad, tile_b=512,
        tile_n=1024, interpret=False))
    dt, out = timed(lambda q, d: f1(q, d), queries, docs_p)
    report("phase1_stored_f32_G8", dt, B)
    drop(*out)
    f1b = jax.jit(functools.partial(
        _bin_scores_pallas, bin_size=8, n_valid=n_pad, tile_b=512,
        tile_n=1024, interpret=False, score_dtype=jnp.bfloat16))
    dt, out = timed(lambda q, d: f1b(q, d), queries, docs_p)
    report("phase1_stored_bf16_G8", dt, B)
    drop(*out)
    fbm = jax.jit(functools.partial(
        _binmax_only_pallas, bin_size=8, n_valid=n_pad, tile_b=512,
        tile_n=1024, interpret=False))
    dt, out = timed(lambda q, d: fbm(q, d), queries, docs_p)
    report("phase1_binmax_only_G8", dt, B)
    drop(out)

    # --- isolated top_k domains ---------------------------------------------
    for nb in (137_500, 17_188, 16_000, 8_594, 8_000):
        x = jnp.asarray(rng.standard_normal((B, nb), dtype=np.float32))
        fk = jax.jit(lambda a: lax.top_k(a, k))
        dt, out = timed(fk, x)
        report(f"topk_{nb}_to_{k}", dt, B)
        drop(x, *out)

    # --- isolated element gather from (N, B) scores --------------------------
    scores_t = jnp.asarray(rng.standard_normal((n_pad, B), dtype=np.float32))
    idx = jnp.asarray(rng.integers(0, N, size=(B, k * 8), dtype=np.int32))
    fg = jax.jit(lambda s, i: jnp.take_along_axis(s, i.T, axis=0).T)
    dt, out = timed(fg, scores_t, idx)
    report("gather_8000_from_NB_f32", dt, B)
    drop(out)
    scores_tb = scores_t.astype(jnp.bfloat16)
    drop(scores_t)
    fgb = jax.jit(lambda s, i: jnp.take_along_axis(s, i.T, axis=0).T)
    dt, out = timed(fgb, scores_tb, idx)
    report("gather_8000_from_NB_bf16", dt, B)
    drop(scores_tb, idx, out)

    # --- two-level prototype --------------------------------------------------
    for (G, M) in ((8, 16), (8, 8), (16, 8)):
        f2 = jax.jit(functools.partial(two_level_topk, k=k, G=G, M=M, tile_b=512))
        dt, (v2, i2) = timed(lambda q, d: f2(q, d), queries, docs_p)
        report(f"two_level_G{G}_M{M}_k{k}", dt, B)
        got = np.asarray(i2)[:8]
        drop(v2, i2)
        ri = oracle_ids()
        ov = np.mean([len(set(g.tolist()) & set(r.tolist())) / k
                      for g, r in zip(got, ri)])
        print(json.dumps({"probe": f"two_level_G{G}_M{M}_overlap",
                          "overlap": round(float(ov), 5)}), flush=True)

    # two-level with bf16 stored scores
    f2b = jax.jit(functools.partial(
        two_level_topk, k=k, G=8, M=16, tile_b=512, score_dtype=jnp.bfloat16))
    dt, out = timed(lambda q, d: f2b(q, d), queries, docs_p)
    report("two_level_G8_M16_bf16scores", dt, B)
    drop(*out)

    # --- rescore path at deep k -------------------------------------------------
    fr = jax.jit(functools.partial(
        topk_ip_bins_rescore, k=k, bin_size=16, tile_b=512, tile_n=1024,
        interpret=False))
    dt, out = timed(lambda q, d: fr(q, d), queries, docs_p)
    report(f"rescore_G16_k{k}", dt, B)
    drop(*out)

    # --- k=500 on the two-level shape --------------------------------------------
    f5 = jax.jit(functools.partial(two_level_topk, k=500, G=8, M=16, tile_b=512))
    dt, out = timed(lambda q, d: f5(q, d), queries, docs_p)
    report("two_level_G8_M16_k500", dt, B)
    drop(*out)


if __name__ == "__main__":
    main()
