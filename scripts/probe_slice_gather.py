"""Probe: phase-2 candidate extraction strategies for deep-k top-k.

The r2 measurement: XLA ELEMENT gathers are issue-bound (~0.014 ms per
per-query element) regardless of layout/dtype — 270 ms of the k=1000
wall. Hypothesis (VERDICT r3 item 1b): gathering whole BINS as
contiguous G-element slices from a bin-major (B, nb, G) layout cuts the
issue count by G (and super-slices by G*M), turning the gather
HBM-side. Measures, at serving shapes (N=1.1M, B=512, k=1000):

  A  element gather from (N, B)    [current production formulation]
  B  bin-slice gather from (B, nb, G)  via take_along_axis axis=1
  C  super-slice gather from (B, ns, G*M) + full top_k over ks*G*M
  D  bin-max slice gather from (B, ns, M)  [phase-2a equivalent]
  E  full two-level tail in bin-major layout (D + B + top_ks)

Run from /root/repo WITHOUT PYTHONPATH (axon plugin registration).
"""

import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

B, N, G, M, K = 512, 1_114_112, 8, 4, 1000
NB, NS = N // G, N // (G * M)


def sync(x):
    jax.block_until_ready(x)
    return float(jnp.ravel(x)[0])


def bench(fn, *args, iters=5):
    out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    sync(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters * 1000.0


@jax.jit
def elem_gather(scores_t, cand_idx):
    return jnp.take_along_axis(scores_t, cand_idx.T, axis=0).T


@jax.jit
def bin_slice_gather(scores_b3, bin_ids):
    # (B, nb, G) gather k bins -> (B, k, G): minor-dim-contiguous slices
    return jnp.take_along_axis(scores_b3, bin_ids[:, :, None], axis=1)


@jax.jit
def bin_slice_topk(scores_b3, bin_ids):
    cand = jnp.take_along_axis(scores_b3, bin_ids[:, :, None], axis=1)
    flat = cand.reshape(B, -1).astype(jnp.float32)
    vals, pos = lax.top_k(flat, K)
    gids = bin_ids[:, :, None] * G + lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
    return vals, jnp.take_along_axis(gids.reshape(B, -1), pos, axis=1)


@jax.jit
def super_slice_topk(scores_s3, sup_ids):
    cand = jnp.take_along_axis(scores_s3, sup_ids[:, :, None], axis=1)
    flat = cand.reshape(B, -1).astype(jnp.float32)
    vals, pos = lax.top_k(flat, K)
    gids = sup_ids[:, :, None] * (G * M) + lax.broadcasted_iota(
        jnp.int32, (1, 1, G * M), 2
    )
    return vals, jnp.take_along_axis(gids.reshape(B, -1), pos, axis=1)


@jax.jit
def binmax_slice_gather(binmax_s3, sup_ids):
    return jnp.take_along_axis(binmax_s3, sup_ids[:, :, None], axis=1)


@jax.jit
def two_level_binmajor(scores_b3, binmax_b2):
    # full tail: super max -> top_ks -> covered binmax slices -> top_k bins
    # -> covered score slices -> final top_k
    super_max = binmax_b2.reshape(B, NS, M).max(axis=2)
    _, sup_ids = lax.top_k(super_max, K)
    sup_ids = lax.sort(sup_ids, dimension=1)
    cand_bm = jnp.take_along_axis(
        binmax_b2.reshape(B, NS, M), sup_ids[:, :, None], axis=1
    ).reshape(B, K * M)
    cand_bins = sup_ids[:, :, None] * M + lax.broadcasted_iota(
        jnp.int32, (1, 1, M), 2
    )
    _, pos = lax.top_k(cand_bm, K)
    bin_ids = jnp.take_along_axis(cand_bins.reshape(B, -1), pos, axis=1)
    bin_ids = lax.sort(bin_ids, dimension=1)
    cand = jnp.take_along_axis(scores_b3, bin_ids[:, :, None], axis=1)
    vals, p2 = lax.top_k(cand.reshape(B, K * G).astype(jnp.float32), K)
    gids = (
        bin_ids[:, :, None] * G + lax.broadcasted_iota(jnp.int32, (1, 1, G), 2)
    ).reshape(B, -1)
    return vals, jnp.take_along_axis(gids, p2, axis=1)


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)
    # realistic score magnitudes
    scores = rng.standard_normal((B, N), dtype=np.float32) * 0.3

    def sample_rows(pop, k):
        # per-query distinct sorted ids (replace=False per ROW)
        r = rng.random((B, pop))
        part = np.argpartition(r, k, axis=1)[:, :k]
        return np.sort(part.astype(np.int32), axis=1)

    bin_ids = sample_rows(NB, K)
    sup_ids = sample_rows(NS, K)
    bin_ids_j = jnp.asarray(bin_ids)
    sup_ids_j = jnp.asarray(sup_ids)
    cand_idx = (
        bin_ids[:, :, None] * G + np.arange(G)[None, None, :]
    ).reshape(B, K * G).astype(np.int32)
    cand_idx_j = jnp.asarray(cand_idx)

    # --- variant A on the (N, B) layout, then free it (HBM budget) ---
    s_t = jnp.asarray(np.ascontiguousarray(scores.T))
    sync(s_t)
    t = bench(elem_gather, s_t, cand_idx_j)
    print(f"A element gather (N,B) k*G={K*G}/q:        {t:8.1f} ms", flush=True)
    del s_t

    # --- bin-major variants ---
    s_b = jnp.asarray(scores)
    s_b3 = s_b.reshape(B, NB, G)
    s_s3 = s_b.reshape(B, NS, G * M)
    binmax = s_b3.max(axis=2)
    sync(binmax)
    t = bench(bin_slice_gather, s_b3, bin_ids_j)
    print(f"B bin-slice gather (B,nb,G) k={K}/q:       {t:8.1f} ms", flush=True)
    t = bench(bin_slice_topk, s_b3, bin_ids_j)
    print(f"B' bin-slice gather + final top_k:         {t:8.1f} ms", flush=True)
    t = bench(super_slice_topk, s_s3, sup_ids_j)
    print(f"C super-slice gather + top_k over {K*G*M}: {t:8.1f} ms", flush=True)
    t = bench(binmax_slice_gather, jnp.asarray(binmax).reshape(B, NS, M), sup_ids_j)
    print(f"D binmax slice gather (B,ns,M) k={K}/q:    {t:8.1f} ms", flush=True)
    t = bench(two_level_binmajor, s_b3, binmax)
    print(f"E full bin-major two-level tail:           {t:8.1f} ms", flush=True)

    # correctness spot check of E vs numpy
    vals, ids = two_level_binmajor(s_b3, binmax)
    vals, ids = np.asarray(vals), np.asarray(ids)
    want = np.sort(scores[0])[::-1][:K]
    np.testing.assert_allclose(vals[0], want, rtol=1e-6)
    got_ids = set(ids[0].tolist())
    want_ids = set(np.argsort(-scores[0], kind="stable")[:K].tolist())
    print("E exact overlap:", len(got_ids & want_ids) / K, flush=True)


if __name__ == "__main__":
    main()
