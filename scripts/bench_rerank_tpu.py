"""Two-stage serving benchmark on the real chip: dense recall + MaxSim
rerank throughput over an on-disk int8 token store.

Workload (BGE-M3-colbert-sized): 256k docs x Td=32 tokens x d=128
(int8 + per-token scales, ~1 GB store), B=256 queries x Tq=16,
k_dense=100 -> k=10. Reports dense/gather/rerank phase times and e2e
two-stage qps. One JSON line at the end.

Usage: python scripts/bench_rerank_tpu.py [--docs 262144] [--out /tmp/...]
"""

import argparse
import json
import pathlib
import shutil
import sys
import tempfile
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.token_shards import TokenShardStore, TokenShardWriter
from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=262_144)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--td", type=int, default=32)
    ap.add_argument("--tq", type=int, default=16)
    ap.add_argument("--b", type=int, default=256)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--k_dense", type=int, default=100)
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    out = pathlib.Path(args.out) if args.out else pathlib.Path(
        tempfile.mkdtemp(prefix="bench_rerank_")
    )
    tok_dir = out / "tokens"
    n, td, d = args.docs, args.td, args.dim

    t0 = time.perf_counter()
    if not TokenShardStore.exists(tok_dir):
        w = TokenShardWriter(tok_dir, d, td, "int8", lang="en")
        step = 16_384
        for s in range(0, n, step):
            m = min(step, n - s)
            blk = rng.standard_normal((m, td, d)).astype(np.float32)
            blk /= np.linalg.norm(blk, axis=-1, keepdims=True)
            w.append(blk, np.full(m, td), [str(s + i) for i in range(m)])
        w.finalize()
    store = TokenShardStore.open(tok_dir)
    print(json.dumps({"phase": "store_ready", "s": round(time.perf_counter() - t0, 1),
                      "docs": n, "bytes_per_doc": td * d + td * 4}), flush=True)

    # dense rows: mean of each doc's tokens (realistic correlation with MaxSim)
    dense = np.zeros((n, d), np.float32)
    step = 65_536
    for s in range(0, n, step):
        blk, _ = store.gather(np.arange(s, min(s + step, n)))
        m = blk.mean(axis=1)
        dense[s : s + len(m)] = m / np.linalg.norm(m, axis=-1, keepdims=True)
    index = DenseFlatIndex.build(dense, [str(i) for i in range(n)], dtype="bfloat16")
    index.to_device()
    print(json.dumps({"phase": "index_ready", "backend": jax.default_backend()}),
          flush=True)

    q_toks = rng.standard_normal((args.b, args.tq, d)).astype(np.float32)
    q_toks /= np.linalg.norm(q_toks, axis=-1, keepdims=True)
    q_lens = np.full(args.b, args.tq)
    q_dense = q_toks.mean(axis=1)
    q_dense /= np.linalg.norm(q_dense, axis=-1, keepdims=True)

    # host-gather path pinned explicitly: the auto default would go
    # device-resident for this store size (and does, measured below)
    searcher = TwoStageSearcher(index, store, device_resident=False)
    # warmup at the FULL query shape (a smaller warm batch would leave the
    # timed run paying the compile) + warm the gather's page cache
    searcher.search(q_dense, q_toks, q_lens, args.k, k_dense=args.k_dense)

    # phase timings (median of 3)
    def med(fn):
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn()
            ts.append(time.perf_counter() - t0)
        ts.sort()
        return ts[1], out

    t_dense, gids = med(
        lambda: index.search(q_dense, args.k_dense, return_docids=False)[1]
    )
    t_gather, _ = med(lambda: store.gather_quantized(gids.ravel()))
    t_e2e, pair = med(
        lambda: searcher.search(
            q_dense, q_toks, q_lens, args.k, k_dense=args.k_dense,
            return_docids=False,
        )
    )
    scores, ids = pair

    # correctness: rank-1 should be a sane candidate and scores sorted
    assert np.all(np.diff(scores, axis=1) <= 1e-5)
    print(json.dumps({
        "bench": "two_stage_rerank",
        "workload": "uniform",
        "docs": n, "td": td, "dim": d, "b": args.b,
        "k": args.k, "k_dense": args.k_dense,
        "dense_ms": round(t_dense * 1e3, 1),
        "gather_ms": round(t_gather * 1e3, 1),
        "e2e_ms": round(t_e2e * 1e3, 1),
        "e2e_qps": round(args.b / t_e2e, 1),
        "backend": jax.default_backend(),
    }), flush=True)

    # hot-doc workload: real query traffic clusters on popular documents,
    # so a query block's candidate sets overlap heavily — the dedupe path
    # then ships only the unique blocks host->device (the dominant cost
    # on remote-attached TPUs)
    hot = rng.integers(0, 16, size=args.b)  # 16 hot seeds -> heavy overlap
    blk, _ = store.gather(hot)
    qh_toks = blk[:, : args.tq].astype(np.float32) + 0.05 * rng.standard_normal(
        (args.b, args.tq, d)
    ).astype(np.float32)
    qh_toks /= np.linalg.norm(qh_toks, axis=-1, keepdims=True)
    qh_dense = qh_toks.mean(axis=1)
    qh_dense /= np.linalg.norm(qh_dense, axis=-1, keepdims=True)
    searcher.search(qh_dense, qh_toks, q_lens, args.k, k_dense=args.k_dense)
    _, hot_gids = index.search(qh_dense, args.k_dense, return_docids=False)
    dup = args.b * args.k_dense / max(1, len(np.unique(hot_gids)))
    t_hot, _ = med(
        lambda: searcher.search(
            qh_dense, qh_toks, q_lens, args.k, k_dense=args.k_dense,
            return_docids=False,
        )
    )
    print(json.dumps({
        "bench": "two_stage_rerank",
        "workload": "hot_docs",
        "duplication": round(float(dup), 1),
        "e2e_ms": round(t_hot * 1e3, 1),
        "e2e_qps": round(args.b / t_hot, 1),
    }), flush=True)

    # DEVICE-RESIDENT store (VERDICT r2 item 3): upload the int8 blocks
    # once; the per-query host gather + host->device candidate transfer
    # disappears — candidates become an HBM row gather inside the jit
    t0 = time.perf_counter()
    resident = TwoStageSearcher(index, store, device_resident=True)
    t_upload = time.perf_counter() - t0
    resident.search(q_dense, q_toks, q_lens, args.k, k_dense=args.k_dense)
    t_res, pair_r = med(
        lambda: resident.search(
            q_dense, q_toks, q_lens, args.k, k_dense=args.k_dense,
            return_docids=False,
        )
    )
    # bit-parity with the host-gather path
    np.testing.assert_array_equal(np.asarray(pair_r[1]), np.asarray(ids))
    np.testing.assert_allclose(np.asarray(pair_r[0]), scores, rtol=1e-5, atol=1e-5)
    print(json.dumps({
        "bench": "two_stage_rerank",
        "workload": "uniform_device_resident",
        "upload_s": round(t_upload, 1),
        "store_gib": round(resident._store_bytes() / 2**30, 2),
        "e2e_ms": round(t_res * 1e3, 1),
        "e2e_qps": round(args.b / t_res, 1),
        "host_gather_share_of_host_e2e": round(t_gather / t_e2e, 3),
        "speedup_vs_host_path": round(t_e2e / t_res, 2),
        "parity": "bit-identical",
    }), flush=True)
    if not args.out:
        shutil.rmtree(out, ignore_errors=True)


if __name__ == "__main__":
    main()
