"""Full-stack smoke on real hardware: synthetic 100k-passage corpus with
planted qrels -> encode (flash attention) -> bf16 sharded index ->
vector-mix alpha sweep -> native eval. The TPU analog of the reference's
documented subset smoke (`reproduce_en_zh.sh` at SUBSET_CAP=100k,
SURVEY §4.1) with provable expected metrics (alpha=1 -> MRR@10 == 100).

Usage: python scripts/smoke_e2e_tpu.py [--docs 100000] [--queries 512]
"""

import argparse
import json
import pathlib
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=512)
    ap.add_argument("--dim", type=int, default=256)
    ap.add_argument("--enc_batch", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.evals.evaluate import evaluate_run, load_run_grouped
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig
    from codemix_dense_retrieval_tpu.parallel import make_mesh
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus
    from codemix_dense_retrieval_tpu.pipeline.runs import run_vector_mix_search

    on_tpu = jax.default_backend() != "cpu"
    timings = {}

    cfg = XLMRConfig.tiny(
        vocab_size=30_000, hidden_size=args.dim, num_layers=4, num_heads=8,
        intermediate_size=args.dim * 4, max_position_embeddings=64,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, use_flash=on_tpu,
    )
    enc = TextEncoder(
        "BAAI/bge-m3", cfg, tokenizer=HashTokenizer(30_000, 48), seed=7,
        length_buckets=(32,),
    )

    rng = np.random.default_rng(0)
    words = [f"w{i}" for i in range(5000)]
    docs = {
        str(i): "zh " + " ".join(rng.choice(words, size=12))
        for i in range(args.docs)
    }

    tmp = pathlib.Path(tempfile.mkdtemp(prefix="cdr_smoke_"))
    t0 = time.perf_counter()
    dirs = encode_corpus(
        enc, {"zh": list(docs.items())}, tmp / "idx",
        batch_size=args.enc_batch, enc_batch=args.enc_batch,
        storage_dtype="bfloat16",
    )
    timings["encode_s"] = round(time.perf_counter() - t0, 1)
    timings["encode_passages_per_s"] = round(args.docs / timings["encode_s"], 1)

    index = DenseFlatIndex.load(dirs["zh"])
    t0 = time.perf_counter()
    index.to_device(make_mesh())
    timings["index_upload_s"] = round(time.perf_counter() - t0, 1)

    qids = [f"q{i}" for i in range(args.queries)]
    rel = [str(int(i * args.docs / args.queries)) for i in range(args.queries)]
    zh_vecs = enc.encode_queries([docs[d] for d in rel], batch_size=args.enc_batch)
    noise = rng.standard_normal((args.queries, args.dim)).astype(np.float32)
    en_vecs = noise / np.linalg.norm(noise, axis=1, keepdims=True)

    t0 = time.perf_counter()
    runs = run_vector_mix_search(
        index, qids, en_vecs, zh_vecs, [0.0, 0.5, 1.0], tmp / "runs", k=100,
        query_block=args.queries,
    )
    timings["sweep_s"] = round(time.perf_counter() - t0, 1)

    qrels = {q: {f"{d}#zh": 1} for q, d in zip(qids, rel)}
    metrics = {}
    for alpha, path in runs.items():
        ordered, _, _ = evaluate_run(load_run_grouped(path), qrels, ["MRR@10", "Recall@100"])
        metrics[str(alpha)] = {k: round(v, 2) for k, v in ordered.items()}

    ok = metrics["1.0"]["RR@10"] > 99.0 and metrics["0.0"]["RR@10"] < metrics["1.0"]["RR@10"]
    print(json.dumps({
        "smoke": "e2e_100k",
        "ok": bool(ok),
        "backend": jax.default_backend(),
        "docs": args.docs,
        **timings,
        "metrics": metrics,
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
