"""Corpus-encode throughput benchmark (north-star #2: >=2k passages/sec/chip).

Measures the device forward of a BGE-M3-sized encoder (XLM-R-large: 24
layers, hidden 1024, heads 16, ffn 4096) in bf16 with the Pallas flash
-attention kernel, random weights, synthetic token batches — isolating
the jitted forward from host tokenization (which overlaps in production
via the streaming pipeline).

Usage: python scripts/bench_encode.py [--batch 256] [--seq 128] [--layers 24]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--seq", type=int, default=128)
    ap.add_argument("--layers", type=int, default=24)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder

    on_tpu = jax.default_backend() != "cpu"
    cfg = XLMRConfig(
        vocab_size=250_002,
        hidden_size=1024,
        num_layers=args.layers,
        num_heads=16,
        intermediate_size=4096,
        max_position_embeddings=8194,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu,
        pooling="cls",
    )
    model = XLMREncoder(cfg)
    b, s = args.batch, args.seq
    ids = jnp.asarray(np.full((b, s), 5, np.int32))
    mask = jnp.ones((b, s), jnp.int32)
    # shape-only init, then zeros (random init of 250k x 1024 is slow on host)
    shapes = jax.eval_shape(lambda: model.init(jax.random.key(0), ids[:1, :8], mask[:1, :8]))
    params = jax.tree.map(lambda sh: jnp.full(sh.shape, 0.01, sh.dtype), shapes)

    fwd = jax.jit(lambda p, i, m: model.apply(p, i, m))
    t0 = time.perf_counter()
    out = fwd(params, ids, mask)
    # force a scalar transfer: block_until_ready can return before pallas
    # programs have compiled+run on the relay platform
    _ = float(jnp.asarray(out).ravel()[0])
    compile_s = time.perf_counter() - t0
    out = fwd(params, ids, mask)
    _ = float(jnp.asarray(out).ravel()[0])

    t0 = time.perf_counter()
    for _ in range(args.iters):
        out = fwd(params, ids, mask)
        _ = float(jnp.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / args.iters
    pps = b / dt
    # rough FLOPs: 2 * non-embedding params * tokens (fwd only)
    non_embed = args.layers * (4 * 1024 * 1024 + 2 * 1024 * 4096)
    flops = 2 * non_embed * b * s
    print(json.dumps({
        "metric": f"encode_passages_per_sec_L{args.layers}_S{s}",
        "value": round(pps, 1),
        "unit": "passages/sec",
        "vs_baseline": round(pps / 2000.0, 3),
        "batch": b,
        "seq": s,
        "tflops_per_sec": round(flops / dt / 1e12, 1),
        "compile_s": round(compile_s, 1),
        "backend": jax.default_backend(),
    }))


if __name__ == "__main__":
    main()
