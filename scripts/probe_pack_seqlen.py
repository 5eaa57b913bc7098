"""Packed-encode seq_len sweep: the packed row length trades pad-waste
removal against per-token attention cost (O(S) per token) and kernel
overheads. bench_encode_e2e --pack (S=512) measured 0.76-0.91x the
bucketed path on-chip — this sweeps S in {192, 256, 384} to find
whether a shorter packed row wins before concluding packing loses under
length-sorted bucketing."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent))
from bench_encode_e2e import build_bpe_tokenizer, synth_passages, synth_vocab  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HFTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    on_tpu = jax.default_backend() != "cpu"
    n = 10_000 if on_tpu else 600
    texts = synth_passages(n, vocab=synth_vocab(150_000) if on_tpu else None)
    raw = build_bpe_tokenizer(texts[:5000], vocab_size=32_000)
    tok = HFTokenizer(raw, pad_id=raw.token_to_id("<pad>"))
    layers = 24 if on_tpu else 2
    hidden = 1024 if on_tpu else 64
    cfg = XLMRConfig(
        vocab_size=max(32_000, raw.get_vocab_size() + 2), hidden_size=hidden,
        num_layers=layers, num_heads=16 if on_tpu else 4,
        intermediate_size=4 * hidden, max_position_embeddings=8194,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu, pooling="cls",
    )
    enc = TextEncoder("BAAI/bge-m3", cfg, tokenizer=tok)

    def timed(fn):
        fn()  # warm (compiles)
        t0 = time.perf_counter()
        out = fn()
        return n / (time.perf_counter() - t0), out

    pps_b, ref = timed(lambda: enc.encode_documents(
        texts, batch_size=256, readback_dtype="bfloat16"))
    print(f"bucketed: {pps_b:.0f} p/s", flush=True)
    for s in (192, 256, 384):
        try:
            pps_p, got = timed(lambda s=s: enc.encode_documents(
                texts, batch_size=256, readback_dtype="bfloat16",
                pack=True, max_length=s))
            cos = float(np.mean(np.sum(got[:256] * ref[:256], axis=1) / np.maximum(
                np.linalg.norm(got[:256], axis=1) * np.linalg.norm(ref[:256], axis=1),
                1e-9)))
            print(f"packed S={s}: {pps_p:.0f} p/s ({pps_p / pps_b:.3f}x) "
                  f"cos={cos:.5f}", flush=True)
        except Exception as exc:  # noqa: BLE001
            print(f"packed S={s} FAILED: {exc!r:.120}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
