"""Packed forward-only sustained TF/s (VERDICT r4 item 5's MFU clause):
times the jitted packed forward on a fixed fully-packed batch and
reports achieved TF/s vs the session's chained-matmul probe."""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.packing import pack_sequences, pad_rows_to
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig
    from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    on_tpu = jax.default_backend() != "cpu"
    L, H = (24, 1024) if on_tpu else (2, 64)
    cfg = XLMRConfig(
        vocab_size=32_000, hidden_size=H, num_layers=L,
        num_heads=16 if on_tpu else 4, intermediate_size=4 * H,
        max_position_embeddings=8194,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        use_flash=on_tpu, pooling="cls",
    )
    enc = TextEncoder("BAAI/bge-m3", cfg)
    rng = np.random.default_rng(0)
    S, rows, M = 256, 32, 16
    # fully packed rows: 4 sequences x 64 tokens each
    seqs = [rng.integers(2, 32_000, 64).astype(np.int32) for _ in range(rows * 4)]
    p = pad_rows_to(pack_sequences(seqs, S, 1, M), rows, pad_id=1)
    assert p.n_rows == rows and (p.segment_ids > 0).all()
    task = jnp.asarray(0, jnp.int32)
    args = (enc.params, jnp.asarray(p.ids), jnp.asarray(p.segment_ids),
            jnp.asarray(p.position_ids), jnp.asarray(p.seg_starts),
            jnp.asarray(p.seg_lengths), task, M)
    out = enc._fwd_packed(*args)
    _ = float(np.asarray(out)[0, 0, 0])
    ts = []
    for _i in range(10):
        t0 = time.perf_counter()
        out = enc._fwd_packed(*args)
        _ = float(np.asarray(out)[0, 0, 0])
        ts.append(time.perf_counter() - t0)
    ts.sort()
    dt = ts[len(ts) // 2]
    tokens = rows * S
    # transformer forward FLOPs/token: 12*d^2 (qkv/proj/ffn 4x) + 2*2*S*d attn
    flops = tokens * (12 * H * H * 2 + 2 * 2 * S * H * 2) * L
    # chip-state reference
    a = jnp.asarray(rng.standard_normal((4096, 4096), dtype=np.float32)
                    ).astype(jnp.bfloat16)
    mm = jax.jit(lambda x: lax.fori_loop(0, 32, lambda i, y: y @ x, x))
    r = mm(a); _ = float(np.asarray(r)[0, 0])
    t0 = time.perf_counter()
    r = mm(a); _ = float(np.asarray(r)[0, 0])
    probe_tf = 32 * 2 * 4096**3 / (time.perf_counter() - t0) / 1e12
    tf = flops / dt / 1e12
    print(f"packed forward: {dt*1e3:.1f} ms/batch ({tokens} tokens, "
          f"{tokens/dt:.0f} tok/s) -> {tf:.1f} TF/s sustained; "
          f"chained-matmul probe {probe_tf:.1f} TF/s; "
          f"MFU-vs-probe {tf/probe_tf:.2f}", flush=True)


if __name__ == "__main__":
    main()
