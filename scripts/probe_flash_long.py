"""Validate the grid-based flash kernel on hardware.

r3 rewrote `_flash_kernel` from full-K/V-in-VMEM BlockSpecs to a
(bh, q-block, k-block) grid with VMEM scratch carries. This probe
checks (a) parity vs attention_xla at S=512, (b) compile+run at
long-context Qwen3 shapes (S=16384, dh=128) where the old kernel's
K+V residency (16 MB) exceeded VMEM, (c) causal block skipping
timing at S=4096.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from codemix_dense_retrieval_tpu.ops.flash_attention import (
    attention_flash,
    attention_xla,
)
from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache


def sync(x):
    jax.block_until_ready(x)
    return float(np.asarray(x)[0, 0, 0, 0])


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    # (a) parity vs XLA at S=512 (bf16 inputs, f32 online softmax)
    b, h, s, dh = 4, 8, 512, 64
    q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
    lengths = jnp.asarray([s, s // 2, 37, 1], jnp.int32)
    for causal in (False, True):
        of = np.asarray(attention_flash(q, k, v, lengths, causal=causal),
                        np.float32)
        ox = np.asarray(attention_xla(q, k, v, lengths, causal=causal),
                        np.float32)
        err = np.abs(of - ox).max()
        print(f"S=512 causal={causal}: max|flash-xla| = {err:.5f}", flush=True)
        assert err < 0.05, "parity failed"

    # (b) long-context Qwen3 shape: old kernel could not fit K+V in VMEM
    for s_long, dh_l, hh in ((8192, 128, 2), (16384, 128, 1)):
        q2 = jnp.asarray(rng.standard_normal((1, hh, s_long, dh_l)), jnp.bfloat16)
        k2 = jnp.asarray(rng.standard_normal((1, hh, s_long, dh_l)), jnp.bfloat16)
        v2 = jnp.asarray(rng.standard_normal((1, hh, s_long, dh_l)), jnp.bfloat16)
        ln = jnp.asarray([s_long - 7], jnp.int32)
        fn = jax.jit(lambda a, b_, c, l: attention_flash(a, b_, c, l, causal=True))
        out = fn(q2, k2, v2, ln)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(3):
            out = fn(q2, k2, v2, ln)
        sync(out)
        dt = (time.perf_counter() - t0) / 3
        print(f"S={s_long} dh={dh_l} H={hh} causal: {dt * 1000:.1f} ms/call "
              f"(compiled+ran OK)", flush=True)

    # (c) causal skip benefit at S=4096
    b3, h3, s3, dh3 = 2, 8, 4096, 64
    q3 = jnp.asarray(rng.standard_normal((b3, h3, s3, dh3)), jnp.bfloat16)
    ln3 = jnp.asarray([s3, s3], jnp.int32)
    for causal in (False, True):
        fn = jax.jit(lambda a, l, c=causal: attention_flash(a, a, a, l, causal=c))
        sync(fn(q3, ln3))
        t0 = time.perf_counter()
        for _ in range(5):
            out = fn(q3, ln3)
        sync(out)
        dt = (time.perf_counter() - t0) / 5
        print(f"S=4096 causal={causal}: {dt * 1000:.1f} ms/call", flush=True)


if __name__ == "__main__":
    main()
