"""Clean timing of the windowed flash kernel vs XLA attention.

The first probe's sync read back the ENTIRE output through the ~40 MB/s
relay tunnel (8.4 MB at S=4096 ~ 42 ms/call of contamination). Here the
timed function reduces the output to a scalar on-device, so only 4
bytes cross the tunnel, and reading it forces the Pallas program to
have actually run (block_until_ready alone can return early on the
relay).
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


def timed(fn, *args, reps=10):
    out = fn(*args)
    float(out)  # force
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    float(out)
    return (time.perf_counter() - t0) / reps


def main():
    enable_compile_cache()
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(0)

    for b, h, s, dh in ((8, 12, 1024, 64), (4, 12, 2048, 64),
                        (2, 8, 4096, 64), (1, 8, 4096, 128)):
        q = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((b, h, s, dh)), jnp.bfloat16)
        ln = jnp.asarray([s] * b, jnp.int32)
        flops = 4 * b * h * s * s * dh

        for name, f in (
            ("flash", lambda a, b_, c, l: jnp.sum(
                attention_flash(a, b_, c, l).astype(jnp.float32))),
            ("flash-causal", lambda a, b_, c, l: jnp.sum(
                attention_flash(a, b_, c, l, causal=True).astype(jnp.float32))),
            ("xla", lambda a, b_, c, l: jnp.sum(
                attention_xla(a, b_, c, l).astype(jnp.float32))),
        ):
            fn = jax.jit(f)
            dt = timed(fn, q, k, v, ln)
            eff = flops / dt / 1e12
            print(f"B{b} H{h} S{s} dh{dh} {name:13s}: {dt * 1e3:8.2f} ms "
                  f"({eff:5.1f} TF/s dense-equiv)", flush=True)


if __name__ == "__main__":
    main()
