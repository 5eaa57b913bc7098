"""Hardware validation: chunked MaxSim kernel at a depth whose candidate
block (k*Td*dim) would overflow VMEM un-chunked (VERDICT round-1 item 9).

Run on the real chip; prints one JSON line.
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np
import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.maxsim import (
    _auto_candidate_chunk,
    maxsim_scores_pallas,
    maxsim_scores_xla,
)


def main():
    rng = np.random.default_rng(0)
    # k * Td * dim * 2 (bf16) = 1024*128*128*2 = 32 MB >> VMEM un-chunked
    b, tq, k, td, d = 4, 16, 1024, 128, 128
    qt = rng.standard_normal((b, tq, d)).astype(np.float32)
    dt = rng.standard_normal((b, k, td, d)).astype(np.float32)
    qm = np.ones((b, tq), np.int32)
    dm = (rng.random((b, k, td)) < 0.9).astype(np.int32)
    dm[:, :, 0] = 1
    chunk = _auto_candidate_chunk(k, td, d, 4)
    got = np.asarray(maxsim_scores_pallas(
        jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt), jnp.asarray(dm),
        interpret=False,
    ))
    sub = slice(0, 64)
    ref = np.asarray(maxsim_scores_xla(
        jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt[:, sub]),
        jnp.asarray(dm[:, sub]),
    ))
    ok = bool(np.allclose(got[:, sub], ref, rtol=1e-4, atol=1e-4))
    print(json.dumps({
        "validate": "maxsim_chunked", "ok": ok, "k": k, "chunk": chunk,
        "candidate_block_mb": round(k * td * d * 4 / 2**20, 1),
        "backend": jax.default_backend(),
    }))
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
