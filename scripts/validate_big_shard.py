"""Targeted TPU validation of bench.py's big-shard phase (the r5
validation run OOM'd the one-shot concat derive; this drives the fixed
donated-incremental build without re-running the whole bench)."""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import numpy as np

import bench


def main():
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    n, dim = 1_100_000, 1024
    rng = np.random.default_rng(0)
    bench._log(f"upload {n} rows")
    docs = jnp.asarray(
        rng.standard_normal((n, dim), dtype=np.float32).astype(ml_dtypes.bfloat16)
    )
    queries = jnp.asarray(
        rng.standard_normal((256, dim), dtype=np.float32)
    ).astype(jnp.bfloat16)
    docs.block_until_ready()
    bench._log("upload done")
    bench._bench_big_shard(jax, jnp, [docs], queries, 100, 1000)
    print(json.dumps(bench._RESULT), flush=True)


if __name__ == "__main__":
    main()
