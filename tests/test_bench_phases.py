"""The official bench's extra phases (sketch / guaranteed / mutation)
run correctly off-TPU — so a relay-up driver run exercises code that is
already proven, not first-run logic (VERDICT r3 items 2/3)."""

import sys
import pathlib

import jax.numpy as jnp
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import bench


def _fresh_result():
    bench._RESULT.clear()
    bench._RESULT.update({"metric": "t", "value": 0.0, "unit": "u", "vs_baseline": 0.0})


def test_bench_sketch_phase_banks_keys_incrementally():
    import jax

    _fresh_result()
    rng = np.random.default_rng(0)
    docs = jnp.asarray(rng.standard_normal((2048, 128), dtype=np.float32))
    queries = jnp.asarray(rng.standard_normal((64, 128), dtype=np.float32))
    bench._bench_sketch(
        jax, jnp, docs, queries, 8, 16, 64, iters=1, interpret=True
    )
    r = bench._RESULT
    for depth in (8, 16):
        assert r[f"sketch_qps_k{depth}"] > 0
        assert 0.0 <= r[f"sketch_cert_frac_k{depth}"] <= 1.0
        assert r[f"sketch_cert_violations_k{depth}"] == 0
        assert 0.0 <= r[f"sketch_recall_k{depth}"] <= 1.0
    assert r["guaranteed_qps_k16"] > 0
    # escalation count matches the uncertified fraction of the deep depth
    assert r["guaranteed_escalated"] == round(
        (1 - r["sketch_cert_frac_k16"]) * 64
    )
    # guaranteed cannot be faster than plain sketch
    assert r["guaranteed_qps_k16"] <= r["sketch_qps_k16"] + 1e-6


def test_bench_mutation_scatter_phase():
    import jax

    _fresh_result()
    rng = np.random.default_rng(1)
    docs = jnp.asarray(rng.standard_normal((4096, 128), dtype=np.float32))
    bench._bench_mutation_scatter(jax, jnp, docs, iters=1)
    assert bench._RESULT["mutation_scatter_256rows_ms"] > 0
