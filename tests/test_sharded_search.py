"""Multi-device sharded-search tests on the virtual 8-CPU mesh
(SURVEY §4: shard/all-gather/merge path under
xla_force_host_platform_device_count)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
from codemix_dense_retrieval_tpu.parallel import make_mesh, shard_rows, sharded_topk_ip


@pytest.fixture(scope="module")
def mesh(eight_cpu_devices):
    return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)


@pytest.mark.parametrize("n,k,method", [
    (5000, 100, "bins_xla"),
    (5000, 100, "bins_pallas"),
    (4096, 17, "bins_xla"),
    (3000, 64, "full"),
])
def test_sharded_matches_oracle(mesh, rng, n, k, method):
    d, b = 64, 16
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    qs = rng.standard_normal((b, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)

    docs_dev, counts, rows_per_shard = shard_rows(docs, mesh, pad_multiple=256)
    assert docs_dev.shape[0] == 8 * rows_per_shard
    vals, gids = sharded_topk_ip(
        jnp.asarray(qs), docs_dev, counts, k, mesh=mesh, method=method,
        bin_size=64, tile_n=256,
    )
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    np.testing.assert_array_equal(np.asarray(gids), ref_idx)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)


def test_sharded_pad_rows_never_win(mesh, rng):
    """All-negative scores: zero pad rows would otherwise outrank everything."""
    n, d, b, k = 2100, 32, 4, 50  # 2100 rows over 8 shards -> heavy padding
    docs = -np.abs(rng.standard_normal((n, d)).astype(np.float32))
    qs = np.abs(rng.standard_normal((b, d)).astype(np.float32))
    docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
    vals, gids = sharded_topk_ip(
        jnp.asarray(qs), docs_dev, counts, k, mesh=mesh, method="bins_xla",
        bin_size=64, tile_n=256,
    )
    gids = np.asarray(gids)
    # global padded ids of valid rows == original row ids (contract)
    assert gids.max() < 8 * (docs_dev.shape[0] // 8)
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    np.testing.assert_array_equal(gids, ref_idx)


def test_sharded_tie_break_global_id(mesh, rng):
    """The same vector duplicated across different shards: merge must pick
    ascending global ids."""
    d, k = 16, 6
    v = rng.standard_normal(d).astype(np.float32)
    v /= np.linalg.norm(v)
    docs = rng.standard_normal((2048, d)).astype(np.float32) * 0.01
    # duplicates in shards 0, 3, 7 (rows chosen after padding math: 2048/8=256)
    for row in (10, 3 * 256 + 5, 7 * 256 + 99):
        docs[row] = v
    qs = v[None, :]
    docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
    vals, gids = sharded_topk_ip(
        jnp.asarray(qs), docs_dev, counts, k, mesh=mesh, method="bins_xla",
        bin_size=64, tile_n=256,
    )
    top3 = np.asarray(gids)[0, :3].tolist()
    assert top3 == [10, 3 * 256 + 5, 7 * 256 + 99]


def test_single_device_mesh(rng):
    mesh = make_mesh(shard=1, tp=1, devices=jax.devices()[:1])
    n, d, b, k = 1000, 32, 4, 20
    docs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((b, d)).astype(np.float32)
    docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
    vals, gids = sharded_topk_ip(
        jnp.asarray(qs), docs_dev, counts, k, mesh=mesh, method="bins_xla",
        bin_size=32, tile_n=256,
    )
    _, ref_idx = topk_ip_oracle(qs, docs, k)
    np.testing.assert_array_equal(np.asarray(gids), ref_idx)


def test_sharded_two_level_deep_k(eight_cpu_devices, rng):
    """Deep-k per-shard two-level cover + all-gather merge matches the
    global oracle exactly."""
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
    from codemix_dense_retrieval_tpu.parallel import make_mesh
    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        shard_rows, sharded_topk_ip,
    )

    mesh = make_mesh(shard=4, tp=1, devices=eight_cpu_devices[:4])
    n, d, b, k = 5000, 32, 3, 400
    docs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((b, d)).astype(np.float32)
    sharded, counts, _rps = shard_rows(docs, mesh)
    vals, gids = sharded_topk_ip(
        jnp.asarray(qs), sharded, counts, k, mesh=mesh,
        method="bins_two_level", bin_size=8, tile_n=128, tile_b=4,
    )
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    from tests.test_topk import _assert_topk_matches

    # tie-aware: numpy vs XLA f32 accumulation order can swap 1-ulp ties
    _assert_topk_matches(vals, gids, ref_vals, ref_idx, "sharded two-level")
