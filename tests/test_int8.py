"""Int8 quantized-index tests (the bitsandbytes replacement)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.shards import ShardStore
from codemix_dense_retrieval_tpu.ops.quant import (
    int8_ip_scores,
    quantize_rows,
    quantize_rows_np,
)
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
from codemix_dense_retrieval_tpu.parallel import make_mesh


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestQuantOps:
    def test_roundtrip_error_bound(self, rng):
        x = normed(rng, 50, 64)
        q, s = quantize_rows_np(x)
        deq = q.astype(np.float32) * s[:, None]
        # per-component error <= scale/2 = max|x|/254
        assert np.abs(deq - x).max() <= (np.abs(x).max(axis=1) / 254 + 1e-7).max()

    def test_np_and_jnp_agree(self, rng):
        x = normed(rng, 20, 32)
        qn, sn = quantize_rows_np(x)
        qj, sj = quantize_rows(jnp.asarray(x))
        np.testing.assert_array_equal(qn, np.asarray(qj))
        np.testing.assert_allclose(sn, np.asarray(sj), rtol=1e-6)

    def test_int8_scores_match_dequant(self, rng):
        q = normed(rng, 4, 32)
        d = normed(rng, 100, 32)
        qv, qs = quantize_rows_np(q)
        dv, ds = quantize_rows_np(d)
        got = np.asarray(
            int8_ip_scores(jnp.asarray(qv), jnp.asarray(qs), jnp.asarray(dv), jnp.asarray(ds))
        )
        ref = (qv.astype(np.float32) * qs[:, None]) @ (dv.astype(np.float32) * ds[:, None]).T
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)

    def test_zero_row_safe(self):
        q, s = quantize_rows_np(np.zeros((3, 8), np.float32))
        assert np.all(q == 0) and np.all(s == 1.0)


class TestInt8Index:
    def test_store_roundtrip_with_scales(self, tmp_path, rng):
        vecs = normed(rng, 80, 16)
        store = ShardStore.build(vecs, [str(i) for i in range(80)], dtype="int8")
        assert store.scales is not None and store.scales.shape == (80,)
        store2 = store.save(tmp_path / "ix")
        np.testing.assert_array_equal(np.asarray(store.vectors), np.asarray(store2.vectors))
        np.testing.assert_allclose(store.scales, store2.scales, rtol=1e-7)

    def test_int8_search_high_recall(self, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, k = 3000, 64, 50
        vecs = normed(rng, n, d)
        idx = DenseFlatIndex.build(vecs, [str(i) for i in range(n)], dtype="int8")
        idx.to_device(mesh, pad_multiple=256, method="bins_xla", tile_n=256)
        q = normed(rng, 8, d)
        vals, gids = idx.search(q, k, return_docids=False)
        _, ref_idx = topk_ip_oracle(q, vecs, k)
        recalls = [
            len(set(gids[i].tolist()) & set(ref_idx[i].tolist())) / k for i in range(8)
        ]
        assert np.mean(recalls) > 0.9  # int8 quantization keeps recall high
        # top-1 should essentially always survive quantization
        top1 = np.mean([gids[i, 0] == ref_idx[i, 0] for i in range(8)])
        assert top1 >= 0.75

    def test_int8_without_scales_raises(self, rng, eight_cpu_devices):
        from codemix_dense_retrieval_tpu.parallel import shard_rows, sharded_topk_ip

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        docs = np.zeros((512, 16), np.int8)
        dd, counts, _ = shard_rows(docs, mesh, pad_multiple=64)
        with pytest.raises(ValueError):
            sharded_topk_ip(jnp.zeros((2, 16)), dd, counts, 5, mesh=mesh)


class TestInt8PallasKernel:
    def test_int8_bins_matches_xla_scores(self, rng):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
        from codemix_dense_retrieval_tpu.ops.topk import (
            _topk_from_bins,
            topk_ip_bins_int8,
        )

        n, d, b, k = 2000, 64, 8, 30
        docs = normed(rng, n, d)
        q = normed(rng, b, d)
        dv, ds = quantize_rows_np(docs)
        vals, idx = topk_ip_bins_int8(
            jnp.asarray(q), jnp.asarray(dv), jnp.asarray(ds), k,
            bin_size=16, tile_n=256,
        )
        # oracle: dequantized int8 scores with quantized queries
        qv, qs = quantize_rows_np(q)
        scores = (qv.astype(np.float32) * qs[:, None]) @ (
            dv.astype(np.float32) * ds[:, None]
        ).T
        order = np.lexsort((np.arange(n)[None].repeat(b, 0), -scores), axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(idx), order)
        ref_vals = np.take_along_axis(scores, order, axis=1)
        np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-4, atol=1e-4)

    def test_sharded_int8_pallas_method(self, rng, eight_cpu_devices):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.index import DenseFlatIndex

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, k = 3000, 64, 50
        vecs = normed(rng, n, d)
        idx = DenseFlatIndex.build(vecs, [str(i) for i in range(n)], dtype="int8")
        idx.to_device(mesh, pad_multiple=256, method="bins_pallas", tile_n=256, bin_size=16)
        q = normed(rng, 8, d)
        vals, gids = idx.search(q, k, return_docids=False)
        _, ref_idx = topk_ip_oracle(q, vecs, k)
        recalls = [
            len(set(gids[i].tolist()) & set(ref_idx[i].tolist())) / k for i in range(8)
        ]
        assert np.mean(recalls) > 0.9


class TestInt8TwoLevel:
    """int8 deep-k: the two-level selection tail shared with the f32 path."""

    def test_int8_two_level_matches_single_level(self, rng):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_int8

        n, d, b, k = 6000, 64, 4, 300
        docs = normed(rng, n, d)
        q = normed(rng, b, d)
        dv, ds = quantize_rows_np(docs)
        common = dict(bin_size=8, tile_n=256)
        v1, i1 = topk_ip_bins_int8(
            jnp.asarray(q), jnp.asarray(dv), jnp.asarray(ds), k, **common
        )
        v2, i2 = topk_ip_bins_int8(
            jnp.asarray(q), jnp.asarray(dv), jnp.asarray(ds), k,
            two_level=True, super_size=4, **common,
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-5, atol=1e-5)

    def test_int8_two_level_nonaligned_n_pad_masked(self, rng):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_int8

        n, d, b, k = 3333, 32, 3, 250  # n not a multiple of tile or chunk
        docs = normed(rng, n, d)
        q = normed(rng, b, d)
        dv, ds = quantize_rows_np(docs)
        vals, idx = topk_ip_bins_int8(
            jnp.asarray(q), jnp.asarray(dv), jnp.asarray(ds), k,
            bin_size=8, tile_n=256, two_level=True, super_size=8,
        )
        assert int(np.asarray(idx).max()) < n
        # exact vs dequantized-scores oracle
        qv, qs = quantize_rows_np(q)
        scores = (qv.astype(np.float32) * qs[:, None]) @ (
            dv.astype(np.float32) * ds[:, None]
        ).T
        order = np.lexsort((np.arange(n)[None].repeat(b, 0), -scores), axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(idx), order)

    def test_sharded_int8_auto_routes_two_level(self, rng, eight_cpu_devices):
        """auto method must pick the two-level tail for deep k on big int8
        shards and stay exact vs the dequantized oracle."""
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
        from codemix_dense_retrieval_tpu.parallel.sharded_search import (
            shard_row_sidecar,
            shard_rows,
            sharded_topk_ip,
        )

        mesh = make_mesh(shard=2, devices=eight_cpu_devices[:2])
        n, d, b, k = 8192, 32, 4, 400
        docs = normed(rng, n, d)
        q = normed(rng, b, d)
        dv, ds = quantize_rows_np(docs)
        docs_dev, counts, rps = shard_rows(dv, mesh, pad_multiple=512)
        scales_dev = shard_row_sidecar(ds, mesh, rps)
        # force the deep-k branch regardless of the 32k-bin threshold
        vals, gids = sharded_topk_ip(
            q, docs_dev, counts, k, mesh=mesh, method="bins_two_level",
            tile_n=512, doc_scales=scales_dev,
        )
        qv, qs = quantize_rows_np(q)
        scores = (qv.astype(np.float32) * qs[:, None]) @ (
            dv.astype(np.float32) * ds[:, None]
        ).T
        order = np.lexsort((np.arange(n)[None].repeat(b, 0), -scores), axis=1)[:, :k]
        np.testing.assert_array_equal(np.asarray(gids), order)


def test_int8_k_beyond_corpus_raises(rng):
    """topk_ip_bins_int8 must fail fast on k > n_valid like every other
    entry point, instead of returning padded-row indices."""
    import pytest

    from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_int8

    docs = normed(rng, 100, 32)
    dv, ds = quantize_rows_np(docs)
    q = normed(rng, 4, 32)
    for two_level in (False, True):
        with pytest.raises(ValueError, match="num docs"):
            topk_ip_bins_int8(
                jnp.asarray(q), jnp.asarray(dv), jnp.asarray(ds), 200,
                interpret=True, two_level=two_level,
            )


def test_sharded_int8_bins_xla_tail_not_truncated(rng, eight_cpu_devices):
    """rows_per_shard not a bin_size multiple: the XLA fallback must PAD
    the tail bin (NEG_INF), not truncate it — a truncated tail makes the
    last rows of every shard silently unselectable."""
    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        shard_rows,
        shard_row_sidecar,
        sharded_topk_ip,
    )

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    n, d, b, k = 936, 32, 4, 20  # 936/8 = 117 rows/shard, pad->120; 120 % 16 != 0
    docs = normed(rng, n, d)
    # plant the best doc for query 0 in a shard's TAIL bin remainder
    q = normed(rng, b, d)
    docs[116] = q[0]  # last valid row of shard 0
    dv, ds = quantize_rows_np(docs)
    docs_dev, counts, rps = shard_rows(dv, mesh, pad_multiple=8)
    assert rps % 16 != 0, "fixture must exercise a non-divisible tail"
    scales_dev = shard_row_sidecar(ds, mesh, rps)
    vals, gids = sharded_topk_ip(
        q, docs_dev, counts, k, mesh=mesh, method="bins_xla",
        bin_size=16, doc_scales=scales_dev,
    )
    qv, qs = quantize_rows_np(q)
    scores = (qv.astype(np.float32) * qs[:, None]) @ (
        dv.astype(np.float32) * ds[:, None]
    ).T
    order = np.lexsort((np.arange(n)[None].repeat(b, 0), -scores), axis=1)[:, :k]
    np.testing.assert_array_equal(np.asarray(gids), order)
    assert gids[0, 0] == 116  # the tail-bin plant is found
