"""Oracle tests for the exact bin-max-cover top-k kernel (SURVEY §4: Pallas
top-k vs jax.lax.top_k vs numpy argsort oracle)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.topk import (
    topk_ip,
    topk_ip_bins,
    topk_ip_bins_two_level,
    topk_ip_full,
    topk_ip_oracle,
)


def make_data(rng, n, d, b, normalize=True, dtype=np.float32):
    docs = rng.standard_normal((n, d)).astype(np.float32)
    qs = rng.standard_normal((b, d)).astype(np.float32)
    if normalize:
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs.astype(dtype), docs.astype(dtype)


@pytest.mark.parametrize("method", ["full", "bins_xla", "bins_pallas"])
@pytest.mark.parametrize("n,k", [(500, 10), (1000, 100), (4096, 64), (5000, 7)])
def test_exact_vs_oracle(method, n, k, rng):
    qs, docs = make_data(rng, n, 64, 8)
    vals, idx = topk_ip(jnp.asarray(qs), jnp.asarray(docs), k, method=method, bin_size=32)
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-5, atol=1e-5)
    # indices must match exactly where scores are untied (random floats: untied)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_single_query_batches(rng):
    """B in {1..7}: online serving sends tiny batches; Mosaic rejects a
    degenerate (1, dim) q tile ('vector.broadcast' verification error on
    hardware), so _prep_shard pads every small batch to the 8-sublane
    tile. Exactness must survive the pad+slice round trip on every
    entry point."""
    from codemix_dense_retrieval_tpu.ops.topk import (
        topk_ip_bins,
        topk_ip_bins_two_level,
        topk_ip_oracle,
    )

    for b in (1, 3, 7):
        qs, docs = make_data(np.random.default_rng(100 + b), 2048, 32, b)
        ref_v, ref_i = topk_ip_oracle(qs, docs, 50)
        for fn in (
            lambda q, d: topk_ip_bins(q, d, 50, bin_size=16),
            lambda q, d: topk_ip_bins_two_level(q, d, 50, super_size=4),
        ):
            vals, idx = fn(jnp.asarray(qs), jnp.asarray(docs))
            assert idx.shape == (b, 50)
            np.testing.assert_array_equal(np.asarray(idx), ref_i)
            np.testing.assert_allclose(np.asarray(vals), ref_v, rtol=1e-5, atol=1e-5)


def test_adversarial_clustered_topk(rng):
    """All true top-k rows inside ONE bin — the case where naive bin-max
    (approx_max_k-style) is wrong and the cover algorithm must still be exact."""
    d, n, k = 32, 2048, 16
    q = rng.standard_normal((1, d)).astype(np.float32)
    q /= np.linalg.norm(q)
    docs = rng.standard_normal((n, d)).astype(np.float32) * 0.01
    # plant the top-k all in bin 5 (bin_size=64 -> rows 320..335)
    for j in range(k):
        docs[320 + j] = q[0] * (2.0 + j * 0.01)
    vals, idx = topk_ip_bins(jnp.asarray(q), jnp.asarray(docs), k, bin_size=64)
    ref_vals, ref_idx = topk_ip_oracle(q, docs, k)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)
    np.testing.assert_allclose(np.asarray(vals), ref_vals, rtol=1e-6)
    assert set(np.asarray(idx)[0].tolist()) == set(range(320, 320 + k))


def test_tie_break_lower_id_wins(rng):
    """Duplicate doc rows -> tied scores -> ids must come back ascending
    (FAISS-parity deterministic tie-break)."""
    d, k = 16, 8
    base = rng.standard_normal((4, d)).astype(np.float32)
    docs = np.concatenate([base[rng.integers(0, 4, size=100)]], axis=0)
    q = base[0:1] * 0.5
    for method in ("full", "bins_xla", "bins_pallas"):
        vals, idx = topk_ip(jnp.asarray(q), jnp.asarray(docs), k, method=method, bin_size=16)
        vals, idx = np.asarray(vals), np.asarray(idx)
        # the invariant under test: among EQUAL computed scores, ids ascend
        for j in range(k - 1):
            if vals[0, j] == vals[0, j + 1]:
                assert idx[0, j] < idx[0, j + 1]
        ref_vals, ref_idx = topk_ip_oracle(q, docs, k)
        # oracle comparison must be tie-aware: XLA's matmul can give
        # byte-identical duplicate rows 1-ulp different scores depending
        # on their column position (vector-lane vs tail accumulation), so
        # exact duplicates legitimately reorder vs numpy
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, f"tie {method}")


def test_padding_never_selected(rng):
    """N not a tile multiple: padded rows (score 0 > negative reals) must
    be masked out."""
    d, k = 16, 50
    qs, docs = make_data(rng, 1000, d, 4)
    docs = -np.abs(docs)  # all scores negative vs positive query
    qs = np.abs(qs)
    vals, idx = topk_ip_bins(jnp.asarray(qs), jnp.asarray(docs), k, bin_size=64, tile_n=256)
    assert np.asarray(idx).max() < 1000
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_k_equals_n(rng):
    qs, docs = make_data(rng, 128, 16, 2)
    vals, idx = topk_ip_bins(jnp.asarray(qs), jnp.asarray(docs), 128, bin_size=32, tile_n=128)
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, 128)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_k_too_large_raises(rng):
    qs, docs = make_data(rng, 64, 16, 2)
    with pytest.raises(ValueError):
        topk_ip_bins(jnp.asarray(qs), jnp.asarray(docs), 100)


def test_bf16_storage_fp32_accum(rng):
    """bf16 docs/queries with f32 accumulation: recall@k vs the fp32 oracle
    must be ~1 on normalized vectors (BASELINE recall-parity definition)."""
    qs, docs = make_data(rng, 5000, 128, 16)
    k = 100
    vals, idx = topk_ip_bins(
        jnp.asarray(qs, jnp.bfloat16), jnp.asarray(docs, jnp.bfloat16), k, bin_size=64
    )
    ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
    # set overlap (recall@100) under bf16 quantization
    recalls = [
        len(set(np.asarray(idx)[i].tolist()) & set(ref_idx[i].tolist())) / k
        for i in range(len(qs))
    ]
    assert np.mean(recalls) > 0.97


def test_query_batch_not_multiple_of_tile(rng):
    """B=12 (not a multiple of tile_b=8): gcd fallback must still be exact."""
    qs, docs = make_data(rng, 2048, 32, 12)
    vals, idx = topk_ip_bins(jnp.asarray(qs), jnp.asarray(docs), 10, bin_size=64, tile_b=8)
    _, ref_idx = topk_ip_oracle(qs, docs, 10)
    np.testing.assert_array_equal(np.asarray(idx), ref_idx)


def test_bf16_score_dtype_option(rng):
    """Opt-in bf16 score storage: top-k set stays ~identical on
    well-separated scores; values return as f32."""
    import jax.numpy as jnp

    qs, docs = make_data(rng, 3000, 64, 8)
    k = 50
    v32, i32 = topk_ip_bins(jnp.asarray(qs), jnp.asarray(docs), k)
    v16, i16 = topk_ip_bins(
        jnp.asarray(qs), jnp.asarray(docs), k, score_dtype=jnp.bfloat16
    )
    assert np.asarray(v16).dtype == np.float32
    overlap = np.mean([
        len(set(np.asarray(i32)[b].tolist()) & set(np.asarray(i16)[b].tolist())) / k
        for b in range(8)
    ])
    assert overlap > 0.95


class TestRescoreMode:
    @pytest.mark.parametrize("n,k", [(3000, 50), (5000, 100)])
    def test_rescore_matches_oracle(self, rng, n, k):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_rescore

        qs, docs = make_data(rng, n, 64, 8)
        vals, idx = topk_ip_bins_rescore(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=16, tile_n=256
        )
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
        # the rescore mode RECOMPUTES candidate scores (its documented
        # contract allows a different f32 accumulation order — and the
        # XLA CPU matmul's reduction split varies with threadpool load,
        # so a sub-ulp near-tie can flip only under a full-suite run);
        # ids must match except at near-tie positions
        _assert_topk_matches(
            vals, idx, ref_vals, ref_idx, f"rescore n={n} k={k}"
        )

    def test_rescore_adversarial_clustered(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_rescore

        d, n, k = 32, 2048, 16
        q = rng.standard_normal((1, d)).astype(np.float32)
        q /= np.linalg.norm(q)
        docs = rng.standard_normal((n, d)).astype(np.float32) * 0.01
        for j in range(k):
            docs[512 + j] = q[0] * (2.0 + j * 0.01)
        vals, idx = topk_ip_bins_rescore(
            jnp.asarray(q), jnp.asarray(docs), k, bin_size=16, tile_n=256
        )
        _, ref_idx = topk_ip_oracle(q, docs, k)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_rescore_pad_rows_masked(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_rescore

        qs, docs = make_data(rng, 900, 16, 4)
        docs = -np.abs(docs)
        qs = np.abs(qs)
        vals, idx = topk_ip_bins_rescore(
            jnp.asarray(qs), jnp.asarray(docs), 40, bin_size=16, tile_n=256
        )
        assert np.asarray(idx).max() < 900
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, 40)
        # recomputed-score near-tie tolerance: see test_rescore_matches_oracle
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "rescore pad-mask")


def _assert_topk_matches(vals, idx, ref_vals, ref_idx, msg, tie_eps=1e-5):
    """Exact-id comparison tolerant of 1-ulp accumulation-order near-ties
    (numpy vs XLA f32 sums can differ in the last bit, swapping elements
    whose true scores are equal to within float round-off)."""
    vals, idx = np.asarray(vals), np.asarray(idx)
    np.testing.assert_allclose(vals, ref_vals, rtol=1e-4, atol=1e-5, err_msg=msg)
    mismatch = idx != ref_idx
    if not mismatch.any():
        return
    for r, c in zip(*np.where(mismatch)):
        # a mismatch is acceptable only at a near-tie position
        assert abs(vals[r, c] - ref_vals[r, c]) < tie_eps, (
            f"{msg}: non-tie id mismatch at ({r},{c}): "
            f"{idx[r, c]} vs {ref_idx[r, c]} "
            f"({vals[r, c]} vs {ref_vals[r, c]})"
        )


def test_fuzz_shapes_vs_oracle(rng):
    """Randomized shape/config fuzz vs the numpy oracle."""
    from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins, topk_ip_bins_rescore

    for trial in range(12):
        n = int(rng.integers(200, 4000))
        d = int(rng.choice([16, 32, 64]))
        b = int(rng.integers(1, 20))
        k = int(rng.integers(1, min(n, 120)))
        g = int(rng.choice([8, 16, 32]))
        tn = int(rng.choice([128, 256]))
        if tn % g:
            tn = g * max(1, tn // g)
        qs, docs = make_data(rng, n, d, b)
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
        msg = f"trial {trial}: n={n} d={d} b={b} k={k} g={g} tn={tn}"
        vals, idx = topk_ip_bins(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=g, tile_n=tn, tile_b=8
        )
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "bins " + msg)
        vals2, idx2 = topk_ip_bins_rescore(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=g, tile_n=tn, tile_b=8
        )
        _assert_topk_matches(vals2, idx2, ref_vals, ref_idx, "rescore " + msg)


class TestTwoLevel:
    """Deep-k two-level bin-max cover (exactness incl. ties/padding)."""

    def test_exact_vs_oracle_deep_k(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

        qs, docs = make_data(rng, 6000, 64, 6)
        k = 500
        vals, idx = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), k,
            bin_size=8, super_size=8, tile_n=128, tile_b=8,
        )
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "two_level k=500")

    def test_auto_routes_deep_k(self, rng):
        qs, docs = make_data(rng, 40_000, 32, 3)
        k = 300
        vals, idx = topk_ip(jnp.asarray(qs), jnp.asarray(docs), k, method="auto")
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "auto deep k")

    def test_ties_break_to_lower_id(self, rng):
        """Duplicate rows straddling bin/super boundaries: the winner must
        be the LOWEST id copy (FAISS parity), exercising tie handling at
        every cover level."""
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

        d = 32
        base = rng.standard_normal((512, d)).astype(np.float32)
        docs = np.concatenate([base, base, base])  # ids i, i+512, i+1024
        q = base[7:8] * 2.0  # top hit: row 7 (and its copies)
        vals, idx = topk_ip_bins_two_level(
            jnp.asarray(q), jnp.asarray(docs), 9,
            bin_size=8, super_size=4, tile_n=128, tile_b=1,
        )
        idx = np.asarray(idx)[0]
        # the three tied copies of the best row appear lowest-id first
        top3 = idx[:3]
        assert top3[0] == 7 and set(top3) == {7, 519, 1031}, top3
        assert list(top3) == sorted(top3)

    def test_padding_and_nonaligned_n(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

        qs, docs = make_data(rng, 3333, 32, 4)  # not a tile/chunk multiple
        k = 257
        vals, idx = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), k,
            bin_size=8, super_size=8, tile_n=128, tile_b=4,
        )
        assert np.asarray(idx).max() < 3333
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "two_level padded")

    def test_query_batch_padding(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_bins_two_level

        qs, docs = make_data(rng, 2048, 32, 5)  # b=5 > tile_b=2 -> pad
        vals, idx = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), 300,
            bin_size=8, super_size=4, tile_n=128, tile_b=2,
        )
        assert vals.shape == (5, 300)
        ref_vals, ref_idx = topk_ip_oracle(qs, docs, 300)
        _assert_topk_matches(vals, idx, ref_vals, ref_idx, "two_level qpad")


class TestRescoreTwoLevel:
    """r3 deep-k redesign: no score matrix, slice-gather selection,
    doc-row rescore (`topk_ip_rescore_two_level`)."""

    @pytest.mark.parametrize("n,k", [(4096, 100), (6000, 500)])
    def test_exact_vs_oracle(self, rng, n, k):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_rescore_two_level

        docs = rng.standard_normal((n, 64)).astype(np.float32)
        qs = rng.standard_normal((6, 64)).astype(np.float32)
        vals, ids = topk_ip_rescore_two_level(jnp.asarray(qs), jnp.asarray(docs), k)
        ov, oi = topk_ip_oracle(qs, docs, k)
        vals, ids = np.asarray(vals), np.asarray(ids)
        np.testing.assert_allclose(vals, ov, rtol=1e-5, atol=1e-5)
        # rescore recomputes scores (documented near-tie round-off): ids
        # must match except where neighbors are within float tolerance
        tol = 1e-4
        for qi in range(len(ids)):
            assert set(ids[qi].tolist()) - set(oi[qi].tolist()) == set() or (
                vals[qi][-1] - ov[qi][-1] < tol
            )
            for j in range(k):
                gap_up = j == 0 or ov[qi][j - 1] - ov[qi][j] > tol
                gap_dn = j == k - 1 or ov[qi][j] - ov[qi][j + 1] > tol
                if gap_up and gap_dn:
                    assert ids[qi, j] == oi[qi, j], (qi, j)

    def test_ties_and_padding(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_rescore_two_level

        docs = np.repeat(rng.standard_normal((40, 32)).astype(np.float32), 8, axis=0)
        qs = rng.standard_normal((3, 32)).astype(np.float32)
        vals, ids = topk_ip_rescore_two_level(
            jnp.asarray(qs), jnp.asarray(docs), 100, n_valid=300
        )
        ov, oi = topk_ip_oracle(qs, docs[:300], 100)
        np.testing.assert_allclose(np.asarray(vals), ov, rtol=1e-6, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ids), oi)

    def test_k_too_large_raises(self, rng):
        from codemix_dense_retrieval_tpu.ops.topk import topk_ip_rescore_two_level

        with pytest.raises(ValueError, match="k="):
            topk_ip_rescore_two_level(
                jnp.zeros((1, 8)), jnp.zeros((16, 8)), 32
            )


class TestBinMajorTwoLevel:
    """Bin-major layout (r3): in-kernel transposed outputs + contiguous
    slice reads in the tail; must be bit-identical to the transposed
    path and the oracle."""

    @pytest.mark.parametrize("g,m", [(8, 4), (8, 8), (16, 4)])
    def test_exact_and_matches_transposed(self, rng, g, m):
        docs = rng.standard_normal((8192, 64)).astype(np.float32)
        qs = rng.standard_normal((5, 64)).astype(np.float32)
        k = 300
        vb, ib = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=g, super_size=m,
            bin_major=True,
        )
        vt, it = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=g, super_size=m,
            bin_major=False,
        )
        np.testing.assert_array_equal(np.asarray(ib), np.asarray(it))
        np.testing.assert_allclose(np.asarray(vb), np.asarray(vt), rtol=1e-6)
        # oracle runs in f64 — near-ties at the k boundary may swap
        ov, oi = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(np.asarray(vb), np.asarray(ib), ov, oi, "bm oracle")

    def test_nonaligned_n_and_batch(self, rng):
        docs = rng.standard_normal((5003, 32)).astype(np.float32)
        qs = rng.standard_normal((3, 32)).astype(np.float32)
        vals, ids = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), 400, bin_major=True
        )
        ov, oi = topk_ip_oracle(qs, docs, 400)
        _assert_topk_matches(
            np.asarray(vals), np.asarray(ids), ov, oi, "bm nonaligned"
        )
