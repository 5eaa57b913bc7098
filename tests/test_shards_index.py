"""Shard store + DenseFlatIndex tests (golden IO + FAISS-replacement behavior)."""

import json

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.shards import (
    ShardStore,
    ShardWriter,
    concat_stores,
    storage_dtype,
)
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
from codemix_dense_retrieval_tpu.parallel import make_mesh


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestShardStore:
    def test_write_open_roundtrip_bf16(self, tmp_path, rng):
        vecs = normed(rng, 100, 16)
        ids = [f"doc{i}" for i in range(100)]
        w = ShardWriter(tmp_path / "en", dim=16, dtype="bfloat16", lang="en", rows_per_file=30)
        for start in range(0, 100, 25):
            w.append(vecs[start : start + 25], ids[start : start + 25])
        m = w.finalize()
        assert m.count == 100
        assert [f["rows"] for f in m.files] == [30, 30, 30, 10]

        store = ShardStore.open(tmp_path / "en")
        assert store.count == 100 and store.dim == 16
        assert store.docids == ids
        got = np.asarray(store.vectors, dtype=np.float32)
        np.testing.assert_allclose(got, vecs, atol=1 / 128)  # bf16 quantization

    def test_docid_map_reference_format(self, tmp_path, rng):
        w = ShardWriter(tmp_path / "zh", dim=8, lang="zh")
        w.append(normed(rng, 3, 8), ["a", "b", "c"])
        w.finalize()
        lines = (tmp_path / "zh" / "docid_map.tsv").read_text().splitlines()
        assert lines[0] == "int_id\tderived_id\tbase_id\tlang"
        assert lines[1] == "0\ta\ta\tzh"

    def test_manifest_count_mismatch_detected(self, tmp_path, rng):
        w = ShardWriter(tmp_path / "x", dim=8)
        w.append(normed(rng, 10, 8), [str(i) for i in range(10)])
        w.finalize()
        mpath = tmp_path / "x" / "manifest.json"
        m = json.loads(mpath.read_text())
        m["count"] = 11
        m["files"][0]["rows"] = 11
        mpath.write_text(json.dumps(m))
        with pytest.raises(ValueError):
            ShardStore.open(tmp_path / "x")

    def test_build_save_open(self, tmp_path, rng):
        vecs = normed(rng, 50, 8)
        s = ShardStore.build(vecs, [str(i) for i in range(50)], lang="en")
        s2 = s.save(tmp_path / "saved")
        np.testing.assert_array_equal(
            np.asarray(s2.vectors, np.float32), np.asarray(s.vectors, np.float32)
        )
        assert s2.docids == s.docids

    def test_concat_derived_ids(self, rng):
        a = ShardStore.build(normed(rng, 5, 8), [f"d{i}" for i in range(5)], lang="en")
        b = ShardStore.build(normed(rng, 4, 8), [f"d{i}" for i in range(4)], lang="zh")
        c = concat_stores([a, b])
        assert c.count == 9
        assert c.derived_ids[0] == "d0#en"
        assert c.derived_ids[5] == "d0#zh"
        assert c.docids[5] == "d0"

    def test_dim_mismatch_rejected(self, rng):
        a = ShardStore.build(normed(rng, 5, 8), list("abcde"))
        b = ShardStore.build(normed(rng, 5, 16), list("fghij"))
        with pytest.raises(ValueError):
            concat_stores([a, b])


class TestDenseFlatIndex:
    def test_search_matches_oracle_with_docids(self, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, k = 3000, 32, 25
        vecs = normed(rng, n, d)
        ids = [f"p{i}" for i in range(n)]
        idx = DenseFlatIndex.build(vecs, ids, dtype="float32", lang="en")
        idx.to_device(mesh, pad_multiple=256, method="bins_xla", tile_n=256)
        q = normed(rng, 10, d)
        vals, docids = idx.search(q, k)
        ref_vals, ref_idx = topk_ip_oracle(q, vecs, k)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
        expect = np.asarray(ids, dtype=object)[ref_idx]
        np.testing.assert_array_equal(docids, expect)

    def test_query_block_batching(self, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, k = 2048, 16, 10
        vecs = normed(rng, n, d)
        idx = DenseFlatIndex.build(vecs, [str(i) for i in range(n)], dtype="float32")
        idx.to_device(mesh, pad_multiple=256, method="bins_xla", tile_n=256)
        q = normed(rng, 7, d)
        v1, d1 = idx.search(q, k, query_block=3)
        v2, d2 = idx.search(q, k)
        np.testing.assert_allclose(v1, v2, rtol=1e-6)
        np.testing.assert_array_equal(d1, d2)

    def test_merged_bilingual_search(self, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        d, k = 16, 8
        en = normed(rng, 600, d)
        zh = normed(rng, 500, d)
        ix_en = DenseFlatIndex.build(en, [f"d{i}" for i in range(600)], dtype="float32", lang="en")
        ix_zh = DenseFlatIndex.build(zh, [f"d{i}" for i in range(500)], dtype="float32", lang="zh")
        hub = DenseFlatIndex.merged([ix_en, ix_zh])
        assert hub.count == 1100
        hub.to_device(mesh, pad_multiple=128, method="bins_xla", tile_n=128, bin_size=32)
        q = normed(rng, 5, d)
        vals, docids = hub.search(q, k)
        combined = np.concatenate([en, zh], axis=0)
        ref_vals, ref_idx = topk_ip_oracle(q, combined, k)
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
        for b in range(5):
            for j in range(k):
                gid = ref_idx[b, j]
                expect = f"d{gid}#en" if gid < 600 else f"d{gid-600}#zh"
                assert docids[b, j] == expect

    def test_load_saved_and_search(self, tmp_path, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d = 1500, 16
        vecs = normed(rng, n, d)
        DenseFlatIndex.build(vecs, [str(i) for i in range(n)], dtype="bfloat16").save(
            tmp_path / "ix"
        )
        idx = DenseFlatIndex.load(tmp_path / "ix")
        idx.to_device(mesh, pad_multiple=256, method="bins_xla", tile_n=256)
        import ml_dtypes

        q = normed(rng, 4, d)
        vals, gids = idx.search(q, 20, return_docids=False)
        # oracle sees the same bf16-quantized queries the kernel receives
        q_bf16 = q.astype(ml_dtypes.bfloat16).astype(np.float32)
        ref_vals, ref_idx = topk_ip_oracle(q_bf16, np.asarray(idx.store.vectors, np.float32), 20)
        # bf16 storage: accumulation-order differences can swap near-ties,
        # so compare values and id SETS rather than exact rank order
        # (BASELINE.md: "recall parity modulo bf16 accumulation").
        np.testing.assert_allclose(vals, ref_vals, rtol=1e-5, atol=1e-5)
        for b in range(4):
            assert set(gids[b].tolist()) == set(ref_idx[b].tolist())


def test_query_dim_mismatch_rejected(rng, eight_cpu_devices):
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    vecs = normed(rng, 300, 16)
    idx = DenseFlatIndex.build(vecs, [str(i) for i in range(300)], dtype="float32")
    idx.to_device(mesh, pad_multiple=64, method="bins_xla", tile_n=64, bin_size=16)
    with pytest.raises(ValueError, match="dim"):
        idx.search(normed(rng, 2, 32), 5)


def test_k_clamped_to_count(rng, eight_cpu_devices):
    """k larger than the corpus (the reference's default k=500 on a tiny
    smoke index) is clamped instead of raising or emitting pad rows."""
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    v = normed(rng, 60, 16)
    idx = DenseFlatIndex.build(v, [str(i) for i in range(60)], dtype="float32")
    idx.to_device(mesh, pad_multiple=128, method="bins_xla", tile_n=128, bin_size=16)
    vals, docs = idx.search(v[:2], 500)
    assert vals.shape[1] <= 60
    assert all("#" not in str(d) or True for d in docs[0])  # all real docids
    assert set(map(str, docs[0])) <= {str(i) for i in range(60)}
