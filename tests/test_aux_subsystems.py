"""Aux-subsystem tests: mid-language resume, ephemeral storage, profiling."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.io.shards import ShardStore, ShardWriter
from codemix_dense_retrieval_tpu.orchestrate.storage import (
    ephemeral_run_dir,
    free_gib,
    maybe_ephemeral_dir,
)


def normed(rng, n, d):
    x = rng.standard_normal((n, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=1, keepdims=True)


class TestMidLanguageResume:
    def test_resume_partial_continues_where_left(self, tmp_path, rng):
        d = 8
        vecs = normed(rng, 50, d)
        ids = [f"d{i}" for i in range(50)]
        w = ShardWriter(tmp_path / "en", dim=d, dtype="float32", lang="en", rows_per_file=20)
        w.append(vecs[:30], ids[:30])
        # simulate crash: no finalize; file handles dropped
        if w._fh:
            w._fh.close()

        w2, written = ShardWriter.resume_partial(
            tmp_path / "en", dim=d, dtype="float32", lang="en", rows_per_file=20
        )
        assert written == set(ids[:30])
        assert w2.count == 30
        w2.append(vecs[30:], ids[30:])
        w2.finalize()
        store = ShardStore.open(tmp_path / "en")
        assert store.count == 50
        assert store.docids == ids
        np.testing.assert_allclose(np.asarray(store.vectors), vecs, atol=1e-6)
        assert not (tmp_path / "en" / "docids.partial.txt").exists()

    def test_resume_truncates_torn_row(self, tmp_path, rng):
        d = 8
        vecs = normed(rng, 10, d)
        w = ShardWriter(tmp_path / "x", dim=d, dtype="float32")
        w.append(vecs, [str(i) for i in range(10)])
        w._fh.close()
        # tear the last row (partial write)
        binf = tmp_path / "x" / "emb.00000.bin"
        data = binf.read_bytes()
        binf.write_bytes(data[:-7])
        w2, written = ShardWriter.resume_partial(tmp_path / "x", dim=d, dtype="float32")
        assert w2.count == 9
        assert written == {str(i) for i in range(9)}

    def test_int8_resume_reconciles_scale_sidecar(self, tmp_path, rng):
        """Crash between the scale-sidecar append and the vector write must
        not leave an extra scale row: after resume + finalize the store
        opens with scales aligned to the vector count (VERDICT r1 #4)."""
        d = 8
        vecs = normed(rng, 40, d)
        ids = [f"d{i}" for i in range(40)]
        w = ShardWriter(tmp_path / "q", dim=d, dtype="int8", lang="en")
        w.append(vecs[:24], ids[:24])
        # simulate the torn state: scales + docids for one more batch
        # landed, but the vector write never happened
        from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np

        _, extra_scales = quantize_rows_np(vecs[24:32])
        with open(tmp_path / "q" / "scales.bin", "ab") as fh:
            fh.write(np.ascontiguousarray(extra_scales, np.float32).tobytes())
        with open(tmp_path / "q" / "docids.partial.txt", "a") as fh:
            fh.write("".join(f"{i}\n" for i in ids[24:32]))
        w._fh.close()

        w2, written = ShardWriter.resume_partial(
            tmp_path / "q", dim=d, dtype="int8", lang="en"
        )
        assert written == set(ids[:24])
        assert (tmp_path / "q" / "scales.bin").stat().st_size == 24 * 4
        w2.append(vecs[24:], ids[24:])
        w2.finalize()
        store = ShardStore.open(tmp_path / "q")
        assert store.count == 40
        assert store.scales is not None and store.scales.shape == (40,)
        assert store.docids == ids

    def test_int8_resume_rejects_short_scales(self, tmp_path, rng):
        d = 8
        vecs = normed(rng, 16, d)
        w = ShardWriter(tmp_path / "q2", dim=d, dtype="int8")
        w.append(vecs, [str(i) for i in range(16)])
        w._fh.close()
        with open(tmp_path / "q2" / "scales.bin", "r+b") as fh:
            fh.truncate(8 * 4)  # fewer scales than vectors: unrecoverable
        with pytest.raises(ValueError, match="scales.bin"):
            ShardWriter.resume_partial(tmp_path / "q2", dim=d, dtype="int8")

    def test_encode_corpus_mid_resume(self, tmp_path, rng):
        """Kill the encode after a partial write; the rerun must not
        duplicate rows and must produce the complete store."""
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
        from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
        from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig
        from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

        cfg = XLMRConfig.tiny(vocab_size=2000, hidden_size=32, use_flash=False)
        enc = TextEncoder("BAAI/bge-m3", cfg, tokenizer=HashTokenizer(2000, 32))
        docs = [(str(i), f"passage number {i} alpha beta") for i in range(40)]

        calls = {"n": 0}
        real = enc.encode_documents

        def flaky(texts, batch_size=64, **kw):
            calls["n"] += 1
            if calls["n"] == 3:
                raise RuntimeError("simulated crash")
            return real(texts, batch_size=batch_size, **kw)

        enc.encode_documents = flaky
        with pytest.raises(RuntimeError):
            encode_corpus(enc, {"en": docs}, tmp_path / "idx", batch_size=10,
                          storage_dtype="float32")
        enc.encode_documents = real
        encode_corpus(enc, {"en": docs}, tmp_path / "idx", batch_size=10,
                      storage_dtype="float32")
        store = ShardStore.open(tmp_path / "idx" / "en")
        assert store.count == 40
        assert store.docids == [d for d, _ in docs]


class TestEphemeralStorage:
    def test_normal_path_when_space_available(self, tmp_path):
        d, eph = maybe_ephemeral_dir(tmp_path / "runs", min_free_gib=0.0)
        assert d == tmp_path / "runs" and not eph

    def test_ephemeral_when_low_disk(self, tmp_path):
        d, eph = maybe_ephemeral_dir(tmp_path / "runs", min_free_gib=10_000_000.0)
        assert eph and d.exists()
        import shutil

        shutil.rmtree(d)

    def test_context_cleans_up_on_success(self, tmp_path):
        with ephemeral_run_dir(tmp_path / "runs", min_free_gib=10_000_000.0) as d:
            (d / "out.trec").write_text("x")
            kept = d
        assert not kept.exists()

    def test_free_gib_positive(self, tmp_path):
        assert free_gib(tmp_path) > 0


class TestProfiling:
    def test_maybe_trace_noop_without_env(self, monkeypatch):
        from codemix_dense_retrieval_tpu.utils.profiling import maybe_trace

        monkeypatch.delenv("CDR_PROFILE_DIR", raising=False)
        with maybe_trace("unit"):
            pass

    def test_timed_device_fn(self):
        import jax.numpy as jnp

        from codemix_dense_retrieval_tpu.utils.profiling import timed_device_fn

        out = timed_device_fn(lambda x: x * 2, jnp.ones((8, 8)), iters=2)
        assert out["mean_s"] > 0


def test_compile_cache_enable(tmp_path):
    from codemix_dense_retrieval_tpu.utils.compile_cache import enable_compile_cache

    d = enable_compile_cache(str(tmp_path / "cc"))
    assert (tmp_path / "cc").is_dir()
    import jax

    assert jax.config.jax_compilation_cache_dir == str(tmp_path / "cc")
