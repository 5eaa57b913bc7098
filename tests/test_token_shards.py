"""Token shard store + two-stage searcher: roundtrip, quantization bound,
crash-resume, pipeline integration, dense-then-backfill."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.token_shards import (
    TokenShardStore,
    TokenShardWriter,
    _quantize_tokens_np,
)
from codemix_dense_retrieval_tpu.parallel import make_mesh
from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher


def _normed_tokens(rng, n, t, d):
    x = rng.standard_normal((n, t, d)).astype(np.float32)
    return x / np.linalg.norm(x, axis=-1, keepdims=True)


def _write_store(tmp_path, toks, lengths, dtype="int8", td=None):
    n, t, d = toks.shape
    td = td or t
    w = TokenShardWriter(tmp_path, d, td, dtype, lang="xx")
    w.append(toks, lengths, [f"d{i}" for i in range(n)])
    w.finalize()
    return TokenShardStore.open(tmp_path)


def test_roundtrip_int8_error_bound(rng, tmp_path):
    toks = _normed_tokens(rng, 10, 12, 32)
    lengths = rng.integers(1, 13, size=10)
    store = _write_store(tmp_path / "s", toks, lengths)
    assert store.count == 10 and store.tokens_per_doc == 12 and store.token_dim == 32
    got, mask = store.gather(np.arange(10))
    want_mask = (np.arange(12)[None] < lengths[:, None]).astype(np.int32)
    np.testing.assert_array_equal(mask, want_mask)
    # per-token symmetric int8: |err| <= scale/2 = amax/254 per component
    masked = toks * want_mask[..., None]
    assert np.abs(got - masked).max() <= np.abs(masked).max(-1).max() / 254 + 1e-7
    # padded tokens must be exactly zero (scale 1.0, values 0)
    assert np.all(got[~want_mask.astype(bool)] == 0)


def test_roundtrip_bf16(rng, tmp_path):
    toks = _normed_tokens(rng, 6, 8, 16)
    lengths = np.full(6, 8)
    store = _write_store(tmp_path / "s", toks, lengths, dtype="bfloat16")
    got, _ = store.gather(np.arange(6))
    np.testing.assert_allclose(got, toks, rtol=1e-2, atol=1e-2)


def test_pad_truncate_to_store_td(rng, tmp_path):
    # batch T=20 > store Td=8: truncated; lengths clamped
    toks = _normed_tokens(rng, 4, 20, 16)
    lengths = np.array([3, 8, 15, 20])
    store = _write_store(tmp_path / "s", toks, lengths, td=8)
    got, mask = store.gather(np.arange(4))
    assert got.shape == (4, 8, 16)
    np.testing.assert_array_equal(store.lengths, [3, 8, 8, 8])
    assert np.all(got[0, 3:] == 0)


def test_open_rejects_non_token_store(tmp_path):
    from codemix_dense_retrieval_tpu.io.shards import ShardWriter

    w = ShardWriter(tmp_path / "plain", dim=8)
    w.append(np.zeros((2, 8), np.float32), ["a", "b"])
    w.finalize()
    with pytest.raises(ValueError, match="not a token shard store"):
        TokenShardStore.open(tmp_path / "plain")
    assert not TokenShardStore.exists(tmp_path / "plain")


def test_crash_resume_reconciles_sidecars(rng, tmp_path):
    """Crash after the sidecar appends but before the vector write: resume
    truncates lengths/token_scales to the stored row count, finalize gives
    an openable store (the int8-resume fix class from round-1 VERDICT)."""
    d, td = 16, 8
    toks = _normed_tokens(rng, 6, td, d)
    lengths = np.full(6, td)
    w = TokenShardWriter(tmp_path / "s", d, td, "int8", lang="xx")
    w.append(toks[:4], lengths[:4], [f"d{i}" for i in range(4)])
    # simulate the torn batch: sidecars run ahead of the vector file
    with open(w.dir / "lengths.bin", "ab") as fh:
        fh.write(np.full(2, td, np.int32).tobytes())
    with open(w.dir / "token_scales.bin", "ab") as fh:
        fh.write(np.ones(2 * td, np.float32).tobytes())
    with open(w.dir / "docids.partial.txt", "a") as fh:
        fh.write("d4\nd5\n")
    del w

    w2, written = TokenShardWriter.resume_partial(tmp_path / "s", d, td, "int8", lang="xx")
    assert written == {"d0", "d1", "d2", "d3"}
    assert w2.count == 4
    w2.append(toks[4:], lengths[4:], ["d4", "d5"])
    w2.finalize()
    store = TokenShardStore.open(tmp_path / "s")
    assert store.count == 6
    got, _ = store.gather(np.arange(6))
    assert np.abs(got - toks).max() < 1e-2


def test_quantize_tokens_zero_row():
    q, s = _quantize_tokens_np(np.zeros((1, 4, 8)))
    assert np.all(q == 0) and np.all(s == 1.0)


# ---------------------------------------------------------------------------
# two-stage searcher


def _corpus(rng, n=64, td=8, d=32, tq=4):
    doc_toks = _normed_tokens(rng, n, td, d)
    doc_lens = rng.integers(1, td + 1, size=n)
    doc_lens[:4] = td
    mask = np.arange(td)[None] < doc_lens[:, None]
    doc_toks *= mask[..., None]
    dense = doc_toks.sum(axis=1)
    dense /= np.linalg.norm(dense, axis=-1, keepdims=True)
    q_toks = _normed_tokens(rng, 5, tq, d)
    q_lens = np.array([tq, tq, 2, 3, 1])
    q_dense = q_toks.sum(axis=1)
    q_dense /= np.linalg.norm(q_dense, axis=-1, keepdims=True)
    return dense, doc_toks, doc_lens, q_dense, q_toks, q_lens


def _brute_force_top(q_toks, q_lens, doc_toks, doc_lens, cand, k):
    """numpy MaxSim over the candidate set, ties to the lower row id."""
    tq = q_toks.shape[1]
    td = doc_toks.shape[1]
    out = []
    for qi in range(len(q_toks)):
        scores = []
        for c in cand[qi]:
            total = 0.0
            for i in range(int(q_lens[qi])):
                sims = [
                    float(q_toks[qi, i] @ doc_toks[c, j])
                    for j in range(int(doc_lens[c]))
                ]
                total += max(sims) if sims else 0.0
            scores.append((total, int(c)))
        scores.sort(key=lambda x: (-x[0], x[1]))
        out.append(scores[:k])
    return out


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_two_stage_searcher_matches_brute_force(rng, tmp_path, eight_cpu_devices, dtype):
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    n = len(dense)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens, dtype=dtype)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)

    searcher = TwoStageSearcher(index, store)
    k, k_dense = 5, 16
    scores, ids = searcher.search(
        q_dense, q_toks, q_lens, k, k_dense=k_dense, return_docids=False
    )
    assert scores.shape == (5, k) and ids.shape == (5, k)
    # oracle over the SAME dense candidates, scored on the dequantized store
    _, cand = index.search(q_dense, k_dense, return_docids=False)
    stored, stored_mask = store.gather(np.arange(n))
    if dtype == "int8":
        # the device path rounds dequantized candidates through bf16
        # (halves kernel HBM traffic; int8 already bounds precision)
        import ml_dtypes

        stored = stored.astype(ml_dtypes.bfloat16).astype(np.float32)
    stored_lens = stored_mask.sum(axis=1)
    want = _brute_force_top(q_toks, q_lens, stored, stored_lens, cand, k)
    # tie-aware comparison: the python oracle accumulates in f64, the
    # kernel in f32, so adjacent candidates within float tolerance may
    # legitimately swap — require id equality only where the score gap
    # to both neighbors exceeds the tolerance, scores always close
    tol = 1e-4
    for qi in range(len(want)):
        w_scores = np.asarray([s for s, _ in want[qi]])
        np.testing.assert_allclose(scores[qi], w_scores, atol=tol, rtol=1e-5)
        for j in range(k):
            gap_up = j == 0 or w_scores[j - 1] - w_scores[j] > tol
            gap_dn = j == k - 1 or w_scores[j] - w_scores[j + 1] > tol
            if gap_up and gap_dn:
                assert ids[qi, j] == want[qi][j][1], (qi, j)
    # scores are sorted desc
    assert np.all(np.diff(scores, axis=1) <= 1e-6)
    # docid mapping
    _, docids = searcher.search(q_dense, q_toks, q_lens, k, k_dense=k_dense)
    assert docids[0][0] == f"d{ids[0][0]}"


def test_two_stage_query_block_equivalence(rng, tmp_path, eight_cpu_devices):
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)
    s = TwoStageSearcher(index, store)
    one = s.search(q_dense, q_toks, q_lens, 4, k_dense=12, return_docids=False)
    blk = s.search(q_dense, q_toks, q_lens, 4, k_dense=12, query_block=2, return_docids=False)
    np.testing.assert_array_equal(one[1], blk[1])
    np.testing.assert_allclose(one[0], blk[0], rtol=1e-5, atol=1e-5)


def test_two_stage_approx_guaranteed_parity(rng, tmp_path, eight_cpu_devices):
    """approx='guaranteed' dense stage: final reranked output identical."""
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    n = len(dense)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens, dtype="bfloat16")
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)
    exact = TwoStageSearcher(index, store)
    s_e, i_e = exact.search(q_dense, q_toks, q_lens, 5, k_dense=16, return_docids=False)
    grt = TwoStageSearcher(index, store, approx="guaranteed")
    s_g, i_g = grt.search(q_dense, q_toks, q_lens, 5, k_dense=16, return_docids=False)
    np.testing.assert_array_equal(i_g, i_e)
    np.testing.assert_allclose(s_g, s_e, rtol=1e-5, atol=1e-5)


def test_two_stage_count_mismatch_rejected(rng, tmp_path):
    dense, doc_toks, doc_lens, *_ = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks[:10], doc_lens[:10])
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    with pytest.raises(ValueError, match="token store count"):
        TwoStageSearcher(index, store)


# ---------------------------------------------------------------------------
# pipeline integration: encode-with-tokens, crash resume, backfill


@pytest.fixture(scope="module")
def tiny_encoder():
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig.tiny(vocab_size=8000, hidden_size=64, num_heads=4, use_flash=False)
    return TextEncoder(
        "BAAI/bge-m3", cfg, tokenizer=HashTokenizer(vocab_size=8000, max_length=32),
        seed=3,
    )


def _src(lang, n=24):
    return [(str(i), f"{lang} passage number {i} tok{i % 7}") for i in range(n)]


def test_encode_corpus_writes_token_store(tiny_encoder, tmp_path):
    from codemix_dense_retrieval_tpu.io.shards import ShardStore
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    dirs = encode_corpus(
        tiny_encoder, {"en": _src("en")}, tmp_path / "idx",
        storage_dtype="float32", tokens_per_doc=16,
    )
    dense = ShardStore.open(dirs["en"])
    toks = TokenShardStore.open(dirs["en"] / "tokens")
    assert toks.count == dense.count == 24
    assert toks.docids == dense.docids  # same corpus order: rows align
    assert toks.tokens_per_doc == 16 and toks.token_dim == 64
    # token blocks are per-token L2-normalized where valid
    got, mask = toks.gather(np.arange(4))
    norms = np.linalg.norm(got, axis=-1)
    valid = mask.astype(bool)
    np.testing.assert_allclose(norms[valid], 1.0, atol=0.02)
    assert np.all(norms[~valid] == 0)


def test_encode_corpus_backfills_tokens_for_complete_language(tiny_encoder, tmp_path):
    from codemix_dense_retrieval_tpu.io.shards import ShardStore
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    # round 1: dense only
    encode_corpus(
        tiny_encoder, {"en": _src("en")}, tmp_path / "idx", storage_dtype="float32",
    )
    assert not TokenShardStore.exists(tmp_path / "idx" / "en" / "tokens")
    # round 2: same run with tokens requested -> backfill, dense untouched
    dirs = encode_corpus(
        tiny_encoder, {"en": _src("en")}, tmp_path / "idx",
        storage_dtype="float32", tokens_per_doc=16,
    )
    dense = ShardStore.open(dirs["en"])
    toks = TokenShardStore.open(dirs["en"] / "tokens")
    assert toks.count == dense.count and toks.docids == dense.docids


def test_encode_corpus_token_crash_resume(tiny_encoder, tmp_path):
    """Kill the run after the dense store has more rows than the token
    store; the rerun must top up only the token side and finish aligned."""
    from codemix_dense_retrieval_tpu.io.shards import ShardStore
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    src = _src("en")
    calls = {"n": 0}
    real = tiny_encoder.encode_documents_with_tokens

    def crashing(texts, **kw):
        calls["n"] += 1
        if calls["n"] == 2:
            raise RuntimeError("simulated crash")
        return real(texts, **kw)

    tiny_encoder.encode_documents_with_tokens = crashing
    try:
        with pytest.raises(RuntimeError):
            encode_corpus(
                tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
                storage_dtype="float32", tokens_per_doc=16, batch_size=8,
            )
    finally:
        tiny_encoder.encode_documents_with_tokens = real
    dirs = encode_corpus(
        tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
        storage_dtype="float32", tokens_per_doc=16, batch_size=8,
    )
    dense = ShardStore.open(dirs["en"])
    toks = TokenShardStore.open(dirs["en"] / "tokens")
    assert dense.count == len(src)
    assert toks.count == dense.count and toks.docids == dense.docids


def test_cli_encode_tokens_then_run_rerank(tmp_path, capsys):
    """CLI surface: encode-corpus --tokens_per_doc -> run-rerank writes a
    TREC run; queries that are exact copies of passages retrieve their
    source doc at rank 1 (dense recall AND MaxSim agree on self-match)."""
    from codemix_dense_retrieval_tpu.cli import main as cli_main

    rows = [f"{i}\ten passage number {i} tok{i % 5} tok{i % 9}" for i in range(40)]
    (tmp_path / "corpus.tsv").write_text("\n".join(rows) + "\n")
    cli_main([
        "encode-corpus",
        "--corpus_tsv", f"en={tmp_path/'corpus.tsv'}",
        "--out", str(tmp_path / "idx"),
        "--storage_dtype", "float32",
        "--tokens_per_doc", "16",
        "--smoke_dim", "32",
    ])
    assert TokenShardStore.exists(tmp_path / "idx" / "en" / "tokens")

    qids = [f"q{i}" for i in range(6)]
    rel = [str(5 * i) for i in range(6)]
    docs = {r.split("\t")[0]: r.split("\t")[1] for r in rows}
    (tmp_path / "queries.tsv").write_text(
        "\n".join(f"{q}\t{docs[d]}" for q, d in zip(qids, rel)) + "\n"
    )
    cli_main([
        "run-rerank",
        "--index", str(tmp_path / "idx" / "en"),
        "--queries", str(tmp_path / "queries.tsv"),
        "--outdir", str(tmp_path / "runs"),
        "--k", "10", "--k_dense", "20",
        "--smoke_dim", "32",
    ])
    run_path = tmp_path / "runs" / "queries.trec"
    assert run_path.exists()
    top = {}
    for line in run_path.read_text().splitlines():
        qid, _, docid, rank = line.split()[:4]
        if rank == "1":
            top[qid] = docid
    assert top == {q: f"{d}#en" for q, d in zip(qids, rel)}


def test_query_token_cache_roundtrip_and_mismatch(tmp_path, rng):
    from codemix_dense_retrieval_tpu.pipeline.query_cache import (
        QueryCacheMismatch,
        load_query_token_cache,
        save_query_token_cache,
    )

    qids = ["q1", "q2", "q3"]
    vecs = rng.standard_normal((3, 16)).astype(np.float32)
    toks = rng.standard_normal((3, 4, 16)).astype(np.float32)
    lens = np.array([4, 2, 3], np.int32)
    p = tmp_path / "cache" / "set.npz"
    save_query_token_cache(p, qids, vecs, toks, lens)
    got_q, got_v, got_t, got_l = load_query_token_cache(p, expected_qids=qids)
    np.testing.assert_array_equal(got_q, qids)
    np.testing.assert_allclose(got_v, vecs)
    np.testing.assert_allclose(got_t, toks)  # f32: bit-exact
    np.testing.assert_array_equal(got_l, lens)
    with pytest.raises(QueryCacheMismatch):
        load_query_token_cache(p, expected_qids=["q1", "qX", "q3"])


def test_run_two_stage_uses_cache(tmp_path, rng, eight_cpu_devices):
    """Second run with a cache must not call the encoder at all."""
    from codemix_dense_retrieval_tpu.pipeline.rerank import run_two_stage_search

    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)

    calls = {"n": 0}

    class FakeEnc:
        def encode_queries(self, texts, batch_size=64):
            calls["n"] += 1
            return q_dense[: len(texts)]

        def encode_queries_tokens(self, texts, batch_size=64):
            calls["n"] += 1
            return q_toks[: len(texts)], q_lens[: len(texts)]

    sets = {"band": [(f"q{i}", f"text {i}") for i in range(len(q_dense))]}
    r1 = run_two_stage_search(
        index, store, FakeEnc(), sets, tmp_path / "runs1",
        k=4, k_dense=12, cache_root=tmp_path / "qcache",
    )
    assert calls["n"] == 2
    r2 = run_two_stage_search(
        index, store, FakeEnc(), sets, tmp_path / "runs2",
        k=4, k_dense=12, cache_root=tmp_path / "qcache",
    )
    assert calls["n"] == 2  # cache hit: no new encoder calls
    assert (
        (tmp_path / "runs1" / "band.trec").read_text()
        == (tmp_path / "runs2" / "band.trec").read_text()
    )


def test_multi_file_store_gathers_without_materializing(rng, tmp_path):
    """Stores spanning several bin files must gather through per-part
    memmaps (row order preserved across file boundaries)."""
    d, td, n = 16, 4, 50
    toks = _normed_tokens(rng, n, td, d)
    lengths = np.full(n, td)
    w = TokenShardWriter(tmp_path / "s", d, td, "int8", lang="xx",
                         rows_per_file=16)  # -> 4 files
    for s in range(0, n, 10):
        w.append(toks[s : s + 10], lengths[s : s + 10],
                 [f"d{i}" for i in range(s, min(s + 10, n))])
    w.finalize()
    store = TokenShardStore.open(tmp_path / "s")
    assert store._parts is not None and len(store._parts) == 4
    # the multi-file store must NOT be concatenated into RAM at open —
    # that is the whole point of the per-part maps (corpus-scale stores
    # are ~16 KB/row)
    assert store._inner.vectors is None
    # rows straddling every file boundary, unsorted
    rows = np.array([47, 0, 16, 15, 31, 32, 33, 48, 1])
    got, mask = store.gather(rows)
    ref = _write_store(tmp_path / "ref", toks, lengths).gather(rows)[0]
    np.testing.assert_allclose(got, ref, atol=1e-7)
    assert np.all(mask == 1)


def test_bilingual_two_stage_merge_and_collapse(tmp_path, rng, eight_cpu_devices):
    """Per-language two-stage + merge must rank by MaxSim score with
    concat-hub tie order (lang order, then row), and the collapse keeps
    the max-scoring language variant per base docid."""
    from codemix_dense_retrieval_tpu.io.trec import read_run
    from codemix_dense_retrieval_tpu.pipeline.rerank import run_two_stage_bilingual

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    n, td, d, tq = 32, 6, 16, 4
    stores, indexes = [], []
    all_toks = {}
    for lang in ("en", "zh"):
        toks = _normed_tokens(rng, n, td, d)
        lens = np.full(n, td)
        dense = toks.mean(axis=1)
        dense /= np.linalg.norm(dense, axis=-1, keepdims=True)
        store = _write_store(tmp_path / f"tok_{lang}", toks, lens, dtype="bfloat16")
        ix = DenseFlatIndex.build(
            dense, [f"d{i}" for i in range(n)], dtype="float32", lang=lang,
        )
        # derived ids carry the lang tag, like encode_corpus writes them
        ix.store.derived_ids = [f"d{i}#{lang}" for i in range(n)]
        ix._docids = np.asarray(ix.store.derived_ids, dtype=object)
        ix.to_device(mesh, pad_multiple=8)
        stores.append(store)
        indexes.append(ix)
        all_toks[lang] = toks

    q_toks = _normed_tokens(rng, 3, tq, d)
    q_lens = np.full(3, tq)
    q_dense = q_toks.mean(axis=1)
    q_dense /= np.linalg.norm(q_dense, axis=-1, keepdims=True)

    class FakeEnc:
        def encode_queries(self, texts, batch_size=64):
            return q_dense[: len(texts)]

        def encode_queries_tokens(self, texts, batch_size=64):
            return q_toks[: len(texts)], q_lens[: len(texts)]

    sets = {"band": [(f"q{i}", f"t{i}") for i in range(3)]}
    out = run_two_stage_bilingual(
        indexes, stores, FakeEnc(), sets, tmp_path / "runs",
        k=8, k_dense=16,
    )
    raw = read_run(tmp_path / "runs" / "band_raw.trec")
    base = read_run(out["band"])
    # raw has k rows per query, scores non-increasing, lang-tagged docids
    per_q = {}
    for e in raw:
        per_q.setdefault(e.qid, []).append(e)
    for qid, entries in per_q.items():
        scores = [e.score for e in entries]
        assert scores == sorted(scores, reverse=True)
        assert all("#" in e.docid for e in entries)
    # collapse: base docids unique per query, score = max over variants
    for e in base:
        assert "#" not in e.docid
    raw_best = {}
    for e in raw:
        key = (e.qid, e.docid.split("#")[0])
        raw_best[key] = max(raw_best.get(key, -1e9), e.score)
    for e in base:
        assert abs(raw_best[(e.qid, e.docid)] - e.score) < 1e-4


def test_bilingual_meta_records_per_language_clamp(tmp_path, rng, eight_cpu_devices):
    """Depth clamps can differ per language (one tiny index): the per-set
    meta must surface BOTH languages' effective depths, not language 0's."""
    import json

    from codemix_dense_retrieval_tpu.pipeline.rerank import run_two_stage_bilingual

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    td, d, tq = 6, 16, 4
    stores, indexes = [], []
    # 256 docs -> 32 rows/shard (no clamp at k_dense=32); 16 -> 8 (clamps)
    for lang, n in (("en", 256), ("zh", 16)):
        toks = _normed_tokens(rng, n, td, d)
        dense = toks.mean(axis=1)
        dense /= np.linalg.norm(dense, axis=-1, keepdims=True)
        stores.append(_write_store(tmp_path / f"tok_{lang}", toks, np.full(n, td)))
        ix = DenseFlatIndex.build(
            dense, [f"d{i}" for i in range(n)], dtype="float32", lang=lang,
        )
        ix.store.derived_ids = [f"d{i}#{lang}" for i in range(n)]
        ix._docids = np.asarray(ix.store.derived_ids, dtype=object)
        ix.to_device(mesh, pad_multiple=8)
        indexes.append(ix)

    q_toks = _normed_tokens(rng, 3, tq, d)
    q_dense = q_toks.mean(axis=1)
    q_dense /= np.linalg.norm(q_dense, axis=-1, keepdims=True)

    class FakeEnc:
        def encode_queries(self, texts, batch_size=64):
            return q_dense[: len(texts)]

        def encode_queries_tokens(self, texts, batch_size=64):
            return q_toks[: len(texts)], np.full(len(texts), tq)

    run_two_stage_bilingual(
        indexes, stores, FakeEnc(),
        {"band": [(f"q{i}", f"t{i}") for i in range(3)]},
        tmp_path / "runs", k=8, k_dense=32,
    )
    meta = json.loads((tmp_path / "runs" / "band_meta.json").read_text())
    assert "per_language" in meta
    en, zh = meta["per_language"]
    assert en["k_dense_effective"] == 32
    assert zh["k_dense_effective"] == 8
    assert zh["k_dense_requested"] == 32


def test_token_store_random_crash_point_fuzz(rng, tmp_path):
    """Randomized crash-point fuzz: truncate the partial store's files at
    arbitrary byte offsets (torn writes anywhere), resume, finish, and the
    finalized store must open with aligned sidecars and correct data for
    every surviving row."""
    d, td, n = 16, 4, 30
    toks = _normed_tokens(rng, n, td, d)
    lengths = rng.integers(1, td + 1, size=n)
    for trial in range(6):
        root = tmp_path / f"t{trial}"
        w = TokenShardWriter(root, d, td, "int8", lang="xx", rows_per_file=8)
        half = 4 + int(rng.integers(0, 14))
        for s in range(0, half, 5):
            e = min(s + 5, half)
            w.append(toks[s:e], lengths[s:e], [f"d{i}" for i in range(s, e)])
        # simulate a torn crash: chop a random number of bytes off the
        # LAST bin file and over-append garbage rows to the sidecars
        bins = sorted(root.glob("emb.*.bin"))
        with open(bins[-1], "r+b") as fh:
            size = bins[-1].stat().st_size
            fh.truncate(size - int(rng.integers(0, min(size, td * d + 3))))
        with open(root / "lengths.bin", "ab") as fh:
            fh.write(np.full(2, td, np.int32).tobytes())
        with open(root / "token_scales.bin", "ab") as fh:
            fh.write(np.ones(2 * td, np.float32).tobytes())
        del w

        w2, written = TokenShardWriter.resume_partial(root, d, td, "int8", lang="xx")
        survived = w2.count
        assert len(written) == survived <= half
        todo = [i for i in range(n) if f"d{i}" not in written]
        for s in range(0, len(todo), 7):
            ids = todo[s : s + 7]
            w2.append(toks[ids], lengths[ids], [f"d{i}" for i in ids])
        w2.finalize()
        store = TokenShardStore.open(root)
        assert store.count == n
        # surviving prefix rows must still decode to their original data
        got, mask = store.gather(np.arange(survived))
        want_mask = (np.arange(td)[None] < lengths[:survived, None]).astype(np.int32)
        np.testing.assert_array_equal(mask, want_mask)
        assert np.abs(got - toks[:survived] * want_mask[..., None]).max() < 1e-2


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_two_stage_dedupe_parity(rng, tmp_path, eight_cpu_devices, dtype):
    """Candidate-dedup path must produce identical results to the direct
    path — including under heavy duplication (few hot docs, k_dense deep
    enough that every query recalls mostly the same candidates)."""
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng, n=24)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens, dtype=dtype)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(24)], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)
    on = TwoStageSearcher(index, store, dedupe=True)
    off = TwoStageSearcher(index, store, dedupe=False)
    for qb in (0, 2):
        s1, i1 = on.search(q_dense, q_toks, q_lens, 5, k_dense=20,
                           query_block=qb, return_docids=False)
        s2, i2 = off.search(q_dense, q_toks, q_lens, 5, k_dense=20,
                            query_block=qb, return_docids=False)
        np.testing.assert_array_equal(i1, i2)
        np.testing.assert_allclose(s1, s2, rtol=1e-5, atol=1e-5)


def test_two_stage_row_desync_rejected(rng, tmp_path):
    """Same count, different docid order -> reject at construction
    (advisor r2: a desynced store silently scores the wrong blocks)."""
    dense, doc_toks, doc_lens, *_ = _corpus(rng)
    n = len(dense)
    td, d = doc_toks.shape[1], doc_toks.shape[2]
    w = TokenShardWriter(tmp_path / "tok", d, td, "int8", lang="xx")
    shuffled = [f"d{i}" for i in reversed(range(n))]
    w.append(doc_toks, doc_lens, shuffled)
    w.finalize()
    store = TokenShardStore.open(tmp_path / "tok")
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)], dtype="float32")
    with pytest.raises(ValueError, match="desync"):
        TwoStageSearcher(index, store)


def test_rerank_depth_clamp_warns_and_records(rng, tmp_path, eight_cpu_devices, caplog):
    """k_dense beyond the corpus clamps with a warning and the effective
    depths land in last_depths (VERDICT r2 item 7)."""
    import logging

    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng, n=16)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(16)], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)
    s = TwoStageSearcher(index, store)
    with caplog.at_level(logging.WARNING):
        s.search(q_dense, q_toks, q_lens, 5, k_dense=500, return_docids=False)
    assert any("clamped" in r.message for r in caplog.records)
    assert s.last_depths["k_dense_requested"] == 500
    assert s.last_depths["k_dense_effective"] < 500
    assert s.last_depths["k_requested"] == 5
    assert s.last_depths["k_effective"] == 5

    # final k itself clamped: the REQUESTED depth must survive in the
    # record (it previously stored the post-clamp value)
    sc, ids = s.search(q_dense, q_toks, q_lens, 20, k_dense=500,
                       return_docids=False)
    assert s.last_depths["k_requested"] == 20
    k_eff = s.last_depths["k_effective"]
    assert k_eff == s.last_depths["k_dense_effective"] < 20
    assert sc.shape[1] == k_eff


def test_dedupe_skipped_when_padded_size_larger(rng, tmp_path, eight_cpu_devices, monkeypatch):
    """A tiny block with high duplication still must NOT dedupe when the
    4096-row padded unique set would ship more bytes than the direct
    layout (advisor r2)."""
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)
    s = TwoStageSearcher(index, store, dedupe=True, device_resident=False)

    calls = {"rows": []}
    orig = store.gather_quantized

    def spy(rows):
        calls["rows"].append(np.asarray(rows).size)
        return orig(rows)

    monkeypatch.setattr(store, "gather_quantized", spy)
    # 5 queries x k_dense=16 = 80 candidate slots; unique <= 64 but the
    # 4096 pad bucket >> 80 -> direct path must win
    s.search(q_dense, q_toks, q_lens, 4, k_dense=16, return_docids=False)
    assert calls["rows"], "gather_quantized never called"
    assert max(calls["rows"]) <= 80  # never the 4096-padded unique set


def test_writer_clamps_lengths_to_batch_token_axis(rng, tmp_path):
    """lengths > the batch's token axis t must not mark zero-padded slots
    valid (advisor r2: an all-zero valid token floors max-sim at 0)."""
    n, t, d, td = 4, 6, 16, 12  # t < td: store pads the token axis
    toks = _normed_tokens(rng, n, t, d)
    w = TokenShardWriter(tmp_path / "s", d, td, "int8", lang="xx")
    w.append(toks, [td] * n, [f"d{i}" for i in range(n)])  # lengths > t
    w.finalize()
    store = TokenShardStore.open(tmp_path / "s")
    _, _, mask = store.gather_quantized(np.arange(n))
    # only the t real tokens may be valid
    assert mask.sum() == n * t
    assert not mask[:, t:].any()


@pytest.mark.parametrize("dtype", ["int8", "bfloat16"])
def test_device_resident_matches_host_gather(rng, tmp_path, eight_cpu_devices, dtype):
    """HBM-resident store (VERDICT r2 item 3): results bit-identical to
    the host memmap-gather path on the same candidates."""
    dense, doc_toks, doc_lens, q_dense, q_toks, q_lens = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens, dtype=dtype)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    index.to_device(make_mesh(shard=8, devices=eight_cpu_devices), pad_multiple=8)

    host = TwoStageSearcher(index, store, device_resident=False)
    resident = TwoStageSearcher(index, store, device_resident=True)
    assert resident.device_resident and not host.device_resident
    for qb in (0, 2):
        hs, hi = host.search(q_dense, q_toks, q_lens, 5, k_dense=16,
                             query_block=qb, return_docids=False)
        rs, ri = resident.search(q_dense, q_toks, q_lens, 5, k_dense=16,
                                 query_block=qb, return_docids=False)
        np.testing.assert_array_equal(hi, ri)
        np.testing.assert_allclose(hs, rs, rtol=1e-6, atol=1e-6)


def test_device_resident_auto_selection(rng, tmp_path):
    """auto (None): resident when the store fits the budget, memmap
    beyond it; explicit True over budget is an error."""
    dense, doc_toks, doc_lens, *_ = _corpus(rng)
    store = _write_store(tmp_path / "tok", doc_toks, doc_lens)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(len(dense))], dtype="float32")
    auto = TwoStageSearcher(index, store)
    assert auto.device_resident  # tiny store fits the default budget
    tight = TwoStageSearcher(index, store, device_budget_bytes=16)
    assert not tight.device_resident
    with pytest.raises(ValueError, match="budget"):
        TwoStageSearcher(index, store, device_resident=True,
                         device_budget_bytes=16)


def test_store_bytes_respects_storage_dtype(tmp_path, rng):
    """The device-residency estimate must use the real storage itemsize —
    a float32 store is 4 bytes/element, not the bf16 2 (a 2x
    underestimate could blow the HBM budget)."""
    from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

    n, td, d = 8, 4, 16
    toks = _normed_tokens(rng, n, td, d)
    dense = toks.mean(axis=1)
    dense /= np.linalg.norm(dense, axis=-1, keepdims=True)
    index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(n)], dtype="float32")
    sizes = {}
    for dt in ("float32", "bfloat16", "int8"):
        store = _write_store(tmp_path / f"tok_{dt}", toks, np.full(n, td), dtype=dt)
        s = TwoStageSearcher(index, store, device_resident=False)
        sizes[dt] = s._store_bytes()
    blocks = n * td * d
    assert sizes["float32"] == blocks * 4 + n * 4
    assert sizes["bfloat16"] == blocks * 2 + n * 4
    assert sizes["int8"] == blocks * 1 + n * 4 + n * td * 4  # + scales


def _crash_tok_append_on_call(monkeypatch, n_call):
    """Make TokenShardWriter.append raise on its n_call-th invocation —
    lands the crash BETWEEN the dense and token appends of one batch."""
    calls = {"n": 0}
    real = TokenShardWriter.append

    def crashing(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == n_call:
            raise RuntimeError("simulated crash between appends")
        return real(self, *a, **kw)

    monkeypatch.setattr(TokenShardWriter, "append", crashing)
    return calls


def test_token_resume_when_dense_looks_done_mirror(tiny_encoder, tmp_path, monkeypatch):
    """Crash between the FINAL batch's dense and token appends on a
    mirror language: at resume the dense side already has every selected
    row, and the old early-stop finalized a SHORT token manifest. The
    rerun must top up the token store before finalizing."""
    from codemix_dense_retrieval_tpu.io.shards import ShardStore
    from codemix_dense_retrieval_tpu.pipeline.corpus import SelectionState, encode_corpus

    src_en = _src("en", 32)
    src_zh = _src("zh", 32)
    sources = {"en": src_en, "zh": src_zh}

    def fresh_sel():
        return SelectionState(rel_ids={"3", "9"}, subset_neg_cap=10,
                              neg_prob=0.9, seed=1)

    # probe pass: count token appends of a clean run (the crash goes on
    # the LAST one — zh's final batch)
    calls = _crash_tok_append_on_call(monkeypatch, 0)  # 0 never fires
    encode_corpus(tiny_encoder, sources, tmp_path / "probe",
                  selection=fresh_sel(), storage_dtype="float32",
                  tokens_per_doc=8, batch_size=8)
    total_appends = calls["n"]
    assert total_appends >= 2
    monkeypatch.undo()

    calls = _crash_tok_append_on_call(monkeypatch, total_appends)
    with pytest.raises(RuntimeError, match="between appends"):
        encode_corpus(tiny_encoder, sources, tmp_path / "idx",
                      selection=fresh_sel(), storage_dtype="float32",
                      tokens_per_doc=8, batch_size=8)
    monkeypatch.undo()

    dirs = encode_corpus(tiny_encoder, sources, tmp_path / "idx",
                         selection=fresh_sel(), storage_dtype="float32",
                         tokens_per_doc=8, batch_size=8)
    for lang in ("en", "zh"):
        dense = ShardStore.open(dirs[lang])
        toks = TokenShardStore.open(dirs[lang] / "tokens")
        assert toks.count == dense.count, lang
        assert toks.docids == dense.docids, lang


def test_token_resume_when_dense_at_max_docs(tiny_encoder, tmp_path, monkeypatch):
    """Same crash class with max_docs: dense hits the cap pre-crash, the
    resume enters with kept == max_docs and must still catch the token
    store up instead of finalizing it short."""
    from codemix_dense_retrieval_tpu.io.shards import ShardStore
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    src = _src("en", 40)
    # batch_size=8, max_docs=16 -> 2 token appends; crash the 2nd
    calls = _crash_tok_append_on_call(monkeypatch, 2)
    with pytest.raises(RuntimeError, match="between appends"):
        encode_corpus(tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
                      storage_dtype="float32", tokens_per_doc=8,
                      batch_size=8, max_docs=16)
    monkeypatch.undo()
    # dense is at the cap, tokens one batch short
    dirs = encode_corpus(tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
                         storage_dtype="float32", tokens_per_doc=8,
                         batch_size=8, max_docs=16)
    dense = ShardStore.open(dirs["en"])
    toks = TokenShardStore.open(dirs["en"] / "tokens")
    assert dense.count == 16
    assert toks.count == 16 and toks.docids == dense.docids


def test_finalized_short_token_store_rejected(tiny_encoder, tmp_path):
    """A finalized token store shorter than its dense index must fail
    fast at encode-resume with a pointer to rebuild, not surface later as
    a serving-time desync."""
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    src = _src("en", 24)
    dirs = encode_corpus(tiny_encoder, {"en": src}, tmp_path / "idx",
                         storage_dtype="float32", tokens_per_doc=8)
    # forge a short-but-finalized token store
    store = TokenShardStore.open(dirs["en"] / "tokens")
    toks, mask = store.gather(np.arange(20))
    import shutil

    shutil.rmtree(dirs["en"] / "tokens")
    w = TokenShardWriter(dirs["en"] / "tokens", store.token_dim,
                         store.tokens_per_doc, "int8", lang="en")
    w.append(toks[:20], mask.sum(axis=1)[:20], [str(i) for i in range(20)])
    w.finalize()
    with pytest.raises(ValueError, match="delete .*tokens"):
        encode_corpus(tiny_encoder, {"en": src}, tmp_path / "idx",
                      storage_dtype="float32", tokens_per_doc=8)


def test_root_docids_complete_after_mid_resume(tiny_encoder, tmp_path):
    """out_root/docids.txt must contain PRE-CRASH rows after a
    mid-language resume (they were only added from fresh appends)."""
    from codemix_dense_retrieval_tpu.pipeline.corpus import encode_corpus

    src = _src("en", 40)
    calls = {"n": 0}
    real = tiny_encoder.encode_documents

    def flaky(texts, batch_size=64, **kw):
        calls["n"] += 1
        if calls["n"] == 3:
            raise RuntimeError("simulated crash")
        return real(texts, batch_size=batch_size, **kw)

    tiny_encoder.encode_documents = flaky
    try:
        with pytest.raises(RuntimeError):
            encode_corpus(tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
                          storage_dtype="float32", batch_size=8)
    finally:
        tiny_encoder.encode_documents = real
    encode_corpus(tiny_encoder, {"en": iter(src)}, tmp_path / "idx",
                  storage_dtype="float32", batch_size=8)
    root_ids = set((tmp_path / "idx" / "docids.txt").read_text().splitlines())
    assert root_ids == {d for d, _ in src}
