"""End-to-end smoke: synthetic corpus with planted qrels where exact
recall is provable (SURVEY §4 implication), exercising
encode -> index -> search(+mix) -> TREC -> eval as one flow."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.evals.evaluate import evaluate_run, load_run_grouped
from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.io.shards import ShardStore
from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig
from codemix_dense_retrieval_tpu.parallel import make_mesh
from codemix_dense_retrieval_tpu.pipeline.bilingual import (
    run_bilingual_vector_mix,
    run_bilingual_word_mix,
)
from codemix_dense_retrieval_tpu.pipeline.corpus import SelectionState, encode_corpus
from codemix_dense_retrieval_tpu.pipeline.runs import (
    intersect_query_sets,
    run_vector_mix_search,
    run_word_mix_search,
)


@pytest.fixture(scope="module")
def tiny_encoder():
    cfg = XLMRConfig.tiny(vocab_size=8000, hidden_size=64, num_heads=4, use_flash=False)
    return TextEncoder(
        "BAAI/bge-m3", cfg, tokenizer=HashTokenizer(vocab_size=8000, max_length=32), seed=3
    )


@pytest.fixture(scope="module")
def mesh(eight_cpu_devices):
    return make_mesh(shard=8, devices=eight_cpu_devices)


def corpus_texts(lang: str, n: int = 120):
    # deterministic distinct texts per doc, language-tagged
    return {str(i): f"{lang} passage number {i} token{i % 7} token{i % 11}" for i in range(n)}


DEVICE_KW = dict(pad_multiple=128, method="bins_xla", tile_n=128, bin_size=32)


class TestEndToEndMono:
    def test_planted_qrels_perfect_retrieval(self, tiny_encoder, mesh, tmp_path):
        docs = corpus_texts("en")
        sources = {"en": list(docs.items())}
        dirs = encode_corpus(
            tiny_encoder, sources, tmp_path / "idx", storage_dtype="float32", enc_batch=16
        )
        index = DenseFlatIndex.load(dirs["en"]).to_device(mesh, **DEVICE_KW)

        # queries are exact copies of 15 passages -> top-1 must be the source
        qids = [f"q{i}" for i in range(15)]
        rel_docs = [str(3 * i) for i in range(15)]
        query_rows = [(qid, docs[d]) for qid, d in zip(qids, rel_docs)]

        runs = run_word_mix_search(
            index, tiny_encoder, {"cm0": query_rows}, tmp_path / "runs", k=20,
        )
        run = load_run_grouped(runs["cm0"])
        qrels = {qid: {f"{d}#en": 1} for qid, d in zip(qids, rel_docs)}
        ordered, _, diag = evaluate_run(run, qrels, ["MRR@10", "Recall@10", "nDCG@10"])
        assert ordered["RR@10"] == pytest.approx(100.0)
        assert ordered["R@10"] == pytest.approx(100.0)
        assert diag["num_queries"] == 15

    def test_resume_skips_existing_language(self, tiny_encoder, tmp_path):
        docs = corpus_texts("en", 30)
        sources = {"en": list(docs.items())}
        encode_corpus(tiny_encoder, sources, tmp_path / "idx", storage_dtype="float32")
        store1 = ShardStore.open(tmp_path / "idx" / "en")
        # second run with different texts must be skipped entirely
        sources2 = {"en": [(d, "OVERWRITTEN") for d in docs]}
        encode_corpus(tiny_encoder, sources2, tmp_path / "idx", storage_dtype="float32")
        store2 = ShardStore.open(tmp_path / "idx" / "en")
        np.testing.assert_array_equal(
            np.asarray(store1.vectors, np.float32), np.asarray(store2.vectors, np.float32)
        )


class TestSelectionSemantics:
    def test_rel_always_kept_neg_capped_mirror(self, tiny_encoder, tmp_path):
        n = 80
        docs_en = corpus_texts("en", n)
        docs_zh = corpus_texts("zh", n)
        rel = {"5", "17", "63"}
        sel = SelectionState(rel_ids=set(rel), subset_neg_cap=10, neg_prob=0.5, seed=1)
        dirs = encode_corpus(
            tiny_encoder,
            {"en": list(docs_en.items()), "zh": list(docs_zh.items())},
            tmp_path / "idx",
            selection=sel,
            storage_dtype="float32",
        )
        en = ShardStore.open(dirs["en"])
        zh = ShardStore.open(dirs["zh"])
        assert rel <= set(en.docids)  # relevants always kept
        assert len(set(en.docids) - rel) == 10  # exactly the negative cap
        assert set(zh.docids) == set(en.docids)  # mirror
        # derived ids carry the language tag
        assert en.derived_ids[0].endswith("#en")


class TestVectorMix:
    def test_alpha_endpoints_and_interior(self, tiny_encoder, mesh, tmp_path):
        docs_zh = corpus_texts("zh")
        encode_corpus(
            tiny_encoder, {"zh": list(docs_zh.items())}, tmp_path / "idx",
            storage_dtype="float32",
        )
        index = DenseFlatIndex.load(tmp_path / "idx" / "zh").to_device(mesh, **DEVICE_KW)

        qids = [f"q{i}" for i in range(10)]
        rel_docs = [str(5 * i) for i in range(10)]
        # primary (EN) queries are unrelated text; secondary (ZH) matches docs
        primary = [(q, f"totally unrelated english words {q}") for q in qids]
        secondary = [(q, docs_zh[d]) for q, d in zip(qids, rel_docs)]
        common, p_texts, s_texts = intersect_query_sets(primary, secondary)
        assert common == qids
        p_vecs = tiny_encoder.encode_queries(p_texts, batch_size=8)
        s_vecs = tiny_encoder.encode_queries(s_texts, batch_size=8)

        runs = run_vector_mix_search(
            index, common, p_vecs, s_vecs, [0.0, 0.5, 1.0], tmp_path / "runs", k=20,
        )
        assert set(r.name for r in runs.values()) == {
            "cm-alpha-0.trec", "cm-alpha-0.5.trec", "cm-alpha-1.trec",
        }
        qrels = {q: {f"{d}#zh": 1} for q, d in zip(qids, rel_docs)}

        def mrr(path):
            ordered, _, _ = evaluate_run(load_run_grouped(path), qrels, ["MRR@10"])
            return ordered["RR@10"]

        # alpha=1 -> queries identical to their relevant docs -> perfect
        assert mrr(runs[1.0]) == pytest.approx(100.0)
        # interior mix must be at least as good as the unrelated endpoint
        assert mrr(runs[0.5]) >= mrr(runs[0.0])


class TestBilingualHub:
    @pytest.fixture(scope="class")
    def hub(self, tiny_encoder, mesh, tmp_path_factory):
        tmp = tmp_path_factory.mktemp("hub")
        docs_en = corpus_texts("en", 90)
        docs_zh = corpus_texts("zh", 90)
        dirs = encode_corpus(
            tiny_encoder,
            {"en": list(docs_en.items()), "zh": list(docs_zh.items())},
            tmp / "idx",
            storage_dtype="float32",
        )
        ix_en = DenseFlatIndex.load(dirs["en"])
        ix_zh = DenseFlatIndex.load(dirs["zh"])
        hub = DenseFlatIndex.merged([ix_en, ix_zh], lang_tags=["en", "zh"])
        hub.to_device(mesh, **DEVICE_KW)
        return hub, docs_en, docs_zh, tmp

    def test_word_mix_collapse(self, tiny_encoder, hub):
        hub_index, docs_en, docs_zh, tmp = hub
        qids = [f"q{i}" for i in range(8)]
        rel = [str(7 * i) for i in range(8)]
        sets = {"cm0": [(q, docs_en[d]) for q, d in zip(qids, rel)]}
        out = run_bilingual_word_mix(
            hub_index, tiny_encoder, sets, tmp / "runs", k=30,
        )
        base = load_run_grouped(out["cm0"])
        # collapsed run must contain BASE docids (no #lang suffix)
        for rows in base.values():
            assert all("#" not in d for d, _ in rows)
        raw = load_run_grouped(tmp / "runs" / "cm0_raw.trec")
        for rows in raw.values():
            assert all("#" in d for d, _ in rows)
        qrels = {q: {d: 1} for q, d in zip(qids, rel)}
        ordered, _, _ = evaluate_run(base, qrels, ["MRR@10"])
        assert ordered["RR@10"] == pytest.approx(100.0)

    def test_vector_mix_collapse(self, tiny_encoder, hub):
        hub_index, docs_en, docs_zh, tmp = hub
        qids = [f"q{i}" for i in range(6)]
        rel = [str(11 * i) for i in range(6)]
        p_vecs = tiny_encoder.encode_queries([docs_en[d] for d in rel], batch_size=8)
        s_vecs = tiny_encoder.encode_queries([docs_zh[d] for d in rel], batch_size=8)
        out = run_bilingual_vector_mix(
            hub_index, qids, p_vecs, s_vecs, [0.0, 0.5, 1.0], tmp / "vruns", k=30,
        )
        assert (tmp / "vruns" / "cm-alpha-0.5_base.trec").exists()
        assert (tmp / "vruns" / "cm-alpha-0.5_meta.json").exists()
        # collapse parity convention: raw scores at 6 decimals (4 would
        # manufacture ties that reorder the collapsed run)
        raw_line = (tmp / "vruns" / "cm-alpha-0.5_raw.trec").read_text().splitlines()[0]
        score_field = raw_line.split()[4]
        assert len(score_field.split(".")[1]) == 6, raw_line
        qrels = {q: {d: 1} for q, d in zip(qids, rel)}
        for alpha in (0.0, 1.0):
            ordered, _, _ = evaluate_run(load_run_grouped(out[alpha]), qrels, ["MRR@10"])
            # both endpoints are exact copies of one language's docs -> perfect
            assert ordered["RR@10"] == pytest.approx(100.0)


class TestQueryCache:
    def test_roundtrip_and_mismatch(self, tmp_path, rng):
        from codemix_dense_retrieval_tpu.pipeline.query_cache import (
            QueryCacheMismatch,
            load_query_cache,
            save_query_cache,
        )

        vecs = rng.standard_normal((5, 8)).astype(np.float32)
        save_query_cache(tmp_path / "en" / "queries.npz", ["a", "b", "c", "d", "e"], vecs)
        qids, loaded = load_query_cache(
            tmp_path / "en" / "queries.npz", expected_qids=["a", "b", "c", "d", "e"]
        )
        np.testing.assert_array_equal(loaded, vecs)
        with pytest.raises(QueryCacheMismatch):
            load_query_cache(tmp_path / "en" / "queries.npz", expected_qids=["a", "b"])
