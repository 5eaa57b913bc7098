"""Online serving: microbatch coalescing, per-request k slicing, HTTP
transport, and error paths (serving.py)."""

import http.client
import json
import threading
import time

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.serving import SearchService, make_server


class FakeEncoder:
    """Deterministic text -> unit vector, with an optional encode delay
    (to force request coalescing in tests)."""

    def __init__(self, dim=32, delay_s=0.0):
        self.dim = dim
        self.delay_s = delay_s
        self.calls = []

    def encode_queries(self, texts, batch_size=64):
        if self.delay_s:
            time.sleep(self.delay_s)
        self.calls.append(list(texts))
        out = np.zeros((len(texts), self.dim), np.float32)
        for i, t in enumerate(texts):
            rng = np.random.default_rng(abs(hash(t)) % (2**32))
            v = rng.standard_normal(self.dim)
            out[i] = v / np.linalg.norm(v)
        return out

    def encode_queries_tokens(self, texts, batch_size=64):
        """Deterministic per-text token block: the dense vector repeated
        (so MaxSim agrees with the dense ranking on this fake)."""
        dense = self.encode_queries(texts, batch_size)
        toks = np.repeat(dense[:, None, :], 3, axis=1)
        return toks, np.full(len(texts), 3, np.int32)

    def encode_documents_with_tokens(self, texts, batch_size=64):
        dense = self.encode_queries(texts, batch_size)
        toks = np.repeat(dense[:, None, :], 3, axis=1)
        return dense, toks, np.full(len(texts), 3, np.int32)


@pytest.fixture(scope="module")
def corpus_index():
    rng = np.random.default_rng(3)
    vecs = rng.standard_normal((512, 32)).astype(np.float32)
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    return DenseFlatIndex.build(vecs, [f"d{i}" for i in range(512)])


def make_service(corpus_index, **kw):
    enc = FakeEncoder(delay_s=kw.pop("delay_s", 0.0))
    svc = SearchService(enc, corpus_index, **kw)
    return enc, svc


class TestService:
    def test_single_request_matches_direct_search(self, corpus_index):
        enc, svc = make_service(corpus_index)
        try:
            res = svc.search(["hello world"], k=5)
            assert len(res) == 1 and len(res[0]) == 5
            q = enc.encode_queries(["hello world"])
            scores, docids = corpus_index.search(q, 5)
            assert [r["docid"] for r in res[0]] == [str(d) for d in docids[0]]
            np.testing.assert_allclose(
                [r["score"] for r in res[0]], scores[0], rtol=1e-5
            )
        finally:
            svc.close()

    def test_concurrent_requests_coalesce(self, corpus_index):
        # the encode delay holds batch 1 on the device path while the
        # other requests queue -> they MUST merge into fewer batches
        enc, svc = make_service(
            corpus_index, delay_s=0.05, max_wait_s=0.2, max_batch=64
        )
        try:
            futs = [svc.submit([f"q{i}"], k=3) for i in range(8)]
            results = [f.result(timeout=10) for f in futs]
            assert all(len(r[0]) == 3 for r in results)
            stats = svc.stats.snapshot()
            assert stats["requests"] == 8
            assert stats["batches"] < 8, stats
            # every request still gets ITS OWN query's results
            for i, r in enumerate(results):
                q = enc.encode_queries([f"q{i}"])
                _, docids = corpus_index.search(q, 3)
                assert [x["docid"] for x in r[0]] == [str(d) for d in docids[0]]
        finally:
            svc.close()

    def test_mixed_k_in_one_batch(self, corpus_index):
        enc, svc = make_service(
            corpus_index, delay_s=0.05, max_wait_s=0.2, max_batch=64
        )
        try:
            f1 = svc.submit(["a"], k=2)
            f2 = svc.submit(["b"], k=9)
            assert len(f1.result(10)[0]) == 2
            assert len(f2.result(10)[0]) == 9
        finally:
            svc.close()

    def test_validation(self, corpus_index):
        _, svc = make_service(corpus_index, max_k=100)
        try:
            with pytest.raises(ValueError, match="non-empty"):
                svc.submit([])
            with pytest.raises(ValueError, match="non-empty"):
                svc.submit(["ok", ""])
            with pytest.raises(ValueError, match="k must be"):
                svc.submit(["x"], k=101)
            with pytest.raises(ValueError, match="at most"):
                svc.submit(["x"] * 1000, k=5)
        finally:
            svc.close()

    def test_oversize_batch_defers_to_next(self, corpus_index):
        _, svc = make_service(
            corpus_index, delay_s=0.05, max_wait_s=0.2, max_batch=4
        )
        try:
            futs = [svc.submit([f"q{i}", f"r{i}"], k=2) for i in range(4)]
            for f in futs:
                assert len(f.result(10)) == 2
            assert svc.stats.snapshot()["batches"] >= 2
        finally:
            svc.close()

    def test_consumer_survives_encoder_failure(self, corpus_index):
        enc, svc = make_service(corpus_index)
        try:
            boom = {"n": 0}
            orig = enc.encode_queries

            def flaky(texts, batch_size=64):
                if boom["n"] == 0:
                    boom["n"] = 1
                    raise RuntimeError("transient encode failure")
                return orig(texts, batch_size)

            enc.encode_queries = flaky
            with pytest.raises(RuntimeError, match="transient"):
                svc.search(["x"], k=1)
            # the consumer thread must still be alive and serving
            assert svc.search(["y"], k=1)[0]
            assert svc.stats.snapshot()["errors"] == 1
        finally:
            svc.close()

    def test_approx_mode_returns_certificates(self, corpus_index):
        corpus_index.enable_sketch(sketch_dim=16, probe_bins=48)
        enc, svc = make_service(corpus_index, approx=True)
        try:
            res = svc.search(["hello world", "second"], k=5)
            assert len(res) == 2
            for row in res:
                assert set(row) == {"hits", "certified"}
                assert isinstance(row["certified"], bool)
                assert len(row["hits"]) == 5
        finally:
            svc.close()

    def test_approx_requires_sketch_capable_index(self, corpus_index):
        class NoSketch:
            count = 10

        with pytest.raises(ValueError, match="sketch"):
            SearchService(FakeEncoder(), NoSketch(), approx=True)

    def test_adaptive_mode_serves_exact_results(self, corpus_index):
        """approx='adaptive': the probed-exact tier through the service —
        results identical to exact serving, certificates all True."""
        enc, svc = make_service(corpus_index)
        try:
            exact = svc.search(["hello world", "second"], k=5)
        finally:
            svc.close()
        enc, svc = make_service(corpus_index, approx="adaptive")
        try:
            res = svc.search(["hello world", "second"], k=5)
            assert len(res) == 2
            for row, ex in zip(res, exact):
                assert set(row) == {"hits", "certified"}
                assert row["certified"] is True  # adaptive is always exact
                assert [h["docid"] for h in row["hits"]] == [
                    h["docid"] for h in ex
                ]
        finally:
            svc.close()

    def test_bad_approx_mode_rejected(self, corpus_index):
        with pytest.raises(ValueError, match="approx must be"):
            SearchService(FakeEncoder(), corpus_index, approx="typo")

    def test_online_add_then_searchable(self, corpus_index):
        enc, svc = make_service(corpus_index)
        try:
            before = corpus_index.count
            out = svc.submit_add(
                [{"docid": "live-1", "text": "freshly added doc"}]
            ).result(timeout=30)
            assert out["added"] == 1 and out["count"] == before + 1
            # the doc's own text must retrieve it at rank 1 (FakeEncoder is
            # deterministic text->vector, so the match is exact)
            res = svc.search(["freshly added doc"], k=3)
            assert res[0][0]["docid"] == "live-1"
            out = svc.submit_remove(["live-1", "never-there"]).result(timeout=30)
            assert out["removed"] == 1 and out["count"] == before
            res = svc.search(["freshly added doc"], k=3)
            assert all(r["docid"] != "live-1" for r in res[0])
        finally:
            svc.close()

    def test_two_stage_serving(self, tmp_path):
        """ColBERT serving: SearchService drives a TwoStageSearcher with
        encoder token embeddings; odd batch sizes exercise the zero-length
        pad rows."""
        from codemix_dense_retrieval_tpu.io.token_shards import TokenShardWriter, TokenShardStore
        from codemix_dense_retrieval_tpu.pipeline.rerank import TwoStageSearcher

        enc = FakeEncoder()
        texts = [f"doc number {i}" for i in range(128)]
        dense = enc.encode_queries(texts)
        toks = np.repeat(dense[:, None, :], 3, axis=1)
        w = TokenShardWriter(tmp_path / "tok", token_dim=enc.dim, tokens_per_doc=3)
        w.append(toks, np.full(128, 3, np.int32), [f"d{i}" for i in range(128)])
        w.finalize()
        index = DenseFlatIndex.build(dense, [f"d{i}" for i in range(128)],
                                     dtype="float32")
        searcher = TwoStageSearcher(index, TokenShardStore.open(tmp_path / "tok"))
        svc = SearchService(enc, searcher, index_search_kwargs={"k_dense": 16})
        try:
            assert svc.two_stage
            res = svc.search([texts[7], texts[42], texts[99]], k=3)
            # each query text IS a doc text -> its own doc must rank first
            assert [r[0]["docid"] for r in res] == ["d7", "d42", "d99"]
            # online two-stage mutation through the consumer: add (dense +
            # token block in one encoder pass), retrieve, remove, gone
            out = svc.submit_add(
                [{"docid": "live-2s", "text": "two stage live doc"}]
            ).result(timeout=60)
            assert out["added"] == 1 and out["count"] == 129
            res = svc.search(["two stage live doc"], k=2)
            assert res[0][0]["docid"] == "live-2s"
            out = svc.submit_remove(["live-2s"]).result(timeout=60)
            assert out["removed"] == 1 and out["count"] == 128
            res = svc.search(["two stage live doc"], k=3)
            assert all(r["docid"] != "live-2s" for r in res[0])
        finally:
            svc.close()

    def test_concurrent_search_and_mutation_stress(self, tmp_path):
        """Hammer one service with interleaved searches and add/removes
        from many threads: every future resolves (no deadlock), no
        consumer errors, and the index ends at the expected count."""
        rng = np.random.default_rng(5)
        vecs = rng.standard_normal((256, 32)).astype(np.float32)
        vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
        idx = DenseFlatIndex.build(vecs, [f"d{i}" for i in range(256)],
                                   dtype="float32")
        enc, svc = make_service(idx, max_wait_s=0.002)
        futures = []
        try:
            for round_i in range(6):
                for j in range(4):
                    futures.append(svc.submit([f"q{round_i}-{j}"], k=5))
                futures.append(svc.submit_add(
                    [{"docid": f"live-{round_i}", "text": f"fresh {round_i}"}]
                ))
                for j in range(4):
                    futures.append(svc.submit([f"r{round_i}-{j}"], k=3))
                if round_i % 2:
                    futures.append(svc.submit_remove([f"live-{round_i - 1}"]))
            results = [f.result(timeout=60) for f in futures]
            assert all(r for r in results)
            assert svc.stats.snapshot()["errors"] == 0
            # 6 adds, 3 removes (rounds 1,3,5 remove the previous round's doc)
            assert idx.count == 256 + 6 - 3
            # searches after the queue drains see the surviving live docs
            res = svc.search(["fresh 5"], k=1)
            assert res[0][0]["docid"] == "live-5"
        finally:
            svc.close()

    def test_admin_validation(self, corpus_index):
        enc, svc = make_service(corpus_index)
        try:
            with pytest.raises(ValueError, match="docid"):
                svc.submit_add([{"text": "missing id"}])
            with pytest.raises(ValueError, match="strings"):
                svc.submit_remove([])
        finally:
            svc.close()


class TestHTTP:
    @pytest.fixture()
    def server(self, corpus_index):
        enc, svc = make_service(corpus_index, max_wait_s=0.01)
        srv = make_server(svc, port=0, info={"model": "fake"})
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        yield srv.server_address[:2], enc, svc
        srv.shutdown()
        svc.close()

    def _req(self, addr, method, path, body=None):
        conn = http.client.HTTPConnection(*addr, timeout=10)
        conn.request(
            method, path,
            body=json.dumps(body) if body is not None else None,
            headers={"Content-Type": "application/json"},
        )
        resp = conn.getresponse()
        data = json.loads(resp.read())
        conn.close()
        return resp.status, data

    def test_healthz(self, server):
        addr, _, _ = server
        status, data = self._req(addr, "GET", "/healthz")
        assert status == 200 and data["ok"] and data["model"] == "fake"
        assert "stats" in data

    def test_search_roundtrip(self, server):
        addr, enc, _ = server
        status, data = self._req(
            addr, "POST", "/search", {"queries": ["foo", "bar"], "k": 4}
        )
        assert status == 200
        assert len(data["results"]) == 2
        assert all(len(r) == 4 for r in data["results"])
        assert {"docid", "score"} <= set(data["results"][0][0])

    def test_bad_requests(self, server):
        addr, _, _ = server
        assert self._req(addr, "POST", "/search", {"queries": []})[0] == 400
        assert self._req(addr, "POST", "/search", {"queries": "notalist"})[0] == 400
        assert self._req(addr, "GET", "/nope")[0] == 404
        assert self._req(addr, "POST", "/nope", {})[0] == 404

    def test_save_requires_snapshot_root(self, server):
        addr, _, _ = server  # fixture service has no snapshot_root
        status, data = self._req(addr, "POST", "/save", {"dir": "x"})
        assert status == 400 and "snapshot_root" in data["error"]

    def test_save_snapshot_roundtrip(self, corpus_index, tmp_path):
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex

        enc, svc = make_service(
            corpus_index, max_wait_s=0.01, snapshot_root=str(tmp_path)
        )
        srv = make_server(svc, port=0)
        t = threading.Thread(target=srv.serve_forever, daemon=True)
        t.start()
        addr = srv.server_address[:2]
        try:
            self._req(
                addr, "POST", "/add",
                {"docs": [{"docid": "snap-doc", "text": "to be persisted"}]},
            )
            status, data = self._req(addr, "POST", "/save", {"dir": "snap"})
            assert status == 200 and data["results"]["saved"]
            re = DenseFlatIndex.load(tmp_path / "snap")
            assert "snap-doc" in set(re.docids)
            # path escape rejected
            status, data = self._req(
                addr, "POST", "/save", {"dir": "../outside"}
            )
            assert status == 400 and "escapes" in data["error"]
            self._req(addr, "POST", "/remove", {"docids": ["snap-doc"]})
        finally:
            srv.shutdown()
            svc.close()

    def test_add_remove_roundtrip(self, server):
        addr, _, svc = server
        before = svc.index.count
        status, data = self._req(
            addr, "POST", "/add",
            {"docs": [{"docid": "http-doc", "text": "added over http"}]},
        )
        assert status == 200 and data["results"]["added"] == 1
        status, data = self._req(
            addr, "POST", "/search", {"queries": ["added over http"], "k": 1}
        )
        assert data["results"][0][0]["docid"] == "http-doc"
        status, data = self._req(
            addr, "POST", "/remove", {"docids": ["http-doc"]}
        )
        assert status == 200 and data["results"]["removed"] == 1
        assert svc.index.count == before
        assert self._req(addr, "POST", "/add", {"docs": []})[0] == 400


class TestWarmup:
    def test_warmup_compiles_every_bucket(self, corpus_index):
        enc, svc = make_service(corpus_index, max_batch=8, default_k=5, max_k=32)
        try:
            out = svc.warmup()
            # default combos: EVERY pow2 batch bucket {1,2,4,8} x the two
            # traffic depth buckets {default_k, max_k}
            assert out["programs"] == 8
            assert out["seconds"] >= 0
            with svc.stats._lock:
                assert svc.stats.batches == 8
            # warmed service still serves correctly
            res = svc.search(["hello"], k=3)
            assert len(res[0]) == 3
        finally:
            svc.close()

    def test_warmup_explicit_combos_clamped(self, corpus_index):
        enc, svc = make_service(corpus_index, max_batch=4, max_k=16)
        try:
            # k above max_k clamps; duplicate batch buckets dedupe
            out = svc.warmup(ks=[50_000], batches=[3, 4])
            assert out["programs"] == 1
        finally:
            svc.close()


class TestReload:
    def test_hot_reload_swaps_the_corpus(self, tmp_path):
        rng = np.random.default_rng(11)
        a = rng.standard_normal((64, 32)).astype(np.float32)
        a /= np.linalg.norm(a, axis=1, keepdims=True)
        b = rng.standard_normal((48, 32)).astype(np.float32)
        b /= np.linalg.norm(b, axis=1, keepdims=True)
        idx_a = DenseFlatIndex.build(a, [f"a{i}" for i in range(64)])
        DenseFlatIndex.build(b, [f"b{i}" for i in range(48)]).save(tmp_path / "snap")

        enc, svc = make_service(idx_a, snapshot_root=str(tmp_path))
        try:
            before = svc.search(["hello"], k=3)
            assert all(r["docid"].startswith("a") for r in before[0])
            out = svc.submit_reload("snap").result()
            assert out == {"reloaded": str(tmp_path / "snap"), "count": 48}
            after = svc.search(["hello"], k=3)
            assert all(r["docid"].startswith("b") for r in after[0])
            # searches keep working and mutations target the new index
            svc.submit_add([{"docid": "x", "text": "fresh doc"}]).result()
            assert svc.index.count == 49
        finally:
            svc.close()

    def test_reload_validations(self, corpus_index, tmp_path):
        enc, svc = make_service(corpus_index, snapshot_root=str(tmp_path))
        try:
            with pytest.raises(ValueError, match="escapes"):
                svc.submit_reload("../outside")
            # dim mismatch rejected via the future
            other = np.eye(8, dtype=np.float32)
            DenseFlatIndex.build(other, [str(i) for i in range(8)]).save(
                tmp_path / "wrongdim")
            with pytest.raises(ValueError, match="dim"):
                svc.submit_reload("wrongdim").result()
        finally:
            svc.close()

    def test_reload_requires_snapshot_root(self, corpus_index):
        enc, svc = make_service(corpus_index)
        try:
            with pytest.raises(ValueError, match="snapshot"):
                svc.submit_reload("anything")
        finally:
            svc.close()
