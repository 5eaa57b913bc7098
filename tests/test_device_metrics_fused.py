"""On-device metrics vs host evaluator oracle, and the fused alpha sweep."""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.evals import metrics as host_metrics
from codemix_dense_retrieval_tpu.evals.device_metrics import build_rel_matrix, topk_metrics
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle
from codemix_dense_retrieval_tpu.parallel import make_mesh, shard_rows
from codemix_dense_retrieval_tpu.pipeline.fused import fused_alpha_sweep


class TestDeviceMetricsOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_host_evaluator_binary(self, seed):
        """Device metrics over a top-k ranking must equal the host
        trec_eval-compatible evaluator on binary qrels."""
        rng = np.random.default_rng(seed)
        b, n, k = 12, 300, 50
        scores = rng.standard_normal((b, n))
        topk = np.argsort(-scores, axis=1)[:, :k].astype(np.int32)
        rel_rows = []
        qrels = {}
        run = {}
        for i in range(b):
            rels = rng.choice(n, size=rng.integers(1, 6), replace=False)
            rel_rows.append(rels.tolist())
            qrels[f"q{i}"] = {f"d{j}": 1 for j in rels}
            run[f"q{i}"] = [(f"d{j}", float(scores[i, j])) for j in topk[i]]
        rel_mat = build_rel_matrix(rel_rows)
        got = {k2: float(v) for k2, v in topk_metrics(
            jnp.asarray(topk), jnp.asarray(rel_mat)).items()}

        measures = host_metrics.parse_measures(
            ["MRR@1", "MRR@5", "MRR@10", "MRR@100", "P@5", "P@10",
             "Recall@5", "Recall@10", "Recall@100", "nDCG@5", "nDCG@10", "nDCG@100"]
        )
        agg = host_metrics.aggregate(measures, qrels, run)
        for name, val in agg.items():
            if name in got:
                assert got[name] == pytest.approx(val, abs=1e-6), name

    def test_ap_matches_host_when_k_covers_run(self):
        rng = np.random.default_rng(3)
        b, n = 6, 100
        scores = rng.standard_normal((b, n))
        order = np.argsort(-scores, axis=1).astype(np.int32)  # full ranking
        rel_rows, qrels, run = [], {}, {}
        for i in range(b):
            rels = rng.choice(n, size=4, replace=False)
            rel_rows.append(rels.tolist())
            qrels[f"q{i}"] = {f"d{j}": 1 for j in rels}
            run[f"q{i}"] = [(f"d{j}", float(scores[i, j])) for j in range(n)]
        got = topk_metrics(jnp.asarray(order), jnp.asarray(build_rel_matrix(rel_rows)))
        agg = host_metrics.aggregate(host_metrics.parse_measures(["AP"]), qrels, run)
        assert float(got["AP"]) == pytest.approx(agg["AP"], abs=1e-6)

    def test_no_relevant_query_scores_zero(self):
        topk = jnp.asarray([[0, 1, 2]], jnp.int32)
        rel = jnp.asarray([[-1, -1]], jnp.int32)
        m = topk_metrics(topk, rel, cutoffs=(3,))
        assert float(m["RR@3"]) == 0.0
        assert float(m["nDCG@3"]) == 0.0
        assert float(m["AP"]) == 0.0


class TestFusedSweep:
    def test_fused_sweep_end_to_end(self, rng, eight_cpu_devices):
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 2000, 32, 16, 20
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        # secondary queries = their relevant docs; primary = random noise
        rel = rng.choice(n, size=b, replace=False)
        secondary = docs[rel]
        primary = rng.standard_normal((b, d)).astype(np.float32)
        primary /= np.linalg.norm(primary, axis=1, keepdims=True)
        docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
        rel_mat = build_rel_matrix([[int(r)] for r in rel])

        alphas = [0.0, 0.5, 1.0]
        vals, ids, metrics, _cert = fused_alpha_sweep(
            primary, secondary, alphas, docs_dev, counts, k, mesh=mesh,
            rel_ids=rel_mat,
            search_kwargs=dict(method="bins_xla", bin_size=64, tile_n=256),
        )
        assert vals.shape == (3, b, k) and ids.shape == (3, b, k)
        mrr = np.asarray(metrics["RR@10"])
        assert mrr[2] == pytest.approx(1.0)  # alpha=1: query == rel doc
        assert mrr[1] >= mrr[0]  # interior at least as good as noise endpoint

        # per-alpha ids must equal the oracle on the same mixed queries
        from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm

        q05 = np.asarray(mix_and_renorm(jnp.asarray(primary), jnp.asarray(secondary), 0.5))
        _, ref_idx = topk_ip_oracle(q05, docs, k)
        np.testing.assert_array_equal(np.asarray(ids)[1], ref_idx)


class TestFusedBilingualCollapse:
    def test_fused_sweep_with_collapse(self, rng, eight_cpu_devices):
        """Parallel bilingual hub: same docs in two 'languages', fused sweep
        collapses on-device; alpha=1 query == its relevant doc -> MRR 100."""
        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n1, d, b, k = 800, 32, 8, 20
        docs_a = rng.standard_normal((n1, d)).astype(np.float32)
        docs_a /= np.linalg.norm(docs_a, axis=1, keepdims=True)
        # second language = rotated copies (distinct but related vectors)
        rot = np.linalg.qr(rng.standard_normal((d, d)))[0].astype(np.float32)
        docs_b = docs_a @ rot
        hub = np.concatenate([docs_a, docs_b], axis=0)

        rel = rng.choice(n1, size=b, replace=False)
        secondary = docs_a[rel]
        primary = rng.standard_normal((b, d)).astype(np.float32)
        primary /= np.linalg.norm(primary, axis=1, keepdims=True)

        docs_dev, counts, _ = shard_rows(hub, mesh, pad_multiple=256)
        rel_mat = build_rel_matrix([[int(r)] for r in rel])  # BASE ids
        vals, ids, metrics, _cert = fused_alpha_sweep(
            primary, secondary, [0.0, 1.0], docs_dev, counts, k, mesh=mesh,
            rel_ids=rel_mat, collapse_n_first=n1,
            search_kwargs=dict(method="bins_xla", bin_size=32, tile_n=256),
        )
        assert ids.shape == (2, b, k)
        ids_np = np.asarray(ids)
        valid = ids_np[ids_np >= 0]
        assert valid.max() < n1  # all base ids after collapse
        assert float(np.asarray(metrics["RR@10"])[1]) == pytest.approx(1.0)


def test_fused_sweep_int8_index(rng, eight_cpu_devices):
    """Fused sweep over an int8 quantized index: queries must be properly
    quantized (not float->int8 truncated)."""
    from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
    from codemix_dense_retrieval_tpu.parallel.sharded_search import shard_row_sidecar

    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    n, d, b, k = 1500, 32, 6, 20
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    rel = rng.choice(n, size=b, replace=False)
    secondary = docs[rel]
    primary = rng.standard_normal((b, d)).astype(np.float32)
    primary /= np.linalg.norm(primary, axis=1, keepdims=True)

    dv, ds = quantize_rows_np(docs)
    docs_dev, counts, rps = shard_rows(dv, mesh, pad_multiple=256)
    scales_dev = shard_row_sidecar(ds, mesh, rps)
    rel_mat = build_rel_matrix([[int(r)] for r in rel])
    vals, ids, metrics, _cert = fused_alpha_sweep(
        primary, secondary, [1.0], docs_dev, counts, k, mesh=mesh,
        rel_ids=rel_mat,
        search_kwargs=dict(method="bins_xla", bin_size=32, tile_n=256,
                           doc_scales=scales_dev),
    )
    # quantization keeps self-retrieval at rank ~1
    assert float(np.asarray(metrics["RR@10"])[0]) > 0.9


class TestAggregationParity:
    def test_unjudged_and_run_absent_queries_match_host(self):
        """Host aggregate() means over QRELS queries: run queries with no
        qrels must not deflate the mean, and qrels queries missing from
        the run must count as zeros (extra_zero_queries)."""
        rng = np.random.default_rng(7)
        b, n, k = 10, 200, 25
        scores = rng.standard_normal((b, n))
        topk = np.argsort(-scores, axis=1)[:, :k].astype(np.int32)
        rel_rows, qrels, run = [], {}, {}
        for i in range(b):
            run[f"q{i}"] = [(f"d{j}", float(scores[i, j])) for j in topk[i]]
            if i < 6:  # only 6 of 10 run queries are judged
                rels = rng.choice(n, size=3, replace=False)
                rel_rows.append(rels.tolist())
                qrels[f"q{i}"] = {f"d{j}": 1 for j in rels}
            else:
                rel_rows.append([])
        # 2 qrels queries absent from the run entirely
        for extra in ("qx1", "qx2"):
            qrels[extra] = {f"d{j}": 1 for j in rng.choice(n, 3, replace=False)}

        got = topk_metrics(
            jnp.asarray(topk), jnp.asarray(build_rel_matrix(rel_rows)),
            extra_zero_queries=2,
        )
        measures = host_metrics.parse_measures(
            ["MRR@10", "Recall@10", "nDCG@10", "P@10", "AP"]
        )
        agg = host_metrics.aggregate(measures, qrels, run)
        for name, val in agg.items():
            if name in {k2 for k2 in got}:
                assert float(got[name]) == pytest.approx(val, abs=1e-6), name

    def test_ndcg_ideal_horizon_beyond_k(self):
        """num_rel > k with cutoff > k: the ideal DCG must sum
        min(num_rel, c) discounts, not stop at the k retrieved."""
        rng = np.random.default_rng(11)
        b, n, k = 4, 300, 10
        scores = rng.standard_normal((b, n))
        topk = np.argsort(-scores, axis=1)[:, :k].astype(np.int32)
        rel_rows, qrels, run = [], {}, {}
        for i in range(b):
            rels = rng.choice(n, size=20, replace=False)  # 20 rels >> k=10
            rel_rows.append(rels.tolist())
            qrels[f"q{i}"] = {f"d{j}": 1 for j in rels}
            run[f"q{i}"] = [(f"d{j}", float(scores[i, j])) for j in topk[i]]
        got = topk_metrics(
            jnp.asarray(topk), jnp.asarray(build_rel_matrix(rel_rows)),
            cutoffs=(10, 100),
        )
        agg = host_metrics.aggregate(
            host_metrics.parse_measures(["nDCG@10", "nDCG@100"]), qrels, run
        )
        assert float(got["nDCG@10"]) == pytest.approx(agg["nDCG@10"], abs=1e-6)
        assert float(got["nDCG@100"]) == pytest.approx(agg["nDCG@100"], abs=1e-6)


class TestFusedDepthClampAndCache:
    def test_small_hub_clamps_with_warning(self, rng, eight_cpu_devices, caplog):
        """k_raw beyond the shard capacity must degrade with the flat.py
        clamp warning, not a ValueError from the sharded kernel (which the
        CLI would misreport as a non-parallel hub)."""
        import logging

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n1, d, b = 96, 16, 4  # hub 192 rows -> 24 rows/shard
        docs_a = rng.standard_normal((n1, d)).astype(np.float32)
        hub = np.concatenate([docs_a, docs_a], axis=0)
        docs_dev, counts, _ = shard_rows(hub, mesh, pad_multiple=8)
        q = rng.standard_normal((b, d)).astype(np.float32)
        with caplog.at_level(logging.WARNING):
            vals, ids, _, _cert = fused_alpha_sweep(
                q, q, [0.5], docs_dev, counts, 60,  # k_raw=120 > 24
                mesh=mesh, collapse_n_first=n1,
                search_kwargs=dict(method="bins_xla", bin_size=8, tile_n=8),
            )
        assert any("clamped" in r.message for r in caplog.records)
        assert ids.shape[2] <= 24

    def test_sweep_program_reused_across_calls(self, rng, eight_cpu_devices):
        """Same static config twice -> the cached jitted sweep is reused
        (no per-call rebuild/recompile)."""
        from codemix_dense_retrieval_tpu.pipeline.fused import _build_sweep

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 256, 16, 4, 10
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=32)
        q1 = rng.standard_normal((b, d)).astype(np.float32)
        q2 = rng.standard_normal((b, d)).astype(np.float32)
        kwargs = dict(method="bins_xla", bin_size=8, tile_n=32)
        before = _build_sweep.cache_info().hits
        fused_alpha_sweep(q1, q1, [0.0, 1.0], docs_dev, counts, k,
                          mesh=mesh, search_kwargs=kwargs)
        fused_alpha_sweep(q2, q2, [0.0, 1.0], docs_dev, counts, k,
                          mesh=mesh, search_kwargs=kwargs)
        assert _build_sweep.cache_info().hits > before


class TestFusedSketchSweep:
    def _aniso(self, rng, n, d, decay=0.05):
        spec = np.exp(-decay * np.arange(d)).astype(np.float32)
        x = rng.standard_normal((n, d)).astype(np.float32) * spec
        return x / np.linalg.norm(x, axis=1, keepdims=True)

    def test_fused_sketch_matches_unfused_approx(self, rng, eight_cpu_devices):
        """--fused --approx fast: the in-sweep sketch search must produce
        the same per-alpha results and certificates as the unfused
        DenseFlatIndex.search(approx=True) at the same probe setting."""
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex
        from codemix_dense_retrieval_tpu.parallel import make_mesh

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 2048, 64, 16, 10
        docs = self._aniso(rng, n, d)
        idx = DenseFlatIndex.build(docs, [str(i) for i in range(n)])
        idx.to_device(mesh, pad_multiple=256)
        idx.enable_sketch(sketch_dim=16, cache=False)

        primary = self._aniso(rng, b, d)
        secondary = self._aniso(rng, b, d)
        alphas = [0.0, 0.5, 1.0]
        vals, ids, _, cert = fused_alpha_sweep(
            primary, secondary, alphas, idx._docs_dev, idx._counts_dev, k,
            mesh=mesh, search_kwargs=idx.search_kwargs, sketch=idx._sketch,
        )
        assert cert is not None and cert.shape == (3, b)
        from codemix_dense_retrieval_tpu.ops.mix import mix_and_renorm

        for ai, alpha in enumerate(alphas):
            q = np.asarray(mix_and_renorm(
                jnp.asarray(primary), jnp.asarray(secondary), alpha))
            uv, ui = idx.search(q, k, return_docids=False, approx=True)
            np.testing.assert_array_equal(np.asarray(ids)[ai], ui, err_msg=str(alpha))
            np.testing.assert_allclose(np.asarray(vals)[ai], uv, rtol=1e-5, atol=1e-5)
            np.testing.assert_array_equal(
                np.asarray(cert)[ai], idx.last_certified, err_msg=str(alpha))

    def test_fused_sketch_certified_rows_exact(self, rng, eight_cpu_devices):
        """Certified rows of the fused sketch sweep equal the exact fused
        sweep bit-for-bit (incl. through the bilingual collapse)."""
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex
        from codemix_dense_retrieval_tpu.parallel import make_mesh

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 1024, 64, 8, 5
        docs = self._aniso(rng, n, d)
        hub = np.concatenate([docs, docs * 0.9 + 0.01 / np.sqrt(d)])
        hub /= np.linalg.norm(hub, axis=1, keepdims=True)
        idx = DenseFlatIndex.build(hub, [str(i) for i in range(2 * n)])
        idx.to_device(mesh, pad_multiple=256)
        idx.enable_sketch(sketch_dim=16, cache=False)
        primary = self._aniso(rng, b, d)
        secondary = self._aniso(rng, b, d)
        alphas = [0.25, 0.75]
        ev, ei, _, _ = fused_alpha_sweep(
            primary, secondary, alphas, idx._docs_dev, idx._counts_dev, k,
            mesh=mesh, search_kwargs=idx.search_kwargs, collapse_n_first=n,
        )
        av, ai_, _, cert = fused_alpha_sweep(
            primary, secondary, alphas, idx._docs_dev, idx._counts_dev, k,
            mesh=mesh, search_kwargs=idx.search_kwargs, collapse_n_first=n,
            sketch=idx._sketch,
        )
        cert_np = np.asarray(cert)
        for a in range(len(alphas)):
            for q in np.flatnonzero(cert_np[a]):
                np.testing.assert_array_equal(
                    np.asarray(ai_)[a, q], np.asarray(ei)[a, q],
                    err_msg=f"alpha {a} query {q}")

    def test_fused_sketch_honors_nondefault_expand(self, rng, eight_cpu_devices):
        """The fused path resolves probe depth exactly like the unfused
        search — including the index's configured expand factor."""
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex
        from codemix_dense_retrieval_tpu.parallel import make_mesh

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 2048, 64, 8, 10
        docs = self._aniso(rng, n, d)
        idx = DenseFlatIndex.build(docs, [str(i) for i in range(n)])
        idx.to_device(mesh, pad_multiple=256)
        idx.enable_sketch(sketch_dim=16, expand=8.0, cache=False)
        primary = self._aniso(rng, b, d)
        vals, ids, _, cert = fused_alpha_sweep(
            primary, primary, [0.0], idx._docs_dev, idx._counts_dev, k,
            mesh=mesh, search_kwargs=idx.search_kwargs, sketch=idx._sketch,
        )
        uv, ui = idx.search(primary, k, return_docids=False, approx=True)
        np.testing.assert_array_equal(np.asarray(ids)[0], ui)
        np.testing.assert_array_equal(np.asarray(cert)[0], idx.last_certified)

    @pytest.mark.parametrize("collapse", [False, True])
    def test_fused_guaranteed_matches_exact_sweep_exactly(
        self, rng, eight_cpu_devices, collapse
    ):
        """--fused --approx guaranteed: sketch sweep + exact escalation
        must be BYTE-identical to the exact fused sweep (vals, ids, and
        recomputed metrics), in both mono and collapsed-hub modes."""
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex
        from codemix_dense_retrieval_tpu.parallel import make_mesh
        from codemix_dense_retrieval_tpu.pipeline.fused import (
            fused_alpha_sweep_guaranteed,
        )

        mesh = make_mesh(shard=8, devices=eight_cpu_devices)
        n, d, b, k = 1024, 64, 12, 6
        docs = self._aniso(rng, n, d)
        if collapse:
            hub = np.concatenate([docs, docs * 0.9 + 0.01 / np.sqrt(d)])
            hub /= np.linalg.norm(hub, axis=1, keepdims=True)
            idx = DenseFlatIndex.build(hub, [str(i) for i in range(2 * n)])
            n_first = n
        else:
            idx = DenseFlatIndex.build(docs, [str(i) for i in range(n)])
            n_first = None
        idx.to_device(mesh, pad_multiple=256)
        idx.enable_sketch(sketch_dim=16, cache=False)
        primary = self._aniso(rng, b, d)
        secondary = self._aniso(rng, b, d)
        rel = np.arange(b)[:, None].astype(np.int32)
        alphas = [0.0, 0.5, 1.0]
        common = dict(
            mesh=mesh, rel_ids=rel, search_kwargs=idx.search_kwargs,
            collapse_n_first=n_first,
        )
        ev, ei, em, _ = fused_alpha_sweep(
            primary, secondary, alphas, idx._docs_dev, idx._counts_dev, k,
            **common)
        gv, gi, gm, cert = fused_alpha_sweep_guaranteed(
            primary, secondary, alphas, idx._docs_dev, idx._counts_dev, k,
            sketch=idx._sketch, **common)
        # some escalation must actually have happened for this to be a
        # meaningful test (tiny ds keeps certificates imperfect)
        assert not np.asarray(cert).all()
        np.testing.assert_array_equal(gi, np.asarray(ei))
        np.testing.assert_array_equal(gv, np.asarray(ev))
        for name in gm:
            np.testing.assert_allclose(
                gm[name], np.asarray(em[name], np.float32), rtol=1e-6,
                err_msg=name)
