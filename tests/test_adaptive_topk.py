"""Probed-exact adaptive deep-k: the probed two-level cover with
TRUE unselected-bin-max certificates + escalation tail
(`ops.topk.topk_ip_bins_two_level_probed` / `topk_full_tail_bm`,
`parallel.sharded_topk_ip_adaptive`). The combination must be exact for
EVERY query regardless of certificate rate (SURVEY §2.2 FAISS flat-IP
exactness contract, `onepass_dense_run.py:326`)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.topk import (
    topk_full_tail_bm,
    topk_ip_bins_two_level,
    topk_ip_bins_two_level_probed,
    topk_ip_oracle,
)
from codemix_dense_retrieval_tpu.parallel import make_mesh, shard_rows
from codemix_dense_retrieval_tpu.parallel.sharded_search import (
    sharded_topk_ip,
    sharded_topk_ip_adaptive,
)

from test_topk import _assert_topk_matches


def _clustered_corpus(rng, n, d, b, k, frac_easy=0.5):
    """Half the queries get a planted, contiguous, well-separated top
    block (certificate fires at small probes); the rest are uniform
    (certificate cannot fire)."""
    docs = rng.standard_normal((n, d)).astype(np.float32)
    docs /= np.linalg.norm(docs, axis=1, keepdims=True)
    docs *= 0.1  # background scores ~0.1
    qs = rng.standard_normal((b, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    n_easy = int(b * frac_easy)
    block = 2 * k
    for i in range(n_easy):
        lo = i * block
        # planted rows: strong alignment with query i, contiguous bins
        dirs = qs[i] + 0.05 * rng.standard_normal((block, d)).astype(np.float32)
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        docs[lo : lo + block] = dirs
    return docs, qs, n_easy


class TestProbedSingleDevice:
    def test_probed_plus_tail_is_exact(self, rng):
        n, d, b, k = 4096, 48, 24, 64
        docs, qs, n_easy = _clustered_corpus(rng, n, d, b, k)
        vals, ids, cert, unsel, scores_bm, binmax_bm = (
            topk_ip_bins_two_level_probed(
                jnp.asarray(qs), jnp.asarray(docs), k,
                probe_bins=2 * (k // 8), bin_size=8, tile_n=256,
                interpret=True, keep_scores=True,
            )
        )
        ref_vals, ref_ids = topk_ip_oracle(qs, docs, k)
        cert_np = np.asarray(cert)
        # planted queries certify (uniform ones may or may not — that is
        # a statistical property, not a contract)
        assert cert_np[:n_easy].all()
        # certified rows are ALREADY exact (the certificate's promise)
        _assert_topk_matches(
            np.asarray(vals)[cert_np], np.asarray(ids)[cert_np],
            ref_vals[cert_np], ref_ids[cert_np], "certified rows",
        )
        # escalation tail on the retained scores completes exactness
        bad = np.flatnonzero(~cert_np).astype(np.int32)
        ev, eg = topk_full_tail_bm(
            scores_bm, binmax_bm, jnp.asarray(bad), k, 8, 8
        )
        out_ids = np.asarray(ids).copy()
        out_vals = np.asarray(vals).copy()
        out_ids[bad] = np.asarray(eg)
        out_vals[bad] = np.asarray(ev)
        _assert_topk_matches(out_vals, out_ids, ref_vals, ref_ids, "probed+tail")

    def test_tail_matches_full_two_level(self, rng):
        """topk_full_tail_bm == topk_ip_bins_two_level for selected rows."""
        n, d, b, k = 2048, 32, 16, 50
        docs = rng.standard_normal((n, d)).astype(np.float32)
        qs = rng.standard_normal((b, d)).astype(np.float32)
        _, _, _, _, scores_bm, binmax_bm = topk_ip_bins_two_level_probed(
            jnp.asarray(qs), jnp.asarray(docs), k, probe_bins=k // 8 + 1,
            bin_size=8, tile_n=256, interpret=True, keep_scores=True,
        )
        qsel = np.array([3, 0, 15, 7], np.int32)
        ev, eg = topk_full_tail_bm(scores_bm, binmax_bm, jnp.asarray(qsel), k, 8, 8)
        fv, fi = topk_ip_bins_two_level(
            jnp.asarray(qs), jnp.asarray(docs), k, bin_size=8, tile_n=256,
            interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(eg), np.asarray(fi)[qsel])
        np.testing.assert_allclose(np.asarray(ev), np.asarray(fv)[qsel], rtol=1e-6)

    def test_probe_too_small_raises(self, rng):
        docs = rng.standard_normal((512, 16)).astype(np.float32)
        qs = rng.standard_normal((4, 16)).astype(np.float32)
        with pytest.raises(ValueError, match="cannot hold k"):
            topk_ip_bins_two_level_probed(
                jnp.asarray(qs), jnp.asarray(docs), 64, probe_bins=4,
                bin_size=8, interpret=True,
            )


class TestShardedAdaptive:
    @pytest.fixture(scope="class")
    def mesh(self, eight_cpu_devices):
        return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)

    def test_tail_branch_parity(self, mesh, rng):
        """Mixed workload (some certify -> tail-only escalation branch):
        results bit-match the exact sharded path / oracle."""
        n, d, b, k = 16384, 48, 32, 64
        docs, qs, n_easy = _clustered_corpus(rng, n, d, b, k)
        docs_dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
        vals, gids, stats = sharded_topk_ip_adaptive(
            jnp.asarray(qs), docs_dev, counts, k, mesh=mesh,
            probe_bins=2 * (k // 8), tile_n=256, tile_b=64, interpret=True,
        )
        # THE contract: bit-identical to the exact sharded path
        ev, eg = sharded_topk_ip(
            jnp.asarray(qs), docs_dev, counts, k, mesh=mesh,
            method="bins_two_level", bin_size=8, tile_n=256, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(gids), np.asarray(eg))
        np.testing.assert_array_equal(np.asarray(vals), np.asarray(ev))
        # oracle match modulo 1-ulp accumulation-order near-ties
        ref_vals, ref_ids = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, gids, ref_vals, ref_ids, "adaptive tail branch")
        assert 0.0 < stats["certified_frac"] < 1.0
        assert stats["escalated"] == round((1 - stats["certified_frac"]) * b)

    def test_full_fallback_branch_parity(self, mesh, rng):
        """Uniform data (nothing certifies -> >1/2 escalated -> fixed-cover
        fallback branch): still exact."""
        n, d, b, k = 8192, 32, 16, 40
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        qs = rng.standard_normal((b, d)).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        vals, gids, stats = sharded_topk_ip_adaptive(
            jnp.asarray(qs), *_shard(docs, mesh), k, mesh=mesh,
            probe_bins=k // 8 + 1, tile_n=256, tile_b=64, interpret=True,
        )
        ref_vals, ref_ids = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, gids, ref_vals, ref_ids, "adaptive fallback")
        assert stats["certified_frac"] < 0.5
        assert stats["escalated"] > b // 2

    def test_all_certified_no_escalation(self, mesh, rng):
        """Every query planted -> no escalation work at all."""
        n, d, b, k = 16384, 48, 16, 64
        docs, qs, _ = _clustered_corpus(rng, n, d, b, k, frac_easy=1.0)
        vals, gids, stats = sharded_topk_ip_adaptive(
            jnp.asarray(qs), *_shard(docs, mesh), k, mesh=mesh,
            probe_bins=2 * (k // 8), tile_n=256, tile_b=64, interpret=True,
        )
        ref_vals, ref_ids = topk_ip_oracle(qs, docs, k)
        _assert_topk_matches(vals, gids, ref_vals, ref_ids, "adaptive all-cert")
        assert stats["certified_frac"] == 1.0
        assert "escalated" not in stats

    def test_padding_rows_never_win(self, mesh, rng):
        """All-negative scores: zero pad rows would outrank everything."""
        n, d, b, k = 6000, 32, 8, 32
        docs = -np.abs(rng.standard_normal((n, d)).astype(np.float32))
        qs = np.abs(rng.standard_normal((b, d)).astype(np.float32))
        vals, gids, _ = sharded_topk_ip_adaptive(
            jnp.asarray(qs), *_shard(docs, mesh), k, mesh=mesh,
            probe_bins=k // 8 + 2, tile_n=256, tile_b=64, interpret=True,
        )
        ref_vals, ref_ids = topk_ip_oracle(qs, docs, k)
        np.testing.assert_array_equal(np.asarray(gids), ref_ids)

    def test_int8_rejected(self, mesh, rng):
        docs = rng.integers(-127, 127, (4096, 32)).astype(np.int8)
        qs = rng.standard_normal((4, 32)).astype(np.float32)
        with pytest.raises(NotImplementedError, match="int8"):
            sharded_topk_ip_adaptive(
                jnp.asarray(qs), *_shard(docs, mesh), 16, mesh=mesh,
                interpret=True,
            )


def _shard(docs, mesh):
    dev, counts, _ = shard_rows(docs, mesh, pad_multiple=256)
    return dev, counts


class TestIndexAdaptive:
    """DenseFlatIndex.reorder_rows + search(approx='adaptive')."""

    @pytest.fixture(scope="class")
    def mesh(self, eight_cpu_devices):
        return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)

    def _mk(self, rng, n=6000, d=48, dtype="float32"):
        from codemix_dense_retrieval_tpu.index.flat import DenseFlatIndex

        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        ids = [f"d{i}" for i in range(n)]
        return DenseFlatIndex.build(docs, ids, dtype=dtype), docs

    def test_reorder_preserves_results(self, mesh, rng):
        idx, docs = self._mk(rng)
        qs = rng.standard_normal((12, docs.shape[1])).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        v0, d0 = idx.search(qs, 20)
        perm = idx.reorder_rows(sketch_dim=16, sample=4096)
        assert sorted(perm.tolist()) == list(range(len(docs)))
        v1, d1 = idx.search(qs, 20)
        np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(d1, d0)  # docid remap survives perm

    def test_adaptive_search_matches_exact(self, mesh, rng):
        idx, docs = self._mk(rng)
        qs = rng.standard_normal((16, docs.shape[1])).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        idx.reorder_rows(sketch_dim=16, sample=4096)
        ev, ed = idx.search(qs, 32)
        av, ad = idx.search(qs, 32, approx="adaptive")
        np.testing.assert_array_equal(ad, ed)
        np.testing.assert_allclose(av, ev, rtol=1e-6)
        stats = idx.last_adaptive_stats
        assert stats is not None and 0.0 <= stats["certified_frac"] <= 1.0
        assert idx.last_certified.all()  # adaptive is always exact

    def test_reorder_after_mutation(self, mesh, rng):
        idx, docs = self._mk(rng, n=3000)
        qs = rng.standard_normal((8, docs.shape[1])).astype(np.float32)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        extra = rng.standard_normal((40, docs.shape[1])).astype(np.float32)
        extra /= np.linalg.norm(extra, axis=1, keepdims=True)
        idx.add(extra, [f"x{i}" for i in range(40)])
        idx.remove([f"d{i}" for i in range(10)])
        v0, d0 = idx.search(qs, 16)
        epoch = idx.mutation_epoch
        idx.reorder_rows(sketch_dim=16, sample=2048)
        assert idx.mutation_epoch == epoch + 1
        assert idx.count == 3030
        v1, d1 = idx.search(qs, 16)
        np.testing.assert_allclose(v1, v0, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(d1, d0)

    def test_int8_adaptive_falls_back_exact(self, mesh, rng):
        idx, docs = self._mk(rng, dtype="int8")
        qs = rng.standard_normal((8, docs.shape[1])).astype(np.float32)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        ev, ed = idx.search(qs, 16)
        av, ad = idx.search(qs, 16, approx="adaptive")
        np.testing.assert_array_equal(ad, ed)
        assert idx.last_adaptive_stats is None

    def test_calibrate_adaptive_resolves_probe(self, mesh, rng):
        """calibrate_adaptive remembers the fastest measured probe and
        subsequent adaptive searches apply it (nprobe-analog,
        `index/flat.py calibrate_adaptive`)."""
        idx, docs = self._mk(rng)
        qs = rng.standard_normal((16, docs.shape[1])).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        idx.reorder_rows(sketch_dim=16, sample=4096)
        cal = idx.calibrate_adaptive(qs, 32, iters=1)
        assert cal is not None and cal["probe_bins"] >= 4
        assert idx._adaptive_cal["probe_by_k"][32] == cal["probe_bins"]
        assert cal["speedup"] > 0
        ev, ed = idx.search(qs, 32)
        av, ad = idx.search(qs, 32, approx="adaptive")
        np.testing.assert_array_equal(ad, ed)
        assert idx.last_adaptive_stats["probe_bins"] == cal["probe_bins"]

    def test_guaranteed_routes_through_adaptive(self, mesh, rng):
        """guaranteed mode uses the (always-exact) adaptive tier when the
        calibrated speedup clears ADAPTIVE_ROUTE_MARGIN; below it, the
        sketch/exact routes keep the guarantee."""
        idx, docs = self._mk(rng)
        qs = rng.standard_normal((12, docs.shape[1])).astype(np.float32)
        qs /= np.linalg.norm(qs, axis=1, keepdims=True)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        ev, ed = idx.search(qs, 32)
        idx._adaptive_cal["speedup_by_k"][32] = 2.0  # injected calibration
        idx._adaptive_cal["probe_by_k"][32] = 16
        gv, gd = idx.search(qs, 32, approx="guaranteed")
        np.testing.assert_array_equal(gd, ed)
        np.testing.assert_allclose(gv, ev, rtol=1e-6)
        assert idx.last_guaranteed_route == "adaptive"
        assert idx.last_certified.all()
        idx._adaptive_cal["speedup_by_k"][32] = 0.9  # below the margin
        gv2, gd2 = idx.search(qs, 32, approx="guaranteed")
        np.testing.assert_array_equal(gd2, ed)
        assert idx.last_guaranteed_route in ("sketch", "exact")
        assert idx.last_certified.all()

    def test_adaptive_cal_persists_with_sketch_cache(self, mesh, rng, tmp_path):
        """Adaptive operating points ride the sketch.npz cache across
        restarts (serving restart keeps its guaranteed routing)."""
        from codemix_dense_retrieval_tpu.index.flat import DenseFlatIndex

        n, d = 4096, 48
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)]).save(
            tmp_path / "idx"
        )
        idx = DenseFlatIndex.load(tmp_path / "idx")
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        idx.enable_sketch(sketch_dim=16)
        qs = rng.standard_normal((8, d)).astype(np.float32)
        cal = idx.calibrate_adaptive(qs, 16, iters=1)
        assert (tmp_path / "idx" / "sketch.npz").exists()
        re = DenseFlatIndex.load(tmp_path / "idx")
        re.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        re.enable_sketch(sketch_dim=16)
        assert re._adaptive_cal["probe_by_k"][16] == cal["probe_bins"]
        assert re._adaptive_cal["speedup_by_k"][16] == pytest.approx(
            cal["speedup"], rel=1e-6
        )

    def test_int8_adaptive_keeps_certified_contract(self, mesh, rng):
        """int8 fallback to exact still leaves an all-True certificate
        vector so adaptive serving keeps its response schema."""
        idx, docs = self._mk(rng, dtype="int8")
        qs = rng.standard_normal((8, docs.shape[1])).astype(np.float32)
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        av, ad = idx.search(qs, 16, approx="adaptive")
        assert idx.last_adaptive_stats is None
        assert idx.last_certified is not None and idx.last_certified.all()

    def test_adaptive_cal_persists_without_sketch(self, mesh, rng, tmp_path):
        """calibrate_adaptive persists (and load_adaptive_calibration
        restores) operating points with NO sketch sidecar armed — the
        serve --approx adaptive path (tune --adaptive analog)."""
        from codemix_dense_retrieval_tpu.index.flat import DenseFlatIndex

        n, d = 4096, 48
        docs = rng.standard_normal((n, d)).astype(np.float32)
        docs /= np.linalg.norm(docs, axis=1, keepdims=True)
        DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)]).save(
            tmp_path / "idx"
        )
        idx = DenseFlatIndex.load(tmp_path / "idx")
        idx.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        qs = rng.standard_normal((8, d)).astype(np.float32)
        cal = idx.calibrate_adaptive(qs, 16, iters=1)
        assert (tmp_path / "idx" / "sketch.npz").exists()
        re = DenseFlatIndex.load(tmp_path / "idx")
        re.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        assert re.load_adaptive_calibration()
        assert re._adaptive_cal["probe_by_k"][16] == cal["probe_bins"]
        # enable_sketch over an adaptive-only cache refits the proj but
        # must preserve the adaptive points through its re-save
        re.enable_sketch(sketch_dim=16)
        assert re._adaptive_cal["probe_by_k"][16] == cal["probe_bins"]
        re2 = DenseFlatIndex.load(tmp_path / "idx")
        re2.to_device(mesh, pad_multiple=256, tile_n=256, tile_b=64)
        assert re2.load_adaptive_calibration()
        assert re2._adaptive_cal["probe_by_k"][16] == cal["probe_bins"]
