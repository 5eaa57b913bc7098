"""Sketch (approximate + certified) search: ops/sketch.py.

Soundness contract under test: whenever ``certified[q]`` is True, row q's
(values, indices) must EXACTLY match the f32 oracle — on easy
(anisotropic) data and on adversarially hard (isotropic) data alike.
Recall quality is asserted only on anisotropic data, which is what real
sentence embeddings look like (the reference's own analyzer measures
strong anisotropy: `cm_embedding_space_analysis.py` anisotropy section).
"""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.ops.sketch import (
    fit_sketch,
    sketch_rows,
    topk_ip_sketch,
)
from codemix_dense_retrieval_tpu.ops.topk import topk_ip_oracle

import jax.numpy as jnp


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _anisotropic(rng, n, d, decay=0.03):
    """Rows with exponentially decaying spectrum (sentence-embedding-like)."""
    spectrum = np.exp(-decay * np.arange(d)).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32) * spectrum
    return _normalize(x)


def _run_sketch(queries, docs, ds, k, **kw):
    proj = fit_sketch(docs, ds)
    s, t = sketch_rows(jnp.asarray(docs), jnp.asarray(proj))
    vals, idx, cert = topk_ip_sketch(
        jnp.asarray(queries), jnp.asarray(docs), s, t, jnp.asarray(proj), k, **kw
    )
    return np.asarray(vals), np.asarray(idx), np.asarray(cert), proj


def _assert_certified_exact(vals, idx, cert, queries, docs, k):
    ovals, oidx = topk_ip_oracle(queries, docs, k)
    n_cert = int(cert.sum())
    for q in np.flatnonzero(cert):
        np.testing.assert_array_equal(idx[q], oidx[q], err_msg=f"query {q}")
        np.testing.assert_allclose(vals[q], ovals[q], rtol=2e-3, atol=2e-3)
    return n_cert, oidx


def test_proj_orthonormal():
    rng = np.random.default_rng(0)
    docs = _anisotropic(rng, 2048, 64)
    proj = fit_sketch(docs, 16)
    np.testing.assert_allclose(proj.T @ proj, np.eye(16), atol=1e-5)


def test_tail_norms_bound():
    rng = np.random.default_rng(1)
    docs = _anisotropic(rng, 512, 64)
    proj = fit_sketch(docs, 16)
    s, t = sketch_rows(jnp.asarray(docs), jnp.asarray(proj))
    resid = docs - (np.asarray(s) @ proj.T)
    np.testing.assert_allclose(
        np.asarray(t), np.linalg.norm(resid, axis=1), rtol=1e-3, atol=1e-5
    )


def test_full_dim_sketch_is_exact():
    """ds == d: tails vanish, the cover is the exact two-level cover."""
    rng = np.random.default_rng(2)
    docs = _normalize(rng.standard_normal((3000, 64)).astype(np.float32))
    queries = _normalize(rng.standard_normal((16, 64)).astype(np.float32))
    # probe >= k bins: the exact two-level cover guarantee applies
    vals, idx, cert, _ = _run_sketch(queries, docs, 64, 10, probe_bins=16)
    ovals, oidx = topk_ip_oracle(queries, docs, 10)
    np.testing.assert_array_equal(idx, oidx)
    np.testing.assert_allclose(vals, ovals, rtol=2e-3, atol=2e-3)
    assert cert.all()


def test_anisotropic_recall_and_certificates():
    rng = np.random.default_rng(3)
    docs = _anisotropic(rng, 6000, 128)
    queries = _anisotropic(rng, 32, 128)
    k = 10
    vals, idx, cert, _ = _run_sketch(queries, docs, 32, k, probe_bins=32)
    n_cert, oidx = _assert_certified_exact(vals, idx, cert, queries, docs, k)
    # anisotropic data: the sketch captures most energy -> high recall
    recall = np.mean([len(set(idx[q]) & set(oidx[q])) / k for q in range(len(queries))])
    assert recall >= 0.9, recall


def test_isotropic_certificates_stay_sound():
    """Worst-case (flat-spectrum) data with a tiny sketch: recall may
    crater but certification must never lie."""
    rng = np.random.default_rng(4)
    docs = _normalize(rng.standard_normal((4096, 256)).astype(np.float32))
    queries = _normalize(rng.standard_normal((24, 256)).astype(np.float32))
    k = 10
    vals, idx, cert, _ = _run_sketch(queries, docs, 8, k, expand=2.0)
    _assert_certified_exact(vals, idx, cert, queries, docs, k)
    # with an 8/256 sketch of isotropic data nearly nothing is provable
    assert cert.mean() <= 0.5


def test_probe_bins_monotone_recall():
    rng = np.random.default_rng(5)
    # decay=0.05: ~91% of row energy in the top-24 components — mild
    # compared to real sentence embeddings (BGE-M3 concentrates harder)
    docs = _anisotropic(rng, 4096, 128, decay=0.05)
    queries = _anisotropic(rng, 16, 128, decay=0.05)
    k = 10
    _, oidx = topk_ip_oracle(queries, docs, k)

    def recall(probe_bins):
        _, idx, _, _ = _run_sketch(queries, docs, 24, k, probe_bins=probe_bins)
        return np.mean(
            [len(set(idx[q]) & set(oidx[q])) / k for q in range(len(queries))]
        )

    r_small, r_big = recall(4), recall(64)
    assert r_big >= r_small
    assert r_big >= 0.98, r_big


def test_ragged_rows_and_single_query():
    """Row count not a tile multiple; B=1 (sublane-pad path)."""
    rng = np.random.default_rng(6)
    docs = _anisotropic(rng, 3037, 64)
    queries = _anisotropic(rng, 1, 64)
    vals, idx, cert, _ = _run_sketch(queries, docs, 32, 5, expand=8.0)
    assert idx.shape == (1, 5) and cert.shape == (1,)
    assert (idx < 3037).all()
    _assert_certified_exact(vals, idx, cert, queries, docs, 5)


def test_certificate_soundness_fuzz():
    """Many seeds x regimes: certified => exactly the oracle result.
    This is the sketch tier's load-bearing claim; the fuzz sweeps spectrum
    shapes, sketch widths, probe depths, and bf16/f32 docs."""
    import jax.numpy as jnp

    violations = []
    total_cert = 0
    for seed in range(12):
        rng = np.random.default_rng(1000 + seed)
        decay = [0.0, 0.01, 0.05, 0.2][seed % 4]
        d = [64, 128][seed % 2]
        ds = [8, 16, d // 4][seed % 3]
        n = 2048 + 173 * seed  # ragged row counts
        k = [5, 17, 50][seed % 3]
        probe = [8, 24, 64][(seed // 2) % 3]
        if probe * 8 < k:
            probe = -(-k // 8) + 2
        docs = _anisotropic(rng, n, d, decay=decay) if decay else _normalize(
            rng.standard_normal((n, d)).astype(np.float32)
        )
        queries = docs[rng.choice(n, 16, replace=False)] + 0.05 * rng.standard_normal(
            (16, d)
        ).astype(np.float32)
        queries = _normalize(queries)
        dtype = jnp.bfloat16 if seed % 2 else jnp.float32
        docs_dev = jnp.asarray(docs, dtype)
        docs_eff = np.asarray(docs_dev, np.float32)  # what the kernel scores
        proj = fit_sketch(docs_eff, ds)
        s, t = sketch_rows(docs_dev, jnp.asarray(proj))
        vals, idx, cert = topk_ip_sketch(
            jnp.asarray(queries), docs_dev, s, t, jnp.asarray(proj), k,
            probe_bins=probe,
        )
        idx, cert = np.asarray(idx), np.asarray(cert)
        # contract: queries are rounded to the index dtype before scoring
        # (same as DenseFlatIndex.search), so "exact" means exact top-k of
        # round(q) . round(d) — the operands the score kernels actually see
        queries_eff = np.asarray(jnp.asarray(queries, dtype), np.float32)
        _, oidx = topk_ip_oracle(queries_eff, docs_eff, k)
        total_cert += int(cert.sum())
        for q in np.flatnonzero(cert):
            if not np.array_equal(idx[q], oidx[q]):
                violations.append((seed, int(q)))
    assert not violations, violations
    assert total_cert > 0  # the fuzz must actually exercise certificates


def test_too_few_probe_bins_raises():
    rng = np.random.default_rng(7)
    docs = _anisotropic(rng, 2048, 64)
    queries = _anisotropic(rng, 8, 64)
    with pytest.raises(ValueError, match="too few candidates"):
        _run_sketch(queries, docs, 16, 64, probe_bins=2)


# --------------------------------------------------------------------------
# sharded + index-level integration (virtual 8-CPU mesh)
# --------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mesh(eight_cpu_devices):
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    return make_mesh(shard=8, tp=1, devices=eight_cpu_devices)


def test_sharded_sketch_certified_matches_oracle(mesh):
    import jax
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.parallel import shard_rows
    from codemix_dense_retrieval_tpu.parallel.sharded_search import (
        sharded_topk_ip_sketch,
    )

    rng = np.random.default_rng(10)
    n, d, ds, b, k = 6000, 64, 24, 16, 10
    docs = _anisotropic(rng, n, d, decay=0.05)
    queries = _anisotropic(rng, b, d, decay=0.05)
    proj = jnp.asarray(fit_sketch(docs, ds))
    docs_dev, counts, rows_per_shard = shard_rows(docs, mesh, pad_multiple=256)
    sk, tails = jax.jit(sketch_rows)(docs_dev, proj)
    assert sk.shape[0] == docs_dev.shape[0]
    vals, gids, cert = sharded_topk_ip_sketch(
        jnp.asarray(queries), docs_dev, counts, sk, tails, proj, k,
        mesh=mesh, probe_bins=32, tile_n=256,
    )
    vals, gids, cert = np.asarray(vals), np.asarray(gids), np.asarray(cert)
    n_cert, oidx = _assert_certified_exact(vals, gids, cert, queries, docs, k)
    recall = np.mean([len(set(gids[q]) & set(oidx[q])) / k for q in range(b)])
    assert recall >= 0.9, recall


def test_index_approx_search(tmp_path, mesh):
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(11)
    n, d, k = 5000, 64, 10
    docs = _anisotropic(rng, n, d, decay=0.05)
    queries = _anisotropic(rng, 8, d, decay=0.05)
    ids = [f"d{i}" for i in range(n)]
    idx = DenseFlatIndex.build(docs, ids, dtype="bfloat16", lang="en")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=24, probe_bins=48)
    # sketch search path needs tile_n-compatible shards on the tiny mesh
    vals, docids = idx.search(queries, k, approx=True)
    assert idx.last_certified is not None and idx.last_certified.shape == (8,)
    evals, edocids = idx.search(queries, k)
    assert idx.last_certified is None
    for q in range(8):
        hit = len(set(docids[q]) & set(edocids[q])) / k
        assert hit >= 0.8, (q, hit)


def test_index_calibrate_sketch(mesh):
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(20)
    n, d, k = 5000, 64, 10
    docs = _anisotropic(rng, n, d, decay=0.05)
    queries = _anisotropic(rng, 64, d, decay=0.05)
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)], dtype="bfloat16")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=24)
    out = idx.calibrate_sketch(queries, k, recall_target=0.95)
    assert out["recall"] >= 0.95
    assert idx._sketch[3]["probe_by_k"][k] == out["probe_bins"]
    # subsequent approx searches use the calibrated probe depth
    _, ids = idx.search(queries, k, return_docids=False, approx=True)
    _, eids = idx.search(queries, k, return_docids=False)
    recall = np.mean([len(set(ids[q]) & set(eids[q])) / k for q in range(len(ids))])
    assert recall >= 0.95


def test_index_guaranteed_mode_is_exact(mesh):
    """Worst-case isotropic data with a thin probe: guaranteed mode must
    still return EXACTLY the exact-search results (escalation path)."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(21)
    n, d, k = 4096, 64, 10
    docs = _normalize(rng.standard_normal((n, d)).astype(np.float32))
    queries = _normalize(rng.standard_normal((16, d)).astype(np.float32))
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)], dtype="bfloat16")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=8, probe_bins=8)
    vals, ids = idx.search(queries, k, return_docids=False, approx="guaranteed")
    assert idx.last_certified.all()
    evals, eids = idx.search(queries, k, return_docids=False)
    np.testing.assert_array_equal(ids, eids)
    np.testing.assert_allclose(vals, evals, rtol=1e-5, atol=1e-5)


def test_index_search_rejects_bad_approx_value(mesh):
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(22)
    docs = _anisotropic(rng, 1024, 32)
    idx = DenseFlatIndex.build(docs, [str(i) for i in range(1024)])
    idx.to_device(mesh, pad_multiple=256)
    with pytest.raises(ValueError, match="guaranteed"):
        idx.search(docs[:4], 5, approx="yes-please")


def test_sketch_cache_roundtrip(tmp_path, mesh):
    """Projection + calibrated operating points persist in the index dir
    and are reloaded (no refit) by a fresh process's enable_sketch."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(40)
    n, d, k = 4096, 64, 10
    docs = _anisotropic(rng, n, d, decay=0.05)
    queries = _anisotropic(rng, 32, d, decay=0.05)
    DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)], dtype="bfloat16").save(
        tmp_path / "idx"
    )
    idx = DenseFlatIndex.load(tmp_path / "idx")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=24)
    out = idx.calibrate_sketch(queries, k, recall_target=0.9)
    assert (tmp_path / "idx" / "sketch.npz").exists()

    re = DenseFlatIndex.load(tmp_path / "idx")
    re.to_device(mesh, pad_multiple=256)
    import codemix_dense_retrieval_tpu.ops.sketch as sketch_mod

    orig_fit = sketch_mod.fit_sketch
    try:
        sketch_mod.fit_sketch = lambda *a, **kw: (_ for _ in ()).throw(
            AssertionError("refit should not happen on cache hit")
        )
        re.enable_sketch(sketch_dim=24)
    finally:
        sketch_mod.fit_sketch = orig_fit
    assert re._sketch[3]["probe_by_k"][k] == out["probe_bins"]
    np.testing.assert_array_equal(
        np.asarray(re._sketch[2]), np.asarray(idx._sketch[2])
    )

    # a mutated (different-count) store invalidates the cache
    re.add(_anisotropic(rng, 4, d), [f"x{i}" for i in range(4)])
    re.save(tmp_path / "idx2")
    re2 = DenseFlatIndex.load(tmp_path / "idx2")
    re2.to_device(mesh, pad_multiple=256)
    re2.enable_sketch(sketch_dim=24)  # no cache file there at all: refits
    assert re2._sketch[3]["probe_by_k"] == {}


def test_vector_mix_runner_guaranteed_identical_trec(tmp_path, mesh):
    """--approx guaranteed contract: run files byte-identical to exact."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.pipeline.runs import run_vector_mix_search

    rng = np.random.default_rng(30)
    n, d = 4096, 64
    docs = _anisotropic(rng, n, d, decay=0.05)
    qa = _anisotropic(rng, 12, d, decay=0.05)
    qb = _anisotropic(rng, 12, d, decay=0.05)
    qids = [f"q{i}" for i in range(12)]
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)], dtype="bfloat16")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=16, probe_bins=16)
    exact = run_vector_mix_search(
        idx, qids, qa, qb, [0.5], tmp_path / "exact", k=10, write_meta=True
    )
    grt = run_vector_mix_search(
        idx, qids, qa, qb, [0.5], tmp_path / "grt", k=10,
        approx="guaranteed", write_meta=True
    )
    assert exact[0.5].read_text() == grt[0.5].read_text()
    import json

    meta = json.loads((tmp_path / "grt" / "cm-alpha-0.5_meta.json").read_text())
    assert meta["approx"] == "guaranteed" and meta["certified_frac"] == 1.0


def test_bilingual_vector_mix_guaranteed_identical(tmp_path, mesh):
    """Bilingual hub + --approx guaranteed: collapsed runs byte-identical."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex
    from codemix_dense_retrieval_tpu.pipeline.bilingual import (
        run_bilingual_vector_mix,
    )

    rng = np.random.default_rng(31)
    n, d = 2048, 64
    docs = _anisotropic(rng, n, d, decay=0.05)
    a = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)], lang="en")
    b = DenseFlatIndex.build(docs[::-1], [f"d{i}" for i in range(n)], lang="zh")
    hub = DenseFlatIndex.merged([a, b], lang_tags=["en", "zh"])
    hub.to_device(mesh, pad_multiple=256)
    hub.enable_sketch(sketch_dim=16, probe_bins=32)
    qa = _anisotropic(rng, 8, d, decay=0.05)
    qb = _anisotropic(rng, 8, d, decay=0.05)
    qids = [f"q{i}" for i in range(8)]
    exact = run_bilingual_vector_mix(
        hub, qids, qa, qb, [0.5], tmp_path / "exact", k=20
    )
    grt = run_bilingual_vector_mix(
        hub, qids, qa, qb, [0.5], tmp_path / "grt", k=20, approx="guaranteed"
    )
    assert exact[0.5].read_text() == grt[0.5].read_text()


def test_index_approx_query_block_equivalence(mesh):
    """approx search through ragged query blocks == one dispatch (results
    and certificates both; pad rows never leak)."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(33)
    n, d, k = 4096, 64, 10
    docs = _anisotropic(rng, n, d, decay=0.05)
    queries = _anisotropic(rng, 21, d, decay=0.05)  # ragged vs block=8
    idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)])
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=24, probe_bins=32)
    v1, i1 = idx.search(queries, k, return_docids=False, approx=True)
    c1 = idx.last_certified.copy()
    v2, i2 = idx.search(queries, k, return_docids=False, approx=True,
                        query_block=8)
    c2 = idx.last_certified
    assert c1.shape == c2.shape == (21,)
    np.testing.assert_array_equal(i1, i2)
    np.testing.assert_allclose(v1, v2, rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(c1, c2)


def test_index_sketch_int8_supported(tmp_path, mesh):
    """int8 indexes get the sketch tier too (certificates prove parity
    with the int8 exact path — full coverage in test_sketch_int8.py)."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(12)
    docs = _anisotropic(rng, 1024, 32)
    idx = DenseFlatIndex.build(docs, [str(i) for i in range(1024)], dtype="int8")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=8, cache=False)
    q = _anisotropic(rng, 6, 32)
    ev, ei = idx.search(q, 5, return_docids=False)
    gv, gi = idx.search(q, 5, return_docids=False, approx="guaranteed")
    np.testing.assert_array_equal(gi, ei)


def test_rescore_budget_chunking_parity(monkeypatch):
    """A tiny _RESCORE_BUDGET forces the lax.map query-chunked rescore;
    results (values, ids, certificates) must be identical to the
    unchunked path — the OOM guard (bench_logs/r4s3/guaranteed_quick:
    calibration pushed probe to 416 bins and the one-shot gather+rescore
    exceeded HBM) must be a pure memory transform."""
    from codemix_dense_retrieval_tpu.ops import topk as topk_mod

    rng = np.random.default_rng(77)
    docs = _anisotropic(rng, 4096, 64)
    queries = _anisotropic(rng, 32, 64)
    k = 10
    ref = _run_sketch(queries, docs, 16, k, probe_bins=64)
    assert topk_mod._rescore_chunk(32, 64, 8, 64, 4) == 32  # unchunked
    monkeypatch.setattr(topk_mod, "_RESCORE_BUDGET", 1 << 20)
    assert topk_mod._rescore_chunk(32, 64, 8, 64, 4) < 32  # now chunked
    chunked = _run_sketch(queries, docs, 16, k, probe_bins=64)
    np.testing.assert_array_equal(chunked[1], ref[1])
    np.testing.assert_allclose(chunked[0], ref[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(chunked[2], ref[2])


def test_rescore_chunk_divides_batch():
    from codemix_dense_retrieval_tpu.ops.topk import _rescore_chunk

    for b in (1, 3, 8, 24, 1024):
        for kb in (4, 416):
            c = _rescore_chunk(b, kb, 8, 1024, 2)
            assert 1 <= c <= b and b % c == 0


def test_calibrate_refine_tightens_probe(mesh):
    """Binary refine returns a probe no larger than the raw doubling
    sweep's (refine_steps=0), still meeting the recall target, and the
    stored operating point matches the report."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(91)
    n, d, k = 8192, 64, 10
    docs = _anisotropic(rng, n, d, decay=0.02)
    queries = _anisotropic(rng, 64, d, decay=0.02)

    def calibrated(steps):
        idx = DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)])
        idx.to_device(mesh, pad_multiple=256)
        idx.enable_sketch(sketch_dim=16, cache=False)
        out = idx.calibrate_sketch(
            queries, k, recall_target=0.95, refine_steps=steps
        )
        assert out["recall"] >= 0.95
        assert idx._sketch[3]["probe_by_k"][k] == out["probe_bins"]
        return out

    coarse = calibrated(0)
    refined = calibrated(3)
    assert refined["probe_bins"] <= coarse["probe_bins"]


def test_guaranteed_cert_floor_routes_exact(mesh, tmp_path):
    """When calibration measures a near-zero certificate rate, guaranteed
    mode skips the sketch pass and runs exact directly — identical
    results, all-True certificates, and the route is introspectable. The
    persisted cert_by_k survives a reload."""
    from codemix_dense_retrieval_tpu.index import DenseFlatIndex

    rng = np.random.default_rng(95)
    n, d, k = 4096, 128, 10
    # isotropic data + thin sketch: nothing certifies
    docs = _normalize(rng.standard_normal((n, d)).astype(np.float32))
    queries = _normalize(rng.standard_normal((16, d)).astype(np.float32))
    DenseFlatIndex.build(docs, [f"d{i}" for i in range(n)]).save(tmp_path / "i")
    idx = DenseFlatIndex.load(tmp_path / "i")
    idx.to_device(mesh, pad_multiple=256)
    idx.enable_sketch(sketch_dim=8)
    out = idx.calibrate_sketch(queries, k, recall_target=0.5)
    assert out["certified_frac"] < 0.05
    ev, ei = idx.search(queries, k, return_docids=False)
    gv, gi = idx.search(queries, k, return_docids=False, approx="guaranteed")
    assert idx.last_guaranteed_direct
    assert idx.last_certified.all()
    np.testing.assert_array_equal(gi, ei)
    np.testing.assert_allclose(gv, ev, rtol=1e-6, atol=1e-6)
    # reload: the calibrated cert rate persisted, the route stays direct
    re = DenseFlatIndex.load(tmp_path / "i")
    re.to_device(mesh, pad_multiple=256)
    re.enable_sketch(sketch_dim=8)
    assert re._sketch[3]["cert_by_k"].get(k) == pytest.approx(
        out["certified_frac"]
    )
    re.search(queries, k, return_docids=False, approx="guaranteed")
    assert re.last_guaranteed_direct
