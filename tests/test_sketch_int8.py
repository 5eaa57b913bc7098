"""Sketch tier over INT8 indexes (ops.sketch.topk_ip_sketch_int8).

The exactness contract is the int8 path's own: certified rows must match
the exact int8 MXU scores (int32 accumulation, ``(acc * d_scale) *
q_scale`` rescale — `ops/quant.py`, `ops/topk.py`
_bin_scores_pallas_int8_kernel). The oracle below replicates that
scoring in numpy; guaranteed-mode escalation parity is asserted through
``DenseFlatIndex.search`` end-to-end.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.quant import quantize_rows_np
from codemix_dense_retrieval_tpu.ops.sketch import (
    fit_sketch,
    sketch_rows_int8,
    topk_ip_sketch_int8,
)


def _normalize(x):
    return x / np.linalg.norm(x, axis=1, keepdims=True)


def _anisotropic(rng, n, d, decay=0.03):
    spectrum = np.exp(-decay * np.arange(d)).astype(np.float32)
    x = rng.standard_normal((n, d)).astype(np.float32) * spectrum
    return _normalize(x)


def _int8_oracle(queries, d_vals, d_scales, k):
    """Exact top-k of the int8 path's scores: int32-exact accumulation,
    same f32 rescale order as the fused kernel, ties to lower id."""
    q_vals, q_scales = quantize_rows_np(queries)
    acc = q_vals.astype(np.int32) @ d_vals.astype(np.int32).T  # exact
    scores = acc.astype(np.float32) * d_scales[None, :] * q_scales[:, None]
    n = d_vals.shape[0]
    order = np.lexsort(
        (np.arange(n)[None, :].repeat(len(queries), 0), -scores), axis=1
    )
    idx = order[:, :k]
    return np.take_along_axis(scores, idx, axis=1), idx.astype(np.int32)


def _run(queries, docs_f32, ds, k, **kw):
    d_vals, d_scales = quantize_rows_np(docs_f32)
    proj = fit_sketch(d_vals.astype(np.float32) * d_scales[:, None], ds)
    sk, tails = sketch_rows_int8(
        jnp.asarray(d_vals), jnp.asarray(d_scales), jnp.asarray(proj)
    )
    vals, idx, cert = topk_ip_sketch_int8(
        jnp.asarray(queries), jnp.asarray(d_vals), jnp.asarray(d_scales),
        sk, tails, jnp.asarray(proj), k, **kw
    )
    return (
        np.asarray(vals), np.asarray(idx), np.asarray(cert),
        d_vals, d_scales,
    )


class TestInt8SketchKernel:
    def test_certified_rows_match_int8_oracle(self):
        rng = np.random.default_rng(0)
        # decay=0.05 at d=128/ds=32 captures ~91% of row energy (the float
        # tier's calibration-test regime) — tight enough tails to certify
        docs = _anisotropic(rng, 4096, 128, decay=0.05)
        queries = _anisotropic(rng, 24, 128, decay=0.05)
        k = 10
        vals, idx, cert, dv, dsc = _run(
            queries, docs, ds=32, k=k, probe_bins=96, tile_n=512
        )
        ovals, oidx = _int8_oracle(queries, dv, dsc, k)
        assert cert.any(), "anisotropic data should certify some queries"
        for q in np.flatnonzero(cert):
            np.testing.assert_array_equal(idx[q], oidx[q], err_msg=f"query {q}")
            np.testing.assert_allclose(vals[q], ovals[q], rtol=1e-5, atol=1e-5)
        # uncertified rows still have decent recall on anisotropic data
        recall = np.mean([
            len(set(idx[q]) & set(oidx[q])) / k for q in range(len(queries))
        ])
        assert recall > 0.9, recall

    def test_certificates_sound_on_adversarial_isotropic(self):
        """Isotropic data is the sketch's worst case: few (or no)
        certificates, but every granted one must be correct."""
        rng = np.random.default_rng(1)
        docs = _normalize(rng.standard_normal((2048, 32)).astype(np.float32))
        queries = _normalize(rng.standard_normal((16, 32)).astype(np.float32))
        k = 5
        vals, idx, cert, dv, dsc = _run(
            queries, docs, ds=8, k=k, probe_bins=64, tile_n=512
        )
        _, oidx = _int8_oracle(queries, dv, dsc, k)
        for q in np.flatnonzero(cert):
            np.testing.assert_array_equal(idx[q], oidx[q], err_msg=f"query {q}")

    def test_full_probe_certifies_everything(self):
        """Probing every bin must certify every query (the cover is the
        whole index, so the (probe+1)-th bound is -inf)."""
        rng = np.random.default_rng(2)
        docs = _anisotropic(rng, 1024, 32)
        queries = _anisotropic(rng, 8, 32)
        k = 4
        vals, idx, cert, dv, dsc = _run(
            queries, docs, ds=8, k=k, probe_bins=1024 // 8, tile_n=512
        )
        assert cert.all()
        ovals, oidx = _int8_oracle(queries, dv, dsc, k)
        np.testing.assert_array_equal(idx, oidx)


@pytest.fixture
def mesh():
    from codemix_dense_retrieval_tpu.parallel import make_mesh

    return make_mesh()


class TestInt8IndexSketch:
    def _build(self, tmp_path, mesh, n=2048, d=32):
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex

        rng = np.random.default_rng(7)
        docs = _anisotropic(rng, n, d)
        idx = DenseFlatIndex.build(
            docs, [f"d{i}" for i in range(n)], dtype="int8"
        )
        idx.to_device(mesh, pad_multiple=256)
        queries = _anisotropic(rng, 20, d)
        return idx, queries

    def test_approx_certified_rows_match_exact(self, tmp_path, mesh):
        idx, q = self._build(tmp_path, mesh)
        idx.enable_sketch(sketch_dim=8, cache=False)
        ev, ei = idx.search(q, 10, return_docids=False)
        av, ai = idx.search(q, 10, return_docids=False, approx=True)
        cert = idx.last_certified
        assert cert.shape == (20,)
        for r in np.flatnonzero(cert):
            np.testing.assert_array_equal(ai[r], ei[r], err_msg=f"query {r}")
            np.testing.assert_allclose(av[r], ev[r], rtol=1e-5, atol=1e-5)

    def test_guaranteed_byte_parity_with_exact(self, tmp_path, mesh):
        idx, q = self._build(tmp_path, mesh)
        idx.enable_sketch(sketch_dim=8, cache=False)
        ev, ei = idx.search(q, 10, return_docids=False)
        gv, gi = idx.search(q, 10, return_docids=False, approx="guaranteed")
        np.testing.assert_array_equal(gi, ei)
        np.testing.assert_allclose(gv, ev, rtol=1e-6, atol=1e-6)
        assert idx.last_certified.all()

    def test_sketch_cache_roundtrip(self, tmp_path, mesh):
        """int8 sketch caches/reloads like the float tier."""
        from codemix_dense_retrieval_tpu.index import DenseFlatIndex

        rng = np.random.default_rng(9)
        docs = _anisotropic(rng, 1024, 32)
        DenseFlatIndex.build(
            docs, [f"d{i}" for i in range(1024)], dtype="int8"
        ).save(tmp_path / "idx")
        a = DenseFlatIndex.load(tmp_path / "idx")
        a.to_device(mesh, pad_multiple=256)
        a.enable_sketch(sketch_dim=8)
        assert (tmp_path / "idx" / "sketch.npz").exists()
        b = DenseFlatIndex.load(tmp_path / "idx")
        b.to_device(mesh, pad_multiple=256)
        b.enable_sketch(sketch_dim=8)
        q = _anisotropic(rng, 6, 32)
        va, ia = a.search(q, 5, return_docids=False, approx=True)
        vb, ib = b.search(q, 5, return_docids=False, approx=True)
        np.testing.assert_array_equal(ia, ib)
        np.testing.assert_allclose(va, vb, rtol=1e-6)


def test_int8_rescore_budget_chunking_parity(monkeypatch):
    """Tiny _RESCORE_BUDGET -> lax.map-chunked int8 rescore; values, ids
    and certificates must be identical to the unchunked path (the OOM
    guard is a pure memory transform — see test_sketch.py twin)."""
    from codemix_dense_retrieval_tpu.ops import topk as topk_mod

    rng = np.random.default_rng(88)
    docs = _anisotropic(rng, 4096, 64)
    queries = _anisotropic(rng, 32, 64)
    k = 10
    ref = _run(queries, docs, 16, k, probe_bins=64)
    monkeypatch.setattr(topk_mod, "_RESCORE_BUDGET", 1 << 18)
    assert topk_mod._rescore_chunk(32, 64, 8, 64, 1) < 32
    chunked = _run(queries, docs, 16, k, probe_bins=64)
    np.testing.assert_array_equal(chunked[1], ref[1])
    np.testing.assert_allclose(chunked[0], ref[0], rtol=1e-6, atol=1e-6)
    np.testing.assert_array_equal(chunked[2], ref[2])
