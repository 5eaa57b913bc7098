"""MaxSim late-interaction rerank tests (numpy oracle + pallas parity)."""

import numpy as np
import pytest

import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.maxsim import (
    maxsim_rerank,
    maxsim_scores_pallas,
    maxsim_scores_xla,
)


def numpy_maxsim(qt, qm, dt, dm):
    b, tq, d = qt.shape
    _, k, td, _ = dt.shape
    out = np.zeros((b, k), np.float32)
    for bi in range(b):
        for ki in range(k):
            total = 0.0
            for i in range(tq):
                if not qm[bi, i]:
                    continue
                sims = [
                    float(qt[bi, i] @ dt[bi, ki, j])
                    for j in range(td) if dm[bi, ki, j]
                ]
                total += max(sims) if sims else 0.0
            out[bi, ki] = total
    return out


@pytest.fixture
def data(rng):
    b, tq, k, td, d = 3, 8, 5, 16, 32
    qt = rng.standard_normal((b, tq, d)).astype(np.float32)
    dt = rng.standard_normal((b, k, td, d)).astype(np.float32)
    qm = (rng.random((b, tq)) < 0.8).astype(np.int32)
    qm[:, 0] = 1
    dm = (rng.random((b, k, td)) < 0.8).astype(np.int32)
    dm[:, :, 0] = 1
    return qt, qm, dt, dm


def test_xla_matches_numpy(data):
    qt, qm, dt, dm = data
    got = np.asarray(maxsim_scores_xla(*map(jnp.asarray, (qt, qm, dt, dm))))
    ref = numpy_maxsim(qt, qm, dt, dm)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_pallas_matches_xla(data):
    qt, qm, dt, dm = data
    a = np.asarray(maxsim_scores_xla(*map(jnp.asarray, (qt, qm, dt, dm))))
    b = np.asarray(maxsim_scores_pallas(*map(jnp.asarray, (qt, qm, dt, dm))))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_rerank_orders_and_tiebreaks(data, rng):
    qt, qm, dt, dm = data
    cand = jnp.asarray(rng.permutation(100)[:5][None].repeat(3, 0), jnp.int32)
    scores, ids = maxsim_rerank(
        *map(jnp.asarray, (qt, qm, dt, dm)), candidate_ids=cand, use_pallas=False
    )
    s = np.asarray(scores)
    assert np.all(np.diff(s, axis=1) <= 1e-6)  # descending
    # the reranked ids are a permutation of the candidates
    for bi in range(3):
        assert set(np.asarray(ids)[bi].tolist()) == set(np.asarray(cand)[bi].tolist())


def test_identical_doc_wins(rng):
    """A candidate whose tokens equal the query's scores the maximum."""
    b, tq, d = 1, 4, 16
    qt = rng.standard_normal((b, tq, d)).astype(np.float32)
    qt /= np.linalg.norm(qt, axis=-1, keepdims=True)
    dt = rng.standard_normal((1, 3, tq, d)).astype(np.float32)
    dt /= np.linalg.norm(dt, axis=-1, keepdims=True)
    dt[0, 1] = qt[0]  # candidate 1 == query tokens
    qm = np.ones((1, tq), np.int32)
    dm = np.ones((1, 3, tq), np.int32)
    scores = np.asarray(maxsim_scores_xla(*map(jnp.asarray, (qt, qm, dt, dm))))
    assert scores[0].argmax() == 1
    assert scores[0, 1] == pytest.approx(tq, rel=1e-5)


def test_token_embeddings_feed_maxsim(rng):
    """End-to-end multi-vector: token embeddings from the encoder rerank a
    copy of the query's own text to the top."""
    import jax
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder

    cfg = XLMRConfig.tiny(vocab_size=5000, hidden_size=32, use_flash=False)
    model = XLMREncoder(cfg)
    tok = HashTokenizer(5000, 16)
    texts = ["alpha beta gamma", "delta epsilon zeta", "eta theta iota"]
    query = texts[1]
    ids_d, mask_d = tok.encode_batch(texts, 16)
    ids_q, mask_q = tok.encode_batch([query], 16)
    # pad both to the same length for stacking
    L = max(ids_d.shape[1], ids_q.shape[1])
    def padto(a, fill):
        out = np.full((a.shape[0], L), fill, a.dtype)
        out[:, :a.shape[1]] = a
        return out
    ids_d, mask_d = padto(ids_d, 1), padto(mask_d, 0)
    ids_q, mask_q = padto(ids_q, 1), padto(mask_q, 0)
    params = model.init(jax.random.key(0), jnp.asarray(ids_q), jnp.asarray(mask_q))
    d_tok = np.asarray(model.apply(params, jnp.asarray(ids_d), jnp.asarray(mask_d),
                                   method=model.token_embeddings))
    q_tok = np.asarray(model.apply(params, jnp.asarray(ids_q), jnp.asarray(mask_q),
                                   method=model.token_embeddings))
    scores = np.asarray(maxsim_scores_xla(
        jnp.asarray(q_tok), jnp.asarray(mask_q), jnp.asarray(d_tok[None]),
        jnp.asarray(mask_d[None]),
    ))
    assert scores[0].argmax() == 1  # the query's own text wins


def test_pallas_chunked_matches_xla(data):
    """Candidate chunking (incl. a non-divisible chunk forcing zero-mask
    padding) is invisible in the scores — rerank depth is not VMEM-bound."""
    qt, qm, dt, dm = data  # k = 5
    ref = np.asarray(maxsim_scores_xla(*map(jnp.asarray, (qt, qm, dt, dm))))
    for chunk in (1, 2, 3, 5, 64):
        got = np.asarray(maxsim_scores_pallas(
            *map(jnp.asarray, (qt, qm, dt, dm)), candidate_chunk=chunk))
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5, err_msg=f"chunk={chunk}")


def test_auto_chunk_bounds_vmem():
    from codemix_dense_retrieval_tpu.ops.maxsim import (
        _MAXSIM_VMEM_BUDGET, _auto_candidate_chunk,
    )

    # deep rerank at ColBERT-ish shapes: chunk must bound the block size
    k, td, dim = 1000, 256, 128
    chunk = _auto_candidate_chunk(k, td, dim, 4)
    assert 8 <= chunk < k
    assert chunk % 8 == 0  # Mosaic sublane rule (second-to-last block dim)
    assert chunk * td * dim * 4 <= _MAXSIM_VMEM_BUDGET
    # shallow rerank: one chunk (covers the whole axis, no alignment needed)
    assert _auto_candidate_chunk(4, 16, 32, 4) == 4
    # a single huge candidate: floor at the 8-sublane minimum, never 0
    assert _auto_candidate_chunk(8, 8192, 1024, 4) == 8


def test_deep_rerank_previously_vmem_bound(data, rng):
    """k*Td*dim*4 = 48 MB here — far beyond VMEM; chunking makes it run.
    Verified against the XLA reference on a spot-check of candidates."""
    b, tq, k, td, d = 1, 4, 768, 128, 128
    qt = rng.standard_normal((b, tq, d)).astype(np.float32)
    dt = rng.standard_normal((b, k, td, d)).astype(np.float32)
    qm = np.ones((b, tq), np.int32)
    dm = np.ones((b, k, td), np.int32)
    got = np.asarray(maxsim_scores_pallas(*map(jnp.asarray, (qt, qm, dt, dm))))
    assert got.shape == (b, k)
    sub = slice(0, 32)
    ref = np.asarray(maxsim_scores_xla(
        jnp.asarray(qt), jnp.asarray(qm), jnp.asarray(dt[:, sub]), jnp.asarray(dm[:, sub])))
    np.testing.assert_allclose(got[:, sub], ref, rtol=1e-4, atol=1e-4)
