"""Two-stage serving integration: dense recall -> MaxSim rerank.

Demonstrates the ColBERT-style pattern end-to-end at test scale: the CLS
dense vectors retrieve top-K candidates from the sharded index, then the
multi-vector token embeddings rerank them. A doc that looks close in CLS
space but disagrees token-wise must drop after reranking."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.index import DenseFlatIndex
from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder
from codemix_dense_retrieval_tpu.ops.maxsim import maxsim_rerank
from codemix_dense_retrieval_tpu.parallel import make_mesh


def test_dense_recall_then_maxsim_rerank(rng, eight_cpu_devices):
    mesh = make_mesh(shard=8, devices=eight_cpu_devices)
    cfg = XLMRConfig.tiny(vocab_size=8000, hidden_size=32, use_flash=False)
    model = XLMREncoder(cfg)
    tok = HashTokenizer(8000, 16)

    texts = [f"topic{i % 37} detail{i} filler{i % 11} extra{i % 7}" for i in range(120)]
    query = texts[42]

    def batch(ts):
        ids, mask = tok.encode_batch(ts, 16)
        pad = 16 - ids.shape[1]
        if pad > 0:
            ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=1)
            mask = np.pad(mask, ((0, 0), (0, pad)))
        return jnp.asarray(ids), jnp.asarray(mask)

    ids_d, mask_d = batch(texts)
    ids_q, mask_q = batch([query])
    params = model.init(jax.random.key(0), ids_q, mask_q)

    # stage 1: dense CLS vectors + sharded recall
    dense_d = np.asarray(model.apply(params, ids_d, mask_d))
    dense_q = np.asarray(model.apply(params, ids_q, mask_q))
    index = DenseFlatIndex.build(dense_d, [str(i) for i in range(120)], dtype="float32")
    index.to_device(mesh, pad_multiple=64, method="bins_xla", tile_n=64, bin_size=16)
    K = 10
    vals, cand_ids = index.search(dense_q, K, return_docids=False)
    assert 42 in cand_ids[0].tolist()

    # stage 2: token-level MaxSim rerank of the K candidates
    tok_d = np.asarray(
        model.apply(params, ids_d, mask_d, method=model.token_embeddings)
    )
    tok_q = np.asarray(
        model.apply(params, ids_q, mask_q, method=model.token_embeddings)
    )
    cand_tok = tok_d[cand_ids[0]][None]  # (1, K, T, d)
    cand_mask = np.asarray(mask_d)[cand_ids[0]][None]
    scores, reranked = maxsim_rerank(
        jnp.asarray(tok_q), mask_q, jnp.asarray(cand_tok), jnp.asarray(cand_mask),
        candidate_ids=jnp.asarray(cand_ids, jnp.int32), use_pallas=True,
    )
    # the exact-match document must win the rerank
    assert int(np.asarray(reranked)[0, 0]) == 42
    s = np.asarray(scores)[0]
    assert np.all(np.diff(s) <= 1e-5)
