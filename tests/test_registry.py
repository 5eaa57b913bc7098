"""Encoder-registry tests: family dispatch + HF checkpoint loading."""

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.models.registry import load_encoder


class TestRandomInit:
    @pytest.mark.parametrize("name,family_dim", [
        ("BAAI/bge-m3", 64),
        ("intfloat/multilingual-e5-large", 64),
        ("jinaai/jina-embeddings-v3", 64),
        ("Qwen/Qwen3-Embedding-0.6B", 32),
        ("Alibaba-NLP/gte-multilingual-base", 32),
    ])
    def test_all_families_encode(self, name, family_dim):
        enc = load_encoder(name, use_flash=False)
        vecs = enc.encode_queries(["hello world", "你好"], batch_size=2)
        assert vecs.shape == (2, family_dim)
        np.testing.assert_allclose(np.linalg.norm(vecs, axis=1), 1.0, rtol=1e-4)


class TestHFCheckpointDispatch:
    def test_xlmr_checkpoint(self, tmp_path):
        import torch
        from transformers import XLMRobertaConfig, XLMRobertaModel

        hf_cfg = XLMRobertaConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        )
        src = tmp_path / "xlmr"
        XLMRobertaModel(hf_cfg).save_pretrained(src)
        enc = load_encoder("BAAI/bge-m3", str(src), use_flash=False)
        vecs = enc.encode_documents(["some text"], batch_size=1)
        assert vecs.shape == (1, 32) and np.isfinite(vecs).all()

    def test_qwen3_checkpoint(self, tmp_path):
        import torch
        from transformers import Qwen3Config as HFConfig
        from transformers import Qwen3Model

        hf_cfg = HFConfig(
            vocab_size=100, hidden_size=32, intermediate_size=64, num_hidden_layers=1,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128, rope_theta=10000.0,
        )
        src = tmp_path / "qwen"
        Qwen3Model(hf_cfg).save_pretrained(src)
        enc = load_encoder("Qwen/Qwen3-Embedding-0.6B", str(src), use_flash=False)
        vecs = enc.encode_queries(["a query"], batch_size=1)
        assert vecs.shape == (1, 32) and np.isfinite(vecs).all()
        # query prefix dialect engaged (qwen3 instruct prompt)
        from codemix_dense_retrieval_tpu.models.dialects import query_prefix

        assert query_prefix("Qwen/Qwen3-Embedding-0.6B").startswith("Instruct:")
