"""Weight quantization (bitsandbytes load_in_8bit / load_in_4bit analog,
reference `onepass_dense_run.py:100-103,177-187`)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from codemix_dense_retrieval_tpu.ops.weight_quant import (
    NF4_BLOCK,
    NF4_TABLE,
    QuantizedTensor,
    dequantize_tree,
    quantize_tree,
    quantized_nbytes,
)


class TestLeafQuant:
    def test_int8_roundtrip_error_bound(self):
        rng = np.random.default_rng(0)
        w = rng.standard_normal((256, 384)).astype(np.float32) * 0.05
        q = quantize_tree({"kernel": w}, "int8", min_size=1)["kernel"]
        assert isinstance(q, QuantizedTensor) and q.codes.dtype == np.int8
        deq = np.asarray(q.dequantize(jnp.float32))
        # symmetric per-column absmax/127 -> error <= half a step
        step = np.abs(w).max(axis=0) / 127.0
        assert (np.abs(deq - w) <= step / 2 + 1e-7).all()

    def test_nf4_roundtrip_error_bound_and_zero(self):
        rng = np.random.default_rng(1)
        w = rng.standard_normal((128, 512)).astype(np.float32) * 0.02
        w[3, 7] = 0.0
        q = quantize_tree({"kernel": w}, "nf4", min_size=1)["kernel"]
        # two codes per byte + one f32 scale per 64-block
        assert q.codes.dtype == np.uint8
        assert q.codes.size == w.size // 2
        assert q.scale.size == w.size // NF4_BLOCK
        deq = np.asarray(q.dequantize(jnp.float32))
        # worst-case error: half the largest inter-level gap times absmax
        gap = np.diff(NF4_TABLE).max() / 2
        blocks = w.reshape(-1, NF4_BLOCK)
        bound = np.abs(blocks).max(axis=1, keepdims=True) * gap
        err = np.abs(deq.reshape(-1, NF4_BLOCK) - blocks)
        assert (err <= bound + 1e-7).all()
        # NF4 has a true zero code: exact zeros survive
        assert deq[3, 7] == 0.0

    def test_nf4_ragged_tail_padding(self):
        w = np.linspace(-1, 1, 5 * 30, dtype=np.float32).reshape(5, 30)
        q = quantize_tree({"k": w}, "nf4", min_size=1)["k"]
        deq = np.asarray(q.dequantize(jnp.float32))
        assert deq.shape == w.shape
        # half the largest NF4 inter-level gap at absmax 1 is ~0.139
        assert np.abs(deq - w).max() < 0.15


class TestTreeSelection:
    def _tree(self):
        rng = np.random.default_rng(2)
        return {
            "embeddings": {"word_embeddings": rng.standard_normal((1000, 256)).astype(np.float32)},
            "layer_0": {
                "ffn_in": {"kernel": rng.standard_normal((256, 1024)).astype(np.float32),
                           "bias": np.zeros(1024, np.float32)},
                "tiny": {"kernel": rng.standard_normal((8, 8)).astype(np.float32)},
            },
        }

    def test_selection_rules(self):
        t = quantize_tree(self._tree(), "int8", min_size=65536)
        # embeddings skipped (bnb quantizes Linear only), bias 1D skipped,
        # small kernel under min_size skipped, big Linear kernel quantized
        assert isinstance(t["embeddings"]["word_embeddings"], np.ndarray)
        assert isinstance(t["layer_0"]["ffn_in"]["kernel"], QuantizedTensor)
        assert isinstance(t["layer_0"]["ffn_in"]["bias"], np.ndarray)
        assert isinstance(t["layer_0"]["tiny"]["kernel"], np.ndarray)

    def test_footprint_shrinks(self):
        t = self._tree()
        full = quantized_nbytes(t)
        q8 = quantized_nbytes(quantize_tree(t, "int8", min_size=1024))
        q4 = quantized_nbytes(quantize_tree(t, "nf4", min_size=1024))
        # embeddings (1000x256 f32) stay; the Linear kernels shrink 4x/8x+
        assert q8 < full * 0.65
        assert q4 < q8

    def test_dequantize_tree_restores_structure(self):
        t = self._tree()
        out = dequantize_tree(quantize_tree(t, "nf4", min_size=1024), jnp.float32)
        assert jax.tree_util.tree_structure(out) == jax.tree_util.tree_structure(t)
        w = t["layer_0"]["ffn_in"]["kernel"]
        # bound: half the largest NF4 gap x the per-block absmax (~4 sigma)
        atol = float(np.abs(w).max()) * float(np.diff(NF4_TABLE).max()) / 2
        np.testing.assert_allclose(
            np.asarray(out["layer_0"]["ffn_in"]["kernel"]), w, atol=atol)


class TestEncoderParity:
    @pytest.fixture(scope="class")
    def cfg(self):
        from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

        # hidden 256 so every Linear kernel reaches the 65536 threshold
        return XLMRConfig.tiny(
            vocab_size=500, hidden_size=256, num_heads=4,
            intermediate_size=512, use_flash=False,
        )

    @pytest.mark.parametrize("mode,min_cos", [("int8", 0.995), ("nf4", 0.95)])
    def test_quantized_encoder_close_to_full(self, cfg, mode, min_cos):
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
        from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer

        tok = HashTokenizer(vocab_size=500, max_length=32)
        full = TextEncoder("BAAI/bge-m3", cfg, tokenizer=tok, seed=3)
        quant = TextEncoder("BAAI/bge-m3", cfg, params=full.params,
                            tokenizer=tok, weight_quant=mode)
        texts = [f"passage about topic {i}" for i in range(6)]
        a = full.encode_documents(texts, batch_size=4)
        b = quant.encode_documents(texts, batch_size=4)
        cos = (a * b).sum(axis=1)  # both L2-normalized
        assert cos.min() > min_cos, cos
        # resident params actually shrank
        assert quantized_nbytes(quant.params) < quantized_nbytes(full.params) * 0.7

    def test_bad_mode_rejected(self, cfg):
        from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
        from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer

        with pytest.raises(ValueError, match="int8|nf4"):
            TextEncoder("BAAI/bge-m3", cfg,
                        tokenizer=HashTokenizer(vocab_size=500, max_length=32),
                        weight_quant="fp2")


def test_conflicting_mode_on_prequantized_params_rejected():
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    cfg = XLMRConfig.tiny(
        vocab_size=500, hidden_size=256, num_heads=4,
        intermediate_size=512, use_flash=False,
    )
    tok = HashTokenizer(vocab_size=500, max_length=32)
    base = TextEncoder("BAAI/bge-m3", cfg, tokenizer=tok)
    nf4 = quantize_tree(base.params, "nf4")
    # same mode: fine (load path); different mode: refuse loudly
    TextEncoder("BAAI/bge-m3", cfg, params=nf4, tokenizer=tok,
                weight_quant="nf4")
    with pytest.raises(ValueError, match="already quantized"):
        TextEncoder("BAAI/bge-m3", cfg, params=nf4, tokenizer=tok,
                    weight_quant="int8")
