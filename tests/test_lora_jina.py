"""Jina-v3 task-LoRA adapter tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
from codemix_dense_retrieval_tpu.models.tokenizer import HashTokenizer
from codemix_dense_retrieval_tpu.models.xlmr import (
    JINA_V3_TASKS,
    XLMRConfig,
    XLMREncoder,
)


@pytest.fixture(scope="module")
def lora_model():
    cfg = XLMRConfig.tiny(
        vocab_size=500, hidden_size=32, num_heads=4, use_flash=False,
        lora_rank=4, lora_tasks=5, pooling="mean",
    )
    model = XLMREncoder(cfg)
    ids = jnp.asarray(np.full((2, 6), 7, np.int32))
    mask = jnp.ones((2, 6), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask, 0)
    return cfg, model, params, ids, mask


class TestLora:
    def test_param_shapes(self, lora_model):
        cfg, model, params, ids, mask = lora_model
        q = params["params"]["layer_0"]["q"]
        assert set(q) == {"base", "lora_a", "lora_b"}
        assert q["lora_a"].shape == (5, 32, 4)
        assert q["lora_b"].shape == (5, 4, 32)

    def test_zero_init_b_means_base_behavior(self, lora_model):
        """lora_b initializes to zero -> adapters are initially a no-op and
        every task matches the base model."""
        cfg, model, params, ids, mask = lora_model
        outs = [np.asarray(model.apply(params, ids, mask, t)) for t in range(3)]
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-7)
        np.testing.assert_allclose(outs[0], outs[2], atol=1e-7)

    def test_tasks_diverge_with_nonzero_adapters(self, lora_model, rng):
        cfg, model, params, ids, mask = lora_model
        import jax.tree_util as jtu

        def bump(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name.endswith("lora_b"):
                noise = rng.standard_normal(leaf.shape).astype(np.float32) * 0.5
                return jnp.asarray(noise)
            return leaf

        params2 = jtu.tree_map_with_path(bump, params)
        out0 = np.asarray(model.apply(params2, ids, mask, 0))
        out1 = np.asarray(model.apply(params2, ids, mask, 1))
        assert np.abs(out0 - out1).max() > 1e-4

    def test_text_encoder_selects_task_by_role(self, rng):
        cfg = XLMRConfig.jina_v3(
            vocab_size=500, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, use_flash=False,
        )
        enc = TextEncoder(
            "jinaai/jina-embeddings-v3", cfg,
            tokenizer=HashTokenizer(vocab_size=500, max_length=32),
        )
        # perturb adapters so tasks differ
        import jax.tree_util as jtu

        def bump(path, leaf):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            if name.endswith("lora_b"):
                return jnp.asarray(
                    rng.standard_normal(leaf.shape).astype(np.float32) * 0.5
                )
            return leaf

        enc.params = jtu.tree_map_with_path(bump, enc.params)
        q = enc.encode_queries(["hello world"], batch_size=1)
        d = enc.encode_documents(["hello world"], batch_size=1)
        assert np.abs(q - d).max() > 1e-4  # different adapters engaged
        assert JINA_V3_TASKS.index("retrieval.query") == 0


class TestLoraConversion:
    def test_convert_with_and_without_adapters(self):
        import torch
        from transformers import XLMRobertaConfig, XLMRobertaModel

        from codemix_dense_retrieval_tpu.models.convert import convert_xlmr_state_dict

        torch.manual_seed(0)
        hf_cfg = XLMRobertaConfig(
            vocab_size=120, hidden_size=32, num_hidden_layers=1,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
        )
        tm = XLMRobertaModel(hf_cfg).eval()
        cfg = XLMRConfig.tiny(
            vocab_size=120, hidden_size=32, num_layers=1, num_heads=4,
            intermediate_size=64, max_position_embeddings=66,
            lora_rank=4, lora_tasks=5, use_flash=False,
        )
        params = convert_xlmr_state_dict(tm.state_dict(), cfg)
        q = params["params"]["layer_0"]["q"]
        assert "base" in q and q["lora_a"].shape == (5, 32, 4)
        # absent adapters in the checkpoint -> zero adapters (no-op)
        assert np.all(q["lora_a"] == 0) and np.all(q["lora_b"] == 0)

        # and the converted model still matches torch (adapters are no-ops)
        import jax

        model = XLMREncoder(cfg)
        ids = np.full((1, 5), 7, np.int64)
        mask = np.ones_like(ids)
        with torch.no_grad():
            ref = tm(torch.tensor(ids), attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        got = np.asarray(
            model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                        0, method=model.hidden_states)
        )
        np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-4)


def test_lora_composes_with_weight_quant(lora_model):
    """Weight quantization is a pytree transform, so Jina's task-LoRA
    needs no special handling: 2D base kernels quantize, 3D lora_a/b
    stacks stay full precision, and the adapted forward stays close."""
    import jax.numpy as jnp

    from codemix_dense_retrieval_tpu.ops.weight_quant import (
        QuantizedTensor,
        dequantize_tree,
        quantize_tree,
    )

    cfg, model, params, ids, mask = lora_model
    qp = quantize_tree(params, "int8", min_size=512)
    leaves = jax.tree_util.tree_leaves(
        qp, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    kinds = [x for x in leaves if isinstance(x, QuantizedTensor)]
    assert kinds, "expected at least one quantized base kernel"
    assert all(len(x.shape) == 2 for x in kinds)  # lora stacks untouched

    task = jnp.asarray(2, jnp.int32)
    full = np.asarray(model.apply(params, ids, mask, task))
    quant = np.asarray(model.apply(dequantize_tree(qp, jnp.float32), ids, mask, task))
    cos = (full * quant).sum(axis=1)
    assert cos.min() > 0.995, cos
