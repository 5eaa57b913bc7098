"""Qwen3 decoder parity vs HF torch, and tensor-parallel equivalence."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.models.qwen3 import (
    Qwen3Config,
    Qwen3Encoder,
    convert_qwen3_state_dict,
)
from codemix_dense_retrieval_tpu.parallel import make_mesh
from codemix_dense_retrieval_tpu.parallel.tp import replicate_params, shard_params_tp


@pytest.fixture(scope="module")
def torch_qwen():
    import torch
    from transformers import Qwen3Config as HFConfig
    from transformers import Qwen3Model

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=100, hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, rope_theta=10000.0,
        attention_dropout=0.0, tie_word_embeddings=True,
    )
    tm = Qwen3Model(hf_cfg).eval()
    cfg = Qwen3Config.tiny()
    params = convert_qwen3_state_dict(tm.state_dict(), cfg)
    return tm, cfg, params


class TestQwen3Parity:
    def test_hidden_states_match_torch(self, torch_qwen, rng):
        import torch

        tm, cfg, params = torch_qwen
        ids = rng.integers(3, 99, size=(2, 9)).astype(np.int64)
        mask = np.ones_like(ids)
        mask[1, -3:] = 0  # right padding
        ids[1, -3:] = 0
        with torch.no_grad():
            ref = tm(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(mask)
            ).last_hidden_state.numpy()
        model = Qwen3Encoder(cfg)
        got = np.asarray(
            model.apply(
                params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                method=model.hidden_states,
            )
        )
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], rtol=3e-4, atol=3e-4)

    def test_last_token_pooling_normalized(self, torch_qwen, rng):
        tm, cfg, params = torch_qwen
        ids = rng.integers(3, 99, size=(3, 7)).astype(np.int64)
        mask = np.ones_like(ids)
        mask[0, -2:] = 0
        model = Qwen3Encoder(cfg)
        out = np.asarray(
            model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32))
        )
        np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)
        # the pooled row equals the normalized hidden state at the last
        # VALID position
        hid = np.asarray(
            model.apply(params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
                        method=model.hidden_states)
        )
        h = hid[0, 4]
        np.testing.assert_allclose(out[0], h / np.linalg.norm(h), rtol=1e-5)


class TestTensorParallel:
    def test_tp_forward_matches_replicated(self, torch_qwen, rng, eight_cpu_devices):
        """Megatron-style TP over a (2, 4) mesh must be numerically
        equivalent to the replicated forward (the device_map=auto
        replacement, SURVEY §2.2)."""
        tm, cfg, params = torch_qwen
        model = Qwen3Encoder(cfg)
        ids = jnp.asarray(rng.integers(3, 99, size=(4, 8)), jnp.int32)
        mask = jnp.ones_like(ids)

        mesh = make_mesh(shard=2, tp=4, devices=eight_cpu_devices)
        params_tp = shard_params_tp(params, mesh, "qwen3")
        params_rep = replicate_params(params, mesh)

        fwd = jax.jit(lambda p, i, m: model.apply(p, i, m))
        with jax.set_mesh(mesh):
            out_tp = np.asarray(fwd(params_tp, ids, mask))
            out_rep = np.asarray(fwd(params_rep, ids, mask))
        np.testing.assert_allclose(out_tp, out_rep, rtol=2e-5, atol=2e-5)

    def test_sharding_rules(self):
        from codemix_dense_retrieval_tpu.parallel.tp import tp_spec_for_path
        from jax.sharding import PartitionSpec as P

        assert tp_spec_for_path("layer_0/self_attn/q_proj/kernel", "qwen3") == P(None, "tp")
        assert tp_spec_for_path("layer_0/self_attn/o_proj/kernel", "qwen3") == P("tp", None)
        assert tp_spec_for_path("layer_0/mlp/down_proj/kernel", "qwen3") == P("tp", None)
        assert tp_spec_for_path("norm/weight", "qwen3") == P()
        assert tp_spec_for_path("layer_3/q/kernel", "xlmr") == P(None, "tp")
        assert tp_spec_for_path("layer_3/ffn_out/kernel", "xlmr") == P("tp", None)
        assert tp_spec_for_path("embeddings/word_embeddings/embedding", "xlmr") == P()

    def test_indivisible_dims_fall_back_to_replication(self, torch_qwen, eight_cpu_devices):
        tm, cfg, params = torch_qwen
        mesh = make_mesh(shard=1, tp=8, devices=eight_cpu_devices)  # 64/8 ok but 32-dim rows?
        # head dim h*dh = 64 divisible by 8; hidden 32 divisible by 8 -> kernel (32, 64) shards fine.
        # Force an indivisible case via a fake leaf.
        import jax.numpy as jnp
        from codemix_dense_retrieval_tpu.parallel.tp import shard_params_tp

        fake = {"self_attn": {"q_proj": {"kernel": jnp.zeros((32, 9))}}}
        out = shard_params_tp(fake, mesh, "qwen3")
        # not sharded (9 % 8 != 0) -> fully replicated spec
        sh = out["self_attn"]["q_proj"]["kernel"].sharding
        assert sh.is_fully_replicated

    def test_tp_with_int8_weight_quant(self, torch_qwen, rng, eight_cpu_devices):
        """int8-quantized kernels TP-shard (codes follow the kernel spec,
        per-out-channel scale follows the out axis) and the TP forward
        matches the replicated quantized forward — the bitsandbytes-on-
        2-GPUs setup (`onepass_dense_run.py:177-213`) as GSPMD."""
        from codemix_dense_retrieval_tpu.ops.weight_quant import (
            QuantizedTensor,
            dequantize_tree,
            quantize_tree,
        )

        tm, cfg, params = torch_qwen
        model = Qwen3Encoder(cfg)
        qparams = quantize_tree(params, "int8", min_size=1024)
        leaves = jax.tree_util.tree_leaves(
            qparams, is_leaf=lambda x: isinstance(x, QuantizedTensor))
        assert any(isinstance(x, QuantizedTensor) for x in leaves)
        ids = jnp.asarray(rng.integers(3, 99, size=(4, 8)), jnp.int32)
        mask = jnp.ones_like(ids)

        mesh = make_mesh(shard=2, tp=4, devices=eight_cpu_devices)
        qp_tp = shard_params_tp(qparams, mesh, "qwen3")
        qp_rep = replicate_params(dequantize_tree(qparams, jnp.float32), mesh)

        fwd_q = jax.jit(
            lambda p, i, m: model.apply(dequantize_tree(p, jnp.float32), i, m))
        fwd = jax.jit(lambda p, i, m: model.apply(p, i, m))
        with jax.set_mesh(mesh):
            out_tp = np.asarray(fwd_q(qp_tp, ids, mask))
            out_rep = np.asarray(fwd(qp_rep, ids, mask))
        np.testing.assert_allclose(out_tp, out_rep, rtol=2e-5, atol=2e-5)
        # a column-parallel kernel's codes really are sharded on the mesh
        q = qp_tp["params"]["layer_0"]["self_attn"]["q_proj"]["kernel"] \
            if "params" in qp_tp else None
        if q is None:
            # locate any quantized leaf and check it is not fully replicated
            qs = [x for x in jax.tree_util.tree_leaves(
                qp_tp, is_leaf=lambda x: isinstance(x, QuantizedTensor))
                if isinstance(x, QuantizedTensor)]
            assert any(not x.codes.sharding.is_fully_replicated for x in qs)
        else:
            assert not q.codes.sharding.is_fully_replicated
