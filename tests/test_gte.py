"""GTE encoder structural tests (conversion parity pending real weights —
see models/gte.py NOTE)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.models.gte import GTEConfig, GTEEncoder


@pytest.fixture(scope="module")
def gte():
    cfg = GTEConfig.tiny()
    model = GTEEncoder(cfg)
    ids = jnp.asarray(np.full((2, 10), 7, np.int32))
    mask = jnp.ones((2, 10), jnp.int32)
    params = model.init(jax.random.key(0), ids, mask)
    return cfg, model, params


def test_output_normalized(gte, rng):
    cfg, model, params = gte
    ids = jnp.asarray(rng.integers(3, 199, size=(3, 8)), jnp.int32)
    mask = jnp.ones_like(ids)
    out = np.asarray(model.apply(params, ids, mask))
    assert out.shape == (3, cfg.hidden_size)
    np.testing.assert_allclose(np.linalg.norm(out, axis=1), 1.0, rtol=1e-5)


def test_padding_invariance(gte, rng):
    """Extending a batch with pad tokens must not change valid outputs
    (mask + RoPE positions handled correctly)."""
    cfg, model, params = gte
    ids = jnp.asarray(rng.integers(3, 199, size=(2, 6)), jnp.int32)
    mask = jnp.ones_like(ids)
    out1 = np.asarray(model.apply(params, ids, mask))
    ids_pad = jnp.pad(ids, ((0, 0), (0, 4)))
    mask_pad = jnp.pad(mask, ((0, 0), (0, 4)))
    out2 = np.asarray(model.apply(params, ids_pad, mask_pad))
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_position_sensitivity(gte, rng):
    """RoPE: swapping token order must change the embedding."""
    cfg, model, params = gte
    ids = jnp.asarray([[5, 9, 13, 42, 7, 3]], jnp.int32)
    mask = jnp.ones_like(ids)
    out1 = np.asarray(model.apply(params, ids, mask))
    out2 = np.asarray(model.apply(params, ids[:, ::-1], mask))
    assert np.abs(out1 - out2).max() > 1e-4


def test_conversion_mapping_shapes():
    import torch

    cfg = GTEConfig.tiny()
    # synthesize an HF-style state dict and check the mapping applies
    sd = {}
    h, inter = cfg.hidden_size, cfg.intermediate_size
    sd["embeddings.word_embeddings.weight"] = torch.randn(cfg.vocab_size, h)
    sd["embeddings.token_type_embeddings.weight"] = torch.randn(1, h)
    sd["embeddings.LayerNorm.weight"] = torch.randn(h)
    sd["embeddings.LayerNorm.bias"] = torch.randn(h)
    for i in range(cfg.num_layers):
        p = f"encoder.layer.{i}"
        sd[f"{p}.attention.qkv_proj.weight"] = torch.randn(3 * h, h)
        sd[f"{p}.attention.qkv_proj.bias"] = torch.randn(3 * h)
        sd[f"{p}.attention.o_proj.weight"] = torch.randn(h, h)
        sd[f"{p}.attention.o_proj.bias"] = torch.randn(h)
        sd[f"{p}.attn_ln.weight"] = torch.randn(h)
        sd[f"{p}.attn_ln.bias"] = torch.randn(h)
        sd[f"{p}.mlp.up_gate_proj.weight"] = torch.randn(2 * inter, h)
        sd[f"{p}.mlp.down_proj.weight"] = torch.randn(h, inter)
        sd[f"{p}.mlp.down_proj.bias"] = torch.randn(h)
        sd[f"{p}.mlp_ln.weight"] = torch.randn(h)
        sd[f"{p}.mlp_ln.bias"] = torch.randn(h)

    from codemix_dense_retrieval_tpu.models.gte import convert_gte_state_dict

    params = convert_gte_state_dict(sd, cfg)
    model = GTEEncoder(cfg)
    ids = jnp.asarray(np.full((1, 4), 5, np.int32))
    mask = jnp.ones_like(ids)
    out = np.asarray(model.apply(params, ids, mask))
    assert out.shape == (1, cfg.hidden_size)
    assert np.isfinite(out).all()
