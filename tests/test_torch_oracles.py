"""In-repo torch reference forwards pinning GTE and Jina-LoRA conversion
numerics (VERDICT round-1 item 6).

The reference loads these families via sentence-transformers
trust_remote_code (`run_ablation.sh:98-105`,
`onepass_dense_mix_run_custom_lang.py:34-58`), unavailable offline. The
technique here is the same one already used for XLM-R/Qwen3 parity
(tests/test_models.py): build a minimal torch forward of the documented
architecture, run it on random weights, and assert the converted Flax
model matches to float32 tolerance. This pins

- the HF-name -> Flax-pytree mapping (convert_gte_state_dict /
  convert_xlmr_state_dict incl. the torch ``parametrizations.weight``
  naming that real jina-v3 checkpoints use), and
- the forward numerics (RoPE convention, gated-GELU split order, post-LN
  residual placement, LoRA scaling alpha/r).
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")


def _init_linear(rng, linear, std=0.05):
    with torch.no_grad():
        linear.weight.copy_(torch.tensor(
            rng.standard_normal(linear.weight.shape).astype(np.float32) * std))
        if linear.bias is not None:
            linear.bias.copy_(torch.tensor(
                rng.standard_normal(linear.bias.shape).astype(np.float32) * 0.02))


# ---------------------------------------------------------------------------
# GTE ("NewModel"): RoPE attention + gated-GELU MLP + post-LN
# ---------------------------------------------------------------------------


class TorchGTELayer(torch.nn.Module):
    """Torch mirror of models/gte.py GTELayer, HF NewModel naming."""

    def __init__(self, cfg):
        super().__init__()
        h, inter = cfg.hidden_size, cfg.intermediate_size
        self.cfg = cfg
        self.attention = torch.nn.Module()
        self.attention.qkv_proj = torch.nn.Linear(h, 3 * h)
        self.attention.o_proj = torch.nn.Linear(h, h)
        self.attn_ln = torch.nn.LayerNorm(h, eps=cfg.layer_norm_eps)
        self.mlp = torch.nn.Module()
        self.mlp.up_gate_proj = torch.nn.Linear(h, 2 * inter, bias=False)
        self.mlp.down_proj = torch.nn.Linear(inter, h)
        self.mlp_ln = torch.nn.LayerNorm(h, eps=cfg.layer_norm_eps)

    @staticmethod
    def _rope(x, positions, theta):
        # HF half-split convention (matches models/qwen3.py rope())
        dh = x.shape[-1]
        half = dh // 2
        freqs = 1.0 / (theta ** (torch.arange(half, dtype=torch.float32) / half))
        angles = positions[..., None].float() * freqs  # (B, S, half)
        cos = torch.cos(angles)[:, :, None, :]
        sin = torch.sin(angles)[:, :, None, :]
        x1, x2 = x[..., :half], x[..., half:]
        return torch.cat([x1 * cos - x2 * sin, x2 * cos + x1 * sin], dim=-1)

    def forward(self, x, positions, lengths):
        c = self.cfg
        b, s, h = x.shape
        dh = h // c.num_heads
        qkv = self.attention.qkv_proj(x)
        q, k, v = qkv.chunk(3, dim=-1)
        q = self._rope(q.reshape(b, s, c.num_heads, dh), positions, c.rope_theta)
        k = self._rope(k.reshape(b, s, c.num_heads, dh), positions, c.rope_theta)
        v = v.reshape(b, s, c.num_heads, dh)
        qh, kh, vh = (t.permute(0, 2, 1, 3) for t in (q, k, v))
        scores = torch.einsum("bhqd,bhkd->bhqk", qh, kh) / math.sqrt(dh)
        col = torch.arange(s).view(1, 1, 1, s)
        scores = scores.masked_fill(col >= lengths.view(-1, 1, 1, 1), -1e30)
        attn = torch.einsum("bhqk,bhkd->bhqd", torch.softmax(scores, dim=-1), vh)
        attn = attn.permute(0, 2, 1, 3).reshape(b, s, h)
        x = self.attn_ln(x + self.attention.o_proj(attn))
        up, gate = self.mlp.up_gate_proj(x).chunk(2, dim=-1)
        y = self.mlp.down_proj(up * torch.nn.functional.gelu(gate))
        return self.mlp_ln(x + y)


class TorchGTE(torch.nn.Module):
    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.embeddings = torch.nn.Module()
        self.embeddings.word_embeddings = torch.nn.Embedding(
            cfg.vocab_size, cfg.hidden_size)
        self.embeddings.token_type_embeddings = torch.nn.Embedding(
            cfg.type_vocab_size, cfg.hidden_size)
        self.embeddings.LayerNorm = torch.nn.LayerNorm(
            cfg.hidden_size, eps=cfg.layer_norm_eps)
        self.encoder = torch.nn.Module()
        self.encoder.layer = torch.nn.ModuleList(
            [TorchGTELayer(cfg) for _ in range(cfg.num_layers)])

    def forward(self, input_ids, attention_mask):
        b, s = input_ids.shape
        lengths = attention_mask.to(torch.int64).sum(dim=1)
        positions = torch.arange(s).view(1, s).expand(b, s)
        x = self.embeddings.word_embeddings(input_ids) + \
            self.embeddings.token_type_embeddings(torch.zeros_like(input_ids))
        x = self.embeddings.LayerNorm(x)
        for layer in self.encoder.layer:
            x = layer(x, positions, lengths)
        return x


@pytest.fixture(scope="module")
def gte_pair(rng):
    from codemix_dense_retrieval_tpu.models.gte import (
        GTEConfig, GTEEncoder, convert_gte_state_dict,
    )

    cfg = GTEConfig.tiny(vocab_size=120, hidden_size=32, num_heads=4,
                         intermediate_size=64)
    tm = TorchGTE(cfg).eval()
    g = np.random.default_rng(7)
    with torch.no_grad():
        for m in tm.modules():
            if isinstance(m, torch.nn.Linear):
                _init_linear(g, m)
            elif isinstance(m, torch.nn.Embedding):
                m.weight.copy_(torch.tensor(
                    g.standard_normal(m.weight.shape).astype(np.float32) * 0.1))
            elif isinstance(m, torch.nn.LayerNorm):
                m.weight.copy_(torch.tensor(
                    1.0 + 0.1 * g.standard_normal(m.weight.shape).astype(np.float32)))
                m.bias.copy_(torch.tensor(
                    0.05 * g.standard_normal(m.bias.shape).astype(np.float32)))
    params = convert_gte_state_dict(tm.state_dict(), cfg)
    return cfg, tm, GTEEncoder(cfg), params


class TestGTETorchParity:
    def test_hidden_states(self, gte_pair, rng):
        cfg, tm, model, params = gte_pair
        ids = rng.integers(3, cfg.vocab_size - 1, size=(3, 12)).astype(np.int64)
        mask = np.ones_like(ids)
        mask[1, 9:] = 0  # ragged lengths exercise the mask + RoPE positions
        mask[2, 6:] = 0
        with torch.no_grad():
            ref = tm(torch.tensor(ids), torch.tensor(mask)).numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            method=model.hidden_states))
        valid = mask.astype(bool)
        np.testing.assert_allclose(got[valid], ref[valid], atol=1e-4, rtol=1e-4)

    def test_pooled_cls_normalized(self, gte_pair, rng):
        cfg, tm, model, params = gte_pair
        ids = rng.integers(3, cfg.vocab_size - 1, size=(2, 8)).astype(np.int64)
        mask = np.ones_like(ids)
        with torch.no_grad():
            hid = tm(torch.tensor(ids), torch.tensor(mask)).numpy()
        ref = hid[:, 0]
        ref = ref / np.linalg.norm(ref, axis=-1, keepdims=True)
        got = np.asarray(model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32)))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)


# ---------------------------------------------------------------------------
# Jina-v3: torch parametrization-style LoRA over XLMRobertaModel
# ---------------------------------------------------------------------------

_PROJ_NAMES = (
    "attention.self.query",
    "attention.self.key",
    "attention.self.value",
    "attention.output.dense",
    "intermediate.dense",
    "output.dense",
)


def _parametrized_jina_state_dict(tm, cfg, g):
    """Rewrite an XLMRobertaModel state dict into the torch-parametrization
    layout a real jina-v3 checkpoint uses (weight ->
    parametrizations.weight.original + per-task lora_A/lora_B), returning
    (state_dict, {proj_key: (lora_A, lora_B)})."""
    sd = {k: v.clone() for k, v in tm.state_dict().items()}
    adapters = {}
    for i in range(cfg.num_layers):
        for proj in _PROJ_NAMES:
            base = f"encoder.layer.{i}.{proj}"
            w = sd.pop(f"{base}.weight")
            sd[f"{base}.parametrizations.weight.original"] = w
            out_f, in_f = w.shape
            la = torch.tensor(g.standard_normal(
                (cfg.lora_tasks, cfg.lora_rank, in_f)).astype(np.float32) * 0.05)
            lb = torch.tensor(g.standard_normal(
                (cfg.lora_tasks, out_f, cfg.lora_rank)).astype(np.float32) * 0.05)
            sd[f"{base}.parametrizations.weight.0.lora_A"] = la
            sd[f"{base}.parametrizations.weight.0.lora_B"] = lb
            adapters[base] = (la, lb)
    return sd, adapters


def test_jina_lora_torch_parity(rng):
    """Converted jina-style checkpoint matches a torch forward whose weights
    are materialized as W + (alpha/r) * B_t @ A_t for each task t."""
    from transformers import XLMRobertaConfig, XLMRobertaModel

    from codemix_dense_retrieval_tpu.models.convert import (
        convert_xlmr_state_dict, detect_prefix,
    )
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig, XLMREncoder

    torch.manual_seed(3)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    tm = XLMRobertaModel(hf_cfg).eval()
    cfg = XLMRConfig.jina_v3(
        vocab_size=120, hidden_size=32, num_layers=2, num_heads=4,
        intermediate_size=64, max_position_embeddings=66, use_flash=False,
    )
    g = np.random.default_rng(11)
    sd, adapters = _parametrized_jina_state_dict(tm, cfg, g)
    assert detect_prefix(sd) == ""
    params = convert_xlmr_state_dict(sd, cfg)

    # converted adapter shapes: (tasks, in, r) / (tasks, r, out)
    q = params["params"]["layer_0"]["q"]
    assert q["lora_a"].shape == (cfg.lora_tasks, 32, cfg.lora_rank)
    assert q["lora_b"].shape == (cfg.lora_tasks, cfg.lora_rank, 32)

    model = XLMREncoder(cfg)
    ids = np.full((2, 7), 7, np.int64)
    ids[0, :4] = [5, 9, 13, 42]
    mask = np.ones_like(ids)
    scale = cfg.lora_alpha / cfg.lora_rank

    for task_id in (0, 2, 4):
        # torch reference: materialize the parametrized weights at task_id
        with torch.no_grad():
            for i in range(cfg.num_layers):
                for proj in _PROJ_NAMES:
                    base = f"encoder.layer.{i}.{proj}"
                    la, lb = adapters[base]
                    w = sd[f"{base}.parametrizations.weight.original"]
                    mod = tm.get_submodule(base)
                    mod.weight.copy_(w + scale * lb[task_id] @ la[task_id])
            ref = tm(input_ids=torch.tensor(ids),
                     attention_mask=torch.tensor(mask)).last_hidden_state.numpy()
        got = np.asarray(model.apply(
            params, jnp.asarray(ids, jnp.int32), jnp.asarray(mask, jnp.int32),
            task_id, method=model.hidden_states))
        np.testing.assert_allclose(got, ref, atol=1e-4, rtol=1e-4)
