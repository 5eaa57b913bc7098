"""Flax GTE-multilingual encoder (Alibaba-NLP ``gte-multilingual-base``).

The reference's ablation sweep includes the GTE family via
sentence-transformers trust_remote_code (`run_ablation.sh:98-105`). The
architecture ("NewModel") is a post-LN BERT variant with rotary position
embeddings and a gated GELU MLP:

- embeddings: word + token_type (no absolute positions), LayerNorm;
- per layer: fused ``qkv_proj`` -> RoPE on q/k -> attention -> ``o_proj``
  -> LayerNorm(x + attn); gated MLP ``up_gate_proj`` (gate, up halves,
  ``gelu(gate) * up``) -> ``down_proj`` -> LayerNorm(x + mlp);
- pooling: CLS + L2 norm.

NOTE: built from the published architecture description; numerics and the
HF-name mapping are pinned against an in-repo torch reference forward
(tests/test_torch_oracles.py) to <=1e-4. Validation against real released
weights still needs a network-enabled environment (the HF implementation
is trust_remote_code and unavailable offline here).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.models.qwen3 import rope
from codemix_dense_retrieval_tpu.models.xlmr import pool_and_normalize


@dataclass(frozen=True)
class GTEConfig:
    vocab_size: int = 250_048
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-12
    rope_theta: float = 160_000.0
    max_position_embeddings: int = 8192
    pooling: str = "cls"
    normalize: bool = True
    dtype: Any = jnp.float32

    @classmethod
    def tiny(cls, **kw) -> "GTEConfig":
        defaults = dict(
            vocab_size=200, hidden_size=32, num_layers=2, num_heads=4,
            intermediate_size=64, max_position_embeddings=64, rope_theta=10_000.0,
        )
        defaults.update(kw)
        return cls(**defaults)


class GTELayer(nn.Module):
    cfg: GTEConfig

    @nn.compact
    def __call__(self, x, positions, lengths):
        c = self.cfg
        b, s, h = x.shape
        dh = h // c.num_heads
        qkv = nn.Dense(3 * h, name="qkv_proj", dtype=c.dtype)(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = rope(q.reshape(b, s, c.num_heads, dh), positions, c.rope_theta)
        k = rope(k.reshape(b, s, c.num_heads, dh), positions, c.rope_theta)
        v = v.reshape(b, s, c.num_heads, dh)
        qh, kh, vh = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        scores = jnp.einsum("bhqd,bhkd->bhqk", qh, kh, preferred_element_type=jnp.float32)
        scores = scores / np.sqrt(dh)
        col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, s), 3)
        scores = jnp.where(col < lengths[:, None, None, None], scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(vh.dtype)
        attn = jnp.einsum("bhqk,bhkd->bhqd", probs, vh)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, s, h)
        attn = nn.Dense(h, name="o_proj", dtype=c.dtype)(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln", dtype=c.dtype)(x + attn)
        up_gate = nn.Dense(2 * c.intermediate_size, name="up_gate_proj", use_bias=False,
                           dtype=c.dtype)(x)
        up, gate = jnp.split(up_gate, 2, axis=-1)
        y = nn.Dense(h, name="down_proj", dtype=c.dtype)(up * nn.gelu(gate, approximate=False))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="mlp_ln", dtype=c.dtype)(x + y)
        return x


class GTEEncoder(nn.Module):
    cfg: GTEConfig

    def setup(self) -> None:
        c = self.cfg
        self.word_embeddings = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings",
                                        dtype=c.dtype)
        self.token_type_embeddings = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings", dtype=c.dtype
        )
        self.emb_ln = nn.LayerNorm(epsilon=c.layer_norm_eps, name="emb_ln", dtype=c.dtype)
        self.layers = [GTELayer(c, name=f"layer_{i}") for i in range(c.num_layers)]

    def hidden_states(self, input_ids, attention_mask):
        b, s = input_ids.shape
        lengths = attention_mask.astype(jnp.int32).sum(axis=1)
        positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
        x = self.word_embeddings(input_ids) + self.token_type_embeddings(
            jnp.zeros_like(input_ids)
        )
        x = self.emb_ln(x)
        for layer in self.layers:
            x = layer(x, positions, lengths)
        return x

    def __call__(self, input_ids, attention_mask, task_id=None):
        x = self.hidden_states(input_ids, attention_mask)
        return pool_and_normalize(x, attention_mask, self.cfg.pooling, self.cfg.normalize)

    def token_embeddings(self, input_ids, attention_mask, task_id=None):
        """Per-token L2-normalized embeddings (multi-vector late interaction;
        same contract as ``XLMREncoder.token_embeddings``); pads zeroed."""
        x = self.hidden_states(input_ids, attention_mask).astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x * attention_mask.astype(jnp.float32)[..., None]

    def embed_with_tokens(self, input_ids, attention_mask, task_id=None):
        """One backbone pass -> (pooled, per-token normalized) — see
        ``XLMREncoder.embed_with_tokens``."""
        x = self.hidden_states(input_ids, attention_mask)
        pooled = pool_and_normalize(x, attention_mask, self.cfg.pooling, self.cfg.normalize)
        t = x.astype(jnp.float32)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        return pooled, t * attention_mask.astype(jnp.float32)[..., None]


def convert_gte_state_dict(state_dict: Mapping[str, "object"], cfg: GTEConfig, prefix: str = "") -> Dict:
    """Best-effort HF NewModel state-dict mapping (see module NOTE)."""

    def _np(t):
        try:
            return t.detach().cpu().float().numpy()
        except AttributeError:
            return np.asarray(t, dtype=np.float32)

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def dense(name, bias=True):
        out = {"kernel": _np(sd[f"{name}.weight"]).T}
        if bias and f"{name}.bias" in sd:
            out["bias"] = _np(sd[f"{name}.bias"])
        return out

    def ln(name):
        return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}

    params: Dict = {
        "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
        "token_type_embeddings": {
            "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
        },
        "emb_ln": ln("embeddings.LayerNorm"),
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "qkv_proj": dense(f"{hf}.attention.qkv_proj"),
            "o_proj": dense(f"{hf}.attention.o_proj"),
            "attn_ln": ln(f"{hf}.attn_ln"),
            "up_gate_proj": dense(f"{hf}.mlp.up_gate_proj", bias=False),
            "down_proj": dense(f"{hf}.mlp.down_proj"),
            "mlp_ln": ln(f"{hf}.mlp_ln"),
        }
    return {"params": params}
