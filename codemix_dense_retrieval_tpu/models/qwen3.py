"""Flax Qwen3-Embedding decoder (0.6B / 4B / 8B family).

The reference runs these through sentence-transformers with accelerate
``device_map="auto"`` sharding for the 4B/8B sizes
(`onepass_dense_run.py:155-215`); here they are a functional Flax decoder
whose weights carry pjit tensor-parallel sharding rules
(:mod:`~codemix_dense_retrieval_tpu.parallel.tp`) so GSPMD inserts the
all-reduces over ICI — no layer offloading.

Architecture (HF ``Qwen3Model``): RMSNorm (pre-attn / pre-MLP), grouped
-query attention with per-head q/k RMSNorm, RoPE, SiLU gate MLP, causal
mask; embedding = L2-normalized LAST-token hidden state (the
``last_token`` pooling dialect, reference prompt_name="query").
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Mapping, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from codemix_dense_retrieval_tpu.models.xlmr import pool_and_normalize


@dataclass(frozen=True)
class Qwen3Config:
    vocab_size: int = 151_669
    hidden_size: int = 1024
    num_layers: int = 28
    num_heads: int = 16
    num_kv_heads: int = 8
    head_dim: int = 128
    intermediate_size: int = 3072
    rms_norm_eps: float = 1e-6
    rope_theta: float = 1_000_000.0
    max_position_embeddings: int = 32_768
    tie_word_embeddings: bool = True
    normalize: bool = True
    dtype: Any = jnp.float32
    use_flash: bool = False  # causal Pallas flash attention (TPU runs)

    @classmethod
    def embedding_0p6b(cls, **kw) -> "Qwen3Config":
        return cls(**kw)

    @classmethod
    def tiny(cls, **kw) -> "Qwen3Config":
        defaults = dict(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=4,
            num_kv_heads=2, head_dim=16, intermediate_size=64,
            rope_theta=10_000.0, max_position_embeddings=128,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def from_hf_config(cls, hf: Dict, **kw) -> "Qwen3Config":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            num_kv_heads=hf.get("num_key_value_heads", hf["num_attention_heads"]),
            head_dim=hf.get("head_dim", hf["hidden_size"] // hf["num_attention_heads"]),
            intermediate_size=hf["intermediate_size"],
            rms_norm_eps=hf.get("rms_norm_eps", 1e-6),
            rope_theta=hf.get("rope_theta", 1_000_000.0),
            max_position_embeddings=hf.get("max_position_embeddings", 32_768),
            tie_word_embeddings=hf.get("tie_word_embeddings", True),
            **kw,
        )


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(jnp.square(x.astype(jnp.float32)), axis=-1, keepdims=True)
        out = x.astype(jnp.float32) * lax.rsqrt(var + self.eps)
        return (out * scale).astype(x.dtype)


def rope(x: jnp.ndarray, positions: jnp.ndarray, theta: float) -> jnp.ndarray:
    """Rotary embedding, HF half-split convention. x: (B, S, H, Dh)."""
    dh = x.shape[-1]
    half = dh // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (B, S, half)
    cos = jnp.cos(angles)[:, :, None, :]
    sin = jnp.sin(angles)[:, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate(
        [x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1
    ).astype(x.dtype)


class Qwen3Attention(nn.Module):
    cfg: Qwen3Config

    @nn.compact
    def __call__(self, x, positions, lengths, segment_ids=None):
        c = self.cfg
        b, s, _ = x.shape
        h, kvh, dh = c.num_heads, c.num_kv_heads, c.head_dim
        q = nn.Dense(h * dh, use_bias=False, name="q_proj", dtype=c.dtype)(x)
        k = nn.Dense(kvh * dh, use_bias=False, name="k_proj", dtype=c.dtype)(x)
        v = nn.Dense(kvh * dh, use_bias=False, name="v_proj", dtype=c.dtype)(x)
        q = q.reshape(b, s, h, dh)
        k = k.reshape(b, s, kvh, dh)
        v = v.reshape(b, s, kvh, dh)
        # Qwen3 per-head q/k RMSNorm
        q = RMSNorm(c.rms_norm_eps, name="q_norm")(q)
        k = RMSNorm(c.rms_norm_eps, name="k_norm")(k)
        q = rope(q, positions, c.rope_theta)
        k = rope(k, positions, c.rope_theta)
        # (B, H|KVH, S, Dh)
        q, k, v = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
        if c.use_flash:
            from codemix_dense_retrieval_tpu.ops.flash_attention import attention_flash

            # GQA-native: the kernel maps q heads onto kv heads in its
            # index_map — repeated K/V never hit HBM. Packed rows add the
            # block-diagonal segment mask (causal-within-segment: global
            # col<=row intersected with same-segment is correct because
            # segments are contiguous in the row).
            out = attention_flash(
                q, k, v, lengths, causal=True, segment_ids=segment_ids
            )
        else:
            # GQA: repeat kv heads for the einsum path
            k = jnp.repeat(k, h // kvh, axis=1)
            v = jnp.repeat(v, h // kvh, axis=1)
            scores = jnp.einsum(
                "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            scores = scores / np.sqrt(dh)
            row = lax.broadcasted_iota(jnp.int32, (1, 1, s, s), 2)
            col = lax.broadcasted_iota(jnp.int32, (1, 1, s, s), 3)
            causal = col <= row
            valid = col < lengths[:, None, None, None]
            if segment_ids is not None:
                seg_q = segment_ids[:, None, :, None]
                valid = valid & (seg_q == segment_ids[:, None, None, :]) & (seg_q > 0)
            scores = jnp.where(causal & valid, scores, -1e30)
            probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
            out = jnp.einsum("bhqk,bhkd->bhqd", probs, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, s, h * dh)
        return nn.Dense(c.hidden_size, use_bias=False, name="o_proj", dtype=c.dtype)(out)


class Qwen3Mlp(nn.Module):
    cfg: Qwen3Config

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        gate = nn.Dense(c.intermediate_size, use_bias=False, name="gate_proj", dtype=c.dtype)(x)
        up = nn.Dense(c.intermediate_size, use_bias=False, name="up_proj", dtype=c.dtype)(x)
        return nn.Dense(c.hidden_size, use_bias=False, name="down_proj", dtype=c.dtype)(
            nn.silu(gate) * up
        )


class Qwen3Layer(nn.Module):
    cfg: Qwen3Config

    @nn.compact
    def __call__(self, x, positions, lengths, segment_ids=None):
        c = self.cfg
        h = RMSNorm(c.rms_norm_eps, name="input_layernorm")(x)
        x = x + Qwen3Attention(c, name="self_attn")(h, positions, lengths, segment_ids)
        h = RMSNorm(c.rms_norm_eps, name="post_attention_layernorm")(x)
        x = x + Qwen3Mlp(c, name="mlp")(h)
        return x


class Qwen3Encoder(nn.Module):
    """Decoder-only embedding model: last-token pool + L2 norm."""

    cfg: Qwen3Config
    # packed-encode position convention: RoPE positions restart at 0 per
    # segment (vs XLM-R's pad_id+1 learned-table convention)
    PACKED_POS = "zero"

    def setup(self) -> None:
        self.embed_tokens = nn.Embed(
            self.cfg.vocab_size, self.cfg.hidden_size, name="embed_tokens",
            dtype=self.cfg.dtype,
        )
        self.layers = [
            Qwen3Layer(self.cfg, name=f"layer_{i}") for i in range(self.cfg.num_layers)
        ]
        self.norm = RMSNorm(self.cfg.rms_norm_eps, name="norm")

    def hidden_states(self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray) -> jnp.ndarray:
        lengths = attention_mask.astype(jnp.int32).sum(axis=1)
        b, s = input_ids.shape
        positions = jnp.tile(jnp.arange(s, dtype=jnp.int32)[None], (b, 1))
        x = self.embed_tokens(input_ids)
        for layer in self.layers:
            x = layer(x, positions, lengths)
        return self.norm(x)

    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ) -> jnp.ndarray:
        # task_id accepted for TextEncoder interface uniformity (unused —
        # Qwen3-Embedding differentiates query/passage by prompt, not adapters)
        x = self.hidden_states(input_ids, attention_mask)
        return pool_and_normalize(x, attention_mask, "last_token", self.cfg.normalize)

    def packed_embeddings(
        self,
        input_ids: jnp.ndarray,
        segment_ids: jnp.ndarray,
        position_ids: jnp.ndarray,
        seg_starts: jnp.ndarray,
        seg_lengths: jnp.ndarray,
        task_id=None,
        *,
        max_segments: int,
    ) -> jnp.ndarray:
        """Sequence-packed forward (same contract as
        ``XLMREncoder.packed_embeddings``): causal-within-segment
        attention, per-segment RoPE position restart, per-segment
        LAST-token pooling + L2 norm. Returns (B, max_segments, d) f32;
        empty slots are zeros."""
        del task_id
        from codemix_dense_retrieval_tpu.models.xlmr import pool_segments

        lengths = (segment_ids > 0).astype(jnp.int32).sum(axis=1)
        x = self.embed_tokens(input_ids)
        for layer in self.layers:
            x = layer(x, position_ids, lengths, segment_ids)
        return pool_segments(
            self.norm(x).astype(jnp.float32), segment_ids, seg_starts,
            seg_lengths, "last_token", self.cfg.normalize, max_segments,
        )

    def packed_embed_with_tokens(
        self,
        input_ids: jnp.ndarray,
        segment_ids: jnp.ndarray,
        position_ids: jnp.ndarray,
        seg_starts: jnp.ndarray,
        seg_lengths: jnp.ndarray,
        task_id=None,
        *,
        max_segments: int,
    ):
        """Packed analog of :meth:`embed_with_tokens` (same contract as
        ``XLMREncoder.packed_embed_with_tokens``)."""
        del task_id
        from codemix_dense_retrieval_tpu.models.xlmr import pool_segments

        mask = (segment_ids > 0).astype(jnp.int32)
        lengths = mask.sum(axis=1)
        x = self.embed_tokens(input_ids)
        for layer in self.layers:
            x = layer(x, position_ids, lengths, segment_ids)
        xf = self.norm(x).astype(jnp.float32)
        pooled = pool_segments(
            xf, segment_ids, seg_starts, seg_lengths,
            "last_token", self.cfg.normalize, max_segments,
        )
        t = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-12)
        return pooled, t * mask.astype(jnp.float32)[..., None]

    def token_embeddings(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ) -> jnp.ndarray:
        """Per-token L2-normalized embeddings (multi-vector late interaction;
        same contract as ``XLMREncoder.token_embeddings``); pads zeroed."""
        x = self.hidden_states(input_ids, attention_mask).astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x * attention_mask.astype(jnp.float32)[..., None]

    def embed_with_tokens(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ):
        """One backbone pass -> (pooled, per-token normalized) — see
        ``XLMREncoder.embed_with_tokens``."""
        x = self.hidden_states(input_ids, attention_mask)
        pooled = pool_and_normalize(x, attention_mask, "last_token", self.cfg.normalize)
        t = x.astype(jnp.float32)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        return pooled, t * attention_mask.astype(jnp.float32)[..., None]


def convert_qwen3_state_dict(
    state_dict: Mapping[str, "object"], cfg: Qwen3Config, prefix: str = ""
) -> Dict:
    """HF ``Qwen3Model`` state dict -> Qwen3Encoder params."""

    def _np(t):
        try:
            return t.detach().cpu().float().numpy()
        except AttributeError:
            return np.asarray(t, dtype=np.float32)

    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def dense(name):
        return {"kernel": _np(sd[f"{name}.weight"]).T}

    def norm(name):
        return {"weight": _np(sd[f"{name}.weight"])}

    params: Dict = {
        "embed_tokens": {"embedding": _np(sd["embed_tokens.weight"])},
        "norm": norm("norm"),
    }
    for i in range(cfg.num_layers):
        hf = f"layers.{i}"
        params[f"layer_{i}"] = {
            "self_attn": {
                "q_proj": dense(f"{hf}.self_attn.q_proj"),
                "k_proj": dense(f"{hf}.self_attn.k_proj"),
                "v_proj": dense(f"{hf}.self_attn.v_proj"),
                "o_proj": dense(f"{hf}.self_attn.o_proj"),
                "q_norm": norm(f"{hf}.self_attn.q_norm"),
                "k_norm": norm(f"{hf}.self_attn.k_norm"),
            },
            "input_layernorm": norm(f"{hf}.input_layernorm"),
            "post_attention_layernorm": norm(f"{hf}.post_attention_layernorm"),
            "mlp": {
                "gate_proj": dense(f"{hf}.mlp.gate_proj"),
                "up_proj": dense(f"{hf}.mlp.up_proj"),
                "down_proj": dense(f"{hf}.mlp.down_proj"),
            },
        }
    return {"params": params}
