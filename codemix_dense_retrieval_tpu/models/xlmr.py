"""Flax XLM-RoBERTa encoder — the architecture behind BGE-M3,
multilingual-E5, LaBSE-style and Jina-v3 embedding models.

This replaces the reference's PyTorch/sentence-transformers encode path
(`model.encode`, e.g. `onepass_dense_run.py:351-353`) with a jit/pjit-able
functional forward: embeddings -> N transformer layers -> pooling
(cls | mean | last_token) -> L2 norm, all inside one traced graph so XLA
fuses pooling+norm into the final matmuls (SURVEY §2.2 "TPU-native
equivalent" table).

Attention runs through :mod:`~codemix_dense_retrieval_tpu.ops.flash_attention`
(Pallas kernel on TPU, reference XLA softmax path on CPU/tests).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from codemix_dense_retrieval_tpu.ops.flash_attention import multi_head_attention


@dataclass(frozen=True)
class XLMRConfig:
    vocab_size: int = 250_002
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    max_position_embeddings: int = 8194
    type_vocab_size: int = 1
    layer_norm_eps: float = 1e-5
    pad_token_id: int = 1
    pooling: str = "cls"  # cls | mean | last_token
    normalize: bool = True
    dtype: Any = jnp.float32  # compute dtype (bfloat16 on TPU)
    use_flash: bool = True
    # Jina-v3-style task LoRA adapters: rank 0 disables; when enabled every
    # projection carries per-task (A, B) low-rank deltas selected at call
    # time by task id (reference dialect: task="retrieval.query"/"retrieval.passage",
    # `onepass_dense_mix_run_custom_lang.py:46-58`).
    lora_rank: int = 0
    lora_tasks: int = 0
    lora_alpha: float = 1.0

    @classmethod
    def bge_m3(cls, **kw) -> "XLMRConfig":
        """BGE-M3: XLM-R-large backbone, 8192-token window, CLS pooling
        (dense head == normalized [CLS] hidden state)."""
        return cls(pooling="cls", **kw)

    @classmethod
    def me5_large(cls, **kw) -> "XLMRConfig":
        """multilingual-e5-large: XLM-R-large, 512 window, mean pooling."""
        return cls(max_position_embeddings=514, pooling="mean", **kw)

    @classmethod
    def jina_v3(cls, **kw) -> "XLMRConfig":
        """jina-embeddings-v3: XLM-R backbone + 5-task LoRA (r=4), mean
        pooling. Task ids follow JINA_V3_TASKS."""
        defaults = dict(pooling="mean", lora_rank=4, lora_tasks=5)
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def tiny(cls, **kw) -> "XLMRConfig":
        """Small config for tests."""
        defaults = dict(
            vocab_size=100, hidden_size=32, num_layers=2, num_heads=2,
            intermediate_size=64, max_position_embeddings=64,
        )
        defaults.update(kw)
        return cls(**defaults)

    @classmethod
    def from_hf_config(cls, hf: Dict, **kw) -> "XLMRConfig":
        return cls(
            vocab_size=hf["vocab_size"],
            hidden_size=hf["hidden_size"],
            num_layers=hf["num_hidden_layers"],
            num_heads=hf["num_attention_heads"],
            intermediate_size=hf["intermediate_size"],
            max_position_embeddings=hf["max_position_embeddings"],
            type_vocab_size=hf.get("type_vocab_size", 1),
            layer_norm_eps=hf.get("layer_norm_eps", 1e-5),
            pad_token_id=hf.get("pad_token_id", 1),
            **kw,
        )


def position_ids_from_input_ids(input_ids: jnp.ndarray, pad_token_id: int) -> jnp.ndarray:
    """RoBERTa-style position ids: positions count non-pad tokens and start
    at pad_token_id + 1 (HF ``create_position_ids_from_input_ids``)."""
    mask = (input_ids != pad_token_id).astype(jnp.int32)
    return jnp.cumsum(mask, axis=1) * mask + pad_token_id


class XLMREmbeddings(nn.Module):
    cfg: XLMRConfig

    @nn.compact
    def __call__(
        self, input_ids: jnp.ndarray, position_ids: Optional[jnp.ndarray] = None
    ) -> jnp.ndarray:
        c = self.cfg
        word = nn.Embed(c.vocab_size, c.hidden_size, name="word_embeddings", dtype=c.dtype)
        pos = nn.Embed(
            c.max_position_embeddings, c.hidden_size, name="position_embeddings", dtype=c.dtype
        )
        tok_type = nn.Embed(
            c.type_vocab_size, c.hidden_size, name="token_type_embeddings", dtype=c.dtype
        )
        if position_ids is None:
            # packed rows pass explicit per-segment-restarting positions;
            # the default derives them from the pad convention (HF)
            position_ids = position_ids_from_input_ids(input_ids, c.pad_token_id)
        x = word(input_ids) + pos(position_ids) + tok_type(jnp.zeros_like(input_ids))
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="LayerNorm", dtype=c.dtype)(x)
        return x


# jina-embeddings-v3 task-adapter order (index = task id)
JINA_V3_TASKS = (
    "retrieval.query",
    "retrieval.passage",
    "separation",
    "classification",
    "text-matching",
)


class LoraDense(nn.Module):
    """Dense layer with optional per-task low-rank adaptation.

    ``task_id`` (traced int scalar) selects the adapter pair; the delta is
    ``alpha/r * (x @ A_t) @ B_t`` added to the frozen base projection —
    the Jina-v3 adapter mechanism as a functional Flax module.
    """

    features: int
    rank: int = 0
    num_tasks: int = 0
    alpha: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, task_id=None) -> jnp.ndarray:
        out = nn.Dense(self.features, name="base", dtype=self.dtype)(x)
        if self.rank and self.num_tasks:
            a = self.param(
                "lora_a",
                nn.initializers.normal(1e-2),
                (self.num_tasks, x.shape[-1], self.rank),
            )
            b = self.param(
                "lora_b", nn.initializers.zeros, (self.num_tasks, self.rank, self.features)
            )
            tid = jnp.asarray(0 if task_id is None else task_id, jnp.int32)
            a_t = jnp.take(a, tid, axis=0).astype(self.dtype)
            b_t = jnp.take(b, tid, axis=0).astype(self.dtype)
            out = out + (self.alpha / self.rank) * ((x @ a_t) @ b_t)
        return out


class XLMRLayer(nn.Module):
    cfg: XLMRConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None,
        segment_ids: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        c = self.cfg
        h = c.hidden_size

        def dense(features, name):
            if c.lora_rank:
                return lambda y: LoraDense(
                    features, c.lora_rank, c.lora_tasks, c.lora_alpha, c.dtype, name=name
                )(y, task_id)
            return nn.Dense(features, name=name, dtype=c.dtype)

        q = dense(h, "q")(x)
        k = dense(h, "k")(x)
        v = dense(h, "v")(x)
        attn = multi_head_attention(
            q, k, v, attention_mask, num_heads=c.num_heads, use_flash=c.use_flash,
            segment_ids=segment_ids,
        )
        attn = dense(h, "attn_out")(attn)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="attn_ln", dtype=c.dtype)(x + attn)
        y = dense(c.intermediate_size, "ffn_in")(x)
        y = nn.gelu(y, approximate=False)
        y = dense(h, "ffn_out")(y)
        x = nn.LayerNorm(epsilon=c.layer_norm_eps, name="ffn_ln", dtype=c.dtype)(x + y)
        return x


class XLMREncoder(nn.Module):
    """Full encoder; ``__call__`` returns pooled (and optionally normalized)
    sentence embeddings; ``hidden_states`` returns the last hidden layer."""

    cfg: XLMRConfig

    def setup(self) -> None:
        self.embeddings = XLMREmbeddings(self.cfg, name="embeddings")
        self.layers = [XLMRLayer(self.cfg, name=f"layer_{i}") for i in range(self.cfg.num_layers)]

    def hidden_states(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ) -> jnp.ndarray:
        x = self.embeddings(input_ids)
        for layer in self.layers:
            x = layer(x, attention_mask, task_id)
        return x

    def __call__(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ) -> jnp.ndarray:
        x = self.hidden_states(input_ids, attention_mask, task_id)
        return pool_and_normalize(
            x, attention_mask, self.cfg.pooling, self.cfg.normalize
        )

    def token_embeddings(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ) -> jnp.ndarray:
        """Per-token L2-normalized embeddings for multi-vector (ColBERT /
        BGE-M3 colbert-head) late interaction; padded tokens zeroed.
        Feed into :mod:`~codemix_dense_retrieval_tpu.ops.maxsim`."""
        x = self.hidden_states(input_ids, attention_mask, task_id).astype(jnp.float32)
        x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        return x * attention_mask.astype(jnp.float32)[..., None]

    def packed_embeddings(
        self,
        input_ids: jnp.ndarray,       # (B, S) packed rows
        segment_ids: jnp.ndarray,     # (B, S) int32; 0 = pad, 1..M = seqs
        position_ids: jnp.ndarray,    # (B, S) per-segment RoBERTa positions
        seg_starts: jnp.ndarray,      # (B, M) int32 first-token index per slot
        seg_lengths: jnp.ndarray,     # (B, M) int32 token count (0 = empty)
        task_id=None,
        *,
        max_segments: int,
    ) -> jnp.ndarray:
        """Sequence-packed forward (SURVEY §7 hard parts: "prefetch +
        pack"): multiple short passages share one device row under a
        block-diagonal attention mask, eliminating intra-bucket pad waste
        in corpus encode. Returns per-SEGMENT pooled embeddings
        (B, max_segments, d) f32 — empty slots are zero vectors; callers
        unpack with their (row, slot) placement map.

        Matches the unpacked forward exactly (modulo float reassociation):
        per-segment positions restart the RoBERTa numbering, attention
        never crosses segments, and pooling reduces each segment alone
        (tests/test_packing.py asserts parity).
        """
        c = self.cfg
        mask = (segment_ids > 0).astype(jnp.int32)
        x = self.embeddings(input_ids, position_ids)
        for layer in self.layers:
            x = layer(x, mask, task_id, segment_ids=segment_ids)
        return pool_segments(
            x.astype(jnp.float32), segment_ids, seg_starts, seg_lengths,
            c.pooling, c.normalize, max_segments,
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
        """Packed analog of :meth:`embed_with_tokens`: one backbone pass
        over packed rows -> (per-segment pooled (B, M, d) f32, per-token
        normalized embeddings (B, S, d) f32 with pad slots zeroed).
        Callers slice each segment's token block out of the row with the
        packer's (start, length) table."""
        c = self.cfg
        mask = (segment_ids > 0).astype(jnp.int32)
        x = self.embeddings(input_ids, position_ids)
        for layer in self.layers:
            x = layer(x, mask, task_id, segment_ids=segment_ids)
        xf = x.astype(jnp.float32)
        pooled = pool_segments(
            xf, segment_ids, seg_starts, seg_lengths,
            c.pooling, c.normalize, max_segments,
        )
        t = xf / jnp.maximum(jnp.linalg.norm(xf, axis=-1, keepdims=True), 1e-12)
        return pooled, t * mask.astype(jnp.float32)[..., None]

    def embed_with_tokens(
        self, input_ids: jnp.ndarray, attention_mask: jnp.ndarray, task_id=None
    ):
        """One backbone pass -> (pooled sentence embedding, per-token
        normalized embeddings) for building the dense index and the token
        store together (two-stage serving) without doubling the forward."""
        x = self.hidden_states(input_ids, attention_mask, task_id)
        pooled = pool_and_normalize(
            x, attention_mask, self.cfg.pooling, self.cfg.normalize
        )
        t = x.astype(jnp.float32)
        t = t / jnp.maximum(jnp.linalg.norm(t, axis=-1, keepdims=True), 1e-12)
        return pooled, t * attention_mask.astype(jnp.float32)[..., None]


def pool_segments(
    hidden_f32: jnp.ndarray,    # (B, S, d) f32
    segment_ids: jnp.ndarray,   # (B, S) int32, 0 = pad
    seg_starts: jnp.ndarray,    # (B, M)
    seg_lengths: jnp.ndarray,   # (B, M)
    pooling: str,
    normalize: bool,
    max_segments: int,
) -> jnp.ndarray:
    """Per-SEGMENT pooling for packed rows -> (B, M, d) f32; empty slots
    exact zeros. Mean pooling reduces via a one-hot segment matmul on the
    MXU (no scatter, no per-segment loop)."""
    x = hidden_f32
    if pooling == "cls":
        pooled = jnp.take_along_axis(x, seg_starts[:, :, None], axis=1)
    elif pooling == "mean":
        sel = (
            segment_ids[:, None, :]
            == (1 + jnp.arange(max_segments))[None, :, None]
        ).astype(jnp.float32)
        pooled = jnp.einsum("bms,bsd->bmd", sel, x) / jnp.maximum(
            seg_lengths[:, :, None].astype(jnp.float32), 1e-9
        )
    elif pooling == "last_token":
        idx = seg_starts + jnp.maximum(seg_lengths - 1, 0)
        pooled = jnp.take_along_axis(x, idx[:, :, None], axis=1)
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    if normalize:
        pooled = pooled / jnp.maximum(
            jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return pooled * (seg_lengths > 0)[:, :, None].astype(jnp.float32)


def pool_and_normalize(
    hidden: jnp.ndarray,
    attention_mask: jnp.ndarray,
    pooling: str,
    normalize: bool,
) -> jnp.ndarray:
    """cls | mean | last_token pooling + in-graph L2 norm (fused by XLA
    into the surrounding program — replaces torch ``normalize_embeddings``,
    reference `onepass_dense_mix_run_custom_lang.py:363`)."""
    mask = attention_mask.astype(hidden.dtype)[..., None]  # (B, S, 1)
    if pooling == "cls":
        pooled = hidden[:, 0]
    elif pooling == "mean":
        pooled = (hidden * mask).sum(axis=1) / jnp.maximum(mask.sum(axis=1), 1e-9)
    elif pooling == "last_token":
        # last non-pad token (Qwen3-style); lengths from the mask
        lengths = attention_mask.astype(jnp.int32).sum(axis=1)
        idx = jnp.maximum(lengths - 1, 0)
        pooled = jnp.take_along_axis(hidden, idx[:, None, None], axis=1)[:, 0]
    else:
        raise ValueError(f"unknown pooling {pooling!r}")
    pooled = pooled.astype(jnp.float32)
    if normalize:
        pooled = pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)
    return pooled
