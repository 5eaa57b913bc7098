"""Encoder registry: one entry point for the whole encoder zoo.

``load_encoder(name, checkpoint_dir)`` dispatches on the encoder family
(name substring, reference dialect detection) and the checkpoint's
``config.json`` ``model_type`` to build the right architecture +
conversion + tokenizer:

- XLM-R family (``xlm-roberta``): BGE-M3, multilingual-E5, LaBSE-class
- Qwen3-Embedding (``qwen3``): decoder, last-token pooling
- GTE-multilingual (``new``): RoPE post-LN encoder
- jina-embeddings-v3: XLM-R + task-LoRA adapters

Replaces sentence-transformers' model-card dispatch
(`onepass_dense_run.py:155-215`).
"""

from __future__ import annotations

import json
import pathlib
from typing import Optional

from codemix_dense_retrieval_tpu.models import dialects
from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
from codemix_dense_retrieval_tpu.models.tokenizer import load_tokenizer
from codemix_dense_retrieval_tpu.utils.logging import get_logger

log = get_logger("registry")


def _load_state_dict(d: pathlib.Path):
    # single-file or index.json-sharded safetensors/torch layouts
    from codemix_dense_retrieval_tpu.models.convert import load_state_dict

    return load_state_dict(d)


def load_encoder(
    name: str,
    checkpoint_dir: Optional[str] = None,
    *,
    dtype=None,
    use_flash: Optional[bool] = None,
    seed: int = 0,
    mesh=None,
    weight_quant: Optional[str] = None,
) -> TextEncoder:
    """Build a TextEncoder for any supported family.

    Without ``checkpoint_dir``: random-init architecture for the family
    (smoke/testing mode). With one: HF-format dir (config.json + weights)
    or a pre-converted dir (params.npz + encoder_config.json).
    ``mesh``: a jax Mesh with a "shard" axis enables data-parallel
    encoding (batch split over devices, params replicated).
    """
    import jax.numpy as jnp

    family = dialects.detect_encoder_family(name)
    if dtype is None:
        import jax

        dtype = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    if use_flash is None:
        import jax

        use_flash = jax.default_backend() == "tpu"

    if checkpoint_dir is None:
        return _random_init(name, family, dtype, use_flash, seed, mesh, weight_quant)

    d = pathlib.Path(checkpoint_dir)
    if (d / "params.npz").exists():
        # pre-converted: XLM-R-family only for now (the convert CLI path)
        return TextEncoder.from_checkpoint(name, d, seed=seed, mesh=mesh, weight_quant=weight_quant)
    hf_cfg = json.loads((d / "config.json").read_text())
    model_type = hf_cfg.get("model_type", "xlm-roberta")
    sd = _load_state_dict(d)

    if model_type == "qwen3" or family == "qwen3":
        from codemix_dense_retrieval_tpu.models.qwen3 import (
            Qwen3Config,
            Qwen3Encoder,
            convert_qwen3_state_dict,
        )

        cfg = Qwen3Config.from_hf_config(hf_cfg, dtype=dtype, use_flash=use_flash)
        prefix = _detect_prefix(sd, "embed_tokens.weight")
        params = convert_qwen3_state_dict(sd, cfg, prefix=prefix)
        tok = load_tokenizer(d, cfg.max_position_embeddings - 2, vocab_size=cfg.vocab_size)
        return TextEncoder(name, cfg, params, tok, model=Qwen3Encoder(cfg), seed=seed, mesh=mesh, weight_quant=weight_quant)

    if model_type == "new" or family == "gte":
        from codemix_dense_retrieval_tpu.models.gte import (
            GTEConfig,
            GTEEncoder,
            convert_gte_state_dict,
        )

        cfg = GTEConfig(
            vocab_size=hf_cfg["vocab_size"],
            hidden_size=hf_cfg["hidden_size"],
            num_layers=hf_cfg["num_hidden_layers"],
            num_heads=hf_cfg["num_attention_heads"],
            intermediate_size=hf_cfg["intermediate_size"],
            layer_norm_eps=hf_cfg.get("layer_norm_eps", 1e-12),
            rope_theta=hf_cfg.get("rope_theta", 160_000.0),
            max_position_embeddings=hf_cfg.get("max_position_embeddings", 8192),
            dtype=dtype,
        )
        prefix = _detect_prefix(sd, "embeddings.word_embeddings.weight")
        params = convert_gte_state_dict(sd, cfg, prefix=prefix)
        tok = load_tokenizer(d, cfg.max_position_embeddings - 2, vocab_size=cfg.vocab_size)
        return TextEncoder(name, cfg, params, tok, model=GTEEncoder(cfg), seed=seed, mesh=mesh, weight_quant=weight_quant)

    # XLM-R family (incl. jina-v3 LoRA)
    from codemix_dense_retrieval_tpu.models.convert import (
        convert_xlmr_state_dict,
        detect_prefix,
    )
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    extra = {}
    if family == "jina-v3":
        extra = dict(lora_rank=hf_cfg.get("lora_rank", 4), lora_tasks=5)
    cfg = XLMRConfig.from_hf_config(
        hf_cfg, pooling=dialects.default_pooling(name), dtype=dtype,
        use_flash=use_flash, **extra,
    )
    params = convert_xlmr_state_dict(sd, cfg, prefix=detect_prefix(sd))
    tok = load_tokenizer(d, cfg.max_position_embeddings - 2, vocab_size=cfg.vocab_size)
    return TextEncoder(name, cfg, params, tok, seed=seed, mesh=mesh, weight_quant=weight_quant)


def _detect_prefix(sd, marker: str) -> str:
    for key in sd:
        if key.endswith(marker):
            return key[: -len(marker)]
    raise KeyError(f"no {marker} in state dict")


def _random_init(name, family, dtype, use_flash, seed, mesh=None, weight_quant=None) -> TextEncoder:
    """Smoke-mode random-init encoder of the right family shape (tiny)."""
    if family == "qwen3":
        from codemix_dense_retrieval_tpu.models.qwen3 import Qwen3Config, Qwen3Encoder

        cfg = Qwen3Config.tiny(vocab_size=30_000, dtype=dtype)
        return TextEncoder(name, cfg, model=Qwen3Encoder(cfg), seed=seed, mesh=mesh, weight_quant=weight_quant)
    if family == "gte":
        from codemix_dense_retrieval_tpu.models.gte import GTEConfig, GTEEncoder

        cfg = GTEConfig.tiny(vocab_size=30_000, dtype=dtype)
        return TextEncoder(name, cfg, model=GTEEncoder(cfg), seed=seed, mesh=mesh, weight_quant=weight_quant)
    from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig

    extra = dict(lora_rank=4, lora_tasks=5) if family == "jina-v3" else {}
    cfg = XLMRConfig.tiny(
        vocab_size=30_000, hidden_size=64, num_heads=4, intermediate_size=256,
        pooling=dialects.default_pooling(name), dtype=dtype, use_flash=use_flash,
        **extra,
    )
    return TextEncoder(name, cfg, seed=seed, mesh=mesh, weight_quant=weight_quant)
