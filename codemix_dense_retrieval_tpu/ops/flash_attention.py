"""Fused (flash) attention for the encoder stack.

Replaces the reference's ``--attn_impl flash_attention_2`` CUDA hint
(`onepass_dense_run.py:104-105,199`) with a Pallas kernel that is the
default TPU path: per (batch*head, q-block) program, K/V stream through
VMEM in blocks with an online-softmax running (max, sum, acc) — the
(S, S) score matrix never touches HBM. Padding is handled by per-sequence
lengths (scalar-prefetched), masking key columns beyond the length.

A plain-XLA reference implementation backs CPU tests and serves as the
numerics oracle.
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def attention_xla(
    q: jnp.ndarray,  # (B, H, S, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32 valid key counts
    causal: bool = False,
) -> jnp.ndarray:
    dh = q.shape[-1]
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(dh)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, k.shape[2]), 3)
    mask = col < lengths[:, None, None, None]
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[2], 1), 2)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


def _flash_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, *, num_heads, block_k, sm_scale, causal
):
    bh = pl.program_id(0)
    jq = pl.program_id(1)
    length = len_ref[bh // num_heads]
    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, dh)
    block_q, dh = q.shape
    s_total = k_ref.shape[1]
    num_kb = s_total // block_k

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_k
        valid = col < length
        if causal:
            row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + jq * block_q
            valid = valid & (col <= row)
        s = jnp.where(valid, s, _NEG)
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(s - m_new)
        l_new = l * alpha + jnp.sum(p, axis=-1, keepdims=True)
        acc_new = acc * alpha + lax.dot_general(
            p, vb, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        return m_new, l_new, acc_new

    m0 = jnp.full((block_q, 1), _NEG, jnp.float32)
    l0 = jnp.zeros((block_q, 1), jnp.float32)
    a0 = jnp.zeros((block_q, dh), jnp.float32)
    m, l, acc = lax.fori_loop(0, num_kb, body, (m0, l0, a0))
    o_ref[0] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def attention_flash(
    q: jnp.ndarray,  # (B, H, S, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    block_q: int = 256,
    block_k: int = 256,
    interpret: Optional[bool] = None,
    causal: bool = False,
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    b, h, s, dh = q.shape
    bq = min(block_q, s)
    bk = min(block_k, s)
    s_pad = ((s + bq - 1) // bq) * bq
    s_pad = ((s_pad + bk - 1) // bk) * bk
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qf = q.reshape(b * h, s_pad, dh)
    kf = k.reshape(b * h, s_pad, dh)
    vf = v.reshape(b * h, s_pad, dh)
    grid = (b * h, s_pad // bq)
    kernel = functools.partial(
        _flash_kernel, num_heads=h, block_k=bk, sm_scale=1.0 / math.sqrt(dh),
        causal=causal,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((1, bq, dh), lambda i, jq: (i, jq, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh), lambda i, jq: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s_pad, dh), lambda i, jq: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dh), lambda i, jq: (i, jq, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        interpret=interpret,
    )(jnp.asarray(lengths, jnp.int32), qf, kf, vf)
    out = out.reshape(b, h, s_pad, dh)
    return out[:, :, :s, :]


def multi_head_attention(
    q: jnp.ndarray,  # (B, S, H*Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    attention_mask: jnp.ndarray,  # (B, S) 1 = valid
    *,
    num_heads: int,
    use_flash: bool = True,
    causal: bool = False,
    flash_min_seq: int = 512,
) -> jnp.ndarray:
    """Self-attention over packed (B, S, D) projections.

    ``attention_mask`` must be contiguous-prefix (standard right-padding);
    it is reduced to per-sequence lengths for the flash path. ``causal``
    adds the decoder mask (Qwen3-style embedders).

    Dispatch is length-aware even when ``use_flash``: measured on v5e,
    XLA softmax attention is ~25% faster at S=128 (the flash kernel's
    per-(batch*head) program overhead dominates) with crossover at ~512;
    past that the flash path avoids the O(S^2) HBM score materialization
    entirely (mandatory by S=2k+). ``flash_min_seq`` tunes the switch.
    """
    b, s, d = q.shape
    dh = d // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    lengths = attention_mask.astype(jnp.int32).sum(axis=1)
    qh, kh, vh = split(q), split(k), split(v)
    if use_flash and s > flash_min_seq:
        out = attention_flash(qh, kh, vh, lengths, causal=causal)
    else:
        out = attention_xla(qh, kh, vh, lengths, causal=causal)
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)
