"""Fused (flash) attention for the encoder stack.

Replaces the reference's ``--attn_impl flash_attention_2`` CUDA hint
(`onepass_dense_run.py:104-105,199`) with a Pallas kernel that is the
default TPU path: grid (batch*head, q-block, k-block) with the key-block
dimension innermost — K/V stream through VMEM one (block_k, dh) tile at
a time while the online-softmax (max, sum, acc) state carries in VMEM
scratch, so the (S, S) score matrix never touches HBM and VMEM use is
O(block), not O(S). Padding is handled by per-sequence lengths
(scalar-prefetched): key blocks past the length (and, for causal, past
the q-block's frontier) are skipped outright.

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
    k: jnp.ndarray,  # (B, H or KVH, S, Dh) — KVH | H means GQA
    v: jnp.ndarray,
    lengths: jnp.ndarray,  # (B,) int32 valid key counts
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) int32, 0 = pad
) -> jnp.ndarray:
    dh = q.shape[-1]
    if k.shape[1] != q.shape[1]:  # GQA: broadcast kv heads to q heads
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    s = s / math.sqrt(dh)
    col = lax.broadcasted_iota(jnp.int32, (1, 1, 1, k.shape[2]), 3)
    mask = col < lengths[:, None, None, None]
    if segment_ids is not None:
        # packed rows: attention stays within each segment (block-diagonal
        # mask) — multiple independent passages share one device row
        seg = segment_ids[:, None, :, None]  # (B, 1, S, 1) as q rows
        mask = mask & (seg == segment_ids[:, None, None, :]) & (seg > 0)
    if causal:
        row = lax.broadcasted_iota(jnp.int32, (1, 1, q.shape[2], 1), 2)
        mask = mask & (col <= row)
    s = jnp.where(mask, s, _NEG)
    p = jax.nn.softmax(s, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)
    # fully-masked rows (length 0 / pad slots in packed rows) would
    # softmax uniformly over padding and emit mean-of-V garbage — zero
    # them (flash-kernel parity)
    live = (lengths > 0)[:, None, None, None]
    if segment_ids is not None:
        live = live & (segment_ids > 0)[:, None, :, None]
    return jnp.where(live, out, 0)


def _flash_kernel_seg(
    len_ref, q_ref, k_ref, v_ref, qseg_ref, kseg_ref,
    o_ref, m_ref, l_ref, acc_ref,
    *, num_heads, block_q, block_k, window, num_w, sm_scale, causal,
):
    """Packed-row (segment-masked) variant: same online-softmax walk, but
    score validity additionally requires matching per-token segment ids
    (block-diagonal attention for sequence packing; seg 0 = pad). Segment
    ids arrive pre-broadcast as (B, S, 1) q-side / (B, 1, S) k-side so no
    in-kernel transpose/relayout is needed."""
    _flash_kernel(
        len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
        num_heads=num_heads, block_q=block_q, block_k=block_k,
        window=window, num_w=num_w, sm_scale=sm_scale, causal=causal,
        qseg_ref=qseg_ref, kseg_ref=kseg_ref,
    )


def _flash_kernel(
    len_ref, q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
    *, num_heads, block_q, block_k, window, num_w, sm_scale, causal,
    qseg_ref=None, kseg_ref=None,
):
    # grid = (B*H, num_q_blocks, num_k_WINDOWS), windows innermost: the
    # (m, l, acc) online-softmax state lives in VMEM scratch and carries
    # across the window dimension, so VMEM holds one (window, dh) K/V
    # slab at a time — O(window), not O(S) (long-context Qwen3 S=16k
    # dh=128 compiles and runs; the full-sequence BlockSpec variant
    # exceeded VMEM there). Sub-blocks of the window run in an inner
    # fori_loop whose bound is CLAMPED to the sequence length (and the
    # causal frontier), so masked-out work is skipped — a pure grid over
    # (block_k)-tiles cannot skip the per-step DMA and paid ~26 us of
    # grid-step overhead per tiny block on v5e; the windowed hybrid
    # hits 17.5 TF/s dense-equiv causal at S=4096 dh=128
    # (probe_flash_speed r3).
    bh = pl.program_id(0)
    jq = pl.program_id(1)
    w = pl.program_id(2)
    length = len_ref[bh // num_heads]

    @pl.when(w == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, _NEG)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0].astype(jnp.float32) * sm_scale  # (block_q, dh)
    block_q_, _ = q.shape
    # only sub-blocks below this limit can contain unmasked columns
    limit = length
    if causal:
        limit = jnp.minimum(limit, jq * block_q_ + block_q_)
    n_sub = jnp.clip(
        (limit - w * window + block_k - 1) // block_k, 0, window // block_k
    )

    qs = qseg_ref[0] if qseg_ref is not None else None  # (block_q, 1)

    def body(j, carry):
        m, l, acc = carry
        kb = k_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        vb = v_ref[0, pl.ds(j * block_k, block_k), :].astype(jnp.float32)
        s = lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (block_q, block_k)
        col = lax.broadcasted_iota(jnp.int32, s.shape, 1) + w * window + j * block_k
        valid = col < length
        if qs is not None:
            ks = kseg_ref[0, :, pl.ds(j * block_k, block_k)]  # (1, block_k)
            valid = valid & (qs == ks) & (ks > 0)
        if causal:
            row = lax.broadcasted_iota(jnp.int32, s.shape, 0) + jq * block_q_
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

    m, l, acc = lax.fori_loop(
        0, n_sub, body, (m_ref[:], l_ref[:], acc_ref[:])
    )
    m_ref[:] = m
    l_ref[:] = l
    acc_ref[:] = acc

    @pl.when(w == num_w - 1)
    def _finalize():
        out = acc_ref[:] / jnp.maximum(l_ref[:], 1e-30)
        # fully-masked rows (length 0): m never rose above _NEG and the
        # online softmax would emit mean-of-V garbage — zero them
        out = jnp.where(m_ref[:] > _NEG / 2, out, 0.0)
        o_ref[0] = out.astype(o_ref.dtype)


def attention_flash(
    q: jnp.ndarray,  # (B, H, S, Dh)
    k: jnp.ndarray,
    v: jnp.ndarray,
    lengths: jnp.ndarray,
    *,
    block_q: int = 256,
    block_k: int = 256,
    window: Optional[int] = None,
    interpret: Optional[bool] = None,
    causal: bool = False,
    segment_ids: Optional[jnp.ndarray] = None,  # (B, S) int32, 0 = pad
) -> jnp.ndarray:
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    if window is None:
        from codemix_dense_retrieval_tpu.utils.autotune import get_tuned

        window = int(get_tuned("flash.window"))
    b, h, s, dh = q.shape
    kvh = k.shape[1]
    if h % kvh:
        raise ValueError(f"q heads {h} not a multiple of kv heads {kvh}")
    rep = h // kvh
    bq = min(block_q, s)
    bk = min(block_k, s)
    # K/V stream through VMEM one (window, dh) slab per grid step; the
    # kernel's inner fori_loop walks the window in (block_k)-sub-blocks.
    # window must be a block_k multiple; s_pad a multiple of both bq and
    # window so every BlockSpec tiles evenly.
    win = max(bk, min(window, ((s + bk - 1) // bk) * bk))
    win = (win // bk) * bk
    s_pad = ((s + bq - 1) // bq) * bq
    s_pad = ((s_pad + win - 1) // win) * win
    if s_pad != s:
        pad = ((0, 0), (0, 0), (0, s_pad - s), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    qf = q.reshape(b * h, s_pad, dh)
    # GQA (Qwen3): K/V keep their kvh heads in HBM — each grid row maps
    # its q head onto the owning kv head in the index_map, so repeated
    # heads are never materialized and rep consecutive grid rows re-use
    # the same K/V slab fetch.
    kf = k.reshape(b * kvh, s_pad, dh)
    vf = v.reshape(b * kvh, s_pad, dh)

    def kv_row(i):
        return (i // h) * kvh + (i % h) // rep

    num_w = s_pad // win
    grid = (b * h, s_pad // bq, num_w)
    in_specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec((1, bq, dh), lambda i, jq, w: (i, jq, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, win, dh), lambda i, jq, w: (kv_row(i), w, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, win, dh), lambda i, jq, w: (kv_row(i), w, 0), memory_space=pltpu.VMEM),
    ]
    args = [jnp.asarray(lengths, jnp.int32), qf, kf, vf]
    if segment_ids is not None:
        segs = jnp.asarray(segment_ids, jnp.int32)
        if s_pad != s:
            segs = jnp.pad(segs, ((0, 0), (0, s_pad - s)))  # pad seg = 0
        # pre-broadcast layouts so the kernel needs no transpose: q side
        # (B, S, 1) -> (block_q, 1) blocks; k side (B, 1, S) -> (1, win)
        args.append(segs.reshape(b, s_pad, 1))
        args.append(segs.reshape(b, 1, s_pad))
        in_specs.append(pl.BlockSpec(
            (1, bq, 1), lambda i, jq, w: (i // h, jq, 0),
            memory_space=pltpu.VMEM))
        in_specs.append(pl.BlockSpec(
            (1, 1, win), lambda i, jq, w: (i // h, 0, w),
            memory_space=pltpu.VMEM))
        kernel = functools.partial(
            _flash_kernel_seg, num_heads=h, block_q=bq, block_k=bk,
            window=win, num_w=num_w, sm_scale=1.0 / math.sqrt(dh),
            causal=causal,
        )
    else:
        kernel = functools.partial(
            _flash_kernel, num_heads=h, block_q=bq, block_k=bk, window=win,
            num_w=num_w, sm_scale=1.0 / math.sqrt(dh), causal=causal,
        )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, bq, dh), lambda i, jq, w: (i, jq, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b * h, s_pad, dh), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, 1), jnp.float32),
            pltpu.VMEM((bq, dh), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(*args)
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
    flash_min_seq: Optional[int] = None,
    segment_ids: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Self-attention over packed (B, S, D) projections.

    ``attention_mask`` must be contiguous-prefix (standard right-padding);
    it is reduced to per-sequence lengths for the flash path. ``causal``
    adds the decoder mask (Qwen3-style embedders). ``segment_ids``
    (0 = pad, 1..m = packed sub-sequences) switches on block-diagonal
    masking for sequence-packed rows (SURVEY §7 "prefetch + pack"); the
    mask must still cover exactly the seg>0 prefix.

    Dispatch is length-aware even when ``use_flash``: measured on v5e,
    XLA softmax attention is ~25% faster at S=128 (the flash kernel's
    per-(batch*head) program overhead dominates) with crossover at ~512;
    past that the flash path avoids the O(S^2) HBM score materialization
    entirely (mandatory by S=2k+). ``flash_min_seq`` tunes the switch;
    its default comes from the on-chip `tune` store (utils/autotune.py).
    """
    if flash_min_seq is None:
        from codemix_dense_retrieval_tpu.utils.autotune import get_tuned

        flash_min_seq = int(get_tuned("flash.min_seq"))
    b, s, d = q.shape
    dh = d // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    lengths = attention_mask.astype(jnp.int32).sum(axis=1)
    qh, kh, vh = split(q), split(k), split(v)
    # packed rows are always FULL (segments tile the row), so XLA's
    # short-realized-length advantage doesn't apply and its O(S^2) score
    # materialization (B*H*S*S f32 per layer) does — include the
    # crossover length itself in the flash regime for segment mode
    want_flash = s > flash_min_seq or (
        segment_ids is not None and s >= flash_min_seq
    )
    if use_flash and want_flash:
        out = attention_flash(
            qh, kh, vh, lengths, causal=causal, segment_ids=segment_ids
        )
    else:
        out = attention_xla(
            qh, kh, vh, lengths, causal=causal, segment_ids=segment_ids
        )
    return out.transpose(0, 2, 1, 3).reshape(b, s, d)
