"""Sequence packing (SURVEY §7 "prefetch + pack"): packer invariants,
block-diagonal attention parity (XLA + flash-interpret), and end-to-end
packed-vs-unpacked encoder equality."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from codemix_dense_retrieval_tpu.models.packing import (  # noqa: E402
    pack_sequences,
    packing_efficiency,
    pad_rows_to,
)
from codemix_dense_retrieval_tpu.models.xlmr import (  # noqa: E402
    XLMRConfig,
    XLMREncoder,
)
from codemix_dense_retrieval_tpu.ops.flash_attention import (  # noqa: E402
    attention_flash,
    attention_xla,
)

PAD = 1


def _random_rows(rng, n, lo, hi, vocab=90):
    return [
        rng.integers(2, vocab, size=rng.integers(lo, hi + 1)).astype(np.int32)
        for _ in range(n)
    ]


class TestPacker:
    def test_every_sequence_placed_once_and_roundtrips(self):
        rng = np.random.default_rng(0)
        rows = _random_rows(rng, 57, 3, 30)
        rows.sort(key=len, reverse=True)  # best-fit-decreasing
        p = pack_sequences(rows, 64, PAD, max_segments=8)
        assert p.placement.shape == (57, 2)
        for i, toks in enumerate(rows):
            r, slot = p.placement[i]
            start = p.seg_starts[r, slot]
            ln = p.seg_lengths[r, slot]
            assert ln == len(toks)
            np.testing.assert_array_equal(p.ids[r, start : start + ln], toks)
            # the segment's tokens carry slot+1, positions restart
            assert (p.segment_ids[r, start : start + ln] == slot + 1).all()
            np.testing.assert_array_equal(
                p.position_ids[r, start : start + ln],
                PAD + 1 + np.arange(ln),
            )

    def test_no_overlap_and_pad_is_zero_segment(self):
        rng = np.random.default_rng(1)
        rows = sorted(_random_rows(rng, 40, 1, 20), key=len, reverse=True)
        p = pack_sequences(rows, 32, PAD, max_segments=4)
        total = sum(len(t) for t in rows)
        assert int((p.segment_ids > 0).sum()) == total
        assert (p.ids[p.segment_ids == 0] == PAD).all()

    def test_efficiency_beats_padding(self):
        rng = np.random.default_rng(2)
        rows = sorted(_random_rows(rng, 300, 20, 120), key=len, reverse=True)
        p = pack_sequences(rows, 512, PAD, max_segments=16)
        eff, nrows = packing_efficiency(p, 512)
        # naive padding to 128-bucket would be <= mean(len)/128 ~ 55%
        assert eff > 0.85, (eff, nrows)

    def test_truncation_and_max_segments_cap(self):
        rows = [np.arange(2, 50, dtype=np.int32)] + [
            np.full(4, 7, np.int32) for _ in range(10)
        ]
        p = pack_sequences(rows, 16, PAD, max_segments=2)
        r0, s0 = p.placement[0]
        assert p.seg_lengths[r0, s0] == 16  # truncated to seq_len
        assert (p.seg_lengths > 0).sum(axis=1).max() <= 2

    def test_pad_rows_to(self):
        rows = [np.full(5, 3, np.int32)]
        p = pad_rows_to(pack_sequences(rows, 8, PAD, 2), 4)
        assert p.n_rows == 4
        assert (p.segment_ids[1:] == 0).all()


def _pack_inputs(cfg, rng, n, lo, hi, seq_len, max_segments):
    rows = sorted(
        _random_rows(rng, n, lo, hi, vocab=cfg.vocab_size),
        key=len, reverse=True,
    )
    p = pack_sequences(rows, seq_len, cfg.pad_token_id, max_segments)
    # unpacked reference batch: one row per sequence, right-padded
    ids_u = np.full((n, seq_len), cfg.pad_token_id, np.int32)
    mask_u = np.zeros((n, seq_len), np.int32)
    for i, toks in enumerate(rows):
        ids_u[i, : len(toks)] = toks
        mask_u[i, : len(toks)] = 1
    return rows, p, ids_u, mask_u


@pytest.mark.parametrize("pooling", ["cls", "mean", "last_token"])
def test_packed_forward_matches_unpacked(pooling):
    cfg = XLMRConfig.tiny(
        vocab_size=97, hidden_size=32, num_heads=4, intermediate_size=64,
        pooling=pooling, use_flash=False, max_position_embeddings=80,
    )
    model = XLMREncoder(cfg)
    rng = np.random.default_rng(3)
    seq_len, m = 48, 6
    rows, p, ids_u, mask_u = _pack_inputs(cfg, rng, 11, 1, 20, seq_len, m)
    params = model.init(
        jax.random.key(0), jnp.asarray(ids_u), jnp.asarray(mask_u)
    )
    ref = np.asarray(model.apply(params, jnp.asarray(ids_u), jnp.asarray(mask_u)))
    packed = np.asarray(model.apply(
        params, jnp.asarray(p.ids), jnp.asarray(p.segment_ids),
        jnp.asarray(p.position_ids), jnp.asarray(p.seg_starts),
        jnp.asarray(p.seg_lengths), None,
        max_segments=m, method="packed_embeddings",
    ))
    got = packed[p.placement[:, 0], p.placement[:, 1]]
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-5)
    # empty slots are exact zeros
    slot_used = np.zeros((p.n_rows, m), bool)
    slot_used[p.placement[:, 0], p.placement[:, 1]] = True
    assert (packed[~slot_used] == 0).all()


def test_flash_segment_kernel_matches_xla(monkeypatch):
    b, h, s, dh = 2, 2, 64, 8
    rng = np.random.default_rng(5)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, dh), dtype=np.float32))
        for _ in range(3)
    )
    # two packed rows: segments [1]*20+[2]*30+pad, [1]*64 (full row)
    seg = np.zeros((b, s), np.int32)
    seg[0, :20] = 1
    seg[0, 20:50] = 2
    seg[1, :] = 1
    seg = jnp.asarray(seg)
    lengths = (seg > 0).sum(axis=1).astype(jnp.int32)
    ref = attention_xla(q, k, v, lengths, segment_ids=seg)
    out = attention_flash(
        q, k, v, lengths, segment_ids=seg, block_q=16, block_k=16,
        window=32, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_encoder_packed_encode_matches_unpacked():
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

    cfg = XLMRConfig.tiny(
        vocab_size=211, hidden_size=32, num_heads=4, intermediate_size=64,
        pooling="mean", use_flash=False, max_position_embeddings=80,
    )
    enc = TextEncoder("test-enc", cfg, length_buckets=(16, 32, 64))
    rng = np.random.default_rng(7)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(3, 60)))
        for _ in range(37)
    ]
    ref = enc.encode_documents(texts, batch_size=8)
    packed = enc.encode_documents(texts, batch_size=8, pack=True)
    assert packed.shape == ref.shape
    np.testing.assert_allclose(packed, ref, rtol=5e-4, atol=5e-5)


def test_qwen3_packed_forward_matches_unpacked():
    """Decoder embedder: causal-within-segment attention + per-segment
    RoPE restart + per-segment last-token pooling must reproduce the
    unpacked forward."""
    from codemix_dense_retrieval_tpu.models.qwen3 import Qwen3Config, Qwen3Encoder

    cfg = Qwen3Config.tiny(use_flash=False)
    model = Qwen3Encoder(cfg)
    rng = np.random.default_rng(9)
    seq_len, m = 32, 4
    rows = sorted(
        (rng.integers(2, cfg.vocab_size, size=rng.integers(1, 14))
         .astype(np.int32) for _ in range(9)),
        key=len, reverse=True,
    )
    p = pack_sequences(rows, seq_len, 0, m, pos_offset=0, pos_pad=0)
    n = len(rows)
    ids_u = np.zeros((n, seq_len), np.int32)
    mask_u = np.zeros((n, seq_len), np.int32)
    for i, toks in enumerate(rows):
        ids_u[i, : len(toks)] = toks
        mask_u[i, : len(toks)] = 1
    params = model.init(jax.random.key(1), jnp.asarray(ids_u), jnp.asarray(mask_u))
    ref = np.asarray(model.apply(params, jnp.asarray(ids_u), jnp.asarray(mask_u)))
    packed = np.asarray(model.apply(
        params, jnp.asarray(p.ids), jnp.asarray(p.segment_ids),
        jnp.asarray(p.position_ids), jnp.asarray(p.seg_starts),
        jnp.asarray(p.seg_lengths), None,
        max_segments=m, method="packed_embeddings",
    ))
    got = packed[p.placement[:, 0], p.placement[:, 1]]
    np.testing.assert_allclose(got, ref, rtol=3e-4, atol=3e-5)


def test_flash_segment_causal_matches_xla(monkeypatch):
    """Causal + segments compose in the flash kernel (Qwen3 packed)."""
    b, h, s, dh = 1, 2, 48, 8
    rng = np.random.default_rng(6)
    q, k, v = (
        jnp.asarray(rng.standard_normal((b, h, s, dh), dtype=np.float32))
        for _ in range(3)
    )
    seg = np.zeros((b, s), np.int32)
    seg[0, :15] = 1
    seg[0, 15:40] = 2
    seg = jnp.asarray(seg)
    lengths = (seg > 0).sum(axis=1).astype(jnp.int32)
    ref = attention_xla(q, k, v, lengths, causal=True, segment_ids=seg)
    out = attention_flash(
        q, k, v, lengths, causal=True, segment_ids=seg, block_q=16,
        block_k=16, window=16, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_encoder_packed_encode_qwen3_matches_unpacked():
    """TextEncoder pack=True with a decoder embedder (Qwen3): the
    PACKED_POS convention flows through to the packer."""
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.qwen3 import Qwen3Config, Qwen3Encoder

    cfg = Qwen3Config.tiny(use_flash=False)
    enc = TextEncoder(
        "Qwen/Qwen3-Embedding-0.6B", cfg, model=Qwen3Encoder(cfg),
        length_buckets=(16, 32),
    )
    rng = np.random.default_rng(8)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(3, 30)))
        for _ in range(21)
    ]
    ref = enc.encode_documents(texts, batch_size=8)
    packed = enc.encode_documents(texts, batch_size=8, pack=True)
    np.testing.assert_allclose(packed, ref, rtol=5e-4, atol=5e-5)


def test_encoder_packed_with_tokens_matches_unpacked():
    """Packed two-stage encode: dense + per-token blocks sliced out of
    packed rows equal the bucketed path's outputs."""
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

    cfg = XLMRConfig.tiny(
        vocab_size=211, hidden_size=32, num_heads=4, intermediate_size=64,
        pooling="cls", use_flash=False, max_position_embeddings=80,
    )
    enc = TextEncoder("test-enc", cfg, length_buckets=(16, 32, 64))
    rng = np.random.default_rng(10)
    texts = [
        "".join(chr(97 + c) for c in rng.integers(0, 26, rng.integers(3, 50)))
        for _ in range(19)
    ]
    d_ref, t_ref, l_ref = enc.encode_documents_with_tokens(texts, batch_size=8)
    d_p, t_p, l_p = enc.encode_documents_with_tokens(
        texts, batch_size=8, pack=True
    )
    np.testing.assert_array_equal(l_p, l_ref)
    np.testing.assert_allclose(d_p, d_ref, rtol=5e-4, atol=5e-5)
    t_cut = min(t_ref.shape[1], t_p.shape[1])
    np.testing.assert_allclose(
        t_p[:, :t_cut], t_ref[:, :t_cut], rtol=5e-4, atol=5e-5
    )
    # beyond each row's length both are zero-padded
    for i, ln in enumerate(l_ref):
        assert (t_p[i, ln:] == 0).all()


def test_qwen3_packed_embed_with_tokens():
    from codemix_dense_retrieval_tpu.models.qwen3 import Qwen3Config, Qwen3Encoder

    cfg = Qwen3Config.tiny(use_flash=False)
    model = Qwen3Encoder(cfg)
    rng = np.random.default_rng(12)
    rows = sorted(
        (rng.integers(2, cfg.vocab_size, size=rng.integers(2, 10))
         .astype(np.int32) for _ in range(6)),
        key=len, reverse=True,
    )
    p = pack_sequences(rows, 24, 0, 3, pos_offset=0, pos_pad=0)
    n = len(rows)
    ids_u = np.zeros((n, 24), np.int32)
    mask_u = np.zeros((n, 24), np.int32)
    for i, toks in enumerate(rows):
        ids_u[i, : len(toks)] = toks
        mask_u[i, : len(toks)] = 1
    params = model.init(jax.random.key(2), jnp.asarray(ids_u), jnp.asarray(mask_u))
    d_ref, t_ref = model.apply(
        params, jnp.asarray(ids_u), jnp.asarray(mask_u),
        method="embed_with_tokens",
    )
    pooled, toks = model.apply(
        params, jnp.asarray(p.ids), jnp.asarray(p.segment_ids),
        jnp.asarray(p.position_ids), jnp.asarray(p.seg_starts),
        jnp.asarray(p.seg_lengths), None,
        max_segments=3, method="packed_embed_with_tokens",
    )
    pooled, toks = np.asarray(pooled), np.asarray(toks)
    for i, tr in enumerate(rows):
        r, slot = p.placement[i]
        s0, ln = p.seg_starts[r, slot], p.seg_lengths[r, slot]
        np.testing.assert_allclose(
            pooled[r, slot], np.asarray(d_ref)[i], rtol=3e-4, atol=3e-5)
        np.testing.assert_allclose(
            toks[r, s0 : s0 + ln], np.asarray(t_ref)[i, :ln],
            rtol=3e-4, atol=3e-5)


def test_pack_unsupported_model_fails_fast():
    """GTE (no packed forward yet) must raise a clear error at the API
    boundary, not a flax attribute error mid-pipeline."""
    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.models.gte import GTEConfig, GTEEncoder

    cfg = GTEConfig.tiny()
    enc = TextEncoder("Alibaba-NLP/gte-multilingual-base", cfg,
                      model=GTEEncoder(cfg), length_buckets=(16, 32))
    with pytest.raises(ValueError, match="packing.*not supported"):
        enc.encode_documents(["hello world"], pack=True)


def test_segment_mode_prefers_flash_at_crossover(monkeypatch):
    """Packed rows are always full, so the dispatch includes the
    crossover length itself in the flash regime (s >= flash_min_seq vs
    the unpacked strict >)."""
    import codemix_dense_retrieval_tpu.ops.flash_attention as fa

    calls = []

    def spy_flash(q, k, v, lengths, **kw):
        calls.append("flash")
        return fa.attention_xla(q, k, v, lengths,
                                segment_ids=kw.get("segment_ids"))

    monkeypatch.setattr(fa, "attention_flash", spy_flash)
    b, s, heads, dh = 2, 32, 2, 8
    rng = np.random.default_rng(13)
    x = jnp.asarray(rng.standard_normal((b, s, heads * dh), dtype=np.float32))
    mask = jnp.ones((b, s), jnp.int32)
    seg = jnp.ones((b, s), jnp.int32)
    # unpacked at s == flash_min_seq: stays XLA
    fa.multi_head_attention(x, x, x, mask, num_heads=heads, flash_min_seq=s)
    assert calls == []
    # packed at the same length: flash
    fa.multi_head_attention(
        x, x, x, mask, num_heads=heads, flash_min_seq=s, segment_ids=seg)
    assert calls == ["flash"]
