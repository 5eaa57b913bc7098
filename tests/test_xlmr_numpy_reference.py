"""Independent numpy certification of the XLM-R forward graph.

VERDICT r3 item 6: real-weight quality parity is environment-blocked (no
network), so the graph itself must be certified offline such that
weight-drop-in is the ONLY untested step. This file reimplements the
full XLM-R forward — RoBERTa position ids, embeddings + LayerNorm, Q/K/V
projections, softmax attention with length masking, exact GELU FFN,
post-LN residuals, CLS/mean pooling + L2 norm — in pure numpy, sharing
ZERO code with the Flax model, and asserts the Flax graph matches it
per layer and pooled, at several lengths including padding edges and a
fully-masked row.

The attention compared here is the XLA path (`attention_xla`); the Pallas
flash kernel is certified against that same path by the existing flash
parity tests (tests/test_models.py) and the multichip dryrun stage, so
the chain numpy -> XLA -> flash is closed transitively.

HF-architecture citations: position ids `create_position_ids_from_input_ids`
(reference encoders are HF XLM-R checkpoints, e.g. BGE-M3 —
`/root/reference/onepass_dense_run.py:351-353` encodes with them).
"""

import numpy as np
import pytest
from scipy.special import erf

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

from codemix_dense_retrieval_tpu.models.xlmr import (  # noqa: E402
    XLMRConfig,
    XLMREncoder,
)

# ---------------------------------------------------------------------------
# pure-numpy forward (independent reimplementation — no jax, no flax)
# ---------------------------------------------------------------------------


def _ln(x, scale, bias, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * scale + bias


def _dense(x, p):
    return x @ p["kernel"] + p["bias"]


def _gelu_exact(x):
    return 0.5 * x * (1.0 + erf(x / np.sqrt(2.0)))


def _attention(q, k, v, lengths, num_heads):
    b, s, d = q.shape
    dh = d // num_heads

    def split(x):
        return x.reshape(b, s, num_heads, dh).transpose(0, 2, 1, 3)

    qh, kh, vh = split(q), split(k), split(v)
    scores = qh @ kh.transpose(0, 1, 3, 2) / np.sqrt(dh)  # (B, H, S, S)
    key_valid = np.arange(s)[None, None, None, :] < lengths[:, None, None, None]
    scores = np.where(key_valid, scores, -np.inf)
    # stable softmax; fully-masked rows produce nan -> zeroed below
    with np.errstate(invalid="ignore"):
        scores -= scores.max(-1, keepdims=True)
        e = np.exp(scores)
        p = e / e.sum(-1, keepdims=True)
    p = np.nan_to_num(p)  # length-0 rows: all-(-inf) scores
    out = (p @ vh).transpose(0, 2, 1, 3).reshape(b, s, d)
    return np.where((lengths > 0)[:, None, None], out, 0.0)


def numpy_xlmr_forward(params, input_ids, attention_mask, cfg):
    """Returns (list of hidden states [embeddings, layer1, ...], pooled)."""
    p = {k: jax.tree.map(np.asarray, v) for k, v in params["params"].items()}
    ids = np.asarray(input_ids)
    mask = np.asarray(attention_mask)

    # RoBERTa position ids: count non-pad tokens, start at pad_token_id+1
    nonpad = (ids != cfg.pad_token_id).astype(np.int64)
    pos_ids = np.cumsum(nonpad, axis=1) * nonpad + cfg.pad_token_id

    emb = p["embeddings"]
    x = (
        emb["word_embeddings"]["embedding"][ids]
        + emb["position_embeddings"]["embedding"][pos_ids]
        + emb["token_type_embeddings"]["embedding"][np.zeros_like(ids)]
    )
    x = _ln(x, emb["LayerNorm"]["scale"], emb["LayerNorm"]["bias"], cfg.layer_norm_eps)

    hidden = [x]
    lengths = mask.astype(np.int64).sum(axis=1)
    for i in range(cfg.num_layers):
        lp = p[f"layer_{i}"]
        q = _dense(x, lp["q"])
        k = _dense(x, lp["k"])
        v = _dense(x, lp["v"])
        attn = _attention(q, k, v, lengths, cfg.num_heads)
        attn = _dense(attn, lp["attn_out"])
        x = _ln(x + attn, lp["attn_ln"]["scale"], lp["attn_ln"]["bias"], cfg.layer_norm_eps)
        y = _dense(x, lp["ffn_in"])
        y = _gelu_exact(y)
        y = _dense(y, lp["ffn_out"])
        x = _ln(x + y, lp["ffn_ln"]["scale"], lp["ffn_ln"]["bias"], cfg.layer_norm_eps)
        hidden.append(x)

    if cfg.pooling == "cls":
        pooled = x[:, 0]
    elif cfg.pooling == "mean":
        m = mask.astype(x.dtype)[..., None]
        pooled = (x * m).sum(axis=1) / np.maximum(m.sum(axis=1), 1e-9)
    else:
        raise ValueError(cfg.pooling)
    if cfg.normalize:
        pooled = pooled / np.maximum(
            np.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12
        )
    return hidden, pooled


# ---------------------------------------------------------------------------
# fixtures
# ---------------------------------------------------------------------------


def _make_batch(cfg, seq, lengths, seed=0):
    rng = np.random.default_rng(seed)
    b = len(lengths)
    ids = rng.integers(2, cfg.vocab_size, size=(b, seq)).astype(np.int32)
    mask = np.zeros((b, seq), np.int32)
    for r, ln in enumerate(lengths):
        mask[r, :ln] = 1
        ids[r, ln:] = cfg.pad_token_id  # right padding with the pad id
    return ids, mask


def _flax_all_hidden(model, params, ids, mask):
    def all_hidden(m, i, a):
        x = m.embeddings(i)
        out = [x]
        for layer in m.layers:
            x = layer(x, a)
            out.append(x)
        return out

    return model.apply(params, jnp.asarray(ids), jnp.asarray(mask), method=all_hidden)


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("pooling", ["cls", "mean"])
def test_per_layer_and_pooled_parity(pooling):
    cfg = XLMRConfig.tiny(
        vocab_size=211, hidden_size=32, num_heads=4, intermediate_size=80,
        pooling=pooling, use_flash=False,
    )
    model = XLMREncoder(cfg)
    seq = 12
    # padding edges: full length, mid padding, single token, length 0
    ids, mask = _make_batch(cfg, seq, lengths=[12, 7, 1, 0], seed=1)
    params = model.init(jax.random.key(0), jnp.asarray(ids), jnp.asarray(mask))

    hidden_np, pooled_np = numpy_xlmr_forward(params, ids, mask, cfg)
    hidden_fx = _flax_all_hidden(model, params, ids, mask)
    assert len(hidden_fx) == cfg.num_layers + 1
    for li, (h_np, h_fx) in enumerate(zip(hidden_np, hidden_fx)):
        np.testing.assert_allclose(
            np.asarray(h_fx), h_np, rtol=2e-4, atol=5e-5,
            err_msg=f"hidden state {li} (0 = embeddings)",
        )

    pooled_fx = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled_fx), pooled_np, rtol=2e-4, atol=5e-5)
    # normalized rows are unit length; the length-0 row is degenerate
    # (mean pooling -> exact zero vector, cls -> normalized garbage) and
    # must at least agree between the two implementations (asserted above)
    norms = np.linalg.norm(np.asarray(pooled_fx), axis=1)
    np.testing.assert_allclose(norms[:3], 1.0, atol=1e-5)


def test_depth_24_accumulation():
    """Full BGE-M3 depth (24 layers) at reduced width: certifies that
    error does not compound across the real layer count."""
    cfg = XLMRConfig(
        vocab_size=307, hidden_size=128, num_layers=24, num_heads=16,
        intermediate_size=256, max_position_embeddings=64,
        pooling="cls", use_flash=False,
    )
    model = XLMREncoder(cfg)
    ids, mask = _make_batch(cfg, 16, lengths=[16, 9], seed=2)
    params = model.init(jax.random.key(1), jnp.asarray(ids), jnp.asarray(mask))

    hidden_np, pooled_np = numpy_xlmr_forward(params, ids, mask, cfg)
    pooled_fx = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled_fx), pooled_np, rtol=5e-4, atol=2e-4)
    # and the last hidden state, not just the normalized pooled vector
    hs_fx = model.apply(
        params, jnp.asarray(ids), jnp.asarray(mask),
        method="hidden_states",
    )
    np.testing.assert_allclose(
        np.asarray(hs_fx), hidden_np[-1], rtol=5e-4, atol=2e-4
    )


def test_position_ids_ignore_attention_mask_convention():
    """Position ids derive from input_ids == pad (HF convention), NOT from
    the attention mask; a pad id inside a valid region must shift
    positions on both implementations identically."""
    cfg = XLMRConfig.tiny(vocab_size=97, use_flash=False)
    model = XLMREncoder(cfg)
    ids, mask = _make_batch(cfg, 8, lengths=[8, 8], seed=3)
    ids[0, 3] = cfg.pad_token_id  # pad id in the middle of a valid row
    params = model.init(jax.random.key(2), jnp.asarray(ids), jnp.asarray(mask))
    _, pooled_np = numpy_xlmr_forward(params, ids, mask, cfg)
    pooled_fx = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(pooled_fx), pooled_np, rtol=2e-4, atol=5e-5)
