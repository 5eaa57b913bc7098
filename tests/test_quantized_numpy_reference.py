"""Numpy certification of the QUANTIZED (int8 / NF4) XLM-R forward.

VERDICT r4 item 8: real-weight drop-in is the single untested step for
the full-precision graph (tests/test_xlmr_numpy_reference.py); this file
closes the SECOND untested seam — `--weight_quant` at drop-in time
(reference analog: bitsandbytes int8/NF4, `onepass_dense_run.py:177-187`).

Method: quantize the param tree with `ops.weight_quant.quantize_tree`,
dequantize it with an INDEPENDENT numpy reimplementation (no call into
`QuantizedTensor.dequantize`), run the independent numpy forward from
test_xlmr_numpy_reference on those dequantized weights, and assert the
Flax graph fed the QUANTIZED tree (in-graph `dequantize_tree`, the
production encode path) matches — at padding edges, and in BOTH orders
of quantize∘TP-shard on the 8-device CPU mesh.
"""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402
from jax.sharding import Mesh  # noqa: E402

from codemix_dense_retrieval_tpu.models.xlmr import (  # noqa: E402
    XLMRConfig,
    XLMREncoder,
)
from codemix_dense_retrieval_tpu.ops.weight_quant import (  # noqa: E402
    NF4_BLOCK,
    NF4_TABLE,
    QuantizedTensor,
    dequantize_tree,
    quantize_tree,
)
from codemix_dense_retrieval_tpu.parallel.tp import shard_params_tp  # noqa: E402

from test_xlmr_numpy_reference import _make_batch, numpy_xlmr_forward  # noqa: E402


# ---------------------------------------------------------------------------
# independent numpy dequantization (shares no code with QuantizedTensor)
# ---------------------------------------------------------------------------


def _np_dequant_leaf(qt: QuantizedTensor) -> np.ndarray:
    codes = np.asarray(qt.codes)
    scale = np.asarray(qt.scale, np.float32)
    if qt.kind == "int8":
        return codes.astype(np.float32) * scale  # (in, out) * (out,)
    assert qt.kind == "nf4"
    # packed uint8: high nibble = even element, low nibble = odd element
    hi = (codes >> 4) & 0xF
    lo = codes & 0xF
    idx = np.empty((codes.shape[0], codes.shape[1] * 2), np.uint8)
    idx[:, 0::2] = hi
    idx[:, 1::2] = lo
    vals = NF4_TABLE[idx] * scale[:, None]  # (nblocks, NF4_BLOCK)
    assert vals.shape[1] == NF4_BLOCK
    size = int(np.prod(qt.shape))
    return vals.reshape(-1)[:size].reshape(qt.shape)


def _np_dequant_tree(params):
    def rec(node):
        if isinstance(node, QuantizedTensor):
            return _np_dequant_leaf(node)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return np.asarray(node)

    return rec(params)


def _setup(pooling="cls", seed=0):
    # f32 graph dtype so the only deviation under test is quantization
    cfg = XLMRConfig.tiny(
        vocab_size=211, hidden_size=32, num_heads=4, intermediate_size=80,
        pooling=pooling, use_flash=False,
    )
    model = XLMREncoder(cfg)
    ids, mask = _make_batch(cfg, 12, lengths=[12, 7, 1, 0], seed=seed)
    params = model.init(jax.random.key(seed), jnp.asarray(ids), jnp.asarray(mask))
    return cfg, model, ids, mask, params


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_quantized_forward_matches_numpy_oracle(mode):
    cfg, model, ids, mask, params = _setup()
    # tiny kernels (32x80) need a low min_size for any leaf to qualify
    qparams = quantize_tree(params, mode, min_size=1024)
    n_q = sum(
        isinstance(x, QuantizedTensor)
        for x in jax.tree_util.tree_leaves(
            qparams, is_leaf=lambda x: isinstance(x, QuantizedTensor))
    )
    assert n_q >= 2 * cfg.num_layers  # ffn_in/ffn_out at least

    # oracle: independent dequant -> independent numpy forward
    deq_np = _np_dequant_tree(qparams)
    hidden_np, pooled_np = numpy_xlmr_forward(deq_np, ids, mask, cfg)

    # production path: quantized tree through the in-graph dequant
    fwd = jax.jit(lambda p, i, a: model.apply(
        dequantize_tree(p, jnp.float32), i, a))
    pooled_fx = fwd(qparams, jnp.asarray(ids), jnp.asarray(mask))
    np.testing.assert_allclose(
        np.asarray(pooled_fx), pooled_np, rtol=3e-4, atol=1e-4)

    # the quantized pooled output must differ from full precision (guards
    # against quantize_tree silently passing every leaf through)
    pooled_full = model.apply(params, jnp.asarray(ids), jnp.asarray(mask))
    assert float(np.abs(np.asarray(pooled_full) - np.asarray(pooled_fx)).max()) > 0


@pytest.mark.parametrize("mode", ["int8", "nf4"])
def test_quantize_then_shard_and_shard_then_quantize_agree(mode):
    """Both compositions of quantize∘TP-shard produce the numpy-oracle
    pooled output (and each other's), on the 8-device CPU mesh."""
    cfg, model, ids, mask, params = _setup(seed=5)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))

    q_then_s = shard_params_tp(
        quantize_tree(params, mode, min_size=1024), mesh, "xlmr")
    s_then_q = quantize_tree(
        shard_params_tp(params, mesh, "xlmr"), mode, min_size=1024)

    deq_np = _np_dequant_tree(q_then_s)
    _, pooled_np = numpy_xlmr_forward(deq_np, ids, mask, cfg)

    fwd = jax.jit(lambda p, i, a: model.apply(
        dequantize_tree(p, jnp.float32), i, a))
    with mesh:
        out_qs = np.asarray(fwd(q_then_s, jnp.asarray(ids), jnp.asarray(mask)))
        out_sq = np.asarray(fwd(s_then_q, jnp.asarray(ids), jnp.asarray(mask)))

    np.testing.assert_allclose(out_qs, pooled_np, rtol=3e-4, atol=1e-4)
    # shard-then-quantize sees the SAME host values (device_put is
    # value-preserving), so its codes must match bit-for-bit
    np.testing.assert_allclose(out_sq, out_qs, rtol=1e-6, atol=1e-6)


def test_int8_codes_shard_with_kernel_spec():
    """int8 codes/scales carry the kernel's TP sharding (memory actually
    splits); nf4 replicates (documented fallback)."""
    cfg, model, ids, mask, params = _setup(seed=7)
    mesh = Mesh(np.array(jax.devices()[:4]), ("tp",))
    qs = shard_params_tp(quantize_tree(params, "int8", min_size=1024), mesh, "xlmr")
    leaf = qs["params"]["layer_0"]["ffn_in"]["kernel"]
    assert isinstance(leaf, QuantizedTensor)
    spec = leaf.codes.sharding.spec
    assert tuple(spec) == (None, "tp")
    assert tuple(leaf.scale.sharding.spec) == ("tp",)
