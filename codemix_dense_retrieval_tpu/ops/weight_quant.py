"""Encoder weight quantization: TPU-native bitsandbytes analog.

The reference fits large encoders (Qwen3-4B/8B) on consumer GPUs with
bitsandbytes int8 / NF4 weight quantization (`onepass_dense_run.py:
100-103,177-187`). The TPU-native equivalent works at the param-pytree
level, so every model family (XLM-R, Qwen3, GTE, Jina) gets it without
touching module code:

- :func:`quantize_tree` replaces every large 2D Linear kernel leaf with
  a :class:`QuantizedTensor` — ``int8`` per-output-channel symmetric
  (W8A16) or ``nf4`` blockwise 4-bit NormalFloat (two codes packed per
  byte + per-block absmax, the QLoRA scheme; double-quant of the absmax
  is omitted — it saves 0.4 bit/param and costs a second dequant level).
- :func:`dequantize_tree` runs INSIDE the jitted forward: XLA fuses the
  ``convert * scale`` (and the nibble unpack) into the consuming matmul
  reads, so HBM holds the int8/uint8 codes (2x / ~3.7x smaller than
  bf16) and the matmul still runs on the MXU in bf16.

Embeddings and 1D params (LayerNorm, biases) stay full precision —
matching bitsandbytes, which quantizes ``nn.Linear`` only (quantizing
the embedding gather table would also defeat the gather-then-dequant
fusion). Pooled-output quality on encoders is near-lossless for int8
(per-channel) and within ~1e-2 cosine for nf4, asserted in
tests/test_weight_quant.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NF4_BLOCK = 64

# the 16 NormalFloat-4 quantiles (QLoRA): equal-mass bins of N(0,1),
# scaled so the extremes hit +-1 exactly, with a true zero code
NF4_TABLE = np.array([
    -1.0, -0.6961928009986877, -0.5250730514526367, -0.39491748809814453,
    -0.28444138169288635, -0.18477343022823334, -0.09105003625154495, 0.0,
    0.07958029955625534, 0.16093020141124725, 0.24611230194568634,
    0.33791524171829224, 0.44070982933044434, 0.5626170039176941,
    0.7229568362236023, 1.0,
], dtype=np.float32)


@jax.tree_util.register_pytree_node_class
class QuantizedTensor:
    """A quantized weight leaf: device-resident ``codes`` + ``scale``
    children, static (kind, shape) aux — jit/device_put/sharding-safe."""

    def __init__(self, kind: str, codes, scale, shape: tuple):
        self.kind = kind
        self.codes = codes
        self.scale = scale
        self.shape = tuple(shape)

    def tree_flatten(self):
        return (self.codes, self.scale), (self.kind, self.shape)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], children[0], children[1], aux[1])

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return f"QuantizedTensor({self.kind}, shape={self.shape})"

    def dequantize(self, dtype=jnp.bfloat16) -> jnp.ndarray:
        if self.kind == "int8":
            return (jnp.asarray(self.codes).astype(jnp.float32)
                    * self.scale).astype(dtype)
        # nf4: unpack nibbles -> table lookup -> * per-block absmax
        packed = jnp.asarray(self.codes)
        hi = (packed >> 4).astype(jnp.int32)
        lo = (packed & 0xF).astype(jnp.int32)
        codes = jnp.stack([hi, lo], axis=-1).reshape(packed.shape[0], -1)
        vals = jnp.asarray(NF4_TABLE)[codes] * self.scale[:, None]
        size = int(np.prod(self.shape))
        return vals.reshape(-1)[:size].reshape(self.shape).astype(dtype)


def _quantize_leaf_int8(w: np.ndarray) -> QuantizedTensor:
    """Per-output-channel symmetric int8: W (in, out) -> codes int8 +
    scale f32 (out,). absmax/127 scaling, round-to-nearest-even."""
    absmax = np.abs(w).max(axis=0)
    scale = np.where(absmax > 0, absmax / 127.0, 1.0).astype(np.float32)
    codes = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return QuantizedTensor("int8", codes, scale, w.shape)


def _quantize_leaf_nf4(w: np.ndarray) -> QuantizedTensor:
    """Blockwise NF4: flatten, pad to NF4_BLOCK, per-block absmax,
    nearest NF4 level, two 4-bit codes packed per uint8."""
    flat = w.astype(np.float32).ravel()
    pad = (-len(flat)) % NF4_BLOCK
    if pad:
        flat = np.concatenate([flat, np.zeros(pad, np.float32)])
    blocks = flat.reshape(-1, NF4_BLOCK)
    absmax = np.abs(blocks).max(axis=1, keepdims=True)
    absmax = np.where(absmax > 0, absmax, 1.0).astype(np.float32)
    normed = blocks / absmax
    # nearest of the 16 levels; table is sorted -> searchsorted midpoints
    mids = (NF4_TABLE[1:] + NF4_TABLE[:-1]) / 2
    codes = np.searchsorted(mids, normed).astype(np.uint8)  # (nb, B)
    packed = ((codes[:, 0::2] << 4) | codes[:, 1::2]).astype(np.uint8)
    return QuantizedTensor("nf4", packed, absmax[:, 0], w.shape)


def quantize_tree(
    params,
    mode: str = "int8",
    *,
    min_size: int = 65_536,
    skip_substrings: tuple = ("embed",),
):
    """Return a copy of the param pytree with every eligible 2D float
    kernel replaced by a :class:`QuantizedTensor` (eligible: >=
    ``min_size`` elements, no path component containing any of
    ``skip_substrings``). Feed the result through
    :func:`dequantize_tree` inside the jitted forward."""
    if mode not in ("int8", "nf4"):
        raise ValueError(f"weight_quant mode must be int8|nf4, got {mode!r}")
    quant = _quantize_leaf_int8 if mode == "int8" else _quantize_leaf_nf4

    def rec(node, path):
        if isinstance(node, QuantizedTensor):  # already quantized: keep
            return node
        if isinstance(node, dict):
            return {k: rec(v, path + (k.lower(),)) for k, v in node.items()}
        w = np.asarray(node)
        if (
            w.ndim == 2
            and w.size >= min_size
            and np.issubdtype(w.dtype, np.floating)
            and not any(s in p for s in skip_substrings for p in path)
        ):
            return quant(w.astype(np.float32))
        return node

    return rec(params, ())


def dequantize_tree(params, dtype=jnp.bfloat16):
    """Inverse of :func:`quantize_tree`; jit-traceable (runs inside the
    forward so codes stay resident and the dequant fuses into matmuls)."""

    def rec(node):
        if isinstance(node, QuantizedTensor):
            return node.dequantize(dtype)
        if isinstance(node, dict):
            return {k: rec(v) for k, v in node.items()}
        return node

    return rec(params)


def has_quantized(params) -> bool:
    """True if any leaf of the pytree is a :class:`QuantizedTensor` —
    lets loaders arm the dequant wrapper for pre-quantized checkpoints."""
    return any(
        isinstance(x, QuantizedTensor)
        for x in jax.tree_util.tree_leaves(
            params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
        )
    )


def quantized_nbytes(params) -> int:
    """Resident bytes of a (possibly quantized) param tree."""
    total = 0
    for leaf in jax.tree_util.tree_leaves(params):
        a = np.asarray(leaf) if not hasattr(leaf, "nbytes") else leaf
        total += int(a.size) * int(np.dtype(a.dtype).itemsize)
    return total
