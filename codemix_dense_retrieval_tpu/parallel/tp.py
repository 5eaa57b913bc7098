"""Tensor-parallel parameter sharding for large encoders.

Replaces HF accelerate's ``device_map="auto"`` layer placement
(reference `onepass_dense_run.py:202-213`, used for Qwen3-4B/8B) with
megatron-style 1D tensor parallelism over the mesh's ``tp`` axis:
column-parallel QKV/gate/up projections, row-parallel output/down
projections. Params carry ``NamedSharding``; under ``jit`` GSPMD
propagates the shardings and inserts the (two per layer) all-reduces
over ICI — no manual collectives.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Optional, Tuple

import jax
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

# (path regex, spec) — first match wins. Kernel layout is (in, out).
_QWEN3_RULES: Tuple[Tuple[str, P], ...] = (
    (r"self_attn/(q_proj|k_proj|v_proj)/kernel", P(None, "tp")),  # column parallel
    (r"self_attn/o_proj/kernel", P("tp", None)),  # row parallel
    (r"mlp/(gate_proj|up_proj)/kernel", P(None, "tp")),
    (r"mlp/down_proj/kernel", P("tp", None)),
    (r"embed_tokens/embedding", P(None, None)),
    (r".*", P()),  # norms etc.: replicated
)

_XLMR_RULES: Tuple[Tuple[str, P], ...] = (
    (r"layer_\d+/(q|k|v)/kernel", P(None, "tp")),
    (r"layer_\d+/(q|k|v)/bias", P("tp")),
    (r"layer_\d+/attn_out/kernel", P("tp", None)),
    (r"layer_\d+/ffn_in/kernel", P(None, "tp")),
    (r"layer_\d+/ffn_in/bias", P("tp")),
    (r"layer_\d+/ffn_out/kernel", P("tp", None)),
    (r".*", P()),
)

RULE_SETS = {"qwen3": _QWEN3_RULES, "xlmr": _XLMR_RULES}


def tp_spec_for_path(path: str, family: str) -> P:
    for pattern, spec in RULE_SETS[family]:
        if re.search(pattern, path):
            return spec
    return P()


def _path_str(keypath) -> str:
    return "/".join(str(getattr(k, "key", k)) for k in keypath)


def shard_params_tp(params: Dict, mesh: Mesh, family: str) -> Dict:
    """Place a parameter pytree on the mesh with TP shardings.

    Dims not divisible by the tp axis fall back to replication (with the
    same numerics, just no memory savings for that tensor).

    Composes with weight quantization (the bitsandbytes-on-2-GPUs setup,
    reference `onepass_dense_run.py:177-213`): int8
    :class:`~codemix_dense_retrieval_tpu.ops.weight_quant.QuantizedTensor`
    kernels shard their codes with the kernel's spec and the per-output-
    channel scale with the kernel's out-axis spec; nf4 records replicate
    (their packed-block layout doesn't align with kernel axes).
    """
    from codemix_dense_retrieval_tpu.ops.weight_quant import QuantizedTensor

    tp = mesh.shape.get("tp", 1)

    def _divisible(shape, spec) -> bool:
        for dim, name in zip(range(len(shape)), spec):
            if name == "tp" and shape[dim] % tp:
                return False
        return True

    def place(keypath, leaf):
        spec = tp_spec_for_path(_path_str(keypath), family)
        if isinstance(leaf, QuantizedTensor):
            if leaf.kind != "int8" or not _divisible(leaf.codes.shape, spec):
                spec = P()
            # scale is indexed by the kernel's LAST (out) axis
            sspec = P(spec[-1]) if len(spec) == leaf.codes.ndim else P()
            return QuantizedTensor(
                leaf.kind,
                jax.device_put(leaf.codes, NamedSharding(mesh, spec)),
                jax.device_put(leaf.scale, NamedSharding(mesh, sspec)),
                leaf.shape,
            )
        if not _divisible(leaf.shape, spec):
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(
        place, params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )


def replicate_params(params: Dict, mesh: Mesh) -> Dict:
    return jax.tree_util.tree_map(
        lambda leaf: jax.device_put(leaf, NamedSharding(mesh, P())), params
    )
