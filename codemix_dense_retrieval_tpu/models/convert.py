"""HF PyTorch -> Flax parameter conversion for the XLM-R encoder family.

Converts ``XLMRobertaModel`` state dicts (BGE-M3, multilingual-E5, …) into
the parameter pytree of
:class:`~codemix_dense_retrieval_tpu.models.xlmr.XLMREncoder`. Replaces the
reference's dependence on torch checkpoint loading inside
sentence-transformers (`onepass_dense_run.py:155-215`): here torch is used
ONLY host-side at conversion time; the converted arrays are saved as an
orbax/npz checkpoint and the runtime path is pure JAX.
"""

from __future__ import annotations

import pathlib
from typing import Dict, Mapping, Optional

import numpy as np

from codemix_dense_retrieval_tpu.models.xlmr import XLMRConfig


def _np(t) -> np.ndarray:
    """torch tensor -> float32 numpy (host)."""
    try:
        return t.detach().cpu().float().numpy()
    except AttributeError:
        return np.asarray(t, dtype=np.float32)


def convert_xlmr_state_dict(
    state_dict: Mapping[str, "object"],
    cfg: XLMRConfig,
    prefix: str = "",
) -> Dict:
    """Map an HF ``XLMRobertaModel`` state dict to XLMREncoder params.

    ``prefix`` strips a leading module path (e.g. ``"roberta."`` or the
    sentence-transformers ``"0.auto_model."``).
    """
    sd = {k[len(prefix):]: v for k, v in state_dict.items() if k.startswith(prefix)}

    def dense(hf_name):
        # torch parametrization moves the frozen weight to
        # ``parametrizations.weight.original`` (jina-v3 LoRA checkpoints);
        # plain checkpoints keep ``.weight``.
        w_key = f"{hf_name}.weight"
        if w_key not in sd:
            w_key = f"{hf_name}.parametrizations.weight.original"
        base = {
            "kernel": _np(sd[w_key]).T,
            "bias": _np(sd[f"{hf_name}.bias"]),
        }
        if not cfg.lora_rank:
            return base
        # LoRA-enabled configs nest the frozen projection under "base";
        # jina-v3 adapters (parametrizations.*.lora_A/lora_B per task) map
        # into the stacked (tasks, in, r) / (tasks, r, out) params.
        out: Dict = {"base": base}
        la = f"{hf_name}.parametrizations.weight.0.lora_A"
        lb = f"{hf_name}.parametrizations.weight.0.lora_B"
        if la in sd and lb in sd:
            # HF shapes: lora_A (tasks, r, in), lora_B (tasks, out, r)
            out["lora_a"] = np.transpose(_np(sd[la]), (0, 2, 1))
            out["lora_b"] = np.transpose(_np(sd[lb]), (0, 2, 1))
        else:
            h_in = base["kernel"].shape[0]
            h_out = base["kernel"].shape[1]
            out["lora_a"] = np.zeros((cfg.lora_tasks, h_in, cfg.lora_rank), np.float32)
            out["lora_b"] = np.zeros((cfg.lora_tasks, cfg.lora_rank, h_out), np.float32)
        return out

    def layer_norm(hf_name):
        return {
            "scale": _np(sd[f"{hf_name}.weight"]),
            "bias": _np(sd[f"{hf_name}.bias"]),
        }

    params: Dict = {
        "embeddings": {
            "word_embeddings": {"embedding": _np(sd["embeddings.word_embeddings.weight"])},
            "position_embeddings": {
                "embedding": _np(sd["embeddings.position_embeddings.weight"])
            },
            "token_type_embeddings": {
                "embedding": _np(sd["embeddings.token_type_embeddings.weight"])
            },
            "LayerNorm": layer_norm("embeddings.LayerNorm"),
        }
    }
    for i in range(cfg.num_layers):
        hf = f"encoder.layer.{i}"
        params[f"layer_{i}"] = {
            "q": dense(f"{hf}.attention.self.query"),
            "k": dense(f"{hf}.attention.self.key"),
            "v": dense(f"{hf}.attention.self.value"),
            "attn_out": dense(f"{hf}.attention.output.dense"),
            "attn_ln": layer_norm(f"{hf}.attention.output.LayerNorm"),
            "ffn_in": dense(f"{hf}.intermediate.dense"),
            "ffn_out": dense(f"{hf}.output.dense"),
            "ffn_ln": layer_norm(f"{hf}.output.LayerNorm"),
        }
    return {"params": params}


def detect_prefix(state_dict: Mapping[str, "object"]) -> str:
    """Find the XLMRobertaModel submodule prefix inside a checkpoint."""
    for key in state_dict:
        marker = "embeddings.word_embeddings.weight"
        if key.endswith(marker):
            return key[: -len(marker)]
    raise KeyError("no XLM-R embeddings found in state dict")


def _read_safetensors(path) -> Dict[str, np.ndarray]:
    from safetensors import safe_open

    sd: Dict[str, np.ndarray] = {}
    with safe_open(str(path), framework="np") as f:
        for k in f.keys():
            sd[k] = f.get_tensor(k)
    return sd


def load_state_dict(checkpoint_dir) -> Dict[str, np.ndarray]:
    """Load an HF-format state dict from a local directory, in any of the
    layouts real checkpoints ship (reference loads these through
    `from_pretrained`, `onepass_dense_run.py:155-215`):

    - ``model.safetensors.index.json`` + N shard files (large encoders:
      Qwen3-4B/8B ship sharded)
    - single ``model.safetensors``
    - ``pytorch_model.bin.index.json`` + N torch shards
    - single ``pytorch_model.bin``
    """
    import json

    d = pathlib.Path(checkpoint_dir)
    st_index = d / "model.safetensors.index.json"
    if st_index.exists():
        weight_map = json.loads(st_index.read_text())["weight_map"]
        sd: Dict[str, np.ndarray] = {}
        for shard_name in sorted(set(weight_map.values())):
            shard = _read_safetensors(d / shard_name)
            missing = [k for k, v in weight_map.items()
                       if v == shard_name and k not in shard]
            if missing:
                raise KeyError(
                    f"weight_map names {missing[:3]}... in {shard_name} "
                    "but the shard does not contain them"
                )
            sd.update(shard)
        absent = set(weight_map) - set(sd)
        if absent:
            raise KeyError(f"index lists missing weights: {sorted(absent)[:3]}")
        return sd
    st_path = d / "model.safetensors"
    if st_path.exists():
        return _read_safetensors(st_path)
    bin_index = d / "pytorch_model.bin.index.json"
    if bin_index.exists():
        import torch

        weight_map = json.loads(bin_index.read_text())["weight_map"]
        sd = {}
        for shard_name in sorted(set(weight_map.values())):
            sd.update(torch.load(d / shard_name, map_location="cpu",
                                 weights_only=True))
        return sd
    bin_path = d / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        return torch.load(bin_path, map_location="cpu", weights_only=True)
    raise FileNotFoundError(f"no model weights under {d}")


def load_hf_checkpoint(
    checkpoint_dir,
    cfg: Optional[XLMRConfig] = None,
    **cfg_overrides,
):
    """Load (config, params) from an HF-format local directory
    (config.json + torch / single- or sharded-safetensors weights)."""
    import json

    d = pathlib.Path(checkpoint_dir)
    if cfg is None:
        hf_cfg = json.loads((d / "config.json").read_text())
        cfg = XLMRConfig.from_hf_config(hf_cfg, **cfg_overrides)

    sd = load_state_dict(d)
    params = convert_xlmr_state_dict(sd, cfg, prefix=detect_prefix(sd))
    return cfg, params


def save_params_npz(path, params: Dict) -> None:
    """Flat .npz checkpoint (portable, no orbax dependency at read time).

    Quantized leaves (``ops.weight_quant.QuantizedTensor`` — `convert
    --weight_quant`) persist as three suffixed entries
    (``@wq.<kind>.{codes,scale,shape}``), so an int8/nf4 checkpoint is
    2x/~4x smaller on disk and loads straight back into its quantized
    form (the bitsandbytes save-quantized analog)."""
    import jax

    from codemix_dense_retrieval_tpu.ops.weight_quant import QuantizedTensor

    flat = jax.tree_util.tree_flatten_with_path(
        params, is_leaf=lambda x: isinstance(x, QuantizedTensor)
    )[0]
    arrays = {}
    for keypath, leaf in flat:
        name = "/".join(str(getattr(k, "key", k)) for k in keypath)
        if isinstance(leaf, QuantizedTensor):
            arrays[f"{name}@wq.{leaf.kind}.codes"] = np.asarray(leaf.codes)
            arrays[f"{name}@wq.{leaf.kind}.scale"] = np.asarray(leaf.scale)
            arrays[f"{name}@wq.{leaf.kind}.shape"] = np.asarray(
                leaf.shape, np.int64
            )
        else:
            arrays[name] = np.asarray(leaf)
    np.savez(path, **arrays)


def load_params_npz(path) -> Dict:
    from codemix_dense_retrieval_tpu.ops.weight_quant import QuantizedTensor

    data = np.load(path)
    params: Dict = {}
    pending: Dict[str, dict] = {}
    for name in data.files:
        if "@wq." in name:
            base, tag = name.split("@wq.", 1)
            kind, part = tag.split(".", 1)
            rec = pending.setdefault(base, {"kind": kind})
            rec[part] = data[name]
            continue
        parts = name.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[name]
    for base, rec in pending.items():
        parts = base.split("/")
        node = params
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = QuantizedTensor(
            rec["kind"], rec["codes"], rec["scale"],
            tuple(int(x) for x in rec["shape"]),
        )
    return params
