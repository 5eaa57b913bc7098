"""convert CLI: tiny HF checkpoint dir -> framework params."""

import json

import numpy as np
import pytest

from codemix_dense_retrieval_tpu.cli import main as cli_main


def test_convert_roundtrip(tmp_path):
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(0)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    tm = XLMRobertaModel(hf_cfg)
    src = tmp_path / "hf"
    tm.save_pretrained(src)

    out = tmp_path / "converted"
    cli_main(["convert", "--encoder", "BAAI/bge-m3", "--src", str(src), "--out", str(out)])
    assert (out / "params.npz").exists()
    cfg = json.loads((out / "encoder_config.json").read_text())
    assert cfg["num_layers"] == 2 and cfg["hidden_size"] == 32
    assert cfg["pooling"] == "cls"

    from codemix_dense_retrieval_tpu.models.convert import load_params_npz

    params = load_params_npz(out / "params.npz")
    got = params["params"]["embeddings"]["word_embeddings"]["embedding"]
    ref = tm.embeddings.word_embeddings.weight.detach().numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-6)


def test_from_checkpoint_reads_converted_dir(tmp_path):
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(1)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=1,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    src = tmp_path / "hf"
    XLMRobertaModel(hf_cfg).save_pretrained(src)
    out = tmp_path / "conv"
    cli_main(["convert", "--src", str(src), "--out", str(out)])

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder

    enc = TextEncoder.from_checkpoint("BAAI/bge-m3", out)
    vecs = enc.encode_queries(["hello"], batch_size=1)
    assert vecs.shape == (1, 32)
    assert np.isfinite(vecs).all()


def _save_sharded_safetensors(model, src, n_shards=2):
    """Write an HF dir in the SHARDED safetensors layout
    (model.safetensors.index.json + shard files), the format large
    checkpoints ship in (VERDICT r2 item 6)."""
    import pathlib

    from safetensors.numpy import save_file

    src = pathlib.Path(src)
    src.mkdir(parents=True, exist_ok=True)
    model.config.save_pretrained(src)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    keys = sorted(sd)
    per = -(-len(keys) // n_shards)
    weight_map = {}
    for i in range(n_shards):
        shard_keys = keys[i * per : (i + 1) * per]
        name = f"model-{i + 1:05d}-of-{n_shards:05d}.safetensors"
        save_file({k: sd[k] for k in shard_keys}, src / name)
        for k in shard_keys:
            weight_map[k] = name
    (src / "model.safetensors.index.json").write_text(
        json.dumps({"metadata": {"total_size": 0}, "weight_map": weight_map})
    )
    return sd


def test_sharded_safetensors_checkpoint(tmp_path):
    """Conversion over a model.safetensors.index.json checkpoint matches
    the torch weights exactly (VERDICT r2 item 6)."""
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(2)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    tm = XLMRobertaModel(hf_cfg)
    src = tmp_path / "hf_sharded"
    _save_sharded_safetensors(tm, src, n_shards=2)

    from codemix_dense_retrieval_tpu.models.convert import load_state_dict

    sd = load_state_dict(src)
    assert "embeddings.word_embeddings.weight" in sd
    np.testing.assert_allclose(
        sd["embeddings.word_embeddings.weight"],
        tm.embeddings.word_embeddings.weight.detach().numpy(),
    )

    out = tmp_path / "conv"
    cli_main(["convert", "--src", str(src), "--out", str(out)])
    from codemix_dense_retrieval_tpu.models.convert import load_params_npz

    params = load_params_npz(out / "params.npz")
    got = params["params"]["embeddings"]["word_embeddings"]["embedding"]
    np.testing.assert_allclose(
        got, tm.embeddings.word_embeddings.weight.detach().numpy(), rtol=1e-6
    )


def test_sharded_index_missing_weight_rejected(tmp_path):
    """An index naming a tensor its shard lacks must fail loudly, not
    silently produce partial params."""
    import pathlib

    from safetensors.numpy import save_file

    src = tmp_path / "bad"
    src.mkdir()
    save_file({"a": np.zeros((2, 2), np.float32)}, src / "model-1.safetensors")
    (src / "model.safetensors.index.json").write_text(
        json.dumps({"weight_map": {"a": "model-1.safetensors",
                                   "b": "model-1.safetensors"}})
    )
    from codemix_dense_retrieval_tpu.models.convert import load_state_dict

    with pytest.raises(KeyError):
        load_state_dict(src)


def test_convert_weight_quant_roundtrip(tmp_path):
    """convert --weight_quant persists quantized kernels (smaller npz);
    from_checkpoint arms the dequant wrapper automatically and the
    embeddings stay near the full-precision conversion."""
    import torch
    from transformers import XLMRobertaConfig, XLMRobertaModel

    torch.manual_seed(2)
    # hidden 256 so the Linear kernels clear quantize_tree's 65536-element
    # eligibility threshold (tiny models keep full precision by design)
    hf_cfg = XLMRobertaConfig(
        vocab_size=120, hidden_size=256, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=1024,
        max_position_embeddings=66, type_vocab_size=1, pad_token_id=1,
    )
    src = tmp_path / "hf"
    XLMRobertaModel(hf_cfg).save_pretrained(src)
    full_out, q_out = tmp_path / "conv", tmp_path / "conv-q8"
    cli_main(["convert", "--src", str(src), "--out", str(full_out)])
    cli_main(["convert", "--src", str(src), "--out", str(q_out),
              "--weight_quant", "int8"])

    assert (q_out / "params.npz").stat().st_size < \
        (full_out / "params.npz").stat().st_size

    from codemix_dense_retrieval_tpu.models.encoder import TextEncoder
    from codemix_dense_retrieval_tpu.ops.weight_quant import has_quantized

    enc_f = TextEncoder.from_checkpoint("BAAI/bge-m3", full_out)
    enc_q = TextEncoder.from_checkpoint("BAAI/bge-m3", q_out)
    assert has_quantized(enc_q.params)
    assert enc_q.weight_quant == "pre-quantized"
    a = enc_f.encode_queries(["hello world", "second query"], batch_size=2)
    b = enc_q.encode_queries(["hello world", "second query"], batch_size=2)
    cos = (a * b).sum(axis=1)
    assert cos.min() > 0.995, cos
