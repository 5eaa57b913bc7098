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
