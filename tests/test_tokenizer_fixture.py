"""Tokenizer-id parity fixture (VERDICT r2 item 6).

Real-weight quality parity hinges on the tokenizer producing EXACTLY the
real HF fast tokenizer's ids. The harness here:

1. proves the fixture mechanism end-to-end on a deterministic in-repo
   BPE (train -> generate fixture via the production script -> reload
   from disk -> assert id parity), and
2. auto-runs the REAL parity check whenever
   ``tests/fixtures/real_tokenizer/{tokenizer.json,expected_ids.json}``
   exist (drop them in with ``scripts/make_tokenizer_fixture.py`` once
   network/weights are available; skipped until then).
"""

import json
import pathlib
import subprocess
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parents[1]
REAL_DIR = REPO / "tests" / "fixtures" / "real_tokenizer"


def _train_tiny_bpe(tmp_path):
    from tokenizers import Tokenizer, models, pre_tokenizers, processors, trainers

    corpus = [
        f"multilingual passage number {i} about topic {i % 13} "
        f"with words like retrieval dense query document"
        for i in range(400)
    ] + ["今天 天气 怎么样 北京 上海 很 好", "ما هي عاصمة فرنسا"] * 50
    tok = Tokenizer(models.BPE(unk_token="<unk>"))
    tok.pre_tokenizer = pre_tokenizers.ByteLevel(add_prefix_space=True)
    trainer = trainers.BpeTrainer(
        vocab_size=800, special_tokens=["<s>", "<pad>", "</s>", "<unk>"],
        show_progress=False,
    )
    tok.train_from_iterator(corpus, trainer)
    tok.post_processor = processors.TemplateProcessing(
        single="<s> $A </s>",
        special_tokens=[("<s>", tok.token_to_id("<s>")),
                        ("</s>", tok.token_to_id("</s>"))],
    )
    d = tmp_path / "tok"
    d.mkdir()
    tok.save(str(d / "tokenizer.json"))
    return d


def _assert_fixture_parity(tok_dir, fixture_path):
    from codemix_dense_retrieval_tpu.models.tokenizer import HFTokenizer

    fixture = json.loads(pathlib.Path(fixture_path).read_text())
    tok = HFTokenizer.from_dir(tok_dir)
    assert fixture["cases"], "empty fixture"
    for case in fixture["cases"]:
        enc = tok.tokenizer.encode(case["text"])
        assert list(enc.ids) == case["ids"], case["text"]
    # the batch path (what the pipeline calls) agrees with single encode
    texts = [c["text"] for c in fixture["cases"]]
    ids, mask = tok.encode_batch(texts)
    for i, case in enumerate(fixture["cases"]):
        row = ids[i][mask[i].astype(bool)].tolist()
        assert row == case["ids"], case["text"]


def test_fixture_mechanism_end_to_end(tmp_path):
    """Train tiny BPE -> run the production fixture generator as a
    subprocess -> reload tokenizer from disk -> assert id parity."""
    tok_dir = _train_tiny_bpe(tmp_path)
    out = tmp_path / "expected_ids.json"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_tokenizer_fixture.py"),
         str(tok_dir), str(out)],
        check=True, cwd=REPO, env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    fixture = json.loads(out.read_text())
    assert len(fixture["cases"]) >= 15
    # every probe category must produce a non-degenerate encoding
    non_empty = [c for c in fixture["cases"] if c["text"].strip()]
    assert all(len(c["ids"]) >= 2 for c in non_empty)  # <s> ... </s>
    _assert_fixture_parity(tok_dir, out)


def test_fixture_detects_tokenizer_drift(tmp_path):
    """A changed vocab must fail the parity check (the fixture is a real
    gate, not a tautology)."""
    tok_dir = _train_tiny_bpe(tmp_path)
    out = tmp_path / "expected_ids.json"
    subprocess.run(
        [sys.executable, str(REPO / "scripts" / "make_tokenizer_fixture.py"),
         str(tok_dir), str(out)],
        check=True, cwd=REPO, env={"JAX_PLATFORMS": "cpu", "PATH": "/usr/bin:/bin:/usr/local/bin"},
    )
    # perturb: drop the post-processor (ids lose <s>/</s>)
    from tokenizers import Tokenizer

    tok = Tokenizer.from_file(str(tok_dir / "tokenizer.json"))
    tok.post_processor = None  # type: ignore[assignment]
    drift_dir = tmp_path / "drift"
    drift_dir.mkdir()
    tok.save(str(drift_dir / "tokenizer.json"))
    with pytest.raises(AssertionError):
        _assert_fixture_parity(drift_dir, out)


@pytest.mark.skipif(
    not (REAL_DIR / "tokenizer.json").exists()
    or not (REAL_DIR / "expected_ids.json").exists(),
    reason="real tokenizer fixture not present (needs network once)",
)
def test_real_tokenizer_parity():
    _assert_fixture_parity(REAL_DIR, REAL_DIR / "expected_ids.json")
