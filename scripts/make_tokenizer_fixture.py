"""Generate a tokenizer-id parity fixture from a real tokenizer spec.

The quality-parity gate needs proof that our offline tokenizer wrapper
reproduces the real HF fast tokenizer's ids exactly (VERDICT r2 item 6).
Run this ONCE against the real checkpoint's ``tokenizer.json`` the moment
network/weights are available:

    python scripts/make_tokenizer_fixture.py <ckpt_dir_with_tokenizer.json> \
        tests/fixtures/real_tokenizer/expected_ids.json

then copy the tokenizer.json next to the fixture;
``tests/test_tokenizer_fixture.py`` picks both up automatically and the
parity check runs on every test invocation thereafter.

The probe strings cover the pipeline's real surface: multilingual text
(all 14 mMARCO languages' scripts), code-mixed queries, URLs/digits, and
degenerate inputs. Reference: the encoders loaded at
`onepass_dense_run.py:202-213` all ship XLM-R-family 250k sentencepiece
vocabs.
"""

import json
import pathlib
import sys

# Scripts exercised: Latin (incl. diacritics), Han, Arabic, Devanagari,
# Cyrillic, Kana/Kanji, mixed-script code-mixing, URLs, digits, empties.
PROBE_STRINGS = [
    "What is the capital of France?",
    "今天的天气怎么样？",
    "ما هي عاصمة فرنسا؟",
    "भारत की राजधानी क्या है?",
    "Какая столица у Франции?",
    "フランスの首都はどこですか？",
    "Qual é a capital da França?",
    "Hoeveel inwoners heeft Nederland?",
    "Berapa jumlah penduduk Indonesia?",
    "Thủ đô của Việt Nam là gì?",
    "what is weather 今天 like in 北京 city",
    "El día de los muertos: ¿cuándo se celebra?",
    "https://example.com/path?q=1&lang=zh 3.14159 米",
    "naïve café — résumé",
    "a",
    "",
    " leading and trailing  spaces ",
    "ALL CAPS QUERY WITH numbers 12345",
]


def main() -> None:
    src = pathlib.Path(sys.argv[1])
    out = pathlib.Path(sys.argv[2])
    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
    from codemix_dense_retrieval_tpu.models.tokenizer import HFTokenizer

    tok = HFTokenizer.from_dir(src if src.is_dir() else src.parent)
    cases = []
    for text in PROBE_STRINGS:
        enc = tok.tokenizer.encode(text)
        cases.append({"text": text, "ids": list(enc.ids)})
    out.parent.mkdir(parents=True, exist_ok=True)
    out.write_text(json.dumps(
        {"source": str(src), "pad_id": tok.pad_id, "cases": cases},
        ensure_ascii=False, indent=1,
    ))
    print(f"wrote {len(cases)} cases -> {out}")


if __name__ == "__main__":
    main()
