"""Host-side parity against the reference's REAL shipped ablation
artifacts: the collector's reference-format export must reproduce every
row of ``ablation_results.csv`` (819 rows over the
``results/mmarco_full/ablation2`` tree — 7 encoders x
composition/hub/script/size blocks) and the processed summary must
reproduce ``ablation_processed_results.csv`` (117 groups). Together with
``test_reference_tree_parity`` this proves BOTH collectors byte-for-byte
on the reference's actual data. Skipped when the checkout is absent.
Reference: `collect_ablation_results.py:144-264,574-694,803-841`.
"""

import csv
import math
import pathlib

import pytest

REF = pathlib.Path("/root/reference")
TREE = REF / "results" / "mmarco_full" / "ablation2"

pytestmark = pytest.mark.skipif(
    not TREE.exists(), reason="reference checkout not present"
)


def _load_csv(path):
    with open(path, newline="", encoding="utf-8") as f:
        return list(csv.DictReader(f))


def _eq(a, b) -> bool:
    try:
        fa, fb = float(a), float(b)
        if math.isnan(fa) and math.isnan(fb):
            return True
        return abs(fa - fb) <= 1e-9
    except (TypeError, ValueError):
        return str(a if a is not None else "") == str(b if b is not None else "")


@pytest.fixture(scope="module")
def mine():
    from codemix_dense_retrieval_tpu.analysis.ablation import (
        reference_format_ablation_rows,
    )

    return reference_format_ablation_rows(TREE)


class TestAblationResultsCsv:
    def test_every_row_and_column(self, mine):
        from codemix_dense_retrieval_tpu.analysis.ablation import (
            REFERENCE_ABLATION_COLUMNS,
        )

        ref = _load_csv(REF / "ablation_results.csv")
        assert len(mine) == len(ref) == 819

        def key(r):
            return (r["pair"], r["doc_mix"], r["block"], str(r["model"]),
                    float(r["mix_ratio"]), r["source_file"])

        m = {key(r): r for r in mine}
        rr = {key(r): r for r in ref}
        assert set(m) == set(rr)
        for k, want in rr.items():
            got = m[k]
            for col in REFERENCE_ABLATION_COLUMNS:
                assert _eq(got.get(col), want.get(col)), (k[:4], col)

    def test_only_vector_mix_dirs_collected(self, mine):
        """The reference ships with RESULT_DIR_NAME='vector_mix': the
        vector-rN variant dirs present in the tree must be excluded."""
        assert all(r["result_kind"] == "vector_mix" for r in mine)
        assert all(r["result_variant"] == "" for r in mine)

    def test_covers_all_blocks_and_models(self, mine):
        blocks = {r["block"] for r in mine}
        assert blocks == {"composition", "hub", "script", "size"}
        assert {r["model"] for r in mine} == {
            "Qwen3-Embedding-0.6B", "Qwen3-Embedding-4B", "Qwen3-Embedding-8B",
            "gte-multilingual-base", "jina-embeddings-v3",
            "multilingual-e5-large-instruct",
        }


class TestAblationProcessedCsv:
    def test_summary_reproduced(self, mine):
        from codemix_dense_retrieval_tpu.analysis.ablation import (
            compute_reference_ablation_summary,
        )

        summ = compute_reference_ablation_summary(mine)
        ref = _load_csv(REF / "ablation_processed_results.csv")
        assert len(summ) == len(ref) == 117

        def key(r):
            return (r["pair"], r["doc_mix"], r["block"], str(r["model"]))

        m = {key(r): r for r in summ}
        rr = {key(r): r for r in ref}
        assert set(m) == set(rr)
        for k, want in rr.items():
            got = m[k]
            for col in want:
                assert col in got, (k, col)
                assert _eq(got[col], want[col]), (k, col, got[col], want[col])
